package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.catalyst.InternalRow

/** ProtoWire against hand-assembled wire bytes and hostile inputs. */
class ProtoWireSpec extends AnyFunSuite {

  private def rows(b: Array[Byte]): Array[InternalRow] = {
    val a = ProtoWire.fields(b)
    if (a == null) null
    else (0 until a.numElements()).map(i =>
      a.getStruct(i, 8).asInstanceOf[InternalRow]).toArray
  }

  test("varint, zigzag view, 64-bit boundary") {
    // field 1 varint 300 (0xAC 0x02), field 2 varint max uint64
    val b = Array[Byte](0x08, 0xac.toByte, 0x02,
      0x10, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte,
      0xff.toByte, 0xff.toByte, 0xff.toByte, 0xff.toByte, 0x01)
    val r = rows(b)
    assert(r.length === 2)
    assert(r(0).getLong(3) === 300L)
    assert(r(0).getLong(4) === 150L) // zigzag(300) = 150
    assert(r(1).getLong(3) === -1L) // max uint64 as raw signed
    assert(r(1).getLong(4) === Long.MinValue) // zigzag(2^64-1) = -2^63
  }

  test("fixed64, fixed32, length-delimited with and without valid UTF-8") {
    val b = Array[Byte](
      0x09, 1, 0, 0, 0, 0, 0, 0, 0x80.toByte, // f1 fixed64 LE
      0x15, 0xd2.toByte, 0x02, 0, 0, // f2 fixed32 = 722
      0x1a, 3, 'a', 'b', 'c', // f3 "abc"
      0x22, 2, 0xff.toByte, 0xfe.toByte) // f4 invalid UTF-8
    val r = rows(b)
    assert(r.length === 4)
    assert(r(0).getLong(3) === (1L | (0x80L << 56)))
    assert(r(1).getLong(3) === 722L)
    assert(r(2).getLong(5) === 3L)
    assert(r(2).getUTF8String(7).toString === "abc")
    assert(r(3).getLong(5) === 2L)
    assert(r(3).isNullAt(7)) // bytes kept, string view null
    assert(r(3).getBinary(6) === Array(0xff.toByte, 0xfe.toByte))
  }

  test("two-byte tags (field >= 16) and nested message re-feed") {
    val inner = Array[Byte](0x08, 42) // field 1 varint 42
    val b = Array[Byte](0x80.toByte, 0x01, 7, // field 16 varint 7
      0x92.toByte, 0x01, inner.length.toByte) ++ inner // field 18 nested
    val r = rows(b)
    assert(r.length === 2)
    assert(r(0).getInt(1) === 16 && r(0).getLong(3) === 7L)
    assert(r(1).getInt(1) === 18 && r(1).getInt(2) === 2)
    val nested = rows(r(1).getBinary(6))
    assert(nested.length === 1 && nested(0).getLong(3) === 42L)
  }

  test("malformed inputs decline: groups, field 0, truncations, overrun length") {
    assert(rows(Array[Byte](0x0b)) == null) // wire type 3 (group start)
    assert(rows(Array[Byte](0x07)) == null) // field 0
    assert(rows(Array[Byte](0x08)) == null) // truncated varint value
    assert(rows(Array[Byte](0x1a, 5, 'a')) == null) // length overruns
    assert(rows(Array[Byte](0x09, 1, 2)) == null) // truncated fixed64
    // truncation fuzz over a healthy message
    val good = Array[Byte](0x08, 0xac.toByte, 0x02, 0x1a, 3, 'a', 'b', 'c',
      0x15, 1, 2, 3, 4)
    assert(rows(good).length === 3)
    (1 until good.length).foreach { keep =>
      rows(java.util.Arrays.copyOf(good, keep)) // must not throw
    }
    assert(rows(Array.emptyByteArray).length === 0)
  }
}
