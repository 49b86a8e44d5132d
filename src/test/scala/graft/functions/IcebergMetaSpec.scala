package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** IcebergMeta against hand-built metadata.json documents following
  * the public Iceberg table spec (v1 and v2 shapes), plus the decline
  * and fuzz contracts. */
class IcebergMetaSpec extends AnyFunSuite {

  private def v2Meta(curSnap: Long = 3002L): String =
    s"""{
      |  "format-version": 2,
      |  "table-uuid": "9c12f1b2-0000-4000-8000-000000000001",
      |  "location": "s3://bucket/tbl",
      |  "last-sequence-number": 7,
      |  "current-schema-id": 1,
      |  "schemas": [
      |    {"schema-id": 0, "type": "struct", "fields": [
      |      {"id": 1, "name": "k", "required": true, "type": "long"}]},
      |    {"schema-id": 1, "type": "struct", "fields": [
      |      {"id": 1, "name": "k", "required": true, "type": "long"},
      |      {"id": 2, "name": "payload", "required": false, "type": "string"},
      |      {"id": 3, "name": "day", "required": false, "type": "date"}]}
      |  ],
      |  "default-spec-id": 0,
      |  "partition-specs": [
      |    {"spec-id": 0, "fields": [
      |      {"source-id": 3, "field-id": 1000, "name": "day_bucket",
      |       "transform": "bucket[8]"}]}
      |  ],
      |  "current-snapshot-id": $curSnap,
      |  "snapshots": [
      |    {"snapshot-id": 3001, "timestamp-ms": 1700000001000,
      |     "sequence-number": 6,
      |     "summary": {"operation": "append", "total-records": "1000",
      |       "total-data-files": "4"},
      |     "manifest-list": "s3://bucket/tbl/metadata/snap-3001.avro"},
      |    {"snapshot-id": 3002, "parent-snapshot-id": 3001,
      |     "timestamp-ms": 1700000002000, "sequence-number": 7,
      |     "summary": {"operation": "overwrite", "total-records": "900",
      |       "total-data-files": "3"},
      |     "manifest-list": "s3://bucket/tbl/metadata/snap-3002.avro"}
      |  ]
      |}""".stripMargin

  private val v1Meta: String =
    """{
      |  "format-version": 1,
      |  "table-uuid": "9c12f1b2-0000-4000-8000-000000000002",
      |  "schema": {"type": "struct", "fields": [
      |    {"id": 1, "name": "a", "required": true, "type": "long"},
      |    {"id": 2, "name": "b", "required": false, "type": "string"}]},
      |  "partition-spec": [
      |    {"source-id": 1, "field-id": 1000, "name": "a_id",
      |     "transform": "identity"}],
      |  "snapshots": []
      |}""".stripMargin

  test("v2 metadata: schema by id, spec by id, current snapshot summary") {
    val m = IcebergMeta.tableMeta(v2Meta().getBytes("UTF-8"))
    assert(m != null)
    assert(m.getInt(0) === 2)
    assert(m.getLong(1) === 3002L)
    assert(m.getInt(2) === 2)
    assert(m.getUTF8String(3).toString === "day,k,payload") // schema-id 1!
    assert(m.getUTF8String(4).toString === "day_bucket")
    assert(m.getLong(5) === 900L)
    assert(m.getLong(6) === 3L)
    val snaps = IcebergMeta.snapshots(v2Meta().getBytes("UTF-8"))
    assert(snaps != null && snaps.numElements() === 2)
    val s0 = snaps.getStruct(0, 7)
    assert(s0.getLong(0) === 3001L)
    assert(s0.isNullAt(1)) // no parent
    assert(s0.getLong(2) === 6L)
    assert(s0.getUTF8String(4).toString === "append")
    assert(s0.getLong(5) === 1000L)
    val s1 = snaps.getStruct(1, 7)
    assert(s1.getLong(1) === 3001L)
    assert(s1.getUTF8String(4).toString === "overwrite")
  }

  test("v1 metadata: inline schema + partition-spec, no snapshots") {
    val m = IcebergMeta.tableMeta(v1Meta.getBytes("UTF-8"))
    assert(m != null)
    assert(m.getInt(0) === 1)
    assert(m.isNullAt(1)) // no current snapshot
    assert(m.getInt(2) === 0)
    assert(m.getUTF8String(3).toString === "a,b")
    assert(m.getUTF8String(4).toString === "a_id")
    assert(m.isNullAt(5) && m.isNullAt(6))
    assert(IcebergMeta.snapshots(v1Meta.getBytes("UTF-8")).numElements() === 0)
  }

  test("declines: bad version, missing uuid/schema, dangling ids, junk") {
    def bad(s: String) =
      assert(IcebergMeta.tableMeta(s.getBytes("UTF-8")) == null, s.take(60))
    bad(v2Meta().replace("\"format-version\": 2", "\"format-version\": 9"))
    bad(v2Meta().replace("\"table-uuid\"", "\"nope\""))
    bad(v2Meta().replace("\"current-schema-id\": 1", "\"current-schema-id\": 42"))
    bad(v2Meta().replace("\"default-spec-id\": 0", "\"default-spec-id\": 42"))
    bad("not json at all")
    bad("{}")
    assert(IcebergMeta.tableMeta(null) == null)
  }

  test("63-bit snapshot ids parse exactly (integral JSON stays Long)") {
    val big = 3051729675574597004L // a realistic uniform 63-bit id
    val par = 9007199254740993L // 2^53 + 1: rounds under double parsing
    val doc = v2Meta().replace("3002", big.toString)
      .replace("3001", par.toString)
    val m = IcebergMeta.tableMeta(doc.getBytes("UTF-8"))
    assert(m != null)
    assert(m.getLong(1) === big)
    assert(m.getLong(5) === 900L) // summary still resolved for that id
    val snaps = IcebergMeta.snapshots(doc.getBytes("UTF-8"))
    assert(snaps.getStruct(0, 7).getLong(0) === par)
    val s1 = snaps.getStruct(1, 7)
    assert(s1.getLong(0) === big)
    assert(s1.getLong(1) === par) // parent id exact too
  }

  test("totality: truncation and corruption fuzz never throws") {
    val b = v2Meta().getBytes("UTF-8")
    (1 until b.length by 3).foreach { keep =>
      IcebergMeta.tableMeta(java.util.Arrays.copyOf(b, keep))
      IcebergMeta.snapshots(java.util.Arrays.copyOf(b, keep))
    }
    (0 until b.length by 2).foreach { i =>
      val c = b.clone(); c(i) = (c(i) ^ 0x35).toByte
      IcebergMeta.tableMeta(c)
      IcebergMeta.snapshots(c)
    }
  }
}
