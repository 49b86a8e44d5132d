package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._

/** IPv4 / CIDR scalar parsing — the address arithmetic under network
  * analytics (geo/ASN enrichment, access-log sessionization, abuse
  * screens). Strict single-pass parsers, no regex, total (null on any
  * malformed input):
  *
  *  - [[ip4Col]]: dotted-quad string → unsigned address as a long in
  *    [0, 2^32). Exactly four decimal octets, 1–3 digits each, each
  *    ≤ 255; leading zeros are accepted as decimal (a parse choice the
  *    oracle never exercises — its fixtures are canonical). Nothing
  *    else (ports, whitespace, IPv6) passes.
  *  - [[cidrCol]]: "a.b.c.d/len" → struct(net long, len int) with the
  *    host bits MASKED OFF (the standard normalization: 10.1.2.3/16
  *    denotes network 10.1.0.0), len in [0, 32].
  *
  * Both are codegen'd static calls like every decoder here
  * (BinaryMeta pattern). The join built on them lives in
  * `operators/Net.lpmJoin`.
  *
  * Reference scope: the reference keys traffic by mid/uid and carries
  * no address math (SURVEY §2.2); this is beyond-reference §2.10
  * surface.
  */
object NetOps {

  /** Dotted-quad parse; -1 for malformed (valid values are < 2^32). */
  def ip4(s: String): Long = {
    if (s == null) return -1L
    val n = s.length
    if (n < 7 || n > 15) return -1L
    var i = 0
    var octet = 0
    var acc = 0L
    var pos = 0
    while (octet < 4) {
      var v = 0
      var digits = 0
      while (i < n && s.charAt(i) >= '0' && s.charAt(i) <= '9' && digits < 4) {
        v = v * 10 + (s.charAt(i) - '0'); digits += 1; i += 1
      }
      if (digits == 0 || digits > 3 || v > 255) return -1L
      acc = (acc << 8) | v
      octet += 1
      if (octet < 4) {
        if (i >= n || s.charAt(i) != '.') return -1L
        i += 1
      }
      pos = i
    }
    if (pos != n) return -1L
    acc
  }

  /** "a.b.c.d/len" → packed (net << 8 | len), host bits masked; -1 for
    * malformed. Packing keeps the static helper primitive (the
    * expression unpacks into a struct). */
  def cidrPacked(s: String): Long = {
    if (s == null) return -1L
    val slash = s.lastIndexOf('/')
    if (slash <= 0 || slash >= s.length - 1) return -1L
    val base = ip4(s.substring(0, slash))
    if (base < 0) return -1L
    var len = 0
    var i = slash + 1
    if (s.length - i > 2) return -1L
    while (i < s.length) {
      val c = s.charAt(i)
      if (c < '0' || c > '9') return -1L
      len = len * 10 + (c - '0'); i += 1
    }
    if (len > 32) return -1L
    val net = if (len == 0) 0L else (base >>> (32 - len)) << (32 - len)
    (net << 8) | len
  }

  abstract class StrProbe extends UnaryExpression {
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string input")
      }
  }

  case class Ip4Parse(child: Expression) extends StrProbe {
    override def prettyName: String = "ip4"
    override def dataType: DataType = LongType
    override def nullSafeEval(v: Any): Any = {
      val r = NetOps.ip4(v.toString)
      if (r < 0) null else r
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, str => {
        val r = ctx.freshName("r")
        s"""
           |long $r = graft.functions.NetOps.ip4($str.toString());
           |if ($r < 0) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class CidrParse(child: Expression) extends StrProbe {
    override def prettyName: String = "cidr"
    override def dataType: DataType = StructType(Seq(
      StructField("net", LongType, nullable = false),
      StructField("len", IntegerType, nullable = false)))
    override def nullSafeEval(v: Any): Any = {
      val r = NetOps.cidrPacked(v.toString)
      if (r < 0) null else InternalRow(r >>> 8, (r & 0xff).toInt)
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, str => {
        val r = ctx.freshName("r")
        s"""
           |long $r = graft.functions.NetOps.cidrPacked($str.toString());
           |if ($r < 0) { ${ev.isNull} = true; }
           |else { ${ev.value} = new org.apache.spark.sql.catalyst.expressions
           |  .GenericInternalRow(new Object[]{ $r >>> 8, (int) ($r & 0xffL) }); }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def ip4Col(c: Column): Column =
    SparkInternals.column(Ip4Parse(SparkInternals.expression(c)))
  def cidrCol(c: Column): Column =
    SparkInternals.column(CidrParse(SparkInternals.expression(c)))
}
