package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.SparkInternals
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** CSV dialect sniffing — the step BEFORE `spark.read.csv` can be
  * pointed at a crawled tabular file: which delimiter, how many
  * columns, is the first row a header (the python `csv.Sniffer`
  * convention, rebuilt as a codegen'd expression so a corpus of
  * millions of candidate files classifies map-side).
  *
  * Method: over the first 20 non-empty lines, a candidate delimiter
  * (`,` `;` tab `|`) wins when it yields the SAME field count (> 1) on
  * every line — double-quoted fields with embedded delimiters/escaped
  * quotes are honored by the field walk; ties break to the higher
  * column count (the more specific structure). Header detection: some
  * column whose first-row value is non-numeric while the second-row
  * value is numeric (the classic type-flip heuristic). Null when no
  * candidate is consistent — "not a CSV" is an answer, not an error.
  */
object CsvSniff {

  private val Candidates = Array(',', ';', '\t', '|')

  /** Fields of one line under dialect `d` (RFC 4180 quoting: quotes
    * toggle, `""` inside quotes is an escaped quote). */
  private def splitLine(line: String, d: Char): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new java.lang.StringBuilder()
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (c == '"') {
        if (inQ && i + 1 < line.length && line.charAt(i + 1) == '"') {
          cur.append('"'); i += 1
        } else inQ = !inQ
      } else if (c == d && !inQ) { out += cur.toString; cur.setLength(0) }
      else cur.append(c)
      i += 1
    }
    out += cur.toString
    out.toArray
  }

  private def isNumeric(v: String): Boolean = {
    val t = v.trim
    t.nonEmpty && t.matches("[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?")
  }

  /** (delimiter, n_cols, has_header), or null when nothing sniffs. */
  def csvSniff(s: UTF8String): InternalRow = {
    if (s == null) return null
    val lines = s.toString.split("\r?\n").iterator
      .filter(_.nonEmpty).take(20).toArray
    if (lines.length < 2) return null
    var best: Char = 0
    var bestCols = 1
    for (d <- Candidates) {
      val counts = lines.map(splitLine(_, d).length)
      val n = counts(0)
      if (n > bestCols && counts.forall(_ == n)) { best = d; bestCols = n }
    }
    if (best == 0) return null
    val r0 = splitLine(lines(0), best)
    val r1 = splitLine(lines(1), best)
    val hasHeader = r0.indices.exists(i =>
      !isNumeric(r0(i)) && isNumeric(r1(i)))
    InternalRow(UTF8String.fromString(best.toString), bestCols, hasHeader)
  }

  case class Sniff(child: Expression) extends UnaryExpression {
    override def prettyName: String = "csv_sniff"
    override def dataType: DataType = StructType(Seq(
      StructField("delimiter", StringType, nullable = false),
      StructField("n_cols", IntegerType, nullable = false),
      StructField("has_header", BooleanType, nullable = false)))
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      child.dataType match {
        case StringType => TypeCheckResult.TypeCheckSuccess
        case _ => TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a string input")
      }
    override def nullSafeEval(v: Any): Any =
      csvSniff(v.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, s => {
        val r = ctx.freshName("r")
        s"""
           |org.apache.spark.sql.catalyst.InternalRow $r =
           |  graft.functions.CsvSniff.csvSniff($s);
           |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): Expression =
      copy(child = c)
  }

  def csvSniffCol(c: Column): Column =
    SparkInternals.column(Sniff(SparkInternals.expression(c)))
}
