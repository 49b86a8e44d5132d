package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the ANALYZE-shaped statistics a pipeline
  * consults before planning itself (which keys to salt, which columns
  * to z-order, whether a dim still broadcasts).
  *
  * All columns' statistics compute in a SINGLE aggregate over ONE scan
  * — at 100 TB the scan IS the cost, so per-column profiling loops
  * (one job per column) are the anti-pattern this exists to replace.
  * Distinct counts are HLL sketches (fixed KBs of state per column, the
  * only option when every column may be high-cardinality); the exact
  * count rides in the gate query's oracle-pinned tolerance boolean
  * instead of the operator (X45 pattern).
  */
object TableStats {

  /** Long-format numeric profile: one row per requested column with
    * null/non-null counts, min/max (as double), and the HLL distinct
    * estimate. One scan, one aggregate, then a constant-width unpivot. */
  def profileNumeric(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot via stack: constant-width, no shuffle (the agg output is one row)
    val stackArgs = cols.map { c =>
      s"'$c', __nn_$c, __null_$c, __min_$c, __max_$c, __dist_$c"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, non_null_ct, null_ct, min_val, max_val, approx_distinct)"))
  }
}
