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

  /** EXACT fixed-bin histogram per group — the distribution profile
    * behind quality cuts (doc-length curves, score bands). Integer bin
    * index `floor((v - lo) / width)` clamped to [0, nBins-1] (underflow
    * into bin 0, overflow into the top bin), computed MAP-SIDE; the only
    * shuffle is the hash-agg on the bounded (groups × nBins) grain.
    * Spark's `histogram_numeric` is approximate with data-dependent bin
    * centers — useless as a stable contract; fixed edges are exact,
    * mergeable, and comparable across runs/partitions/datasets.
    * Bin edges ride along as columns (`bin_lo` inclusive, `bin_hi`
    * exclusive except the clamp bins, which absorb their overflow). */
  def histogram(df: DataFrame, valueCol: String, lo: Double, width: Double,
                nBins: Int, groupCols: Seq[String]): DataFrame = {
    require(width > 0 && nBins > 0, "histogram needs width > 0 and nBins > 0")
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(width)), lit(0L)), lit(nBins - 1L))
      .cast("long")
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+ bin.as("bin"): _*)
      .agg(count(lit(1)).as("ct"))
      .withColumn("bin_lo", lit(lo) + col("bin") * lit(width))
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * lit(width))
  }

  /** GLOBAL EXACT PERCENT-RANK without the global sort: ranking a whole
    * corpus by one score ("keep the top 30% by quality") is the classic
    * single-partition-Window trap — `percent_rank().over(Window.orderBy
    * (...))` drags every row through one task. This is the distributed
    * two-pass rendering: (1) a hash aggregate counts rows per DISTINCT
    * value; (2) a cumulative sum over that value-bounded table turns
    * counts into "rows strictly below"; (3) the rank table joins back
    * broadcast, map-side. `rank_below` = SQL `rank() - 1` (ties share a
    * rank) and `pct_ppm` = rank_below·10⁶ div (N−1) — integer-exact, so
    * the gate hashes. N reaches the plan as a one-row broadcast.
    *
    * The cumulative pass IS a single-partition window — over the
    * DISTINCT-VALUE table, not the data (same bound as e3's |types|²
    * matrix). The contract is therefore: quantize continuous scores
    * first (the gate uses ppm — ≤10⁶+1 distinct), keeping the rank
    * table bounded and its broadcast justified by construction. */
  def globalPercentRank(df: DataFrame, valueCol: String): DataFrame = {
    // NULL contract: rows with a NULL value have no rank — they are
    // excluded from the output AND from the N−1 denominator (previously
    // the null-unsafe join dropped them from the output while the
    // unfiltered count(*) still inflated pct_ppm).
    val nn = df.filter(col(valueCol).isNotNull)
    val counts = nn.groupBy(col(valueCol)).agg(count(lit(1)).as("__ct"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranks = counts
      .withColumn("__below", coalesce(sum(col("__ct")).over(w), lit(0L)))
      .select(col(valueCol), col("__below"))
    // N from the value-count table, NOT a second pass over the input —
    // the input may be an expensive upstream (x_ccnet_refine's LM score),
    // and this keeps globalPercentRank at two input traversals (counts +
    // the join-back) instead of three
    val tot = counts.agg(sum(col("__ct")).as("__n"))
    nn.join(broadcast(ranks), Seq(valueCol))
      .crossJoin(broadcast(tot))
      .withColumn("rank_below", col("__below"))
      .withColumn("pct_ppm", when(col("__n") > 1,
        expr("__below * 1000000L div (__n - 1)")).otherwise(lit(0L)))
      .drop("__below", "__n")
  }

  /** GROUPED exact percent-rank — `globalPercentRank` per group, the
    * cross-population score CALIBRATION step ("is this document good
    * *for its source*?"): a raw score threshold keeps different
    * fractions of differently-distributed sources, so curation
    * pipelines rank within each source before mixing. Same bounded
    * two-pass rendering: per-(group, value) counts, a cumulative sum
    * over the value table PARTITIONED BY GROUP (rows bounded by
    * |groups| × distinct values — still value-table-sized, never the
    * data; partitioning by group also removes globalPercentRank's
    * single-partition constraint), per-group totals, broadcast join
    * back. `pct_ppm` = rank_below·10⁶ div (N_g −1), integer-exact per
    * group. Quantize continuous scores first, as with the global
    * form. */
  def groupedPercentRank(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame = {
    val nn = df.filter(col(valueCol).isNotNull)
    val counts = nn.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__ct"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranks = counts
      .withColumn("__below", coalesce(sum(col("__ct")).over(w), lit(0L)))
      .select(col(groupCol), col(valueCol), col("__below"))
    val tot = counts.groupBy(col(groupCol)).agg(sum(col("__ct")).as("__ng"))
    nn.join(broadcast(ranks), Seq(groupCol, valueCol))
      .join(broadcast(tot), Seq(groupCol))
      .withColumn("rank_below", col("__below"))
      .withColumn("pct_ppm", when(col("__ng") > 1,
        expr("__below * 1000000L div (__ng - 1)")).otherwise(lit(0L)))
      .drop("__below", "__ng")
  }
}
