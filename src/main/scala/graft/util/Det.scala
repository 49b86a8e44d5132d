package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Determinism helpers for oracle parity.
  *
  * The driver hash-compares our parquet output against DuckDB running the
  * declared oracle SQL. Floating-point SUMs are order-dependent, so every
  * money/double aggregate goes through an exact decimal accumulator and is
  * converted back to double only once at the end — bit-identical in any
  * summation order and in both engines. (Inputs are 2-decimal doubles; sums
  * at sf<=0.1 stay well inside double's 15-significant-digit exact range.)
  */
object Det {
  /** Exact sum of a 2-decimal double column, returned as double.
    * Oracle equivalent: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE). */
  def decSum(c: Column): Column = sum(c.cast("decimal(18,2)")).cast("double")

  /** Exact average: decimal sum divided by count, one double division.
    * Oracle: CAST(SUM(CAST(x AS DECIMAL(18,2))) AS DOUBLE) / COUNT(x). */
  def decAvg(c: Column): Column =
    sum(c.cast("decimal(18,2)")).cast("double") / count(c)

  /** Exact distinct count via set accumulation — mirrors the reference's
    * HashSet-in-reduce pattern (ProductStats orderIdSet,
    * `ProductStatsApp.java:274-283`); works in streaming where Spark bans
    * COUNT(DISTINCT). Oracle: COUNT(DISTINCT x). */
  def setCount(c: Column): Column = size(collect_set(c)).cast("long")

  /** The 100 TB swap for setCount: HyperLogLog++ sketch distinct
    * (`approx_count_distinct`). `collect_set` state is O(distinct) per
    * group — exact, and fine at gate scale or for bounded key domains —
    * while the HLL sketch is a fixed few KB per group at ~rsd relative
    * error, mergeable map-side, and safe for unbounded domains. Not
    * oracle-able (the sketch is engine-specific), so gate queries keep
    * the exact form; ApproxSpec bounds the error against it. */
  def approxSetCount(c: Column, rsd: Double = 0.05): Column =
    approx_count_distinct(c, rsd)

  /** Window-bound stamp "yyyy-MM-dd HH:mm:ss" (reference DateTimeUtil
    * format; session TZ pinned UTC). Oracle: strftime(ts, '%Y-%m-%d %H:%M:%S'). */
  def stamp(c: Column): Column = date_format(c, "yyyy-MM-dd HH:mm:ss")

  /** Total-order the result and collapse to one file so row order in the
    * written parquet matches the oracle's ORDER BY. */
  def ordered(df: DataFrame, keys: String*): DataFrame =
    df.orderBy(keys.map(col): _*)
}
