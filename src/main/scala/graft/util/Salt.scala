package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys at scale (SURVEY.md build brief:
  * "salting for skew, AQE for runtime re-plan"). AQE's skew-join handles
  * most cases automatically; these are the explicit tools for when the
  * skew is known up front (a handful of mega-keys in a 100 TB shuffle).
  */
object Salt {

  /** Two-phase salted aggregation: phase 1 aggregates on (key, salt) —
    * spreading one hot key over `buckets` reducers — phase 2 merges the
    * partials per key. `aggs` must be algebraic (sum/count/min/max/...):
    * merge(partial(a), partial(b)) == total(a++b).
    *
    * The salt mixes the row-value hash with spark_partition_id: a
    * value-only hash sends byte-identical duplicate rows (the common real
    * skew) all to one bucket, defeating the spread; the source partition
    * id separates them while staying RNG-free (a task replay re-reads the
    * same input split, so the salt is replay-deterministic).
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], buckets: Int,
                partialAggs: Seq[Column], finalAggs: Seq[Column]): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(hash(df.columns.toIndexedSeq.map(col) :+ spark_partition_id(): _*), lit(buckets)))
    salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(keys.map(col): _*)
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Salted broadcast-free join for a skewed key — delegates to the
    * full operator (`operators.Joins.saltedJoin`: multi-key, inner/left,
    * the same partition-id-mixed salt). Kept as the historical
    * single-key entry point. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
                 buckets: Int): DataFrame =
    graft.operators.Joins.saltedJoin(big, small, Seq(key), buckets)
}
