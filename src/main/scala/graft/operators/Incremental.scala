package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance — the "yesterday's cube + today's
  * delta" contract every periodic ETL runs instead of full recompute:
  * keep per-key MERGEABLE partial state (count / sum / min / max in
  * exact integer cents), and absorb a delta by re-aggregating the
  * union of partial tables. At 100 TB the difference is scanning one
  * day instead of the full history — the partial table IS the
  * operator's state, exactly like a streaming agg's store but laid
  * down as a table a batch job can own.
  *
  * The merge law (merge(partial(A), partial(B)) == partial(A ∪ B)) is
  * what the d2_incremental gate pins cross-engine: the oracle computes
  * the one-shot aggregate, the Spark side must reach the identical
  * rows through the split + merge path. min/max/count/sum are the
  * classic mergeable algebra; averages derive at READ time
  * (sum div count — never merged directly, the classic pitfall).
  *
  * Reference behavior mirrored: gmall-flink maintains its DWS layer by
  * exactly this shape (incremental upsert of per-key reduce state into
  * ClickHouse, `ProductStatsApp` et al.); this is the batch rendering.
  */
object Incremental {

  /** Per-key partial state over a value rendered to exact cents. */
  def partialAggregate(df: DataFrame, key: String,
                       valueCents: org.apache.spark.sql.Column): DataFrame =
    df.groupBy(col(key))
      .agg(count(lit(1)).as("cnt"),
        sum(valueCents).as("sum_cents"),
        min(valueCents).as("min_cents"),
        max(valueCents).as("max_cents"))

  /** Merge any number of partial tables (same key column + the
    * `partialAggregate` state columns) into the combined state: one
    * union + one keyed aggregate — the delta-absorb step. */
  def mergePartials(key: String, parts: DataFrame*): DataFrame = {
    require(parts.nonEmpty, "mergePartials: need at least one partial table")
    parts.reduce(_ unionByName _)
      .groupBy(col(key))
      .agg(sum(col("cnt")).as("cnt"),
        sum(col("sum_cents")).as("sum_cents"),
        min(col("min_cents")).as("min_cents"),
        max(col("max_cents")).as("max_cents"))
  }
}
