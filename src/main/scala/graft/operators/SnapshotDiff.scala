package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus snapshot diffing — the dataset-versioning delta every managed
  * training-corpus release publishes: which documents a new snapshot
  * added, removed, changed, or left alone, keyed by document id with
  * change detection by content hash.
  */
object SnapshotDiff {

  /** Per-document delta between two snapshots of the same corpus.
    *
    * Both sides reduce MAP-SIDE to (id, md5(text)) before the ONE full
    * outer join — the join's shuffle carries 16-byte digests, never
    * document bodies, so the diff costs two scans plus an id-keyed
    * exchange of id+hash rows regardless of document size. At 100 TB
    * with both snapshots bucketed by id the exchange disappears
    * entirely. Status: `added` (id only in new), `removed` (only in
    * old), `changed` (both, different hash), `unchanged`. */
  def corpusDiff(oldSnap: DataFrame, newSnap: DataFrame, idCol: String,
                 text: Column = col("text")): DataFrame = {
    val o = oldSnap.select(col(idCol).as("id"), md5(text).as("__fo"))
    val n = newSnap.select(col(idCol).as("id"), md5(text).as("__fn"))
    o.join(n, Seq("id"), "full_outer")
      .select(col("id").as(idCol),
        when(col("__fo").isNull, lit("added"))
          .when(col("__fn").isNull, lit("removed"))
          .when(col("__fo") === col("__fn"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"))
  }

  /** Bounded per-status rollup of a `corpusDiff` result — the release
    * note's four numbers. */
  def diffSummary(diff: DataFrame): DataFrame =
    diff.groupBy(col("status")).agg(count(lit(1)).as("ct"))
}
