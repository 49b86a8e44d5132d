package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Hand-computed delta cases for the snapshot diff, plus its hash-only
  * shuffle contract.
  */
class SnapshotDiffSpec extends SparkSpec {

  test("corpusDiff: added/removed/changed/unchanged verdicts on a hand fixture") {
    import spark.implicits._
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("doc_id", "text")
    val v2 = Seq((2L, "beta"), (3L, "gamma EDITED"), (4L, "delta")).toDF("doc_id", "text")
    val got = SnapshotDiff.corpusDiff(v1, v2, "doc_id")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"), s"got $got")
    // the summary rollup agrees
    val sum = SnapshotDiff.diffSummary(SnapshotDiff.corpusDiff(v1, v2, "doc_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sum == Map("removed" -> 1L, "unchanged" -> 1L,
      "changed" -> 1L, "added" -> 1L), s"got $sum")
  }

  test("corpusDiff shuffles digests, not documents: no text column " +
       "crosses an Exchange") {
    // parquet-backed input: a local-relation fixture gets folded away
    // before any Exchange exists to inspect
    val v1 = graft.Tables.documents(spark, sf("sf0.001"))
    val v2 = v1.filter(col("doc_id") % 2 === 0)
    val plan = SnapshotDiff.corpusDiff(v1, v2, "doc_id")
      .queryExecution.executedPlan.toString
    // every Exchange row must carry only (id, digest) — the raw text
    // column is projected away before any shuffle
    val exchanges = plan.split("\n").filter(_.contains("Exchange"))
    assert(exchanges.nonEmpty, s"expected the id-keyed join exchange:\n$plan")
    exchanges.foreach { l =>
      assert(!l.contains("text"), s"document body crossed a shuffle: $l")
    }
  }
}
