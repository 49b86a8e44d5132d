package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Incremental host-rank maintenance: per-batch edge deltas merged
  * over the artifact must yield EXACTLY the ranks of a from-scratch
  * batch recompute on the union corpus (integer PageRank — equality is
  * bit-exact, not approximate), through replays and compaction. */
class HostRankSpec extends SparkSpec {

  private def pages(rows: Seq[(Long, String, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "url", "html")
  }

  private def page(id: Long, host: String, path: String,
                   links: String*): (Long, String, String) =
    (id, s"https://$host/$path",
      s"<p>${links.map(l => s"<a href=\"$l\">x</a>").mkString}</p>")

  test("merged deltas == batch recompute on the union corpus; replay " +
       "is a no-op; compaction preserves the graph and the ranks") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("host_rank").toString
    val b0 = pages(Seq(
      page(1L, "a.example", "p1", "https://b.example/x", "https://c.example/y"),
      page(2L, "b.example", "p1", "https://c.example/z", "/local")))
    val b1 = pages(Seq(
      page(3L, "a.example", "p2", "https://b.example/x"), // repeats a->b
      page(4L, "c.example", "p1", "https://a.example/q")))
    val b2 = pages(Seq(
      page(5L, "b.example", "p2", "https://a.example/r",
        "https://d.example/new")))
    val ingest = HostRank.edgeDeltaBatch(dir) _
    ingest(b0, 0L)
    ingest(b1, 1L)
    ingest(b1, 1L) // replayed epoch: idempotent sink, no double deltas
    ingest(b2, 2L)

    def rankMap(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
      df.select(col("node").cast("string"), col("rank").cast("long"))
        .as[(String, Long)].collect().toMap
    def edgeMap(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
      df.select($"src", $"dst", $"n_links".cast("long"))
        .as[(String, String, Long)].collect()
        .map(t => (t._1, t._2) -> t._3).toMap

    // ground truth: one batch job over the UNION corpus
    val union = pages(Seq(
      page(1L, "a.example", "p1", "https://b.example/x", "https://c.example/y"),
      page(2L, "b.example", "p1", "https://c.example/z", "/local"),
      page(3L, "a.example", "p2", "https://b.example/x"),
      page(4L, "c.example", "p1", "https://a.example/q"),
      page(5L, "b.example", "p2", "https://a.example/r",
        "https://d.example/new")))
    val truthEdges = edgeMap(HostRank.edgeDeltas(union))
    // a->b twice (p1 + p2), b->b once (the /local self-link), etc.
    assert(truthEdges(("a.example", "b.example")) == 2L, truthEdges.toString)
    assert(truthEdges(("b.example", "b.example")) == 1L)
    val truthRanks = rankMap(graft.operators.Graph.pageRank(
      HostRank.edgeDeltas(union), "src", "dst", "n_links"))

    assert(edgeMap(HostRank.mergedEdges(spark, dir)) == truthEdges)
    assert(rankMap(HostRank.hostRank(spark, dir)) == truthRanks)

    // compaction folds epochs 0..1, keeps 2; graph and ranks unchanged
    HostRank.compactEdges(spark, dir)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$dir/edges/batch_id=0")))
    assert(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/edges/batch_id=2")))
    assert(edgeMap(HostRank.mergedEdges(spark, dir)) == truthEdges)
    assert(rankMap(HostRank.hostRank(spark, dir)) == truthRanks)

    // growth after compaction keeps summing into the same graph
    val b3 = pages(Seq(page(6L, "d.example", "p1", "https://a.example/s")))
    ingest(b3, 3L)
    val after = edgeMap(HostRank.mergedEdges(spark, dir))
    assert(after(("d.example", "a.example")) == 1L, after.toString)
    assert(after(("a.example", "b.example")) == 2L)
    // second compaction over (compacted + epochs 2,3): still exact
    HostRank.compactEdges(spark, dir)
    assert(edgeMap(HostRank.mergedEdges(spark, dir)) == after)
  }
}
