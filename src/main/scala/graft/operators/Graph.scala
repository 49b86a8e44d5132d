package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over edge tables the engine already produces — the
  * page-transition matrix (`EventAnalytics.pathTransitions`), the
  * near-dup pair graph (`llm.Dedup` — whose connected components live in
  * `Dedup.connectedComponents`). PageRank here is the importance face of
  * that graph family: link-weighted stationary visit probability, the
  * classic quality prior for web-corpus curation (Common-Crawl-style
  * pipelines weight documents by host/page rank) and the "which page
  * anchors the flow" ranking over the reference's visitor-journey graph
  * (gmall-realtime `UserJumpDetailApp`'s page flow, generalized).
  */
object Graph {

  /** WEIGHTED PAGERANK, integer-exact: `iterations` rounds of
    *
    *   r'(v) = base + Σ_{u→v} (r(u) · share(u,v) div 10⁶) · d div 100
    *
    * where share(u,v) = w(u,v)·10⁶ div out(u) (the edge's ppm share of
    * its source's out-weight), d = `dampingPct`, and base =
    * (scale div N)·(100−d) div 100. Every step is int64 multiply /
    * truncating `div` — no floats anywhere, so the result is bit-exact
    * across engines and the gate can hash it. Truncation bleeds ≤1 unit
    * per edge per round out of the mass (and dangling nodes leak their
    * damped mass entirely, the no-redistribution variant); at
    * scale=10¹² the relative error is ~10⁻⁶ per round — ranking-order
    * noise far below any real corpus-curation threshold. The float
    * formulation is the documented swap if absolute stationary
    * probabilities are ever needed.
    *
    * Plan shape per round: ranks (|V| rows, one int64 per node) join
    * edge shares on src, one hash-agg on dst, left-join back to the
    * node list — two shuffles on node keys, nothing driver-side (N
    * reaches the plan as a broadcast one-row cross join, never a
    * `collect`). The share table is computed ONCE (one groupBy + one
    * bounded window) and persisted by Catalyst plan reuse across
    * rounds. At 100 TB (web-graph |E| ≫ |V|): shares partition by src,
    * contributions by dst — the standard Pregel data layout; for deep
    * iteration counts checkpoint ranks every ~10 rounds to cut plan
    * depth (documented, not needed at the fixed small `iterations`
    * this engine gates).
    *
    * Multi-edges are pre-summed; self-loops are legal. Output:
    * (node, rank) — rank on the `scale` integer scale. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               weightCol: String, iterations: Int = 3, dampingPct: Int = 85,
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && dampingPct >= 0 && dampingPct <= 100,
      "pageRank: need iterations >= 1 and dampingPct in [0,100]")
    val e = edges
      .groupBy(col(srcCol).as("__src"), col(dstCol).as("__dst"))
      .agg(sum(col(weightCol)).cast("long").as("__w"))
    // ppm share of the source's out-weight; share <= 1e6 keeps every
    // later product inside int64 (r*share <= scale*1e6 = 1e18 < 2^63)
    val shares = e
      .withColumn("__out", sum(col("__w")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("__src"))))
      .withColumn("__share", expr("__w * 1000000L div __out"))
      .select("__src", "__dst", "__share")
    val nodes = e.select(col("__src").as("node"))
      .union(e.select(col("__dst").as("node"))).distinct()
    val n = nodes.agg(count(lit(1)).as("__n"))
    // base carries on every node row; r0 = scale div N (uniform start)
    val withBase = nodes.crossJoin(broadcast(n))
      .withColumn("__r0", expr(s"${scale}L div __n"))
      .withColumn("__base",
        expr(s"(${scale}L div __n) * ${100 - dampingPct}L div 100"))
      .select("node", "__r0", "__base")
    var ranks = withBase.select(col("node"), col("__r0").as("rank"))
    for (_ <- 1 to iterations) {
      val contrib = ranks
        .join(shares, ranks("node") === shares("__src"))
        .groupBy(col("__dst").as("node"))
        .agg(sum(expr(s"(rank * __share div 1000000L) * ${dampingPct}L div 100"))
          .as("__c"))
      ranks = withBase.join(contrib, Seq("node"), "left_outer")
        .select(col("node"),
          (col("__base") + coalesce(col("__c"), lit(0L))).as("rank"))
    }
    ranks
  }
}
