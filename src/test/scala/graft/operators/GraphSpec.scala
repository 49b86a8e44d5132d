package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class GraphSpec extends SparkSpec {

  test("pageRank: hand-computed integer ranks, dangling node, base mass") {
    import spark.implicits._
    // A→B, A→C, B→A; C is dangling (its damped mass leaks, documented)
    val edges = Seq(("A", "B", 1L), ("A", "C", 1L), ("B", "A", 1L))
      .toDF("src", "dst", "w")
    val got = Graph.pageRank(edges, "src", "dst", "w")
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // by hand at scale=1e12, d=85: r0 = 333333333333, base = 49999999999;
    // three rounds of (r*share div 1e6) * 85 div 100 give:
    assert(got == Map(
      "A" -> 212916666664L,
      "B" -> 140489583331L,
      "C" -> 140489583331L), s"got $got")
  }

  test("pageRank: multi-edges pre-sum; mass never exceeds scale") {
    import spark.implicits._
    val dup = Seq(("A", "B", 1L), ("A", "B", 1L), ("A", "C", 2L),
      ("B", "A", 3L)).toDF("src", "dst", "w")
    val merged = Seq(("A", "B", 2L), ("A", "C", 2L), ("B", "A", 3L))
      .toDF("src", "dst", "w")
    val a = Graph.pageRank(dup, "src", "dst", "w")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    val b = Graph.pageRank(merged, "src", "dst", "w")
      .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(a.sameElements(b), "duplicate edge rows must pre-sum")
    // truncation only ever LOSES mass: sum(rank) <= scale, all positive
    val total = a.map(_._2).sum
    assert(total <= 1000000000000L && a.forall(_._2 > 0), s"mass: $total")
  }
}
