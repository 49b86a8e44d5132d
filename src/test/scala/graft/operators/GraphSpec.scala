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

  test("triangles: enumerates exactly the closed wedges, a<b<c once each") {
    import spark.implicits._
    // K4 on 1..4 (4 triangles) plus a pendant edge (no new triangle)
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 9L)).toDF("src", "dst")
    val tri = Graph.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(tri == Set((1L, 2L, 3L), (1L, 2L, 4L), (1L, 3L, 4L), (2L, 3L, 4L)))
    // open wedge only: no triangle
    val open = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    assert(Graph.triangles(open).count() == 0)
  }

  test("identityStitch: modal device with smallest-id tie-break, transitive merge, min-user label") {
    import spark.implicits._
    def ev(user: Long, k: Int, n: Int) =
      (1 to n).map(i => (user, s"""{"k": $k}"""))
    // u1: device 7 (×2) beats 9 (×1); u2: tie 7/8 → smallest (7) wins;
    // u3: device 8 — separate identity; u4: device 7 → merges with u1,u2
    val events = (ev(1, 7, 2) ++ ev(1, 9, 1) ++ ev(2, 7, 1) ++ ev(2, 8, 1) ++
      ev(3, 8, 2) ++ ev(4, 7, 3)).toDF("user_id", "props")
    val got = Graph.identityStitch(events)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == Set((1L, 1L, 3L), (2L, 1L, 3L), (4L, 1L, 3L), (3L, 3L, 1L)),
      s"got $got")
  }
}
