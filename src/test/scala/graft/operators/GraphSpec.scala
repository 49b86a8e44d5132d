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

  test("trianglesDegreeOrdered: identical triangles on a skewed " +
       "star+clique, wedge fan-out bounded by arboricity not max degree") {
    import spark.implicits._
    // hub 0 with 50 pendant spokes (ids 101..150) — the skew regime —
    // plus K5 on 1..5 (10 triangles); hub has the graph's max degree
    // AND the smallest id, the worst case for id-orientation
    val star = (101L to 150L).map(s => (0L, s))
    val k5 = for (i <- 1L to 5L; j <- (i + 1) to 5L) yield (i, j)
    val edges = (star ++ k5).toDF("src", "dst")

    val got = Graph.trianglesDegreeOrdered(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = Graph.triangles(edges)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val k5tris = (for (a <- 1L to 5L; b <- (a + 1) to 5L; c <- (b + 1) to 5L)
      yield (a, b, c)).toSet
    assert(got == want && got == k5tris, s"got $got")

    // the bound itself: wedges = Σ C(outdeg, 2) over the orientation.
    // Degree-ordered: spokes orient INTO the hub (out-degree ≤ 1 each,
    // hub out-degree 0) → only K5 wedges survive, ≤ C(4,2)·5 = 30.
    // Id-ordered (hub id 0 < every spoke): C(50+?,2) ≥ 1225 wedges at
    // the hub alone — the blow-up this orientation exists to kill.
    def wedgeCount(oriented: org.apache.spark.sql.DataFrame): Long =
      oriented.groupBy(col("src")).agg(count(lit(1)).as("od"))
        .agg(sum(expr("od * (od - 1) / 2"))).collect()(0).getAs[Any](0)
        match { case null => 0L; case d: java.math.BigDecimal => d.longValue
                case l: Long => l; case d: Double => d.toLong }
    val degWedges = wedgeCount(Graph.orientByDegree(edges)
      .select(col("src"), col("dst")))
    val idWedges = wedgeCount(edges)
    assert(degWedges <= 30, s"degree-ordered wedges: $degWedges")
    assert(idWedges >= 1225, s"id-ordered wedges: $idWedges")
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
