package graft.util

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Bounds the HLL++ approximate-distinct (the documented 100 TB swap for
  * the exact collect_set accumulator) against the exact count on real
  * table data. The sketch is engine-specific, so this error bound — not
  * a DuckDB oracle — is its correctness contract.
  */
class ApproxSpec extends SparkSpec {

  test("approxSetCount within rsd of exact setCount, globally and per group") {
    val ev = graft.Tables.events(spark, sf("sf0.01"))
    val both = ev.agg(
      Det.setCount(col("user_id")).as("exact"),
      Det.approxSetCount(col("user_id"), 0.05).as("approx")).head()
    val (exact, approx) = (both.getLong(0), both.getLong(1))
    assert(exact > 0)
    val err = math.abs(approx - exact).toDouble / exact
    // 0.05 rsd is one sigma — 4x covers it with huge slack, while still
    // catching a broken sketch (which is off by orders of magnitude)
    assert(err < 0.2, s"HLL err $err (exact=$exact approx=$approx)")
    // per-group (the windowed-stats shape): every group within the band
    val grouped = ev.groupBy(col("event_type"))
      .agg(Det.setCount(col("user_id")).as("exact"),
        Det.approxSetCount(col("user_id"), 0.05).as("approx"))
      .collect()
    assert(grouped.nonEmpty)
    grouped.foreach { r =>
      val (e, a) = (r.getLong(1), r.getLong(2))
      assert(e == 0 && a == 0 || math.abs(a - e).toDouble / e < 0.2,
        s"group ${r.get(0)}: exact=$e approx=$a")
    }
  }
}
