package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BloomPruneSpec extends SparkSpec {

  test("bloomSemiJoin is bit-identical to the plain semi join") {
    val li = graft.Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey"), col("l_linenumber"))
    val hot = graft.Tables.orders(spark, sf("sf0.001"))
      .filter(col("o_totalprice") > 300000.0).select(col("o_orderkey"))
    val got = BloomPrune.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    val want = li.join(hot, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .collect().map(r => (r.getLong(0), r.getInt(1))).toSet
    assert(got == want && got.nonEmpty, s"${got.size} vs ${want.size}")
    // and the pruning is real: the probe side is larger than the match set
    assert(want.size < li.count(), "fixture must make the semi join selective")
  }

  test("the bloom filter sits on the probe side BELOW the semi join") {
    val li = graft.Tables.lineitem(spark, sf("sf0.001"))
      .select(col("l_orderkey"), col("l_linenumber"))
    val hot = graft.Tables.orders(spark, sf("sf0.001"))
      .filter(col("o_totalprice") > 300000.0).select(col("o_orderkey"))
    val df = BloomPrune.bloomSemiJoin(li, hot, "l_orderkey", "o_orderkey")
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"bloom filter missing from plan:\n$plan")
    // the might_contain Filter must appear AFTER (deeper than) the semi
    // join node in the plan text — i.e. on the probe input, not on top
    val joinLine = plan.linesIterator.indexWhere(_.contains("LeftSemi"))
    val bloomLine = plan.linesIterator.indexWhere(_.contains("might_contain"))
    assert(joinLine >= 0 && bloomLine > joinLine,
      s"bloom filter must pre-filter the probe side (join@$joinLine bloom@$bloomLine):\n$plan")
  }

  test("bloom admits only false positives: pruned superset of matches, no false negatives") {
    import spark.implicits._
    val probe = (1L to 2000L).toDF("k")
    val build = (1L to 2000L by 100L).toDF("bk") // 20 true keys
    val exact = BloomPrune.bloomSemiJoin(probe, build, "k", "bk")
      .as[Long].collect().toSet
    assert(exact == (1L to 2000L by 100L).toSet, "re-check must remove every false positive")
  }
}
