package graft.util

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The 100 TB co-located join strategy: bucketing both sides of a
  * recurring join key writes them pre-shuffled, so the join plans with
  * ZERO exchanges — the shuffle is paid once at write time, not per
  * query. (On a real cluster this is the orders ⋈ lineitem layout.)
  */
class BucketingSpec extends SparkSpec {

  test("join of two tables bucketed on the join key plans without a shuffle") {
    val db = "graft_bkt"
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    spark.sql(s"DROP TABLE IF EXISTS $db.orders_b")
    spark.sql(s"DROP TABLE IF EXISTS $db.lineitem_b")
    // the in-memory catalog is per-JVM but the warehouse dir persists:
    // clear stale table locations from previous runs
    Seq("orders_b", "lineitem_b").foreach { t =>
      val loc = new java.io.File(s"/tmp/graft_warehouse/$db.db/$t")
      if (loc.exists()) org.apache.commons.io.FileUtils.deleteDirectory(loc)
    }
    graft.Tables.orders(spark, sf("sf0.001"))
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable(s"$db.orders_b")
    graft.Tables.lineitem(spark, sf("sf0.001"))
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable(s"$db.lineitem_b")

    val joined = spark.table(s"$db.lineitem_b")
      .join(spark.table(s"$db.orders_b"),
        col("l_orderkey") === col("o_orderkey"))
    val plan = joined.queryExecution.executedPlan.toString

    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin")
      || plan.contains("BroadcastHashJoin"))
    // with both sides bucketed on the key, no Exchange may appear
    // (disable auto-broadcast to force the co-located path)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val colocated = spark.table(s"$db.lineitem_b")
        .join(spark.table(s"$db.orders_b"),
          col("l_orderkey") === col("o_orderkey"))
      val p2 = colocated.queryExecution.executedPlan.toString
      assert(!p2.contains("Exchange"), s"bucketed join should not shuffle:\n$p2")
      assert(colocated.count() > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
