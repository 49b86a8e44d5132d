package graft.util

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SaltSpec extends SparkSpec {

  test("salted aggregation equals plain aggregation on a skewed key distribution") {
    import spark.implicits._
    // 90% of rows on one hot key
    val rows = (1 to 10000).map(i => (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong))
    val df = rows.toDF("key", "v")
    val plain = df.groupBy("key").agg(sum("v").as("s"), count(lit(1)).as("c"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Salt.saltedAgg(df, Seq("key"), buckets = 8,
      partialAggs = Seq(sum("v").as("ps"), count(lit(1)).as("pc")),
      finalAggs = Seq(sum("ps").as("s"), sum("pc").as("c")))
      .as[(String, Long, Long)].collect().toSet
    assert(salted == plain)
  }

  test("approx_count_distinct (the 100 TB swap-in for collect_set) stays within 5% of exact") {
    import spark.implicits._
    val e = graft.Tables.events(spark, sf("sf0.01"))
    val both = e.groupBy("event_type")
      .agg(countDistinct("user_id").as("exact"),
        approx_count_distinct("user_id", 0.02).as("approx"))
      .as[(String, Long, Long)].collect()
    both.foreach { case (_, exact, approx) =>
      assert(math.abs(approx - exact).toDouble / exact <= 0.05)
    }
  }

  test("salted join equals plain join when the dim cannot broadcast") {
    import spark.implicits._
    val facts = (1 to 5000).map(i => (if (i % 20 == 0) i % 50 else 1, i)).toDF("k", "v")
    val dim = (0 until 50).map(i => (i, s"name_$i")).toDF("k", "name")
    val plain = facts.join(dim, "k").as[(Int, Int, String)].collect().toSet
    val salted = Salt.saltedJoin(facts, dim, "k", buckets = 8)
      .select("k", "v", "name").as[(Int, Int, String)].collect().toSet
    assert(salted == plain)
  }
}
