package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunctionsSpec extends SparkSpec {

  test("F1 SplitKeyword generator: latin words + CJK bigrams, one row per token") {
    import spark.implicits._
    val df = Seq((1L, "Apple iPhone 12 手机壳 NEW"), (2L, ""), (3L, null: String))
      .toDF("id", "title")
    val out = df.select($"id", Tokenize.splitKeyword($"title"))
      .as[(Long, String)].collect().toSeq
    assert(out == Seq(
      1L -> "apple", 1L -> "iphone", 1L -> "12",
      1L -> "手机", 1L -> "机壳", 1L -> "new"))
  }

  test("F1 SQL registration: split_keyword usable from spark.sql (UDTF call shape)") {
    import spark.implicits._
    Tokenize.register(spark)
    Seq(("spark spark streaming", "src1")).toDF("full_word", "source")
      .createOrReplaceTempView("fw")
    val rows = spark.sql(
      "SELECT word, source FROM fw LATERAL VIEW split_keyword(full_word) t AS word")
      .as[(String, String)].collect().toSeq
    assert(rows == Seq(("spark", "src1"), ("spark", "src1"), ("streaming", "src1")))
  }

  test("S6 transient-column drop mirrors @TransientSink before the JDBC write") {
    import spark.implicits._
    val df = Seq((1L, "a", Seq(1L, 2L))).toDF("sku_id", "sku_name", "orderIdSet")
    val out = graft.sources.Sinks.dropTransient(df, Seq("orderIdSet"))
    assert(out.columns.toSeq == Seq("sku_id", "sku_name"))
  }

  test("S7 dim upsert store: latest write per (table, pk) wins across batches") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dims").toString + "/store"
    def batch(rows: (String, String, Map[String, String])*) =
      rows.toSeq.toDF("sinkTable", "pk", "data")
    graft.sources.Sinks.upsertDims(dir)(
      batch(("dim_user", "1", Map("name" -> "ann")), ("dim_user", "2", Map("name" -> "bo"))), 0L)
    graft.sources.Sinks.upsertDims(dir)(
      batch(("dim_user", "1", Map("name" -> "ann2")), ("dim_sku", "9", Map("p" -> "x"))), 1L)
    val users = graft.sources.Sinks.readDims(spark, dir, "dim_user")
      .select($"pk", element_at($"data", "name")).as[(String, String)].collect().toMap
    assert(users == Map("1" -> "ann2", "2" -> "bo"))
    assert(graft.sources.Sinks.readDims(spark, dir, "dim_sku").count() == 1)
  }
}
