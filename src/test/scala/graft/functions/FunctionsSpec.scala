package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class FunctionsSpec extends SparkSpec {

  test("F1 SplitKeyword generator: latin words + CJK bigrams, one row per token") {
    import spark.implicits._
    val df = Seq((1L, "Apple iPhone 12 手机壳 NEW"), (2L, ""), (3L, null: String))
      .toDF("id", "title")
    val q = df.select($"id", Tokenize.splitKeyword($"title"))
    val out = q.as[(Long, String)].collect().toSeq
    assert(out == Seq(
      1L -> "apple", 1L -> "iphone", 1L -> "12",
      1L -> "手机", 1L -> "机壳", 1L -> "new"))
    // the whole tokenize→explode fan-out must stay inside whole-stage
    // codegen: Generate shows up starred, nothing falls back to
    // interpreted eval
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("*") && plan.contains("Generate"), plan)
    assert(plan.linesIterator.filter(_.contains("Generate")).forall(_.contains("*")),
      s"Generate not codegen'd:\n$plan")
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

  test("S7 upsert to one dim table leaves other tables' snapshot files untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dims_part").toString + "/store"
    def batch(rows: (String, String, Map[String, String])*) =
      rows.toSeq.toDF("sinkTable", "pk", "data")
    graft.sources.Sinks.upsertDims(dir)(
      batch(("dim_user", "1", Map("name" -> "ann")), ("dim_sku", "9", Map("p" -> "x"))), 0L)
    // dim_sku's snapshot lives in an immutable v=N/sinkTable=dim_sku dir
    def skuFiles(): Map[String, Long] = {
      val dirs = new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("v="))
        .map(v => new java.io.File(v, "sinkTable=dim_sku")).filter(_.isDirectory)
      assert(dirs.length == 1, "exactly one live dim_sku snapshot dir")
      dirs.head.listFiles().filter(_.getName.endsWith(".parquet"))
        .map(f => f.getAbsolutePath -> f.lastModified()).toMap
    }
    val before = skuFiles()
    assert(before.nonEmpty)
    graft.sources.Sinks.upsertDims(dir)(
      batch(("dim_user", "1", Map("name" -> "ann2"))), 1L)
    assert(skuFiles() == before, "untouched table's snapshot was rewritten")
    val users = graft.sources.Sinks.readDims(spark, dir, "dim_user")
      .select($"pk", element_at($"data", "name")).as[(String, String)].collect().toMap
    assert(users == Map("1" -> "ann2"))
    assert(graft.sources.Sinks.readDims(spark, dir, "dim_sku").count() == 1)
  }

  test("S7 snapshot isolation: a reader mid-commit sees old or new, never a mix") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dims_atomic").toString + "/store"
    def batch(rows: (String, String, Map[String, String])*) =
      rows.toSeq.toDF("sinkTable", "pk", "data")
    def snapshot(): Map[String, String] =
      graft.sources.Sinks.readDims(spark, dir, "dim_user")
        .select($"pk", element_at($"data", "name")).as[(String, String)].collect().toMap
    graft.sources.Sinks.upsertDims(dir)(
      batch(("dim_user", "1", Map("name" -> "ann")), ("dim_user", "2", Map("name" -> "bo"))), 0L)
    val old = snapshot()
    assert(old == Map("1" -> "ann", "2" -> "bo"))
    // the seam fires after the new version dir is fully written but
    // before the _LATEST pointer flip — the exact window the old dynamic
    // partition overwrite could expose a partial snapshot in
    var midCommit: Map[String, String] = null
    graft.sources.Sinks.upsertDimsHook(dir, () => { midCommit = snapshot() })(
      batch(("dim_user", "1", Map("name" -> "ann2")), ("dim_user", "3", Map("name" -> "cy"))), 1L)
    assert(midCommit == old, s"mid-commit reader saw a mixed snapshot: $midCommit")
    assert(snapshot() == Map("1" -> "ann2", "2" -> "bo", "3" -> "cy"))
    // vacuum keeps the just-replaced version (grace for in-flight readers)
    val vdirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v=")).map(_.getName).toSet
    assert(vdirs == Set("v=1", "v=2"), s"unexpected version dirs: $vdirs")
  }

  test("S7 vacuum grace depth: a lazy reader survives that many subsequent commits") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("dims_grace").toString + "/store"
    def batch(rows: (String, String, Map[String, String])*) =
      rows.toSeq.toDF("sinkTable", "pk", "data")
    def vdirs(): Set[String] = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("v=")).map(_.getName).toSet
    val up = graft.sources.Sinks.upsertDims(dir, vacuumGraceCommits = 3) _
    up(batch(("dim_user", "1", Map("name" -> "v1"))), 0L)
    // a lazy reader resolves the manifest (-> v=1) now, evaluates later
    val lazyFrame = graft.sources.Sinks.readDims(spark, dir, "dim_user")
      .select($"pk", element_at($"data", "name"))
    up(batch(("dim_user", "1", Map("name" -> "v2"))), 1L)
    up(batch(("dim_user", "1", Map("name" -> "v3"))), 2L)
    // two commits after resolution the snapshot dir is still there —
    // under the old one-commit grace this read threw FileNotFoundException
    assert(lazyFrame.as[(String, String)].collect().toMap == Map("1" -> "v1"))
    assert(vdirs() == Set("v=1", "v=2", "v=3"), s"grace violated: ${vdirs()}")
    // ...and one more commit ages v=1 past the grace depth
    up(batch(("dim_user", "1", Map("name" -> "v4"))), 3L)
    assert(!vdirs().contains("v=1"), s"v=1 should be vacuumed: ${vdirs()}")
  }

  test("FT2 idempotent batch sink: a replayed batch id is a no-op, new ids append") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("eos").toString + "/facts"
    val sink = graft.sources.Sinks.idempotentBatchSink(dir) _
    sink(Seq((1L, "a"), (2L, "b")).toDF("id", "v"), 0L)
    // replay of batch 0 with DIFFERENT (corrupt/duplicate) data: ignored
    sink(Seq((9L, "dup")).toDF("id", "v"), 0L)
    sink(Seq((3L, "c")).toDF("id", "v"), 1L)
    val rows = spark.read.parquet(dir)
      .select($"batch_id".cast("long"), $"id", $"v")
      .as[(Long, Long, String)].collect().toSet
    assert(rows == Set((0L, 1L, "a"), (0L, 2L, "b"), (1L, 3L, "c")))
  }

  test("RewriteSetCount: batch size(collect_set) becomes count(distinct), results equal") {
    import spark.implicits._
    val df = Seq((1, 10), (1, 10), (1, 20), (2, 30)).toDF("k", "v")
    val agg = df.groupBy($"k").agg(graft.util.Det.setCount($"v").as("dc"))
    val before = agg.queryExecution.analyzed
    val after = RewriteSetCount(before)
    assert(before.toString.contains("collect_set"))
    assert(!after.toString.contains("collect_set") && after.toString.contains("count"))
    val rewritten = org.apache.spark.sql.graft.SparkInternals.ofRows(spark, after)
      .orderBy("k").as[(Int, Long)].collect().toSeq
    val original = agg.orderBy("k").as[(Int, Long)].collect().toSeq
    assert(rewritten == original && original == Seq((1, 2L), (2, 1L)))
  }

  test("RewriteSetCount skips floating-point children (NaN semantics diverge)") {
    import spark.implicits._
    val df = Seq((1, Double.NaN), (1, Double.NaN), (1, 2.0)).toDF("k", "v")
    val agg = df.groupBy($"k").agg(graft.util.Det.setCount($"v").as("dc"))
    val after = RewriteSetCount(agg.queryExecution.analyzed)
    assert(after.toString.contains("collect_set"),
      "double column must keep collect_set: count(distinct) would merge NaNs")
  }

  test("RewriteSetCount leaves streaming aggregates untouched (set IS the state)") {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    import org.apache.spark.sql.functions._
    val mem = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(java.sql.Timestamp, Long)]
    val agg = mem.toDF().toDF("ts", "v")
      .withWatermark("ts", "0 seconds")
      .groupBy(window(col("ts"), "10 seconds"))
      .agg(graft.util.Det.setCount(col("v")).as("dc"))
    val plan = agg.queryExecution.analyzed
    val after = RewriteSetCount(plan)
    assert(after.toString.contains("collect_set"), "streaming plan must keep the set buffer")
  }
}
