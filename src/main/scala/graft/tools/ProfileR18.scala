package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-18 optimization profiling: stage-by-stage wall times for the
  * bench hot spots this round targets (Delta DML fixtures, the
  * containment prefix path, crawl waves, triangles, image near-dup),
  * so each multi-second query is attributed to a specific phase
  * before anything is changed. Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ProfileR18 /root/testdata/sf0.1 delta prefix"
  */
object ProfileR18 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val which = if (args.length > 1) args.drop(1).toSet else Set("all")
    def on(k: String) = which("all") || which(k)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[p18] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    if (sys.env.contains("SPARK_GRAFT_JOBLOG")) {
      val jobStart = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      spark.sparkContext.addSparkListener(
        new org.apache.spark.scheduler.SparkListener {
          override def onJobStart(
              j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
            jobStart.put(j.jobId, System.nanoTime()): Unit
          override def onJobEnd(
              j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
            val t0 = jobStart.getOrDefault(j.jobId, 0L)
            if (t0 > 0)
              println(f"[job] #${j.jobId}%-4d ${(System.nanoTime() - t0) / 1e9}%6.2f s")
          }
        })
    }
    // same warm-up as Bench/Triage so numbers are comparable
    Seq("lineitem", "orders", "documents", "embeddings")
      .foreach(t => graft.Tables.table(spark, sfDir, t).count())
    graft.Tables.events(spark, sfDir).count()
    graft.SparkEntry.queries.get("q1_agg").foreach(_(spark, sfDir).count())

    val docs = graft.Tables.documents(spark, sfDir)

    if (on("delta")) (1 to 3).foreach { it =>
      println(s"[p18] ---- delta iteration $it ----")
      // phase the Delta DML fixture: append, merge, snapshot, changes
      val dir = java.nio.file.Files.createTempDirectory("p18_delta").toString
      val base = graft.Tables.orders(spark, sfDir).coalesce(1)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      time("delta commitAppend (partitioned)")(
        graft.operators.DeltaLite.commitAppend(spark, dir, base, Seq("prio")))
      val src = base.filter(col("k") % 5 === 0)
        .withColumn("st", lit("UP"))
        .unionByName(spark.range(1, 4).select((-col("id")).as("k"),
          lit("NW").as("st"), lit("9-SYN").as("prio")))
      time("delta commitMerge")(
        graft.operators.DeltaLite.commitMerge(spark, dir, src, Seq("k")))
      time("delta snapshot agg")(
        graft.operators.DeltaLite.snapshot(spark, dir)
          .groupBy(col("prio")).agg(count(lit(1))).count())
      time("delta changes agg")(
        graft.operators.DeltaLite.changes(spark, dir, 1L, 1L)
          .groupBy(col("_change_type")).agg(count(lit(1))).count())
      time("delta snapshot agg (2nd)")(
        graft.operators.DeltaLite.snapshot(spark, dir)
          .groupBy(col("prio")).agg(count(lit(1))).count())
      val dir2 = java.nio.file.Files.createTempDirectory("p18_delta2").toString
      time("delta 4 appends + compact + checkpoint")({
        val quarters = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
          "4-NOT SPECIFIED")
        quarters.foreach { q =>
          val pred = if (q == "4-NOT SPECIFIED")
            col("prio") === q || col("prio") === "5-LOW"
          else col("prio") === q
          graft.operators.DeltaLite.commitAppend(spark, dir2,
            base.filter(pred))
        }
        graft.operators.DeltaLite.commitCompact(spark, dir2)
        graft.operators.DeltaLite.commitCheckpoint(spark, dir2)
      })
    }

    if (on("prefix")) {
      // phase the containment prefix path (mirrors Dedup internals)
      import org.apache.spark.sql.expressions.Window
      val g = time("shingles + checkpoint")(
        graft.llm.Dedup.shingles(docs, 3).localCheckpoint(true))
      time("  gram rows")(println("    grams=" + g.count()))
      val sizes = g.groupBy("doc_id").agg(count(lit(1)).as("sz"))
      val withDf = g.join(g.groupBy("gram").agg(count(lit(1)).as("df")), "gram")
      val byRarity = Window.partitionBy(col("doc_id")).orderBy(col("df"), col("gram"))
      val prefixes = time("prefixes (df join + window + cut)")(
        withDf.withColumn("pos", row_number().over(byRarity))
          .join(sizes, "doc_id")
          .filter(col("pos") <= col("sz") - ceil(col("sz") * 0.9) + 1)
          .select(col("doc_id").as("c1"), col("gram"))
          .localCheckpoint(true))
      println("    prefix rows=" + prefixes.count())
      val cands = time("candidates (prefix x grams, distinct)")({
        val c = prefixes
          .join(g.select(col("doc_id").as("c2"), col("gram")), "gram")
          .filter(col("c1") =!= col("c2"))
          .select(least(col("c1"), col("c2")).as("d1"),
            greatest(col("c1"), col("c2")).as("d2"))
          .distinct()
          .localCheckpoint(true)
        println("    cand rows=" + c.count()); c
      })
      val gsets = g.groupBy("doc_id").agg(collect_list(col("gram")).as("gs"))
      time("verification (2 joins + intersect)")(
        cands
          .join(gsets.select(col("doc_id").as("d1"), col("gs").as("gs1")), Seq("d1"))
          .join(gsets.select(col("doc_id").as("d2"), col("gs").as("gs2")), Seq("d2"))
          .select(col("d1"), col("d2"),
            size(array_intersect(col("gs1"), col("gs2"))).cast("long").as("i"))
          .count())
      time("full x_dedup_contain_prefix")(
        graft.SparkEntry.queries("x_dedup_contain_prefix")(spark, sfDir).count())
      time("full x_dedup_contain (direct)")(
        graft.SparkEntry.queries("x_dedup_contain")(spark, sfDir).count())
    }

    if (on("graph")) {
      val li = graft.Tables.lineitem(spark, sfDir)
      val supply = time("supply distinct")({
        val sp = li.select("l_partkey", "l_suppkey").distinct()
          .localCheckpoint(true)
        println("    supply rows=" + sp.count()); sp
      })
      val b = supply.select(col("l_partkey"), col("l_suppkey").as("__s2"))
      val co = time("co-supply self-join + agg")({
        val c = supply.join(b,
            supply("l_partkey") === b("l_partkey") &&
              col("l_suppkey") < col("__s2"))
          .groupBy(col("l_suppkey").as("src"), col("__s2").as("dst"))
          .agg(count(lit(1)).as("shared"))
          .localCheckpoint(true)
        println("    co rows=" + c.count()); c
      })
      val edges = time("threshold edges")({
        val e = co.join(broadcast(co.agg(max(col("shared")).as("__mx"))))
          .filter(col("shared") >= col("__mx") - 10)
          .select("src", "dst").localCheckpoint(true)
        println("    edges=" + e.count()); e
      })
      time("trianglesDegreeOrdered")(
        graft.operators.Graph.trianglesDegreeOrdered(edges).count())
      time("full e8_triangles")(
        graft.SparkEntry.queries("e8_triangles")(spark, sfDir).count())
    }

    if (on("image")) {
      val bmp = time("syntheticBmpImages materialize")(
        graft.llm.Multimodal.syntheticBmpImages(docs).localCheckpoint(true))
      println("    images=" + bmp.count())
      time("imageNearDupPairs from materialized")(
        graft.llm.Dedup.imageNearDupPairs(bmp, "doc_id", "payload",
          maxDist = 3).count())
      time("full x_image_neardup")(
        graft.SparkEntry.queries("x_image_neardup")(spark, sfDir).count())
    }

    if (on("lsh")) (1 to 2).foreach { it =>
      println(s"[p18] ---- lsh iteration $it ----")
      graft.queries.LlmOps.resetArtifactCaches()
      // phase the minhash-LSH pair build (mirrors Dedup internals)
      val g = time("rawShingles + h32")(
        graft.llm.Dedup.rawShingles(docs, 3)
          .withColumn("h", graft.llm.Dedup.h32(col("gram")))
          .localCheckpoint(true))
      println("    gram rows=" + g.count())
      val sigs = time("24 minhash aggs + collect_set + checkpoint")({
        val aggs = (0 until 24).map { j =>
          min(pmod(col("h") * (2 * j + 1) + (7919L * j + 12345L),
            lit(4294967311L))).as(s"sig_$j")
        } :+ sort_array(collect_set(col("h"))).as("hset")
        g.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
          .localCheckpoint(true)
      })
      println("    sig rows=" + sigs.count())
      val bandDf = (0 until 4).map { k =>
        sigs.select(col("doc_id"), col("hset"),
          concat_ws("|", lit(k), concat_ws("_",
            (0 until 6).map(r => col(s"sig_${k * 6 + r}")): _*)).as("bk"))
      }.reduce(_ unionByName _)
      val cands = time("band pair join (coGroupedPairsWithPayload)")({
        val c = graft.llm.Dedup.coGroupedPairsWithPayload(bandDf,
          "bk", "doc_id", "hset").localCheckpoint(true)
        println("    cand rows=" + c.count()); c
      })
      time("verify (intersect + jaccard + dropDup)")(
        println("    pairs=" + cands
          .select(col("d1"), col("d2"),
            size(array_intersect(col("p1"), col("p2"))).as("i"),
            size(col("p1")).as("sz1"), size(col("p2")).as("sz2"))
          .select(col("d1"), col("d2"),
            (col("i") / (col("sz1") + col("sz2") - col("i"))).as("jaccard"))
          .filter(col("jaccard") >= 0.8)
          .dropDuplicates("d1", "d2").count()))
      time("full minhashLshPairs (one shot)")(
        println("    pairs=" +
          graft.llm.Dedup.minhashLshPairs(docs, 3, 0.8).count()))
    }

    if (on("iceberg")) (1 to 3).foreach { it =>
      println(s"[p18] ---- iceberg iteration $it ----")
      val dir = java.nio.file.Files.createTempDirectory("p18_ice").toString
      val base = graft.Tables.orders(spark, sfDir).coalesce(1)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      time("iceberg commitAppend x2")({
        graft.operators.IcebergLite.commitAppend(spark, dir,
          base.filter(col("prio") =!= "5-LOW"))
        graft.operators.IcebergLite.commitAppend(spark, dir,
          base.filter(col("prio") === "5-LOW"))
      })
      val src = base.filter(col("k") % 5 === 0)
        .withColumn("st", lit("UP"))
        .unionByName(spark.range(1, 4).select((-col("id")).as("k"),
          lit("NW").as("st"), lit("9-SYN").as("prio")))
      time("iceberg commitMerge")(
        graft.operators.IcebergLite.commitMerge(spark, dir, src, Seq("k")))
      time("iceberg snapshot agg")(
        graft.operators.IcebergLite.snapshot(spark, dir)
          .groupBy(col("prio")).agg(count(lit(1))).count())
      val dir2 = java.nio.file.Files.createTempDirectory("p18_ice2").toString
      time("iceberg append + delete")({
        graft.operators.IcebergLite.commitAppend(spark, dir2, base)
        graft.operators.IcebergLite.commitDelete(spark, dir2,
          col("k") % 7 === 0)
      })
    }

    if (on("lm")) (1 to 2).foreach { it =>
      println(s"[p18] ---- lm iteration $it ----")
      // phase lmTypicality (mirrors internals): bigram build, c2 model,
      // scoring pass
      val tk = col("__toks")
      val bigrams = docs
        .select(col("doc_id"), graft.llm.TextAnalysis.tokens(col("text")).as("__toks"))
        .filter(size(tk) >= 2)
        .select(col("doc_id"), explode(
          transform(sequence(lit(1), size(tk) - 1),
            i => struct(
              element_at(tk, i).as("prev"),
              element_at(tk, i + 1).as("cur")))).as("bg"))
        .select(col("doc_id"),
          pmod(graft.llm.Dedup.h60(col("bg.prev")), lit(512L)).as("__bp"),
          pmod(graft.llm.Dedup.h60(col("bg.cur")), lit(512L)).as("__bc"))
      time("bigram pass (count only)")(
        println("    bigrams=" + bigrams.count()))
      val c2 = bigrams.groupBy(col("__bp"), col("__bc"))
        .agg(count(lit(1)).as("__c2"))
      time("c2 model agg")(println("    c2 rows=" + c2.count()))
      time("full lmTypicality (noop sink)")(
        graft.llm.TextAnalysis.lmTypicality(docs, buckets = 512)
          .write.format("noop").mode("overwrite").save())
    }

    if (on("crawl")) {
      time("full x_crawl_waves")(
        graft.SparkEntry.queries("x_crawl_waves")(spark, sfDir).count())
      time("full x_crawl_waves (2nd)")(
        graft.SparkEntry.queries("x_crawl_waves")(spark, sfDir).count())
    }

    if (on("winnow")) {
      time("full x_text_winnow")(
        graft.SparkEntry.queries("x_text_winnow")(spark, sfDir).count())
      time("full x_typo_pairs")(
        graft.SparkEntry.queries("x_typo_pairs")(spark, sfDir).count())
      time("full j11_overlap_join")(
        graft.SparkEntry.queries("j11_overlap_join")(spark, sfDir).count())
      time("full x_web_pipeline")(
        graft.SparkEntry.queries("x_web_pipeline")(spark, sfDir).count())
      time("full x_host_rank_incr")(
        graft.SparkEntry.queries("x_host_rank_incr")(spark, sfDir).count())
      time("full x_link_rank")(
        graft.SparkEntry.queries("x_link_rank")(spark, sfDir).count())
    }

    spark.stop()
  }
}
