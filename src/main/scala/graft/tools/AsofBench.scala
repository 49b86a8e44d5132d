package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the as-of join's two plan tiers — composed union+window
  * (`Joins.asofJoin`) vs the native physical merge
  * (`plans/AsofJoinExec` via `Joins.asofJoinNative`) — across payload
  * widths. The union form widens EVERY row to left-width + right-width
  * before its shuffle (left rows carry null right payloads and vice
  * versa), so its shuffle volume grows with the combined schema; the
  * native plan shuffles each side at its own width and keeps one
  * buffered right row of state. Narrow schemas favor the codegen'd
  * window; wide payloads are where the native tier pays off.
  *
  *   sbt "runMain graft.tools.AsofBench"
  */
object AsofBench {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("asofwh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val n = 2000000
    val keys = 5000
    def side(seed: Int) = spark.range(n)
      .select((pmod(col("id") * 2654435761L + seed, lit(keys))).as("k"),
        (pmod(col("id") * 40503 + seed * 7, lit(1000000L))).as("t"),
        col("id").as("rid"))
    for (payloadCols <- Seq(1, 8, 32)) {
      val payload = (1 to payloadCols).map(i =>
        concat_ws("-", lit("payload"), col("rid"), lit(i)).as(s"p$i"))
      val l = side(1)
      val r = side(2).select(Seq(col("k"), col("t"), col("rid")) ++ payload: _*)
      l.count(); r.count()
      // force FULL materialization of every output column — a bare
      // count() lets Catalyst prune the window machinery right out of
      // the composed plan (and nothing out of the opaque native one),
      // which benchmarks two different queries
      def force(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
        val cols = df.columns.map(col)
        val row = df.select(xxhash64(cols: _*).as("__h"))
          .agg(expr("bit_xor(__h)").as("h"), count(lit(1)).as("n")).collect()(0)
        (row.getLong(0), row.getLong(1))
      }
      def time(body: => (Long, Long)): (Double, (Long, Long)) = {
        val t0 = System.nanoTime()
        val v = body
        ((System.nanoTime() - t0) / 1e9, v)
      }
      val (tw, vw) = time(force(graft.operators.Joins
        .asofJoin(l, r, "k", "t", tieBreak = Some("rid"))))
      val (tn, vn) = time(force(graft.operators.Joins
        .asofJoinNative(l, r, "k", "t", tieBreak = Some("rid"))))
      require(vw == vn, s"parity violated at $payloadCols cols: $vw vs $vn")
      println(f"[asof] payload=$payloadCols%2d cols  window=$tw%6.2fs  native=$tn%6.2fs  ratio=${tw / tn}%5.2f")
      // narrow downstream read: only (k, one payload col) consumed.
      // Catalyst cannot push a Project through either custom rendering,
      // so this measures per-row OUTPUT cost: the window form and the
      // iterator exec materialize every column per row; the codegen'd
      // native consume only READS what the parent uses.
      if (payloadCols == 32) {
        def forceNarrow(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
          val row = df.select(xxhash64(col("k"), col("r_p1")).as("__h"))
            .agg(expr("bit_xor(__h)").as("h"), count(lit(1)).as("n")).collect()(0)
          (row.getLong(0), row.getLong(1))
        }
        val (tw2, vw2) = time(forceNarrow(graft.operators.Joins
          .asofJoin(l, r, "k", "t", tieBreak = Some("rid"))))
        val (tn2, vn2) = time(forceNarrow(graft.operators.Joins
          .asofJoinNative(l, r, "k", "t", tieBreak = Some("rid"))))
        require(vw2 == vn2, s"narrow parity violated: $vw2 vs $vn2")
        println(f"[asof] narrow read of 32    window=$tw2%6.2fs  native=$tn2%6.2fs  ratio=${tw2 / tn2}%5.2f")
      }
    }

    // BUCKETED layout: both sides written bucketBy(k).sortBy(k, t[, rid])
    // — the production layout for a repeatedly-as-of-joined pair (quotes/
    // trades). The native exec's requiredChildDistribution is satisfied
    // by the bucketed scan, so the join plans ZERO exchanges and ZERO
    // sorts: the measurement below puts a wall-time number on that claim
    // vs the same data shuffled from unbucketed parquet (8-col payload,
    // the middle width).
    {
      val payload = (1 to 8).map(i =>
        concat_ws("-", lit("payload"), col("rid"), lit(i)).as(s"p$i"))
      val l = side(1)
      val r = side(2).select(Seq(col("k"), col("t"), col("rid")) ++ payload: _*)
      spark.sql("DROP TABLE IF EXISTS asof_l_b")
      spark.sql("DROP TABLE IF EXISTS asof_r_b")
      spark.sql("DROP TABLE IF EXISTS asof_l_f")
      spark.sql("DROP TABLE IF EXISTS asof_r_f")
      l.write.bucketBy(cpus.toInt, "k").sortBy("k", "t")
        .format("parquet").saveAsTable("asof_l_b")
      r.write.bucketBy(cpus.toInt, "k").sortBy("k", "t", "rid")
        .format("parquet").saveAsTable("asof_r_b")
      // flat copies so both paths read from parquet (isolating the
      // exchange cost, not parquet-vs-memory)
      l.write.format("parquet").saveAsTable("asof_l_f")
      r.write.format("parquet").saveAsTable("asof_r_f")
      def run(lt: String, rt: String): (Double, (Long, Long)) = {
        val lj = spark.table(lt)
        val rj = spark.table(rt)
        val df = graft.operators.Joins.asofJoinNative(lj, rj, "k", "t",
          tieBreak = Some("rid"))
        val t0 = System.nanoTime()
        val cols = df.columns.map(col)
        val row = df.select(xxhash64(cols: _*).as("__h"))
          .agg(expr("bit_xor(__h)").as("h"), count(lit(1)).as("n")).collect()(0)
        ((System.nanoTime() - t0) / 1e9, (row.getLong(0), row.getLong(1)))
      }
      val bplan = graft.operators.Joins.asofJoinNative(
          spark.table("asof_l_b"), spark.table("asof_r_b"), "k", "t",
          tieBreak = Some("rid"))
        .queryExecution.executedPlan.toString
      require(!bplan.contains("Exchange"),
        s"bucketed asof must plan zero exchanges:\n$bplan")
      // cold + warm each
      val (tb1, vb1) = run("asof_l_b", "asof_r_b")
      val (tb2, vb2) = run("asof_l_b", "asof_r_b")
      val (tf1, vf1) = run("asof_l_f", "asof_r_f")
      val (tf2, vf2) = run("asof_l_f", "asof_r_f")
      require(vb1 == vf1 && vb2 == vf2 && vb1 == vb2, "bucketed parity violated")
      println(f"[asof] bucketed (0-exchange) native=$tb1%6.2fs/$tb2%6.2fs  " +
        f"shuffled native=$tf1%6.2fs/$tf2%6.2fs  ratio=${tf2 / tb2}%5.2f")
    }
    spark.stop()
  }
}
