package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Direct scale probe for greedy coreset selection (round-14 verdict:
  * the re-fold-all-centers literal plan was O(k²·N·dim) with a k·dim
  * expression tree — a janino 64 KB blowup waiting at real k).
  *
  * Times the INCREMENTAL maintained-state `kCenterSelect` / `mmrSelect`
  * at k = 32 / 128 / 256 over a fixed synthetic corpus — the claim
  * under test is LINEAR rounds: sec/round flat as k grows 8×. The
  * retained literal form runs next to it at small k as the quadratic
  * control (sec/round growing with k), and trace equality at the
  * smallest k asserts inline so the probe fails loudly if the two plans
  * ever disagree.
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.CoresetProbe 100000"
  */
object CoresetProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(100000L)
    val dim = 64
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // deterministic synthetic embeddings in [-1, 1): no RNG at runtime
    val vecs = spark.range(n).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)),
        j => ((pmod(xxhash64(col("id"), j), lit(2001L)) - 1000L)
          .cast("float") / 1000.0f)).as("embedding"))
      .persist()
    vecs.count()

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // warm the quantization/codegen paths once
    graft.llm.Similarity.kCenterSelect(vecs, k = 2).collect()

    // trace equality at k=16: the probe is meaningless if plans diverge
    val inc16 = graft.llm.Similarity.kCenterSelect(vecs, 16)
      .orderBy("round").collect().map(_.toSeq).toSeq
    val lit16 = graft.llm.Similarity.kCenterSelectLiteral(vecs, 16)
      .orderBy("round").collect().map(_.toSeq).toSeq
    require(inc16 == lit16, "k-center incremental != literal at k=16")

    println(f"${"plan"}%-22s ${"k"}%6s ${"sec"}%9s ${"sec/round"}%10s")
    for (k <- Seq(32, 128, 256)) {
      val s = time(graft.llm.Similarity.kCenterSelect(vecs, k).collect())
      println(f"kCenterSelect (incr) $k%6d $s%9.2f ${s / k}%10.4f")
    }
    for (k <- Seq(32, 64)) { // quadratic control — small k only
      val s = time(graft.llm.Similarity.kCenterSelectLiteral(vecs, k).collect())
      println(f"kCenterSelect (lit)  $k%6d $s%9.2f ${s / k}%10.4f")
    }
    for (k <- Seq(32, 128, 256)) {
      val s = time(graft.llm.Similarity.mmrSelect(vecs, k).collect())
      println(f"mmrSelect (incr)     $k%6d $s%9.2f ${s / k}%10.4f")
    }
    for (k <- Seq(32, 64)) {
      val s = time(graft.llm.Similarity.mmrSelectLiteral(vecs, k).collect())
      println(f"mmrSelect (lit)      $k%6d $s%9.2f ${s / k}%10.4f")
    }
    vecs.unpersist()
    spark.stop()
  }
}
