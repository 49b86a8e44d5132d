package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Direct scale probe for the two distributed-prefix-sum operators
  * (`TableStats.globalPercentRankUnbounded`, `Sampling.systematicPps`),
  * round-10 follow-up to the 10× gate-level probes that were fixed-cost
  * dominated (0.36×/1.1× ratios say nothing about the seam): here the
  * value domain is FULLY UNIQUE and data-sized — every row a distinct
  * rank-table entry — so the per-bucket running sums, the P-row offset
  * collect, and the broadcast-back join are exercised at n and
  * factor·n with the rank table actually growing past any single
  * partition's worth.
  *
  * Also asserts the offsets-vs-scan agreement the composition depends
  * on: the PPS intervals must tile exactly to the collected total
  * (max c_hi == T), and the rank of the maximum value must equal
  * n − |max ties| (the two-level cumulative matches a global count).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.PrefixSumProbe 30 1000000"
  */
object PrefixSumProbe {
  def main(args: Array[String]): Unit = {
    val factor = args.headOption.map(_.toInt).getOrElse(30)
    val baseN = args.drop(1).headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // fully unique value domain: v is a Feistel-ish mix of id (bijective
    // over 2^63 for our range, so |distinct| == n); weights 1..1000
    def table(n: Long) = spark.range(n).select(
      col("id"),
      (col("id") * 2654435761L + -7046029254386353131L).as("v"),
      (pmod(col("id") * 48271L, lit(1000L)) + 1L).as("w"))
      .localCheckpoint(true) // freeze: probe the operator, not the gen

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    def probeRank(n: Long): Double = {
      val df = table(n)
      val t = time {
        val r = graft.operators.TableStats
          .globalPercentRankUnbounded(df, "v")
        // agreement assertion: rank_below of the global max == n - 1
        // (all values unique), i.e. the two-level cumulative equals a
        // global count — offsets and scan agree
        val top = r.orderBy(col("v").desc).select("rank_below").head()
        require(top.getLong(0) == n - 1,
          s"rank/count disagreement at n=$n: ${top.getLong(0)} != ${n - 1}")
      }
      df.unpersist()
      t
    }

    def probePps(n: Long): Double = {
      val df = table(n)
      val k = 1000
      val t = time {
        val r = graft.llm.Sampling.systematicPps(df, "id", "w", k)
        val agg = r.agg(sum("multiplicity"), max("c_hi")).head()
        require(agg.getLong(0) == k, s"sum(multiplicity) ${agg.getLong(0)} != $k")
        // tiling assertion: the selected intervals' upper bound never
        // exceeds the collected total weight T (offsets agree with the
        // scan); equality holds iff the last item is drawn
        val total = df.agg(sum("w")).head().getLong(0)
        require(agg.getLong(1) <= total,
          s"interval beyond total: ${agg.getLong(1)} > $total")
      }
      df.unpersist()
      t
    }

    for ((name, probe) <- Seq(
        "globalPercentRankUnbounded" -> (probeRank _),
        "systematicPps" -> (probePps _))) {
      val t1a = probe(baseN) // warm the code paths
      val t1 = probe(baseN)
      val tN = probe(baseN * factor)
      println(f"[prefixsum] $name%-28s 1x(${baseN}%d)=$t1%6.2fs " +
        f"(first $t1a%5.2f) ${factor}x=$tN%7.2fs ratio=${tN / t1}%5.2f " +
        f"perRow=${tN / t1 / factor}%5.3f")
    }
    spark.stop()
  }
}
