package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the rolling-median crossover: the collect_list+array_sort
  * window form (per-row O(w log w) + O(w) frame materialization)
  * against the two-heap secondary-sort `rollingMedianLarge` (per-row
  * O(log w) amortized, O(w) state per key) at growing frame sizes.
  *
  *   sbt "runMain graft.tools.FrameBench 21 201 2001"
  *
  * Numbers land in SCALE.md; the array form is expected to win at
  * gate-sized frames (constant factors) and lose by orders of
  * magnitude once frames reach the thousands.
  */
object FrameBench {
  def main(args: Array[String]): Unit = {
    val frames = if (args.nonEmpty) args.map(_.toInt).toSeq else Seq(21, 201, 2001)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val in = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("event_type"), col("ts"),
        graft.queries.Windows.valueCents.as("cents"))
      .filter(col("cents").isNotNull)
    in.count() // warm the scan

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }
    frames.foreach { frame =>
      require(frame % 2 == 1)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
        .rowsBetween(-(frame - 1), 0)
      val (ta, na) = time {
        in.withColumn("__f", collect_list(col("cents")).over(w))
          .filter(size(col("__f")) === frame)
          .select(element_at(array_sort(col("__f")), (frame + 1) / 2))
          .count()
      }
      val (th, nh) = time {
        graft.operators.TimeSeries.rollingMedianLarge(
          in, "event_type", Seq("ts", "event_id"), "cents", frame).count()
      }
      require(na == nh, s"row-count mismatch at frame $frame: $na vs $nh")
      println(f"[frame] w=$frame%5d rows=$na%8d array=$ta%7.2fs twoheap=$th%7.2fs ratio=${ta / th}%5.2f")
    }
    spark.stop()
  }
}
