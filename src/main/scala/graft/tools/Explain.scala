package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: dump formatted physical plans for selected queries so
  * pushdown (PushedFilters/ReadSchema), join strategies, and
  * WholeStageCodegen spans can be audited. Usage:
  *   sbt "runMain graft.tools.Explain s1_scan j3_dim_enrich"
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.nonEmpty) args.toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      graft.SparkEntry.queries.get(name) match {
        case Some(fn) =>
          println(s"\n===================== $name =====================")
          fn(spark, "/root/testdata/sf0.001").explain("formatted")
        case None => println(s"unknown query: $name")
      }
    }
    spark.stop()
  }
}
