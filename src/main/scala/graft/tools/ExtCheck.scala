package graft.tools

import org.apache.spark.sql.SparkSession

/** Sanity probe for the spark.sql.extensions deployment path: builds a
  * session with graft.GraftExtensions bound at builder time (as a
  * spark-submit/thrift-server deployment would) and exercises every
  * injected function through spark.sql.
  */
object ExtCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println("[extcheck] cosine=" + spark.sql(
      "SELECT cosine_sim(array(CAST(3.0 AS FLOAT)), array(CAST(2.0 AS FLOAT)))").head().getDouble(0))
    println("[extcheck] dot=" + spark.sql(
      "SELECT dot_product(array(CAST(2.0 AS FLOAT)), array(CAST(4.0 AS FLOAT)))").head().getDouble(0))
    println("[extcheck] norm=" + spark.sql(
      "SELECT l2_norm(array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT)))").head().getDouble(0))
    println("[extcheck] words=" + spark.sql(
      "SELECT collect_list(word) FROM (SELECT 'a b' s) LATERAL VIEW split_keyword(s) t AS word")
      .head().getSeq[String](0).mkString(","))
    println("[extcheck] simhash=" + spark.sql(
      "SELECT simhash_agg(h) FROM VALUES (1L),(3L) t(h)").head().getLong(0))
    // RewriteSetCount must NOT fire on doubles (NaN semantics diverge):
    // with two distinct-bit-pattern NaNs the set answer is authoritative
    println("[extcheck] nan_set=" + spark.sql(
      "SELECT size(collect_set(v)) FROM VALUES (CAST('NaN' AS DOUBLE)), (CAST('NaN' AS DOUBLE)), (2.0D) t(v)")
      .head().getInt(0))
    // (the output ALIAS keeps the original "size(collect_set(v))" name,
    // so check for the rewritten aggregate call itself)
    println("[extcheck] long_rewrite_plan=" + spark.sql(
      "SELECT size(collect_set(v)) FROM VALUES (1L),(1L),(2L) t(v)")
      .queryExecution.optimizedPlan.toString.contains("count(distinct"))
    spark.stop()
  }
}
