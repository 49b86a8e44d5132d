package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.Row

/** Channel abstraction preserving the reference's topic topology
  * (apps chained through Kafka topics, SURVEY.md §3.3) without a hard
  * Kafka dependency: Kafka in production, files in tests — identical
  * schemas either way. Each channel carries newline-JSON string records
  * (`value` column), exactly like the reference's
  * SimpleStringSchema topics.
  */
sealed trait Channel {
  def readStream(spark: SparkSession): DataFrame
  def writeStream(df: DataFrame): DataStreamWriter[Row]
}

/** Kafka topic channel (S1/S2). Requires the spark-sql-kafka connector on
  * the classpath at deploy time; referenced by format string so the
  * library itself has no compile-time Kafka dependency. */
final case class KafkaChannel(bootstrap: String, topic: String,
                              groupId: String = "graft") extends Channel {
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("subscribe", topic)
      .option("kafka.group.id", groupId)
      .load()
      .selectExpr("CAST(value AS STRING) AS value")
  def writeStream(df: DataFrame): DataStreamWriter[Row] =
    df.selectExpr("CAST(value AS STRING) AS value")
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
      .option("topic", topic)
}

/** Dynamic-topic Kafka sink (S3, reference MyKafkaUtil.java:29-33 +
  * BaseDbApp.java:85-90): the topic comes from a per-record column —
  * built into Spark's Kafka sink, no custom serialization schema
  * needed. `df` must carry `topic` and `value` string columns. */
object KafkaChannel {
  def dynamicTopicWriter(df: DataFrame, bootstrap: String): DataStreamWriter[Row] =
    df.select(col("topic"), col("value"))
      .writeStream.format("kafka")
      .option("kafka.bootstrap.servers", bootstrap)
}

/** File-backed channel (tests + batch replay): newline-JSON files in a
  * directory. Streaming reads pick up new files — the micro-batch analog
  * of a topic. */
final case class FileChannel(dir: String) extends Channel {
  def readStream(spark: SparkSession): DataFrame =
    spark.readStream.text(dir)
  def writeStream(df: DataFrame): DataStreamWriter[Row] =
    df.selectExpr("CAST(value AS STRING) AS value")
      .writeStream.format("text").option("path", dir)
}
