package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.schemas.Schemas

/** DWD DB split — BaseDbApp parity (SURVEY.md §2.5 ST4, §2.2 P4/P6,
  * §2.1 S3/S7): CDC-envelope stream routed by a config table into
  * Kafka-bound fact rows (dynamic per-record topic) and dim-store
  * upserts, with per-table column allow-lists.
  *
  * The reference broadcasts the config stream into Flink broadcast
  * state; in micro-batch the config table is simply re-read (or cached)
  * per batch and joined with `broadcast()` — freshness = batch interval
  * (the documented contract, SURVEY.md §7.4.6).
  */
object DbSplit {

  /** Parse the CDC envelope and drop deletes (P4, BaseDbApp.java:48-54). */
  def parse(raw: DataFrame): DataFrame =
    raw.withColumn("env", from_json(col("value"), Schemas.cdcEnvelope))
      .filter(col("env").isNotNull)
      .select("env.*")
      .filter(col("type") =!= "delete")

  /** Route by (tableName, type) against the config and project `data`
    * through the per-sink column allow-list (ST4+P6,
    * TableProcessFunction.java:124-166). Config columns: sourceTable,
    * operateType, sinkType, sinkTable, sinkColumns (comma list). */
  def route(envelopes: DataFrame, config: DataFrame): DataFrame = {
    val cfg = broadcast(config
      .withColumn("allow_cols", split(col("sinkColumns"), ",")))
    envelopes.join(cfg,
        envelopes("tableName") === cfg("sourceTable") &&
          envelopes("type") === cfg("operateType"))
      .withColumn("data", map_filter(col("data"),
        (k, _) => array_contains(col("allow_cols"), k)))
      .select(col("database"), col("tableName"), col("type"),
        col("data"), col("sinkType"), col("sinkTable"), col("sinkPk"))
  }

  /** Kafka-bound facts with the dynamic-topic column (S3): the built-in
    * Kafka sink routes on a `topic` column — the whole custom
    * KafkaSerializationSchema of the reference collapses to a select. */
  def kafkaFacts(routed: DataFrame): DataFrame =
    routed.filter(col("sinkType") === "kafka")
      .select(col("sinkTable").as("topic"), to_json(col("data")).as("value"))

  /** Dim-store upserts (S7): the Phoenix auto-DDL + upsert becomes
    * parquet/Delta-style partitioned writes keyed by sinkTable; latest
    * row per (sinkTable, pk) wins — the HBase version-on-rowkey
    * semantic. */
  def dimUpserts(routed: DataFrame): DataFrame =
    routed.filter(col("sinkType") === "hbase")
      .select(col("sinkTable"), element_at(col("data"), coalesce(col("sinkPk"), lit("id")))
        .as("pk"), col("data"))

  /** Streaming topology: one read, two routed sinks per micro-batch. */
  def run(spark: SparkSession, source: Channel, config: DataFrame,
          factSink: DataFrame => Unit, dimSink: DataFrame => Unit,
          checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    source.readStream(spark).writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val routed = route(parse(batch), config)
        routed.persist()
        try {
          factSink(kafkaFacts(routed))
          dimSink(dimUpserts(routed))
        } finally routed.unpersist()
        ()
      }
      .start()
}
