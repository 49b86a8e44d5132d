package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Batch-per-microbatch sinks (SURVEY.md §2.1 S6/S7).
  */
object Sinks {

  /** S6 — the ClickHouse-shaped JDBC batch sink (ClickhouseUtil.java:16-66).
    *
    * The reference reflects over bean fields, skips `@TransientSink`
    * members, and binds a positional PreparedStatement with batch size 5.
    * DataFrame-first, all of that collapses to: drop the transient
    * columns, hand the micro-batch to the JDBC writer (`batchsize`
    * replaces the hand-rolled addBatch loop; column names replace
    * positional binding). Use from streaming as
    * `writeStream.foreachBatch(jdbcBatchSink(...))`.
    */
  def jdbcBatchSink(url: String, table: String, transientCols: Seq[String],
                    batchSize: Int = 5000,
                    props: java.util.Properties = new java.util.Properties)
                   (df: DataFrame, batchId: Long): Unit = {
    props.setProperty("batchsize", batchSize.toString)
    df.drop(transientCols: _*)
      .write.mode(SaveMode.Append)
      .jdbc(url, table, props)
  }

  /** The testable core of S6: transient-column projection (the
    * `@TransientSink` analog, bean/TransientSink.java:11-14). */
  def dropTransient(df: DataFrame, transientCols: Seq[String]): DataFrame =
    df.drop(transientCols: _*)

  /** S7 — dimension upsert store (DimSinkFunction.java:18-70 +
    * TableProcessFunction auto-DDL): Phoenix `UPSERT INTO ... VALUES`
    * keyed by id becomes latest-write-wins MERGE over a parquet table
    * partitioned by dim name. "Auto-DDL" is schema-on-write; Redis
    * invalidation disappears because readers broadcast a fresh snapshot
    * per micro-batch (SURVEY.md §4.1 caching row).
    *
    * `updates` must carry (sinkTable, pk, data); the store keeps one row
    * per (sinkTable, pk) — the newest by batch sequence.
    */
  def upsertDims(storePath: String)(updates: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = updates.sparkSession
    val incoming = updates.withColumn("batch_seq", lit(batchId))
    val merged =
      if (new java.io.File(storePath).exists()) {
        val existing = spark.read.parquet(storePath)
        existing.unionByName(incoming, allowMissingColumns = true)
      } else incoming
    val latest = merged
      .groupBy(col("sinkTable"), col("pk"))
      .agg(max_by(col("data"), col("batch_seq")).as("data"),
        max(col("batch_seq")).as("batch_seq"))
    // write-then-swap: parquet has no in-place merge (Delta would);
    // staging keeps readers consistent
    val staging = storePath + ".staging"
    latest.write.mode(SaveMode.Overwrite).parquet(staging)
    val target = new java.io.File(storePath)
    if (target.exists()) {
      val old = new java.io.File(storePath + ".old")
      if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
      if (!target.renameTo(old))
        throw new java.io.IOException(s"dim store swap failed: $storePath -> $old")
    }
    if (!new java.io.File(staging).renameTo(target)) {
      // roll back so readers still see the previous snapshot
      new java.io.File(storePath + ".old").renameTo(target)
      throw new java.io.IOException(s"dim store swap failed: $staging -> $storePath")
    }
    val old = new java.io.File(storePath + ".old")
    if (old.exists()) org.apache.commons.io.FileUtils.deleteDirectory(old)
  }

  /** Read the current dim snapshot (broadcast by callers per micro-batch —
    * the cache layer of the reference, freshness = batch interval). */
  def readDims(spark: org.apache.spark.sql.SparkSession, storePath: String,
               sinkTable: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(storePath).filter(col("sinkTable") === sinkTable)
  }
}
