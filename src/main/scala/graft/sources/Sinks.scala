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
    * keyed by id becomes latest-write-wins MERGE over a parquet store
    * PARTITIONED BY dim name (`sinkTable=<name>/` directories).
    * "Auto-DDL" is schema-on-write; Redis invalidation disappears because
    * readers broadcast a fresh snapshot per micro-batch (SURVEY.md §4.1
    * caching row).
    *
    * Scale contract: a micro-batch touching k dim tables reads and
    * rewrites ONLY those k partitions — dynamic partition overwrite via
    * Spark's committer, so untouched tables' files are never rewritten.
    * All path handling goes through the Hadoop `FileSystem` API, so the
    * store may live on HDFS/S3A/local alike (the old java.io.File
    * rendering silently reset the store on any non-local URI).
    *
    * Consistency caveat, stated honestly: partition replacement is NOT
    * atomic for a reader that lists a touched partition mid-commit — a
    * concurrent readDims of the SAME dim table during its overwrite can
    * see a partial snapshot (untouched tables are unaffected, which is
    * the common case: readers enrich against dims the batch isn't
    * rewriting). The reference has the same window (its Phoenix upserts
    * are row-at-a-time, readers see mid-batch states). Deployments that
    * need snapshot-isolated dim reads should back the store with a
    * transactional table format (Delta/Iceberg MERGE) — a jar swap, not
    * a code change, since readers go through readDims.
    *
    * `updates` must carry (sinkTable, pk, data); the store keeps one row
    * per (sinkTable, pk) — the newest by batch sequence.
    */
  def upsertDims(storePath: String)(updates: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = updates.sparkSession
    val incoming = updates.withColumn("batch_seq", lit(batchId))
    val touched = incoming.select("sinkTable").distinct()
      .collect().map(_.getString(0)).toSeq
    if (touched.isEmpty) return
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val merged =
      if (fs.exists(root)) {
        // partition-pruned read: only the touched tables' directories
        val existing = spark.read.option("basePath", storePath)
          .parquet(storePath)
          .filter(col("sinkTable").isin(touched: _*))
        existing.unionByName(incoming, allowMissingColumns = true)
      } else incoming
    val latest = merged
      .groupBy(col("sinkTable"), col("pk"))
      .agg(max_by(col("data"), col("batch_seq")).as("data"),
        max(col("batch_seq")).as("batch_seq"))
      // cut lineage before overwriting the path the plan reads from
      // (dim partitions are micro-batch-sized by construction)
      .localCheckpoint(true)
    latest.write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("sinkTable")
      .parquet(storePath)
  }

  /** FT2 — exactly-once micro-batch sink for file/table targets. Each
    * micro-batch commits into its own `batch_id=<id>` directory through
    * the Spark committer; a replayed batch (a restart re-running the
    * last in-flight epoch from the checkpoint) finds its directory
    * already committed and becomes a no-op. foreachBatch + checkpoint
    * gives at-least-once delivery of batch ids; the batch-id keyed
    * idempotent write upgrades the end-to-end guarantee to exactly-once
    * — the semantic the reference *declares* on its producer
    * (MyKafkaUtil.java:32 EXACTLY_ONCE) but never achieves because its
    * checkpointing is commented out. Readers load `path` with partition
    * discovery (`batch_id` becomes a partition column). */
  def idempotentBatchSink(path: String)(df: DataFrame, batchId: Long): Unit = {
    val dir = new org.apache.hadoop.fs.Path(path, s"batch_id=$batchId")
    val fs = dir.getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)
    if (fs.exists(new org.apache.hadoop.fs.Path(dir, "_SUCCESS"))) return
    df.write.mode(SaveMode.Overwrite).parquet(dir.toString)
  }

  /** Read the current dim snapshot (broadcast by callers per micro-batch —
    * the cache layer of the reference, freshness = batch interval). The
    * sinkTable filter prunes to one partition directory. */
  def readDims(spark: org.apache.spark.sql.SparkSession, storePath: String,
               sinkTable: String): DataFrame = {
    import org.apache.spark.sql.functions._
    spark.read.parquet(storePath).filter(col("sinkTable") === sinkTable)
  }
}
