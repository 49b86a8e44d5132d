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
    * keyed by id becomes latest-write-wins MERGE over a versioned parquet
    * store. "Auto-DDL" is schema-on-write; Redis invalidation disappears
    * because readers broadcast a fresh snapshot per micro-batch
    * (SURVEY.md §4.1 caching row).
    *
    * Layout — snapshot-isolated via a manifest pointer:
    * {{{
    *   store/
    *     v=3/sinkTable=dim_user/part-*.parquet   <- immutable once written
    *     v=7/sinkTable=dim_sku/part-*.parquet
    *     _LATEST                                 <- "7\ndim_user=3\ndim_sku=7"
    * }}}
    * Each merge writes ONLY the touched tables' new snapshots under a
    * fresh `v=<n>` directory (version dirs are immutable — never
    * overwritten, never appended), then commits by atomically replacing
    * the single `_LATEST` manifest file (FileContext.rename with
    * OVERWRITE on HDFS/local; a direct single-object PUT on stores
    * without an AbstractFileSystem binding — see commitManifest). The
    * manifest maps each
    * dim table to the version directory holding its current snapshot, so:
    *
    *   - a reader resolves the manifest once and only ever lists
    *     fully-committed immutable directories: it sees the whole old
    *     snapshot or the whole new one, never a mix (the round-2
    *     read-during-overwrite window is closed);
    *   - a micro-batch touching k dim tables reads and writes only those
    *     k tables' data — untouched tables' files are never rewritten;
    *   - crash before the rename leaves an orphaned version dir and an
    *     intact store (cleaned up by the next commit's vacuum).
    *
    * Vacuum: after the pointer flip, a version dir is deleted only when
    * it is referenced by neither the new nor the just-replaced manifest
    * AND it is at least `vacuumGraceCommits` commits old
    * (`newVersion - ver >= vacuumGraceCommits`). A `readDims` DataFrame
    * is lazy — the reader contract is therefore: consume (or
    * broadcast-collect) the result within `vacuumGraceCommits` batch
    * intervals of resolving it, or raise the grace to cover the longest
    * consumer. The default (1) matches the reference's per-batch cache
    * freshness. Single writer assumed (one streaming query's
    * foreachBatch), like the reference's sink.
    *
    * `updates` must carry (sinkTable, pk, data); the store keeps one row
    * per (sinkTable, pk) — the newest by batch sequence.
    */
  def upsertDims(storePath: String, vacuumGraceCommits: Int = 1)
                (updates: DataFrame, batchId: Long): Unit =
    upsertDimsHook(storePath, vacuumGraceCommits = vacuumGraceCommits)(updates, batchId)

  /** upsertDims with a test seam: `beforeCommit` runs after the new
    * version directory is fully written but before the `_LATEST` pointer
    * flip — exactly the window the atomicity claim is about. */
  private[graft] def upsertDimsHook(storePath: String,
                                    beforeCommit: () => Unit = () => (),
                                    vacuumGraceCommits: Int = 1)
                                   (updates: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.functions._
    val spark = updates.sparkSession
    val incoming = updates.withColumn("batch_seq", lit(batchId))
    val touched = incoming.select("sinkTable").distinct()
      .collect().map(_.getString(0)).toSeq
    if (touched.isEmpty) return
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = readManifest(fs, root)
    val newVersion = manifest.map(_._1).getOrElse(0) + 1
    val oldTables: Map[String, Int] = manifest.map(_._2).getOrElse(Map.empty)
    // existing rows of the touched tables only, read from their immutable
    // version dirs (group by version: one pruned scan per distinct dir)
    val existing = touched.flatMap(t => oldTables.get(t).map(t -> _))
      .groupMap(_._2)(_._1).toSeq
      .map { case (ver, tables) =>
        spark.read.option("basePath", s"$storePath/v=$ver")
          .parquet(s"$storePath/v=$ver")
          .filter(col("sinkTable").isin(tables: _*))
          .select(col("sinkTable").cast("string"), col("pk"), col("data"),
            col("batch_seq"))
      }
    val merged = (existing :+ incoming.select(col("sinkTable"), col("pk"),
      col("data"), col("batch_seq"))).reduce(_.unionByName(_))
    merged
      .groupBy(col("sinkTable"), col("pk"))
      .agg(max_by(col("data"), col("batch_seq")).as("data"),
        max(col("batch_seq")).as("batch_seq"))
      .write.mode(SaveMode.Overwrite)
      .partitionBy("sinkTable")
      .parquet(s"$storePath/v=$newVersion")
    beforeCommit()
    val newTables = oldTables ++ touched.map(_ -> newVersion)
    commitManifest(fs, root, newVersion, newTables)
    // vacuum: drop version dirs referenced by neither the new manifest
    // nor the one just replaced, and only once they are at least
    // `vacuumGraceCommits` commits old (versions are monotonic — a dir
    // written at commit v was replaced no earlier than v+1, so
    // newVersion - v bounds how many commits ago an in-flight reader
    // could last have resolved a manifest referencing it)
    val live = newTables.values.toSet ++ oldTables.values.toSet
    Option(fs.globStatus(new org.apache.hadoop.fs.Path(root, "v=*")))
      .getOrElse(Array.empty).foreach { st =>
        val name = st.getPath.getName
        val ver = scala.util.Try(name.stripPrefix("v=").toInt).toOption
        if (ver.exists(v => !live.contains(v) && v != newVersion &&
            newVersion - v >= vacuumGraceCommits))
          fs.delete(st.getPath, true)
      }
  }

  /** `_LATEST` format: first line = version counter, then one
    * `table=version` line per dim table. Returns None if absent. */
  private def readManifest(fs: org.apache.hadoop.fs.FileSystem,
                           root: org.apache.hadoop.fs.Path): Option[(Int, Map[String, Int])] = {
    val p = new org.apache.hadoop.fs.Path(root, "_LATEST")
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
      val lines = text.linesIterator.filter(_.nonEmpty).toSeq
      val tables = lines.drop(1).map { l =>
        val i = l.lastIndexOf('=')
        l.substring(0, i) -> l.substring(i + 1).toInt
      }.toMap
      Some((lines.head.toInt, tables))
    }
  }

  private def commitManifest(fs: org.apache.hadoop.fs.FileSystem,
                             root: org.apache.hadoop.fs.Path, version: Int,
                             tables: Map[String, Int]): Unit = {
    val text = (version.toString +: tables.toSeq.sortBy(_._1)
      .map { case (t, v) => s"$t=$v" }).mkString("\n")
    // scheme-selected atomic strategy — see util.AtomicCommit
    graft.util.AtomicCommit.commitPointer(fs,
      new org.apache.hadoop.fs.Path(root, "_LATEST"), text)
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
    * the cache layer of the reference, freshness = batch interval).
    * Resolves the `_LATEST` manifest once, then reads only the one
    * immutable version directory holding `sinkTable`'s snapshot — a
    * concurrent upsertDims can never make this read see a mix. */
  def readDims(spark: org.apache.spark.sql.SparkSession, storePath: String,
               sinkTable: String): DataFrame = {
    import org.apache.spark.sql.functions._
    val root = new org.apache.hadoop.fs.Path(storePath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // a legitimate store ALWAYS has a manifest (upsertDims commits it
    // with the first version dir), so its absence is a misconfigured
    // path or a corrupt store — fail loudly, like the pre-manifest
    // reader did on a missing parquet path
    val (_, tables) = readManifest(fs, root).getOrElse(throw new IllegalStateException(
      s"dim store at $storePath has no _LATEST manifest (wrong path, or never written)"))
    def readVersion(ver: Int) =
      spark.read.option("basePath", s"$storePath/v=$ver")
        .parquet(s"$storePath/v=$ver")
        .filter(col("sinkTable") === sinkTable)
    tables.get(sinkTable) match {
      case Some(ver) => readVersion(ver)
      case None =>
        // dim table not (yet) written: empty result with the STORE'S
        // schema (any live version dir carries it — schema-on-write
        // means we cannot invent one)
        readVersion(tables.values.max)
    }
  }
}
