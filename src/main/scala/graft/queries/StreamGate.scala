package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for the REAL-engine streaming gates: fixture tables
  * re-served as file-source streams with watermark-driving sentinel
  * ticks, and a bounded run-to-parquet-sink executor. Used by
  * `j1_interval_stream`, `w11_ohlc_stream`, `w6_session_stream` and the
  * stateful `st*_stream` gates so each face runs through the actual
  * Structured Streaming engine (state store, watermarks, timers) and is
  * read back against the SAME DuckDB oracle family as its batch twin.
  */
private[queries] object StreamGate {

  /** Prepared source directories, keyed by (sfDir, sentinels,
    * splitParts). The prep — canonicalize the corpus, min/max scan,
    * coalesce(1) writes of every part + sentinel — is identical for
    * every call with the same key and the written files are immutable,
    * so gates sharing a shape (d1/st3/e6 all run 2 parts + 2
    * sentinels; the three windows gates run 1 + 1) pay it ONCE per
    * session instead of once per gate per bench repeat. The cached
    * value carries the canonical schema so re-serving is a pure
    * readStream with no hidden session-state dependency: the
    * nanosAsLong conf (needed only by the raw read inside the prep)
    * is set on the HIT path too, so both paths leave identical
    * session state, and every temp dir registers for JVM-exit
    * cleanup so the process-lifetime cache cannot leak directories
    * past the process. */
  private val sourceCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Int),
      (String, org.apache.spark.sql.types.StructType)]()

  /** Events fixture as a file-source STREAM with watermark-driving
    * sentinels: the single parquet file symlinks into a temp dir (the
    * file source wants a directory), and `sentinels` one-row files carry
    * ticks 3, 6, … hours past the corpus max with event_type
    * `__sentinel` / user_id −1 — append-mode aggregations only emit
    * watermark-SEALED windows, and event-time TIMERS only fire in a
    * batch AFTER the watermark passed them, so stateful gates ask for
    * two sentinels: the first lifts the watermark past the corpus, the
    * second triggers a batch in which the lifted watermark fires every
    * armed timer. Both marker keys filter on read-back.
    *
    * `oneFilePerTrigger` makes AvailableNow process each file as its own
    * micro-batch (mtimes are spaced explicitly so the source's
    * modification-time ordering is deterministic): the full corpus in
    * batch 0, then one watermark-advancing batch per sentinel — the
    * multi-batch shape cross-batch state and timers need.
    *
    * The fixture's `ts` encoding has varied across driver regenerations
    * (ns-int64 / µs-NTZ / µs-LTZ); it is canonicalized to epoch-µs LONG
    * up front, so the streamed copy and all sentinel math are
    * encoding-independent (same floor-to-µs as `Tables.events`).
    */
  def eventsFileStream(s: SparkSession, d: String, sentinels: Int = 1,
                       oneFilePerTrigger: Boolean = false,
                       splitParts: Int = 1): DataFrame = {
    // needed only by the RAW ns-int64 read inside the prep (the cached
    // files are canonical µs longs) — set OUTSIDE the cache so hit and
    // miss paths leave identical session state, same idempotent
    // convention as Tables.events
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val (dirStr, schema) = sourceCache.computeIfAbsent(
      (d, sentinels, splitParts),
      _ => prepareSourceDir(s, d, sentinels, splitParts))
    val reader = s.readStream.schema(schema)
    val opts = if (oneFilePerTrigger) reader.option("maxFilesPerTrigger", 1) else reader
    opts.parquet(dirStr)
      .withColumn("ts", timestamp_micros(col("ts")))
  }

  /** Recursive JVM-exit cleanup for prep/sink temp dirs — the cache is
    * process-lifetime by design, so the dirs must not outlive it. ONE
    * shutdown hook drains a queue the callers append to: runToSink runs
    * once per gate per bench repeat, so a hook-per-dir would accumulate
    * unbounded Thread objects over a long benchmark session. */
  private val exitDirs =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles).foreach(_.foreach(rm))
        f.delete(): Unit
      }
      var d = exitDirs.poll()
      while (d != null) { rm(d.toFile); d = exitDirs.poll() }
    }))
  }
  private def registerDeleteOnExit(dir: java.nio.file.Path): Unit =
    exitDirs.add(dir): Unit

  /** Canonical-µs ts bounds straight from the fixture's parquet FOOTER
    * (driver-side, zero Spark jobs — guide §5/§6: the writer already
    * computed exact column min/max). Sound only where the µs
    * canonicalization is monotonic in the stored INT64: ns-longs (both
    * non-negative, truncating division) and µs timestamps under a UTC
    * session zone (identity). Anything else — INT96 storage, absent
    * row-group stats, non-UTC session — returns None and the caller
    * falls back to the min/max scan. */
  private def footerTsBoundsUs(s: SparkSession, d: String,
                               tsType: org.apache.spark.sql.types.DataType)
      : Option[(Long, Long)] = try {
    val p = new org.apache.hadoop.fs.Path(s"$d/events.parquet")
    val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
    val paths =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).toSeq.map(_.getPath)
          .filter(_.getName.endsWith(".parquet"))
      else Seq(p)
    val stats = paths.map(graft.operators.FooterStats.read(fs, _))
    val bounds = stats.map(_.bounds.get("ts"))
    if (bounds.exists(b => b.isEmpty || b.get._1 != 2)) return None
    def le(a: Array[Byte]) = java.nio.ByteBuffer.wrap(a)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    val lo = bounds.map(b => le(b.get._2)).min
    val hi = bounds.map(b => le(b.get._3)).max
    tsType match {
      case org.apache.spark.sql.types.LongType if lo >= 0 =>
        Some((lo / 1000, hi / 1000)) // ns → µs, same floor as `ts div 1000`
      case org.apache.spark.sql.types.TimestampNTZType
          if s.conf.get("spark.sql.session.timeZone") == "UTC" =>
        Some((lo, hi)) // NTZ micros cast under UTC == the same micros
      case org.apache.spark.sql.types.TimestampType =>
        Some((lo, hi)) // unix_micros is the stored INT64 verbatim
      case _ => None
    }
  } catch { case scala.util.control.NonFatal(_) => None }

  private def prepareSourceDir(s: SparkSession, d: String, sentinels: Int,
                               splitParts: Int)
      : (String, org.apache.spark.sql.types.StructType) = {
    val raw0 = s.read.parquet(s"$d/events.parquet")
    val dir = java.nio.file.Files.createTempDirectory("evsrc")
    registerDeleteOnExit(dir)
    val raw = raw0.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw0.withColumn("ts", expr("ts div 1000")) // ns → µs, floor
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw0.withColumn("ts",
          unix_micros(col("ts").cast(org.apache.spark.sql.types.TimestampType)))
      case _ => raw0.withColumn("ts", unix_micros(col("ts")))
    }
    val (minUs, maxUs) = footerTsBoundsUs(s, d, raw0.schema("ts").dataType)
      .getOrElse {
        val r = raw.agg(min(col("ts")), max(col("ts"))).head()
        (r.getLong(0), r.getLong(1))
      }
    val baseMtime = java.nio.file.Files
      .getLastModifiedTime(java.nio.file.Paths.get(s"$d/events.parquet")).toMillis

    // writes `df` as a single parquet file named `name` in the stream dir
    // with an explicitly spaced mtime — the file source processes files in
    // (modification time, path) order, so spacing makes the batch order
    // deterministic under oneFilePerTrigger
    def writeOne(df: DataFrame, name: String, seq: Int): Unit = {
      val scratch = dir.resolve(s"_$name")
      df.coalesce(1).write.mode("overwrite").parquet(scratch.toString)
      val part = scratch.toFile.listFiles.find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error(s"$name parquet part not found"))
      val dst = dir.resolve(s"$name.parquet")
      java.nio.file.Files.move(part.toPath, dst)
      java.nio.file.Files.setLastModifiedTime(dst,
        java.nio.file.attribute.FileTime.fromMillis(baseMtime + seq * 60000L))
    }

    if (splitParts <= 1) {
      writeOne(raw, "events", 0) // canonical µs-long copy of the corpus
    } else {
      // time-range halves/parts: part i = (bound(i-1), bound(i)] so every
      // event of an earlier part precedes every event of a later part —
      // cross-batch state then sees each key's history in global time
      // order, and the watermark after part i is ≤ every later part's ts
      // (no late data, no mis-fired timers). ALL parts write in ONE
      // single-task partitionBy pass (was one full filter-scan per
      // part); per-part row order is the input order either way.
      val bounds = (1 until splitParts)
        .map(i => minUs + (maxUs - minUs) * i.toLong / splitParts)
      val partIdx = bounds
        .map(b => when(col("ts") > b, 1).otherwise(0))
        .reduce(_ + _)
      val scratch = dir.resolve("_parts")
      raw.withColumn("__part", partIdx).coalesce(1)
        .write.mode("overwrite").partitionBy("__part")
        .parquet(scratch.toString)
      (0 until splitParts).foreach { i =>
        val pdir = scratch.resolve(s"__part=$i").toFile
        Option(pdir.listFiles)
          .flatMap(_.find(_.getName.endsWith(".parquet"))) match {
          case Some(part) =>
            val dst = dir.resolve(s"part_$i.parquet")
            java.nio.file.Files.move(part.toPath, dst)
            java.nio.file.Files.setLastModifiedTime(dst,
              java.nio.file.attribute.FileTime
                .fromMillis(baseMtime + (i + 1) * 60000L))
          case None => // a part with no rows (degenerate split) still
            // needs its file so the batch sequence keeps its shape
            writeOne(raw.filter(lit(false)), s"part_$i", i + 1)
        }
      }
    }
    if (sentinels > 0) {
      // ONE tiny job collects a prototype row; each sentinel is then a
      // local one-row relation (no per-sentinel corpus scan)
      val proto = raw.limit(1).head()
      val fields = raw.schema.fields
      (1 to sentinels).foreach { i =>
        val vals = fields.map(f => f.name match {
          case "ts" => maxUs + i * 3L * 3600 * 1000000L
          case "event_type" => "__sentinel"
          case "user_id" => -1L
          case n => proto.getAs[Any](n)
        })
        val one = s.createDataFrame(
          java.util.Collections.singletonList(
            org.apache.spark.sql.Row(vals.toIndexedSeq: _*)), raw.schema)
        writeOne(one, s"sentinel_$i", splitParts + i)
      }
    }
    (dir.toString, raw.schema)
  }

  /** Runs a streaming DataFrame to a parquet sink with AvailableNow and
    * reads the result back — 8 state partitions for the bounded run
    * (store setup/commit dominates fixture-sized micro-batches at 32;
    * 4 was probed in round 10 and is WORSE at sf0.1 — the stream-stream
    * joins and state ops lose genuine parallelism: j1 4.2 → 5.3 s cold.
    * 8 is the measured sweet spot). */
  def runToSink(s: SparkSession, df: DataFrame): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("evsink")
    registerDeleteOnExit(tmpDir)
    val tmp = tmpDir.toString
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", "8")
    try {
      df.writeStream
        .format("parquet")
        .option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/cp")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
        .awaitTermination()
    } finally s.conf.set("spark.sql.shuffle.partitions", prev)
    s.read.parquet(s"$tmp/out")
  }
}
