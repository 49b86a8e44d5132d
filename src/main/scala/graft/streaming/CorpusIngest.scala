package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import graft.llm.{Dedup, Sampling, TextAnalysis}

/** The composed streaming job for the LLM-pipeline surface — the corpus
  * analog of the reference's composed DWD/DWS apps (continuous
  * enrichment, BaseLogApp's gate-and-route shape): documents stream in,
  * training-ready shards stream out.
  *
  * Per micro-batch (`foreachBatch`):
  *   1. incremental near-dup STATE update — `Dedup.lshIngestBatch`
  *      appends the batch's MinHash signatures and its new matches
  *      (new-vs-history and new-vs-new) to the persisted artifact;
  *   2. quality + language gate (pure map-side scoring);
  *   3. near-dup removal against the ACCUMULATED match log, with an
  *      ARRIVAL-ORDER canonical: a new doc is dropped when its flagged
  *      partner actually SHIPPED in an earlier batch (whatever their id
  *      order — an already-written shard cannot be retracted), and
  *      within a batch the larger-id (d2) member yields when its partner
  *      passes this batch's gate. A partner that merely APPEARED earlier
  *      but never shipped (quality-gated out, or itself deduped) does
  *      not suppress the new arrival — shipped status is decided by
  *      joining the written output, so at least one member of every
  *      flagged pair whose members clear the gate survives. Batch
  *      compaction upgrades this pairwise rule to full min-id transitive
  *      clusters via `connectedComponentsCached`;
  *   4. deterministic stratified sampling — stateless, so a replayed
  *      batch makes identical decisions;
  *   5. deterministic shard assignment + exactly-once batch-keyed write.
  *
  * Output layout: `outDir/batch_id=N/...` with (doc_id, lang_pred,
  * quality_score, sample_rate, sample_weight, shard, shard_pos).
  * Reproducible global training order = (shard, batch_id, shard_pos);
  * `shard_pos` is batch-local by construction (a stream cannot know
  * future ranks), and every decision is content-hash-keyed, so replays
  * and restarts cannot change the corpus.
  *
  * 100 TB shape: the only shuffle is the band-key join inside the LSH
  * state update (linear sketch state — 24 longs/doc ever ingested); the
  * gate, sampling, and sharding are map-side; the removal set (flagged
  * near-dups, sparse by construction) joins AQE-planned (broadcast when
  * small, shuffled anti-join when not). Shipped status reads a compact
  * ids-only artifact appended per epoch (`artifactDir/shipped`), not the
  * full-width shard output — per-batch cost grows with ids ever shipped,
  * not with corpus bytes.
  */
object CorpusIngest {

  def ingestBatch(artifactDir: String, outDir: String,
                  rates: Map[String, Double] = Map.empty,
                  defaultRate: Double = 1.0,
                  minQuality: Double = 0.45,
                  numShards: Int = 8)
                 (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    Dedup.lshIngestBatch(artifactDir)(batch, batchId)
    val gated = TextAnalysis.withLangId(TextAnalysis.withQuality(batch))
      .filter(col("quality_score") >= minQuality && col("lang_pred") =!= "unknown")
    val matchesPath = new org.apache.hadoop.fs.Path(s"$artifactDir/matches")
    val fs = matchesPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val kept =
      if (fs.exists(matchesPath)) {
        val ml = spark.read.parquet(matchesPath.toString).select("d1", "d2")
        val gatedIds = gated.select(col("doc_id")).distinct()
        // shipped = docs actually WRITTEN by earlier epochs, read from the
        // compact batch-keyed id artifact (appended per epoch exactly like
        // sigs/matches) — NOT a rescan of the ever-growing shard output,
        // which would make every micro-batch pay O(total history) over
        // the full-width corpus. The current batch's own partition is
        // excluded so a replayed batch (whose rows are already in the
        // artifact) makes the identical decisions it made the first time.
        val shippedPath = new org.apache.hadoop.fs.Path(s"$artifactDir/shipped")
        val shipped =
          if (fs.exists(shippedPath))
            spark.read.parquet(shippedPath.toString)
              .filter(col("batch_id").cast("long") =!= lit(batchId))
              .select(col("doc_id")).distinct()
          else spark.range(0).select(col("id").as("doc_id"))
        // d2 yields when its partner shipped OR clears this batch's gate...
        val d2Drop = ml
          .join(gatedIds.withColumnRenamed("doc_id", "d2"), Seq("d2"), "left_semi")
          .join(shipped.union(gatedIds).withColumnRenamed("doc_id", "d1"),
            Seq("d1"), "left_semi")
          .select(col("d2").as("doc_id"))
        // ...and d1 yields only to a partner that actually shipped (an
        // already-written shard cannot be retracted, whatever the ids)
        val d1DropHist = ml
          .join(gatedIds.withColumnRenamed("doc_id", "d1"), Seq("d1"), "left_semi")
          .join(shipped.withColumnRenamed("doc_id", "d2"), Seq("d2"), "left_semi")
          .select(col("d1").as("doc_id"))
        // the removal set is sparse by construction, but its size is
        // data-dependent — no forced broadcast; AQE picks broadcast when
        // it fits and degrades to a shuffled anti-join when it doesn't
        val removed = d2Drop.union(d1DropHist).distinct()
        gated.join(removed, Seq("doc_id"), "left_anti")
      } else gated
    val sampled = Sampling.stratifiedSample(kept, "doc_id", "lang_pred",
      rates, defaultRate)
    val sharded = Sampling.deterministicShard(sampled, "doc_id", numShards)
    graft.sources.Sinks.idempotentBatchSink(outDir)(
      sharded.select("doc_id", "lang_pred", "quality_score",
        "sample_rate", "sample_weight", "shard", "shard_pos"), batchId)
    // append this epoch's shipped ids to the compact artifact — AFTER the
    // shard write, so a crash between the two replays into: output
    // already committed (no-op), identical decisions (the artifact filter
    // above excludes this batch), then this append completes. Ids-only:
    // the artifact a 100 TB stream re-reads every batch stays narrow.
    graft.sources.Sinks.idempotentBatchSink(s"$artifactDir/shipped")(
      sharded.select("doc_id"), batchId)
  }

  /** Wire the per-batch body into a stream. */
  def run(docs: DataFrame, artifactDir: String, outDir: String,
          checkpoint: String, rates: Map[String, Double] = Map.empty,
          minQuality: Double = 0.45): StreamingQuery =
    docs.writeStream
      .foreachBatch(ingestBatch(artifactDir, outDir, rates,
        minQuality = minQuality) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Streaming CRAWL ingest — the incremental face of the web
    * pipeline's ENTRY stages (`xWebPipeline` runs them in batch; a real
    * crawl delivers WARC blobs continuously). Per micro-batch of raw
    * blobs (`doc_id`, `payload` — plain WARC or `.warc.gz`, from
    * `writeStream.foreachBatch`):
    *   1. record extraction — the `warcExtract` byte walk (gunzip
    *      member split auto-detected), `urlCanonical` dedup key,
    *      `registrableDomain`, `htmlToText`, all map-side IN the batch;
    *   2. within-batch URL dedup — keep the first (doc_id, rec_idx)
    *      per canonical key;
    *   3. history URL dedup — a left-anti join against the PERSISTED
    *      url-key artifact (`<dir>/urls`, one narrow row per canonical
    *      key ever kept; the batch's own epoch partition is excluded so
    *      a replayed batch re-derives its original survivors);
    *   4. survivors' pages append to `<dir>/pages`, their keys to
    *      `<dir>/urls` — both batch-id-keyed idempotent commits, so a
    *      replayed micro-batch is a no-op;
    *   5. FRONTIER growth (the crawl loop): survivors' outlinks
    *      extract and resolve (`extractLinks`), canonicalize, and the
    *      keys not yet fetched (urls artifact + this batch) nor
    *      already queued (frontier artifact) append to
    *      `<dir>/frontier` — the candidate list the next fetch wave
    *      drains, discovered by crawling itself.
    * Near-dup state lives in the SEPARATE lsh/image ingest faces —
    * chain them on `<dir>/pages` downstream; this face owns exactly
    * the crawl-specific tier (container split + URL-exact dedup +
    * frontier discovery).
    * 100 TB shape: one shuffle on the canonical key (within-batch
    * dedup); the history checks go through [[CrawlStore]] — bloom
    * sidecars prove most new keys new MAP-SIDE, and the exact confirm
    * reads only the hash buckets the remaining candidates fall into
    * (partition-pruned, broadcast anti-join), so per-batch cost is a
    * function of the batch, not of how much the crawl has ever
    * fetched. Every `compactEvery` epochs the increments fold into the
    * re-bucketed compacted tier (the one amortized history-sized
    * pass). Page BYTES never join anything. */
  def crawlIngestBatch(artifactDir: String, compactEvery: Int = 64,
                       targetRowsPerBucket: Long = 1L << 20)
                      (batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val urlsPath = s"$artifactDir/urls"
    val frontierPath = s"$artifactDir/frontier"
    // a FULLY-committed epoch (every sink marker + both key blobs) has
    // nothing left to write: a replayed batch skips the recompute
    // outright instead of re-deriving outputs whose writes would all
    // no-op. Partially-committed crash windows still recompute the
    // whole body (each write is idempotent on its own). Compaction
    // (below) must still run — a crashed pre-flip compact retries on
    // replay.
    val fs = new org.apache.hadoop.fs.Path(artifactDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    def done(p: String) = fs.exists(
      new org.apache.hadoop.fs.Path(p, s"batch_id=$batchId/_SUCCESS"))
    def blobbed(p: String) = fs.exists(new org.apache.hadoop.fs.Path(
      s"${p}_bloom/batch_id=$batchId", "bf.bin"))
    val replayComplete = done(s"$artifactDir/pages") &&
      done(urlsPath) && blobbed(urlsPath) &&
      done(frontierPath) && blobbed(frontierPath)
    if (replayComplete) {
      if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1)) {
        CrawlStore.compact(spark, urlsPath, "canon",
          targetRowsPerBucket = targetRowsPerBucket)
        CrawlStore.compact(spark, frontierPath, "canon", carry = Seq("url"),
          targetRowsPerBucket = targetRowsPerBucket)
      }
      return
    }
    // extracted once, consumed four times (dedup, pages, urls,
    // outlinks) — a micro-batch's pages are small, checkpoint beats
    // the re-walk
    val pages = graft.llm.Multimodal.warcExtract(batch)
      .select(col("doc_id"), col("rec_idx"), col("uri"),
        TextAnalysis.urlCanonical(col("uri")).as("canon"),
        col("content"))
      .filter(col("canon").isNotNull)
      .withColumn("domain", TextAnalysis.registrableDomain(
        regexp_extract(col("canon"), "^([^/?]*)", 1)))
      .withColumn("text", TextAnalysis.htmlToText(col("content")))
      .localCheckpoint(true)
    if (pages.isEmpty) return
    val w = Window.partitionBy(col("canon"))
      .orderBy(col("doc_id"), col("rec_idx"))
    val firsts = pages.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    // history URL dedup — sub-linear membership check (bloom prefilter
    // + bucket-pruned confirm), own epoch excluded for replay safety.
    // Materialized: survivors feed four consumers (two sinks, the
    // outlink extraction, and the within-batch frontier filter), and
    // without the checkpoint each would re-run the confirm join.
    val survivors = CrawlStore
      .antiJoinNew(firsts, "canon", urlsPath, batchId)
      .localCheckpoint(true)
    graft.sources.Sinks.idempotentBatchSink(s"$artifactDir/pages")(
      survivors.select("doc_id", "rec_idx", "canon", "domain", "text"),
      batchId)
    CrawlStore.appendKeys(urlsPath)(survivors, "canon", batchId)
    // the crawl loop: outlinks of the pages just kept become frontier
    // candidates unless fetched (history or this batch) or queued
    val outlinks = TextAnalysis.extractLinks(
        survivors.select(col("doc_id"), col("uri").as("url"),
          col("content").as("html")))
      .select(TextAnalysis.urlCanonical(col("url")).as("canon"), col("url"))
      .filter(col("canon").isNotNull)
      .dropDuplicates("canon")
      .join(survivors.select("canon"), Seq("canon"), "left_anti")
      .localCheckpoint(true)
    // fetched (urls) and queued (frontier) membership are ONE predicate
    // — "in neither artifact" — checked in one fused pass (one bloom
    // prefilter over both artifacts' blobs, one anti-join against the
    // union of their histories) instead of two sequential store walks
    // with an extra materialization between them
    val fresh = CrawlStore.antiJoinNewAll(outlinks, "canon",
      Seq(urlsPath, frontierPath), batchId)
    CrawlStore.appendKeys(frontierPath)(
      fresh, "canon", batchId, carry = Seq("url"))
    // periodic fold of the batch-keyed increments into the re-bucketed
    // compacted tier; the youngest (replayable) epoch always survives,
    // and a replay of a compacting batch re-enters compact() as a no-op
    if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1)) {
      CrawlStore.compact(spark, urlsPath, "canon",
        targetRowsPerBucket = targetRowsPerBucket)
      CrawlStore.compact(spark, frontierPath, "canon", carry = Seq("url"),
        targetRowsPerBucket = targetRowsPerBucket)
    }
  }

  /** Wire the crawl per-batch body into a stream of WARC blobs. */
  def runCrawl(blobs: DataFrame, artifactDir: String,
               checkpoint: String): StreamingQuery =
    blobs.writeStream
      .foreachBatch(crawlIngestBatch(artifactDir) _)
      .option("checkpointLocation", checkpoint)
      .start()

  /** Streaming ARCHIVE ingest — corpora delivered as .zip/.tar drops
    * (book collections, code snapshots, data dumps) rather than a
    * crawl. Per micro-batch of raw archive blobs (`doc_id`,
    * `payload`):
    *   1. container explode — ZIP or tar auto-detected by magic, the
    *      `Archive` walkers' codegen'd byte walk, regular-file entries
    *      only, map-side IN the batch;
    *   2. text + hygiene — `Utf8Ops.utf8Scan` repairs each entry to
    *      text (the per-byte U+FFFD policy) and keys it by the
    *      CONTENT hash (md5 of the raw bytes) — the same file shipped
    *      in two archives is one document;
    *   3. within-batch first-wins per content key, then the
    *      [[CrawlStore]] history membership check (bloom prefilter +
    *      bucket-pruned confirm; own epoch excluded for replay);
    *   4. survivors append to `<dir>/docs`, their keys to
    *      `<dir>/seen` — batch-id-keyed idempotent commits, replayed
    *      micro-batches are no-ops; every `compactEvery` epochs the
    *      key increments fold into the compacted tier.
    * Same 100 TB shape as the crawl face: one shuffle on the content
    * key; history cost is a function of the batch, not of everything
    * ever ingested; archive BYTES never join anything. */
  def archiveIngestBatch(artifactDir: String, compactEvery: Int = 64,
                         targetRowsPerBucket: Long = 1L << 20)
                        (batch: DataFrame, batchId: Long): Unit = {
    import org.apache.spark.sql.expressions.Window
    val spark = batch.sparkSession
    val seenPath = s"$artifactDir/seen"
    // fully-committed epoch → replay skips the recompute (same contract
    // as crawlIngestBatch; compaction still runs below via the guarded
    // fall-through)
    val fsA = new org.apache.hadoop.fs.Path(artifactDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fsA.exists(new org.apache.hadoop.fs.Path(
          s"$artifactDir/docs/batch_id=$batchId/_SUCCESS")) &&
        fsA.exists(new org.apache.hadoop.fs.Path(
          s"$seenPath/batch_id=$batchId/_SUCCESS")) &&
        fsA.exists(new org.apache.hadoop.fs.Path(
          s"${seenPath}_bloom/batch_id=$batchId", "bf.bin"))) {
      if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
        CrawlStore.compact(spark, seenPath, "content_key",
          targetRowsPerBucket = targetRowsPerBucket)
      return
    }
    val zipRows = graft.functions.Archive.zipEntriesCol(col("payload"))
    val tarRows = graft.functions.Archive.tarEntriesCol(col("payload"))
    def norm(e: org.apache.spark.sql.Column) = struct(
      e.getField("name").as("name"), e.getField("data").as("data"))
    // Route on the full 4-byte ZIP magic (local header / empty-archive
    // EOCD / spanned marker), not the 2-byte "PK" prefix: a tar whose
    // first member name starts with "PK" must not be misrouted. And the
    // magic only sets the PREFERENCE — each branch falls back to the
    // other walker (coalesce is lazy: the fallback parse only runs when
    // the preferred walker declines), so a prefixed/self-extracting ZIP
    // (zipEntries' backward EOCD scan handles those) still parses even
    // without the magic at offset 0.
    val zipT = transform(zipRows, norm(_))
    val tarT = transform(tarRows, norm(_))
    val isZipMagic = hex(substring(col("payload"), 1, 4))
      .isin("504B0304", "504B0506", "504B0708")
    val entries = when(isZipMagic, coalesce(zipT, tarT))
      .otherwise(coalesce(tarT, zipT))
    val scan = graft.functions.Utf8Ops.utf8ScanCol(col("data"))
    val docs = batch
      .select(col("doc_id"), posexplode(entries).as(Seq("entry_idx", "e")))
      .select(col("doc_id"), col("entry_idx").cast("long").as("entry_idx"),
        col("e.name").as("name"), col("e.data").as("data"))
      .filter(col("data").isNotNull)
      .select(col("doc_id"), col("entry_idx"), col("name"),
        md5(col("data")).as("content_key"),
        scan.getField("text").as("text"),
        scan.getField("is_valid").as("utf8_valid"))
      .localCheckpoint(true)
    if (docs.isEmpty) return
    val w = Window.partitionBy(col("content_key"))
      .orderBy(col("doc_id"), col("entry_idx"))
    val firsts = docs.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    val survivors = CrawlStore
      .antiJoinNew(firsts, "content_key", seenPath, batchId)
      .localCheckpoint(true)
    graft.sources.Sinks.idempotentBatchSink(s"$artifactDir/docs")(
      survivors, batchId)
    CrawlStore.appendKeys(seenPath)(survivors, "content_key", batchId)
    if (compactEvery > 0 && batchId % compactEvery == (compactEvery - 1))
      CrawlStore.compact(spark, seenPath, "content_key",
        targetRowsPerBucket = targetRowsPerBucket)
  }

  /** Wire the archive per-batch body into a stream of archive blobs. */
  def runArchives(blobs: DataFrame, artifactDir: String,
                  checkpoint: String): StreamingQuery =
    blobs.writeStream
      .foreachBatch(archiveIngestBatch(artifactDir) _)
      .option("checkpointLocation", checkpoint)
      .start()
}
