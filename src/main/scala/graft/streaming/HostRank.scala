package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.TextAnalysis

/** Incremental HOST-RANK maintenance — the streaming face of the
  * link-graph/PageRank tier (X184/X185 run it in batch; a live crawl
  * discovers links continuously and the frontier prioritizer wants
  * fresh host authority without re-extracting history).
  *
  * Per micro-batch of fetched pages (`doc_id`, `url`, `html`):
  * outlinks extract and resolve map-side (`extractLinks`), fold to the
  * registrable-domain edge list, and the batch's WEIGHTED EDGE DELTAS
  * append to a persisted artifact through the idempotent batch-keyed
  * sink. Weighted edges are SUMS — the mergeable-partial pattern — so
  * the maintained graph is just `groupBy(src,dst).sum(weight)` over
  * the artifact, and ranks refresh by running the integer-exact
  * PageRank operator over the merged graph: HostRankSpec proves the
  * refreshed ranks EQUAL a from-scratch batch recompute over the union
  * corpus (bit-identical, not approximately — both reduce to the same
  * edge multiset).
  *
  * 100 TB shape: extraction is map-side in the batch; the delta append
  * shuffles only batch-sized edges; the merge + rank pass reads the
  * edge artifact, which is |hosts²|-bounded (domain pairs), not
  * corpus-bounded — and compacts like any other batch-keyed artifact
  * (sum the deltas into one epoch). Page bytes never join anything.
  */
object HostRank {

  private def domainOf(url: org.apache.spark.sql.Column) =
    TextAnalysis.registrableDomain(
      regexp_extract(url, "^[a-zA-Z]+://([^/?#]*)", 1))

  /** Outlink edge deltas of one micro-batch of pages, as the weighted
    * registrable-domain edge list `(src, dst, n_links)`. */
  def edgeDeltas(pages: DataFrame): DataFrame = {
    val links = TextAnalysis.extractLinks(pages)
    links
      .join(pages.select(col("doc_id"), domainOf(col("url")).as("src")),
        Seq("doc_id"))
      .withColumn("dst", domainOf(col("url")))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n_links"))
  }

  /** foreachBatch body: append this epoch's edge deltas (idempotent —
    * a replayed epoch is a no-op). */
  def edgeDeltaBatch(artifactDir: String)
                    (pages: DataFrame, batchId: Long): Unit =
    graft.sources.Sinks.idempotentBatchSink(s"$artifactDir/edges")(
      edgeDeltas(pages), batchId)

  /** One-line pointer for the compacted tier: `version upTo`. Unlike
    * the membership store, duplicated SUM deltas would be wrong, so
    * the reader filters epochs by the flipped high-water mark and
    * every crash window resolves to exactly-once accounting. */
  private def metaPath(artifactDir: String) =
    new org.apache.hadoop.fs.Path(s"$artifactDir/edges_compacted/_META")

  private def readEdgeMeta(fs: org.apache.hadoop.fs.FileSystem,
                           artifactDir: String): Option[(Int, Long)] =
    graft.util.AtomicCommit.readPointer(fs, metaPath(artifactDir)).collect {
      case Array(v, upTo) => (v.toInt, upTo.toLong)
    }

  /** The maintained graph: the compacted tier (when one exists) plus
    * the epochs past its high-water mark, merged by summing weights
    * (order- and batching-invariant — a sum is a sum). */
  def mergedEdges(spark: org.apache.spark.sql.SparkSession,
                  artifactDir: String): DataFrame = {
    val fs = new org.apache.hadoop.fs.Path(artifactDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = readEdgeMeta(fs, artifactDir)
    val upTo = meta.map(_._2).getOrElse(-1L)
    val incr =
      if (listEpochs(fs, s"$artifactDir/edges").exists(_ > upTo))
        Some(spark.read.parquet(s"$artifactDir/edges")
          .filter(col("batch_id").cast("long") > lit(upTo))
          .select("src", "dst", "n_links"))
      else None
    val comp = meta.map { case (v, _) =>
      spark.read.parquet(s"$artifactDir/edges_compacted/v=$v")
        .select("src", "dst", "n_links")
    }
    (comp.toSeq ++ incr.toSeq).reduceOption(_.union(_))
      .getOrElse(spark.emptyDataFrame
        .select(lit("").as("src"), lit("").as("dst"),
          lit(0L).as("n_links")).limit(0))
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("n_links")).as("n_links"))
  }

  private def listEpochs(fs: org.apache.hadoop.fs.FileSystem,
                         path: String): Seq[Long] =
    CrawlStore.listEpochs(fs, path)

  /** Fresh host ranks over the maintained graph — the integer
    * fixed-point operator, so incremental == batch exactly. */
  def hostRank(spark: org.apache.spark.sql.SparkSession,
               artifactDir: String): DataFrame =
    graft.operators.Graph.pageRank(
      mergedEdges(spark, artifactDir), "src", "dst", "n_links")

  /** Fold every edge epoch but the youngest (the only replayable one)
    * into a fresh compacted tier, then flip the `_META` pointer and
    * best-effort delete the folded dirs. Sums make duplication WRONG
    * (unlike the membership store), but every crash window here still
    * accounts each delta exactly once: pre-flip the reader uses the old
    * tier + all epochs; post-flip it uses the new tier + epochs past
    * the new high-water mark, and leftover folded dirs are filtered by
    * that mark, not by existence. */
  def compactEdges(spark: org.apache.spark.sql.SparkSession,
                   artifactDir: String): Unit = {
    val path = s"$artifactDir/edges"
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val meta = readEdgeMeta(fs, artifactDir)
    val upTo = meta.map(_._2).getOrElse(-1L)
    val epochs = listEpochs(fs, path).filter(_ > upTo).sorted
    if (epochs.length <= 1) return
    val fold = epochs.dropRight(1)
    val foldDf = spark.read.parquet(path)
      .filter(col("batch_id").cast("long")
        .isin(fold.map(java.lang.Long.valueOf): _*))
      .select("src", "dst", "n_links")
    val all = meta.fold(foldDf) { case (v, _) =>
      spark.read.parquet(s"$artifactDir/edges_compacted/v=$v")
        .select("src", "dst", "n_links").union(foldDf)
    }
      .groupBy(col("src"), col("dst"))
      .agg(sum(col("n_links")).as("n_links"))
    val version = meta.map(_._1 + 1).getOrElse(1)
    all.write.mode("overwrite")
      .parquet(s"$artifactDir/edges_compacted/v=$version")
    graft.util.AtomicCommit.commitPointer(fs, metaPath(artifactDir),
      s"$version ${fold.max}")
    fold.foreach(e =>
      fs.delete(new org.apache.hadoop.fs.Path(path, s"batch_id=$e"), true))
    meta.foreach { case (v, _) =>
      fs.delete(new org.apache.hadoop.fs.Path(
        s"$artifactDir/edges_compacted/v=$v"), true)
    }
  }
}
