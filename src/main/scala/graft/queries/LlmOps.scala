package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.util.Det._
import graft.llm.{Dedup, Multimodal, Sampling, Similarity, TextAnalysis}

/** LLM-training-data pipeline operators (the beyond-reference extension
  * surface): text analysis, dedup (exact / n-gram Jaccard / MinHash LSH /
  * SimHash / embedding), similarity search, multimodal plumbing.
  * Implementations in graft.llm.*; this module binds them to the test
  * tables and declares DuckDB oracles (all hashing is md5-derived so the
  * oracle can replicate it exactly).
  */
object LlmOps {

  def xTextTokens(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.withTokenCounts(documents(s, d))
        .select("doc_id", "n_tokens", "n_ws_tokens", "n_bpe_pieces"),
      "doc_id")

  def xTextQuality(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.withQuality(documents(s, d))
        .select("doc_id", "n_chars", "n_tokens", "alpha_ratio",
          "stopword_ratio", "mean_token_len", "quality_score"),
      "doc_id")

  def xTextLangid(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.withLangId(documents(s, d))
        .select("doc_id", "lang_pred", "lang_score"),
      "doc_id")

  /** Language-confusion audit — the declared `lang` column against the
    * n-gram language-ID heuristic, as a confusion matrix with counts:
    * the "which sources are mislabeled" screen a curation run reads
    * before trusting per-language mixture rates. Pure composition of
    * the gated langID op + one |langs|²-bounded aggregate. */
  def xLangConfusion(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.withLangId(documents(s, d))
        .groupBy(col("lang").as("declared"), col("lang_pred").as("detected"))
        .agg(count(lit(1)).as("ct"),
          sum(when(col("lang") === col("lang_pred"), 1L).otherwise(0L))
            .as("agree_ct")),
      "declared", "detected")

  def xTextFingerprint(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.withFingerprint(documents(s, d))
        .select("doc_id", "fingerprint"),
      "doc_id")

  def xDedupExact(s: SparkSession, d: String): DataFrame =
    ordered(Dedup.exact(documents(s, d)), "content_hash")

  /** Exact substring dedup (Lee et al. ExactSubstr): 30-char duplicated
    * windows struck corpus-wide, spans merged, documents rebuilt. At
    * sf0.01 the 30-char width marks ~12k window offsets across 67 docs —
    * real span merging without degenerating to whole-corpus removal. */
  def xDedupSubstrings(s: SparkSession, d: String): DataFrame =
    ordered(Dedup.dedupSubstrings(documents(s, d), "doc_id", minLen = 30),
      "doc_id")

  /** The round-6 surface composed end-to-end: line-level boilerplate
    * dedup → surviving-content floor (≥8 kept lines) → deterministic
    * sharding of the refined corpus. Every stage is an oracled operator
    * above; the composition proves they agree on one plan. */
  def xCorpusRefine(s: SparkSession, d: String): DataFrame = {
    val w = col("w")
    val lines = transform(
      sequence(lit(0), floor((size(w) - lit(1)) / lit(3)).cast("int")),
      j => concat_ws(" ", slice(w, j * 3 + 1, lit(3))))
    val deduped = Dedup.dedupLines(
      documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), lines.as("lines")),
      "doc_id", col("lines"), maxFreq = 4L)
    val kept = deduped.filter(col("kept_ct") >= 8)
      .select(col("doc_id"), col("kept_ct"), col("removed_ct"),
        length(col("kept_text")).cast("long").as("n_chars"))
    ordered(
      Sampling.deterministicShard(kept, "doc_id", numShards = 4)
        .select(col("doc_id"), col("kept_ct"), col("removed_ct"),
          col("n_chars"), col("shard")),
      "doc_id")
  }

  /** BPE round-1 pair statistics — the cross-engine face of tokenizer
    * merge learning (`llm.Bpe`): frequency-weighted adjacent-symbol
    * counts over char+`</w>` word decompositions. The iterative loop is
    * not SQL-expressible; BpeSpec proves `learnMerges` against an
    * independent in-memory reference instead. */
  def xBpePairs(s: SparkSession, d: String): DataFrame =
    ordered(
      graft.llm.Bpe.firstRoundPairs(documents(s, d))
        .select(col("left_sym"), col("right_sym"), col("pair_count")),
      "left_sym", "right_sym")

  /** Z-order (Morton) key over (custkey, price-cents) — the layout key
    * `operators.Layout.clusterByZOrder` sorts by so parquet min/max
    * stats cluster in BOTH dimensions (LayoutSpec measures the actual
    * per-file spread). Fixed [lo, hi) literals + integer-division
    * scaling keep every step bit-exact cross-engine; the interleave is
    * the native codegen'd `InterleaveBits`. */
  def xZorderKey(s: SparkSession, d: String): DataFrame = {
    import graft.functions.ZOrder._
    val o = orders(s, d)
    val x = scaleToBits(col("o_custkey"), 0L, 1048575L, 16)
    val y = scaleToBits((col("o_totalprice").cast("decimal(18,2)") * 100).cast("long"), 0L, 67108863L, 16)
    ordered(o.select(col("o_orderkey"), zkey(16, x, y).as("zkey")), "o_orderkey")
  }

  /** Hashed bigram-LM typicality — CCNet-style model-based quality
    * scoring in the rational house style (`llm/TextAnalysis
    * .lmTypicality`): per-bigram add-1-smoothed conditional probability
    * in integer ppm, summed per document; log-perplexity is the
    * documented float swap. */
  def xLmTypicality(s: SparkSession, d: String): DataFrame =
    ordered(lmScores(s, d), "doc_id")

  def xDedupNgram(s: SparkSession, d: String): DataFrame =
    ordered(Dedup.ngramJaccardPairs(documents(s, d), n = 3, threshold = 0.8), "d1", "d2")

  /** Sliding-window chunking (64-token windows, stride 48): the
    * context-window construction step of training prep, one row per
    * (doc, window ordinal). */
  def xChunkOverlap(s: SparkSession, d: String): DataFrame =
    ordered(TextAnalysis.chunkOverlap(documents(s, d), window = 64, stride = 48),
      "doc_id", "chunk_idx")

  /** Winnowing fingerprints (MOSS selection over token-3-gram hashes,
    * window 4): position-aware copy-detection fingerprints with the
    * shared-substring guarantee. */
  def xTextWinnow(s: SparkSession, d: String): DataFrame =
    ordered(TextAnalysis.winnowFingerprints(documents(s, d), k = 3, w = 4),
      "doc_id", "fp_pos", "fp_hash")

  /** Gopher-style rule-based quality filter: per-rule violation bitmask
    * + keep verdict per document (`TextAnalysis.withQualityRules`) —
    * the auditable curation form (aggregate the bitmask to see which
    * rule drops your corpus). */
  def xQualityRules(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.withQualityRules(documents(s, d), minTokens = 20)
        .select("doc_id", "violations", "keep"),
      "doc_id")

  /** Directed n-gram CONTAINMENT pairs (`llm/Dedup.containmentPairs`) —
    * the asymmetric excerpt/doc-inside-doc detector; at 0.9 the fixture
    * yields both near-containments and exact subsets (containment=1.0
    * where every sub gram appears in the super). */
  def xDedupContain(s: SparkSession, d: String): DataFrame =
    ordered(Dedup.containmentPairs(documents(s, d), n = 3, threshold = 0.9),
      "d_sub", "d_super")

  /** The SAME containment pairs through the sub-side prefix-filter
    * scale path — provably complete candidates (pigeonhole on the
    * rarest-first prefix), exact verification join, identical output,
    * shared oracle. */
  def xDedupContainPrefix(s: SparkSession, d: String): DataFrame =
    ordered(Dedup.containmentPairs(documents(s, d), n = 3, threshold = 0.9,
      prefixFilter = true), "d_sub", "d_super")

  /** The SAME exact set-Jaccard pairs through the PPJoin prefix-filter
    * scale path (Bayardo et al.): rarest-first prefixes bound the
    * candidate join, a verification join recovers exact intersections —
    * candidates are provably complete, so the output is identical to
    * the quadratic exactness gate and shares its oracle. This gates the
    * path a zipfian 100 TB corpus would actually run. */
  def xDedupNgramPpjoin(s: SparkSession, d: String): DataFrame =
    ordered(Dedup.ngramJaccardPairs(documents(s, d), n = 3, threshold = 0.8,
      prefixFilter = true), "d1", "d2")

  /** The production entry point: direct vs prefix chosen by the
    * MEASURED crossover switch (`Dedup.preferPrefixPath`, gram-df
    * histogram). Same oracle as the forced-path gates — the point is
    * that the output is identical whichever branch the switch takes on
    * the current corpus. */
  def xDedupNgramAuto(s: SparkSession, d: String): DataFrame =
    ordered(Dedup.ngramJaccardPairsAuto(documents(s, d), n = 3, threshold = 0.8),
      "d1", "d2")

  /** Line-level corpus dedup (CCNet-style boilerplate removal): lines
    * occurring more than 4 times corpus-wide are struck from every
    * document, which is then reassembled in original line order. The
    * fixtures are single-line, so "lines" here are the document's
    * 3-word chunks (word j belongs to line j div 3 — the same grouping
    * the oracle derives); real corpora pass `split(text, '\n')`. */
  def xDedupLines(s: SparkSession, d: String): DataFrame = {
    // words materialized as a column BEFORE the lambda: split(text)
    // inline in the transform body would re-split the document once per
    // chunk (O(words²) per doc through the interpreted lambda path)
    val w = col("w")
    val lines = transform(
      sequence(lit(0), floor((size(w) - lit(1)) / lit(3)).cast("int")),
      j => concat_ws(" ", slice(w, j * 3 + 1, lit(3))))
    ordered(
      Dedup.dedupLines(
        documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), lines.as("lines")),
        "doc_id", col("lines"), maxFreq = 4L),
      "doc_id")
  }

  /** LEAKAGE-SAFE train/val/test split: the hash is keyed on the
    * near-dup CLUSTER, not the document — every member of a near-dup
    * cluster lands in the SAME split, so a test document can never
    * have a near-duplicate twin in train (the eval-leakage mode plain
    * per-doc splitting cannot prevent, and the reason dedup-aware
    * pipelines split on canopies). Unclustered docs key on their own
    * id — identical behavior to the plain split for them. */
  def xSplitLeakageSafe(s: SparkSession, d: String): DataFrame = {
    val cl = ccClusters(s, d).select(col("doc_id"), col("cluster_id"))
    val withCluster = documents(s, d).select(col("doc_id"))
      .join(broadcast(cl), Seq("doc_id"), "left_outer")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    ordered(
      Sampling.deterministicSplit(withCluster, "cluster_id",
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
        .select(col("doc_id"), col("cluster_id"), col("split")),
      "doc_id")
  }

  /** Mixture AUDIT: the release-note table for the temperature-flattened
    * mixture — per source, what actually survived sampling (docs, chars,
    * achieved ppm of the kept corpus) next to the rate that produced
    * it. Composes the already-gated temperatureMixture; bounded output
    * (|sources| rows), one aggregate over the sampled stream. */
  def xMixtureAudit(s: SparkSession, d: String): DataFrame = {
    val kept = Sampling.temperatureMixture(documents(s, d), "doc_id",
      "source", "n_chars", budget = 140000L)
    val per = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).as("chars_kept"),
        first(col("sample_rate")).as("sample_rate"))
    ordered(
      per.crossJoin(broadcast(per.agg(sum(col("chars_kept")).as("__tot"))))
        .select(col("source"), col("n_kept"), col("chars_kept"),
          expr("chars_kept * 1000000L div __tot").as("achieved_ppm"),
          col("sample_rate")),
      "source")
  }

  /** Cross-source quality CALIBRATION: per-source exact percent-rank of
    * the LM-typicality signal — "good for its source", the rank a
    * mixed-corpus keep-threshold should use when sources have different
    * score distributions. groupedPercentRank keeps the rank table
    * bounded by |sources| × distinct ppm values; the corpus itself is
    * never sorted. */
  def xQualityCalibrate(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val scored = lmScores(s, d)
      .select(col("doc_id"), col("typ_ppm"))
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    ordered(
      graft.operators.TableStats.groupedPercentRank(scored, "source", "typ_ppm")
        .select("doc_id", "source", "typ_ppm", "rank_below", "pct_ppm"),
      "doc_id")
  }

  /** Dedup-path EVALUATION: precision/recall (integer ppm) of the
    * production MinHash-LSH pair set against the exact all-pairs n-gram
    * Jaccard answer at the same 0.8 threshold — the "how good is the
    * approximation, measured, in-engine" report a pipeline publishes
    * next to its dedup knobs. The two sides differ only where banding
    * misses a pair (recall < 1) or a 32-bit gram-hash collision flips a
    * borderline Jaccard (precision < 1); both sides are themselves
    * gated operators, so this gate pins the RELATION between them.
    * One-row output; counts via joins and aggregates, nothing
    * collected. */
  def xDedupEval(s: SparkSession, d: String): DataFrame = {
    val lsh = lshPairs(s, d).select(col("d1"), col("d2"))
    // the exact pair set feeds BOTH the n_exact count and the common
    // join; without materialization the whole labeled-quadratic oracle
    // computation runs twice (no exchange reuse across the two
    // consumers — the aggregates differ)
    val exact = Dedup.ngramJaccardPairs(documents(s, d), n = 3, threshold = 0.8)
      .select(col("d1"), col("d2")).localCheckpoint(true)
    ordered(
      lsh.agg(count(lit(1)).as("n_lsh"))
        .crossJoin(exact.agg(count(lit(1)).as("n_exact")))
        .crossJoin(lsh.join(exact, Seq("d1", "d2"))
          .agg(count(lit(1)).as("n_common")))
        .select(col("n_lsh"), col("n_exact"), col("n_common"),
          expr("n_common * 1000000L div n_lsh").as("precision_ppm"),
          expr("n_common * 1000000L div n_exact").as("recall_ppm")),
      "n_lsh")
  }

  /** Token-budget corpus selection: the best 60%-of-total-tokens corpus
    * by LM-typicality — threshold selection over the bounded per-value
    * token-sum table (never a global quality sort), boundary value
    * spent in doc-id order. Composes two already-gated signals
    * (lmTypicality quality, withTokenCounts cost); integer end to end,
    * so the exact budget cut is hash-matched cross-engine. */
  def xTokenBudget(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val in = lmScores(s, d)
      .select(col("doc_id"), col("typ_ppm"))
      .join(TextAnalysis.withTokenCounts(docs).select("doc_id", "n_tokens"),
        Seq("doc_id"))
    ordered(
      Sampling.tokenBudgetSelect(in, "doc_id", "typ_ppm", "n_tokens",
        budgetPpm = 600000L),
      "doc_id")
  }

  /** Corpus snapshot diff — the v1→v2 delta report, against a
    * deterministically DERIVED v2 of the documents table (so the gate
    * needs no second fixture): every 17th doc removed, every 13th
    * edited, every 19th cloned under a fresh id. The operator itself
    * (`operators/SnapshotDiff.corpusDiff`) sees two ordinary corpus
    * DataFrames and diffs by content hash over an id-keyed full outer
    * join of (id, md5) pairs — document bodies never shuffle. */
  def xSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("text"))
    val v2base = docs.filter(col("doc_id") % 17 =!= 0)
      .select(col("doc_id"),
        when(col("doc_id") % 13 === 0, concat(col("text"), lit(" rev2")))
          .otherwise(col("text")).as("text"))
    val v2new = docs.filter(col("doc_id") % 19 === 0)
      .select((col("doc_id") + 10000000L).as("doc_id"), col("text"))
    ordered(
      graft.operators.SnapshotDiff.corpusDiff(
        docs, v2base.unionByName(v2new), "doc_id"),
      "doc_id")
  }

  /** In-document line dedup on the same 3-word-chunk line rendering as
    * `x_dedup_lines` — the two gates share the line convention so the
    * corpus-frequency and within-document verdicts stay comparable. */
  def xDedupIndoc(s: SparkSession, d: String): DataFrame = {
    val w = col("w")
    val lines = transform(
      sequence(lit(0), floor((size(w) - lit(1)) / lit(3)).cast("int")),
      j => concat_ws(" ", slice(w, j * 3 + 1, lit(3))))
    ordered(
      Dedup.dedupLinesInDoc(
        documents(s, d)
          .select(col("doc_id"), split(col("text"), " ").as("w"))
          .select(col("doc_id"), lines.as("lines")),
        "doc_id", col("lines")),
      "doc_id")
  }

  /** The materialized near-dup pair table (build-once per JVM; the
    * corpus-filter queries below consume the same artifact — the shape a
    * real pipeline has, where the pair set is computed once and read by
    * every downstream job). */
  /** Per-JVM artifact root: the build-once maps are JVM-scoped, so the
    * on-disk paths must be too — two concurrent JVMs (sbt test next to
    * Bench) would otherwise race Overwrite-writes on a shared path. */
  private lazy val artifactRoot: String =
    s"/tmp/graft_artifacts_${ProcessHandle.current().pid()}"

  private def lshPairs(s: SparkSession, d: String): DataFrame =
    Dedup.minhashLshPairsCached(s, documents(s, d),
      artifactRoot + "/lsh_pairs/" + d.replaceAll("[^a-zA-Z0-9.]", "_") + "_n3_t08_h24b4")

  private def ccClusters(s: SparkSession, d: String): DataFrame =
    Dedup.connectedComponentsCached(s, lshPairs(s, d),
      artifactRoot + "/cc_clusters/" + d.replaceAll("[^a-zA-Z0-9.]", "_") + "_n3_t08_h24b4")

  /** Build-once LM-typicality scores (the corpus-trained bigram model's
    * per-doc output): four gates consume this table — the typicality
    * gate itself, the CCNet refinement, the token-budget selection, and
    * the cross-source calibration — so a real pipeline scores ONCE and
    * every consumer reads the 4-column parquet. Same artifact contract
    * as lsh_pairs: first caller per JVM builds and persists, the bench
    * pays the build as its own line item. */
  private val builtLmScores =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def lmScores(s: SparkSession, d: String): DataFrame = {
    val path = artifactRoot + "/lm_scores/" +
      d.replaceAll("[^a-zA-Z0-9.]", "_") + "_b512"
    if (builtLmScores.add(path)) {
      TextAnalysis.lmTypicality(documents(s, d), buckets = 512)
        .write.mode("overwrite").parquet(path)
    }
    s.read.parquet(path)
  }

  /** The build-once artifacts behind the query surface, exposed so a
    * benchmark can pay each build explicitly (its own line item) instead
    * of attributing it to whichever consumer query happens to run first —
    * that attribution shift made round-over-round per-query numbers
    * incomparable. Building through the same *Cached entry points means a
    * later query call is a pure cache hit. ORDERED by dependency:
    * cc_clusters consumes lsh_pairs, so the pair build must come first
    * or its time lands inside the cluster line item. */
  def artifactBuilders: Seq[(String, (SparkSession, String) => Unit)] = Seq(
    "lsh_pairs" -> ((s: SparkSession, d: String) => { lshPairs(s, d); () }),
    "cc_clusters" -> ((s: SparkSession, d: String) => { ccClusters(s, d); () }),
    "ivf_index" -> ((s: SparkSession, d: String) => {
      val idxPath = artifactRoot + "/ivf_index/" + d.replaceAll("[^a-zA-Z0-9.]", "_")
      Similarity.ivfBuildIndexCached(s, embeddings(s, d), idxPath, nlist = 16); ()
    }),
    "lm_scores" -> ((s: SparkSession, d: String) => { lmScores(s, d); () }))

  /** Which gate queries consume each build-once artifact — so a
    * benchmark can mark them tainted when a build fails (their "cold"
    * timing would silently include an in-query rebuild, the exact
    * attribution shift artifact line items exist to prevent). */
  def artifactConsumers: Map[String, Seq[String]] = Map(
    "lsh_pairs" -> Seq("x_dedup_minhash", "x_dedup_apply", "x_corpus_pipeline",
      "x_dedup_clusters", "x_corpus_assembly"),
    "cc_clusters" -> Seq("x_dedup_clusters", "x_corpus_assembly"),
    "ivf_index" -> Seq("x_ann_ivf", "x_ann_nn_join", "x_ann_recall", "x_semdedup",
      "x_ann_ivfpq"),
    "lm_scores" -> Seq("x_lm_typicality", "x_ccnet_refine", "x_token_budget",
      "x_quality_calibrate"))

  /** Forget all build-once artifacts (benchmarking only). */
  def resetArtifactCaches(): Unit = {
    Dedup.resetArtifactCache()
    Similarity.resetArtifactCache()
    builtLmScores.clear()
  }

  def xDedupMinhash(s: SparkSession, d: String): DataFrame =
    ordered(lshPairs(s, d), "d1", "d2")

  def xDedupSimhash(s: SparkSession, d: String): DataFrame =
    ordered(Dedup.simhashNearPairs(documents(s, d), maxDist = 3), "d1", "d2")

  def xDedupEmbeddingNn(s: SparkSession, d: String): DataFrame =
    ordered(Dedup.embeddingNearestNeighbor(embeddings(s, d)), "vec_id")

  def xAnnTopk(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    ordered(
      Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") < 8), k = 10),
      "query_id", "rank")
  }

  /** IVF path, fully oracled: hash-seeded centroids (no float averaging,
    * so assignment/probe/top-k are all exactly SQL-expressible), index
    * persisted partitioned by cluster, probe is a partition-pruned read.
    * Built at most once per JVM per path (ivfBuildIndexCached) — a fresh
    * driver run always rebuilds, so the gate can't read stale state, but
    * the second query probing the same corpus in-session (x_ann_nn_join)
    * reuses the persisted index: the build-once / probe-many contract.
    * The k-means-refined variant stays recall-spec-tested in LlmSpec. */
  def xAnnIvf(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    val idxPath = artifactRoot + "/ivf_index/" + d.replaceAll("[^a-zA-Z0-9.]", "_")
    val seeds = Similarity.ivfBuildIndexCached(s, vecs, idxPath, nlist = 16)
    ordered(
      Similarity.ivfProbeIndex(s, idxPath, seeds,
        vecs.filter(col("vec_id") < 8), k = 10, nprobe = 4),
      "query_id", "rank")
  }

  /** IVF-PQ: the FAISS IndexIVFPQ composition — partition-pruned probe
    * (WHICH vectors) × PQ code scoring (WHAT bytes) × exact rerank,
    * over the same persisted index and codebook conventions as the
    * standalone x_ann_ivf / x_ann_pq gates, so the full composed
    * pipeline hash-matches its oracle. */
  def xAnnIvfPq(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    val idxPath = artifactRoot + "/ivf_index/" + d.replaceAll("[^a-zA-Z0-9.]", "_")
    val seeds = Similarity.ivfBuildIndexCached(s, vecs, idxPath, nlist = 16)
    ordered(
      Similarity.ivfPqTopK(s, vecs, idxPath, seeds,
        vecs.filter(col("vec_id") < 8), k = 10, nprobe = 4),
      "query_id", "rank")
  }

  /** ANN NN-join: EVERY vector finds its approximate nearest neighbor
    * through the persisted IVF index — probe rows join the cluster-keyed
    * index (no broadcast; both sides shuffle on cluster id), so the
    * quadratic all-pairs NN search becomes cluster-local work. This is
    * the 100 TB embedding-dedup pattern (the exact N² form stays as
    * x_dedup_embedding_nn's exactness gate); deterministic seeds make it
    * fully SQL-oracle-able, approximation included. */
  def xAnnNnJoin(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    val idxPath = artifactRoot + "/ivf_index/" + d.replaceAll("[^a-zA-Z0-9.]", "_")
    val seeds = Similarity.ivfBuildIndexCached(s, vecs, idxPath, nlist = 16)
    ordered(
      Similarity.ivfProbeIndex(s, idxPath, seeds, vecs, k = 1, nprobe = 4,
          broadcastProbes = false)
        .select(col("query_id").as("vec_id"), col("nn_id"), col("cos_sim")),
      "vec_id")
  }

  /** SemDeDup over the persisted IVF index: cluster-local cosine
    * pruning, one verdict row per vector (`Similarity.semDedup`). The
    * 0.4 threshold matches the synthetic embeddings' cosine range (max
    * pairwise ~0.5); real corpora use ~0.95. Reuses the same build-once
    * index as the ANN gates — the build-once / prune-and-probe-many
    * contract. */
  def xSemDedup(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    val idxPath = artifactRoot + "/ivf_index/" + d.replaceAll("[^a-zA-Z0-9.]", "_")
    Similarity.ivfBuildIndexCached(s, vecs, idxPath, nlist = 16)
    val assigned = s.read.parquet(idxPath)
      .select(col("vec_id"), col("cluster"), col("embedding"))
    ordered(Similarity.semDedup(assigned, threshold = 0.4), "vec_id")
  }

  /** Sketch-prefilter + exact-rerank ANN (Similarity.sketchRerankTopK):
    * the high-recall approximate path for corpora without cluster
    * structure. Fully oracled — the sketch pass (leading-48-component
    * cosine), candidate cut, and rerank are all exactly replicable in
    * SQL. */
  def xAnnSketch(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    ordered(
      Similarity.sketchRerankTopK(vecs, vecs.filter(col("vec_id") < 8), k = 10),
      "query_id", "rank")
  }

  /** Approximation quality, surfaced in the gate: per probe query,
    * recall@10 vs brute-force exact top-10 for BOTH approximate paths.
    * The ANN queries hash-match their approximate oracles (determinism),
    * but determinism alone would also pass for a useless index — this
    * query makes the driver see approximation quality itself.
    *
    *  - `ivf_nprobe4`: the served IVF configuration (x_ann_ivf). On the
    *    synthetic embeddings — isotropic random, avg pairwise cos ≈ 0.003,
    *    i.e. NO cluster structure — any partition-pruned method's recall
    *    is bounded by its scan fraction (nprobe/nlist = 0.25 here); the
    *    observed ≈0.5 is that bound plus the mild probe/assignment
    *    correlation. On clustered corpora the same config sits far left
    *    of this curve (LlmSpec's planted-cluster spec proves ≥ 0.9).
    *  - `sketch_rerank`: the sketch-prefilter + exact-rerank path, whose
    *    first pass touches every row (only the short sketch column) —
    *    the honest ≥ 0.9-recall configuration for unstructured data,
    *    asserted in-gate via LlmSpec at sf0.01. */
  def xAnnRecall(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    val probesDf = vecs.filter(col("vec_id") < 8)
    val idxPath = artifactRoot + "/ivf_index/" + d.replaceAll("[^a-zA-Z0-9.]", "_")
    val seeds = Similarity.ivfBuildIndexCached(s, vecs, idxPath, nlist = 16)
    val exact = xAnnTopk(s, d).select(col("query_id"), col("nn_id"))
    def recallOf(method: String, approx: DataFrame): DataFrame = {
      val hits = approx.select(col("query_id"), col("nn_id"))
        .join(exact, Seq("query_id", "nn_id"), "left_semi")
        .groupBy("query_id").agg(count(lit(1)).as("n_hits"))
      exact.select("query_id").distinct()
        .join(hits, Seq("query_id"), "left_outer")
        .select(col("query_id"), lit(method).as("method"),
          (coalesce(col("n_hits"), lit(0L)) / 10.0).as("recall_at_10"))
    }
    ordered(
      recallOf("ivf_nprobe4",
          Similarity.ivfProbeIndex(s, idxPath, seeds, probesDf, k = 10, nprobe = 4))
        .unionByName(recallOf("sketch_rerank",
          Similarity.sketchRerankTopK(vecs, probesDf, k = 10)))
        .unionByName(recallOf("int8_rerank",
          Similarity.quantizedRerankTopK(vecs, probesDf, k = 10))),
      "query_id", "method")
  }

  /** Dedup APPLIED: the near-dup pairs become an actual corpus filter —
    * the later (greater doc_id) member of every >=0.8 pair is dropped,
    * the canonical earlier one kept. One left-anti join against the
    * (small) removal set.
    *
    * Composed on the MinHash-LSH path (not the exact n-gram join): all
    * pair work stays inside LSH band buckets, so the composition is the
    * same plan you would run at 100 TB. The oracle replicates the full
    * banding scheme, so the hash-match covers the approximation too. */
  def xDedupApply(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val removed = lshPairs(s, d)
      .select(col("d2").as("doc_id")).distinct()
    ordered(
      docs.join(broadcast(removed), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_chars")),
      "doc_id")
  }

  /** Containment applied as a corpus filter: every contained document
    * (the excerpt / doc-inside-doc side) is dropped, the superset
    * stays. MUTUAL containment (A⊆B ∧ B⊆A — exact same gram set) would
    * remove both, so the lower-id side of a mutual pair is spared —
    * unless some OTHER pair condemns it non-mutually. The pair graph is
    * near-dup-density-sized, so the set algebra runs on the small pair
    * table and only the final anti-join touches the corpus. */
  def xContainApply(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    // the pair table is referenced four times by the set algebra below
    // (two self-join sides, except, distinct); materialize it once —
    // it is near-dup-density-sized, while its lineage is the full
    // gram-join pipeline, which would otherwise re-run per reference
    val pairs = Dedup.containmentPairs(docs, 3, 0.9)
      .select("d_sub", "d_super").localCheckpoint(true)
    val spared = pairs.as("a").join(pairs.as("b"),
        col("a.d_sub") === col("b.d_super") && col("a.d_super") === col("b.d_sub"),
        "left_semi")
      .filter(col("d_sub") < col("d_super"))
    val removed = pairs.except(spared).select(col("d_sub").as("doc_id")).distinct()
    ordered(
      docs.join(broadcast(removed), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("n_chars")),
      "doc_id")
  }

  /** The full training-corpus pipeline composed end-to-end: quality
    * filter -> language filter -> near-dup removal (MinHash-LSH, the
    * scale path — see xDedupApply). Each stage is one of the operators
    * above; this query proves they compose (and that the composition
    * still hash-matches an independent SQL rendering). */
  def xCorpusPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val scored = TextAnalysis.withLangId(
      TextAnalysis.withQuality(docs))
    val filtered = scored
      .filter(col("quality_score") >= 0.45 && col("lang_pred") === "en")
    val removed = lshPairs(s, d)
      .select(col("d2").as("doc_id")).distinct()
    ordered(
      filtered.join(broadcast(removed), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("quality_score"), col("n_tokens")),
      "doc_id")
  }

  /** Near-dup cluster RESOLUTION over the LSH pair artifact: connected
    * components collapse transitive chains (A~B~C is one cluster even
    * when A~C was never a pair), the component minimum is the canonical
    * doc. The step between pair discovery and corpus rewrite in any
    * dedup pipeline; oracled by a recursive-CTE transitive closure over
    * the identical banding-scheme pair set. */
  def xDedupClusters(s: SparkSession, d: String): DataFrame =
    ordered(ccClusters(s, d), "doc_id")

  /** Deterministic per-language downsampling (hash-threshold Bernoulli,
    * weight = 1/rate): en kept at 0.25, zh at 0.5, the rest untouched. */
  def xSampleStratified(s: SparkSession, d: String): DataFrame =
    ordered(
      Sampling.stratifiedSample(documents(s, d), "doc_id", "lang",
        Map("en" -> 0.25, "zh" -> 0.5), defaultRate = 1.0)
        .select(col("doc_id"), col("lang").as("stratum"),
          col("sample_rate"), col("sample_weight")),
      "doc_id")

  /** Deterministic train/val/test split on hash intervals (exact-binary
    * fractions so the cut points are literal-identical cross-engine). */
  def xSampleSplit(s: SparkSession, d: String): DataFrame =
    ordered(
      Sampling.deterministicSplit(documents(s, d), "doc_id",
        Seq("train" -> 0.75, "val" -> 0.125, "test" -> 0.125))
        .select(col("doc_id"), col("split")),
      "doc_id")

  /** Exact-count per-language sample: the 10 smallest-md5 docs per
    * stratum (deterministic reservoir equivalent; group top-n plan). */
  def xSampleTaken(s: SparkSession, d: String): DataFrame =
    ordered(
      Sampling.stratifiedTakeN(documents(s, d), "doc_id", "lang", 10)
        .select(col("doc_id"), col("lang").as("stratum"), col("sample_rank")),
      "doc_id")

  /** Temperature-flattened source mixture at a 140k-char budget (at
    * sf0.01 two sources cap at rate 1.0, the rest flatten toward the
    * small ones — both regimes of the `least` exercised in-gate). */
  def xSampleMixture(s: SparkSession, d: String): DataFrame =
    ordered(
      Sampling.temperatureMixture(documents(s, d), "doc_id", "source",
        "n_chars", budget = 140000L)
        .select(col("doc_id"), col("source"), col("sample_rate"),
          col("sample_weight")),
      "doc_id")

  /** RAG-prep document chunking: 400-char windows, 100-char overlap —
    * every char covered, consecutive chunks share 100; pure codegen
    * explode, chunks stay partition-local. */
  def xChunk(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.chunkDocuments(documents(s, d), "doc_id", size = 400, overlap = 100)
        .select(col("doc_id"), col("chunk_id"), col("char_off"), col("chunk")),
      "doc_id", "chunk_id")

  /** Adjacent-token co-occurrence with rational PMI (phrase-mining
    * statistics); min-count 3 prunes the tail before the joins. */
  def xTextCooccur(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.cooccurrence(documents(s, d), minCount = 3L),
      "w1", "w2")

  /** Inverted-index build: term -> exact df + first-32 posting list,
    * capped by the bounded TopKAgg buffer (map-side combine). */
  def xTextIndex(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.invertedIndex(documents(s, d), "doc_id", cap = 32),
      "term")

  /** Phrase search via the positional index: docs containing the exact
    * phrase "key scan" — postings pruned to the phrase's terms in one
    * tokenize pass, adjacency as (doc_id, pos−i) equi-joins (offset
    * normalization), per-doc hit count + first position. */
  def xSearchPhrase(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.phraseSearch(documents(s, d), Seq("key", "scan"))
        .select(col("doc_id"), col("n_hits"),
          col("first_pos").cast("long").as("first_pos")),
      "doc_id")

  /** Sorted-neighborhood near-dup pairs: block on the leading 4 key
    * chars, rank within block, compare ranks ≤4 apart — |corpus|·w
    * comparisons, no hot-gram candidate blow-up. */
  def xDedupSnm(s: SparkSession, d: String): DataFrame =
    ordered(
      Dedup.sortedNeighborhoodPairs(documents(s, d), window = 4,
        blockChars = 4, threshold = 0.7),
      "d1", "d2")

  /** Length-curriculum binning: 4 equal-population stages cut at exact
    * token-count quartiles (dyadic fractions over integral values =
    * bit-exact cuts), bin decided map-side. */
  def xSampleCurriculum(s: SparkSession, d: String): DataFrame = {
    val withToks = documents(s, d)
      .select(col("doc_id"), size(TextAnalysis.tokens(col("text"))).cast("long").as("n_toks"))
    ordered(
      Sampling.curriculumBins(withToks, "n_toks", numBins = 4)
        .select(col("doc_id"), col("n_toks"), col("bin")),
      "doc_id")
  }

  /** Quality-weighted Bernoulli downsampling: keep probability = the
    * document's quality score, decided by an INTEGER-exact hash test
    * (h32·1000 < round(q·1000)·2^32 — no double threshold), HT
    * sample_weight = 1/p. The "sample proportionally to quality"
    * curation step; map-side only. */
  def xSampleWeighted(s: SparkSession, d: String): DataFrame =
    ordered(
      Sampling.weightedSample(
        TextAnalysis.withQuality(documents(s, d)), "doc_id",
        col("quality_score"))
        .select(col("doc_id"), col("quality_score"), col("sample_weight")),
      "doc_id")

  /** Edit-distance-1 typo pairs over the corpus vocabulary —
    * `Dedup.typoPairs` (FastSS deletion-neighborhood blocking +
    * levenshtein verification). The oracle is the QUADRATIC all-pairs
    * levenshtein over the vocabulary — exactly the plan the blocking
    * exists to avoid — so the gate pins the recall-1 property of the
    * neighborhood construction, not just the plan's own output.
    * Driven by customer-name tokens (the synthetic documents corpus
    * has a 30-token vocabulary with no ed-1 pairs at all — a 0-row
    * gate would assert nothing): the zero-padded numeric name suffixes
    * are exactly the one-digit-apart regime entity resolution sees. */
  def xTypoPairs(s: SparkSession, d: String): DataFrame =
    ordered(
      Dedup.typoPairs(customer(s, d), col("c_name")),
      "w1", "w2")

  /** Systematic PPS sample — `Sampling.systematicPps`: 25 draws with
    * inclusion probability ∝ n_chars, deterministic points on the
    * cumulative weight line, distributed prefix sum underneath. The
    * oracle replays the identical arithmetic through a plain window
    * cumulative — the range-partitioned two-level rendering must
    * reproduce it exactly. */
  def xSamplePps(s: SparkSession, d: String): DataFrame =
    ordered(
      Sampling.systematicPps(
        documents(s, d).select(col("doc_id"), col("n_chars")),
        "doc_id", "n_chars", k = 25),
      "doc_id")

  /** Deterministic k examples per source — the curation-review sampler
    * (`Sampling.examplesPerGroup`): 8 uniform-ish docs per source via
    * the Knuth multiplicative hash rank, rendered as ONE TopKAgg hash
    * aggregate (O(k) buffer per group, no Window, no per-group sort).
    * The oracle replays the identical hash through a row_number window
    * — the window-free plan must reproduce the windowed semantics. */
  def xSampleExamples(s: SparkSession, d: String): DataFrame =
    ordered(
      Sampling.examplesPerGroup(documents(s, d), "source", "doc_id", k = 8),
      "source", "rank")

  /** Deterministic contrastive negatives: every embedding draws 4
    * hash-bucketed negatives from the corpus (32 buckets ≪ 500
    * candidates so none is empty). */
  def xNegatives(s: SparkSession, d: String): DataFrame = {
    val e = embeddings(s, d)
    ordered(
      Sampling.negativeSample(e, "vec_id", e, "vec_id", k = 4, buckets = 32),
      "anchor_id", "probe_idx")
  }

  /** The UNBOUNDED-domain scale face of the same ranking — identical
    * rows via `globalPercentRankUnbounded`'s range-partitioned
    * distributed prefix-sum (no single-partition cumulative), held to
    * the IDENTICAL oracle as `x_quality_rank`. */
  def xQualityRankScale(s: SparkSession, d: String): DataFrame =
    ordered(
      graft.operators.TableStats.globalPercentRankUnbounded(
        TextAnalysis.withQuality(documents(s, d))
          .select(col("doc_id"),
            expr("CAST(CAST(quality_score AS DECIMAL(18,6)) * 1000000 AS LONG)").as("q_ppm")),
        "q_ppm")
        .select(col("doc_id"), col("q_ppm"), col("rank_below"), col("pct_ppm")),
      "doc_id")

  /** Global exact quality percent-rank (threshold-free corpus cuts):
    * quality score quantized to ppm, ranked corpus-wide by the
    * distributed two-pass — per-value counts, value-bounded cumulative,
    * broadcast join back; no full-table global sort anywhere. */
  def xQualityRank(s: SparkSession, d: String): DataFrame =
    ordered(
      graft.operators.TableStats.globalPercentRank(
        TextAnalysis.withQuality(documents(s, d))
          .select(col("doc_id"),
            expr("CAST(CAST(quality_score AS DECIMAL(18,6)) * 1000000 AS LONG)").as("q_ppm")),
        "q_ppm")
        .select(col("doc_id"), col("q_ppm"), col("rank_below"), col("pct_ppm")),
      "doc_id")

  /** CCNet-style perplexity-bucket refinement — the composition the
    * CCNet pipeline actually runs: corpus-trained LM score per document
    * (`TextAnalysis.lmTypicality`, integer ppm), global percentile rank
    * over the quantized score (`TableStats.globalPercentRank` — the
    * single-partition window runs over the ≤10⁶-row distinct-value
    * table, never the corpus), tercile buckets tail/middle/head, then
    * deterministic per-bucket downsampling (head kept, middle halved,
    * tail 1/8 — binary-exact fractions, md5-hash Bernoulli, unbiased
    * 1/rate weights). Every stage is an already-gated operator; this
    * gate proves the composition end to end. */
  def xCcnetRefine(s: SparkSession, d: String): DataFrame = {
    // globalPercentRank traverses its input twice; the scored table is
    // the build-once lm_scores ARTIFACT (4 narrow columns on parquet) —
    // explicit intermediate, no .persist, so no cached table outlives
    // the query (round-7 finding) and the build cost is its own bench
    // line item shared with the other three LM-score consumers
    val scored = lmScores(s, d)
    val ranked = graft.operators.TableStats.globalPercentRank(scored, "typ_ppm")
    val bucketed = ranked.withColumn("bucket",
      when(col("pct_ppm") * 3 < 1000000L, "tail")
        .when(col("pct_ppm") * 3 < 2000000L, "middle")
        .otherwise("head"))
    ordered(
      Sampling.stratifiedSample(bucketed, "doc_id", "bucket",
        Map("head" -> 1.0, "middle" -> 0.5, "tail" -> 0.125))
        .select(col("doc_id"), col("bucket"), col("typ_ppm"),
          col("sample_rate"), col("sample_weight")),
      "doc_id")
  }

  /** DSIR importance weights (rational variant): every-7th doc plays
    * the trusted target set; one explode feeds both hashed-token
    * models; ratio table is bucket-bounded and broadcast. */
  def xDsirWeights(s: SparkSession, d: String): DataFrame =
    ordered(
      Sampling.dsirWeights(documents(s, d), "doc_id",
        pmod(col("doc_id"), lit(7)) === 0),
      "doc_id")

  /** Within-doc repetition metrics (Gopher-style quality signals):
    * duplicate 3-gram fraction + top-token share, pure map-side. */
  def xTextRepetition(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.withRepetition(documents(s, d))
        .select("doc_id", "n_tokens", "dup_gram_ratio", "top_token_ratio"),
      "doc_id")

  /** PII redaction over a synthesized contact string on the customer
    * table (the synthetic corpus has no real PII, so the gate builds a
    * deterministic one per row from customer fields): email, segmented
    * phone, and dotted-quad IP each replaced by a typed placeholder.
    * 1500 rows at sf0.01, every pattern firing on every row. */
  def xPiiRedact(s: SparkSession, d: String): DataFrame = {
    val contact = concat(
      col("c_name"), lit("@corp.example tel 42-555-"),
      lpad((col("c_custkey") % 1000).cast("string"), 3, "0"), lit("-"),
      lpad((col("c_custkey") % 10000).cast("string"), 4, "0"),
      lit(" host 10.0."), (col("c_custkey") % 23).cast("string"), lit(".7"))
    ordered(
      customer(s, d)
        .select(col("c_custkey"), contact.as("contact"))
        .withColumn("redacted", TextAnalysis.redactPii(col("contact"))),
      "c_custkey")
  }

  /** Deterministic corpus sharding: hash shard + in-shard rank — the
    * reproducible global-shuffle-for-training step, one hash exchange
    * then shard-local sorts. */
  def xSampleShard(s: SparkSession, d: String): DataFrame =
    ordered(
      Sampling.deterministicShard(documents(s, d), "doc_id", numShards = 8)
        .select("doc_id", "shard", "shard_pos"),
      "doc_id")

  /** The round-4 surface composed end-to-end — the full corpus ASSEMBLY
    * a training run needs, one plan: quality+language filter →
    * cluster-canonical near-dup removal (connected components over the
    * LSH pair artifact — the transitive upgrade of xDedupApply's
    * pairwise drop) → temperature-flattened mixture sampling with rates
    * computed on the SURVIVING corpus → deterministic sharding for
    * training order. Every stage is an oracled operator above; this
    * query proves they compose and stays bit-reproducible end-to-end. */
  def xCorpusAssembly(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    val filtered = TextAnalysis.withLangId(TextAnalysis.withQuality(docs))
      .filter(col("quality_score") >= 0.45 && col("lang_pred") === "en")
    val removed = ccClusters(s, d)
      .filter(col("is_canonical") === 0).select(col("doc_id"))
    val kept = filtered.join(broadcast(removed), Seq("doc_id"), "left_anti")
    val mixed = Sampling.temperatureMixture(kept, "doc_id", "source",
      "n_chars", budget = 30000L)
    ordered(
      Sampling.deterministicShard(mixed, "doc_id", numShards = 4)
        .select(col("doc_id"), col("source"), col("sample_weight"),
          col("shard"), col("shard_pos")),
      "doc_id")
  }

  /** Distinctive terms per doc: rational tf·N/df score (ln-free so the
    * oracle is bit-exact), top-3 per document. */
  def xTextTopterms(s: SparkSession, d: String): DataFrame =
    ordered(TextAnalysis.topTerms(documents(s, d), k = 3), "doc_id", "rank")

  /** BM25 relevance (rational-idf variant — see bm25Scores) of three
    * corpus-typical terms against every document: the ranking face of
    * full-text search. One corpus scan, two broadcast-sized stats. */
  def xTextBm25(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.bm25Scores(documents(s, d), bm25Terms),
      "term", "doc_id")

  private val bm25Terms = Seq("join", "scan", "vector")

  /** Multi-term BM25 retrieval: the top-25 documents by the SUMMED
    * score under the Lucene-standard `ln(1 + …)` idf over the three-term
    * query — a real log formula, not the per-term rational substitution
    * (see bm25TopK's determinism contract: everything but `ln` is
    * bit-identical cross-engine; the gate compares the doc RANKING and
    * leaves the float score out of the hash). */
  def xTextBm25TopK(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.bm25TopK(documents(s, d), bm25Terms, k = 25)
        .select(col("doc_id"), col("rank")),
      "rank")

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al. 2009,
    * the standard score-free fusion BM25+vector stacks use): the
    * three-term BM25 top-25 and query-0's brute-force cosine top-25
    * fused by Σ 1/(60 + rank) — rank arithmetic only, so the fusion is
    * bit-exact cross-engine even though BM25's own score has an `ln`
    * (both arms contribute their RANKING, which is what their gates
    * hash). Absent-from-a-list contributes 0 (rank recorded as 0). The
    * final ordering window is single-partition by construction over
    * ≤ 2k rows (the union of two top-k lists), never the corpus. */
  def xHybridRrf(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val text = TextAnalysis.bm25TopK(documents(s, d), bm25Terms, k = 25)
      .select(col("doc_id"), col("rank").as("rank_text"))
    val vecs = embeddings(s, d)
    val vec = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 25)
      .select(col("nn_id").as("doc_id"), col("rank").as("rank_vec"))
    val fused = text.join(vec, Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        coalesce(col("rank_text"), lit(0L)).as("rank_text"),
        coalesce(col("rank_vec"), lit(0L)).as("rank_vec"))
      .withColumn("rrf",
        when(col("rank_text") > 0, lit(1.0) / (lit(60.0) + col("rank_text")))
          .otherwise(lit(0.0)) +
        when(col("rank_vec") > 0, lit(1.0) / (lit(60.0) + col("rank_vec")))
          .otherwise(lit(0.0)))
    val w = Window.orderBy(col("rrf").desc, col("doc_id"))
    ordered(
      fused.withColumn("rank", row_number().over(w).cast("long"))
        .select("rank", "doc_id", "rank_text", "rank_vec", "rrf"),
      "rank")
  }

  /** Per-document n-gram novelty: the fraction (integer ppm) of a doc's
    * distinct 3-grams appearing NOWHERE else in the corpus — the
    * corpus-uniqueness signal memorization/contamination analyses rank
    * by (low novelty = boilerplate or near-copy, high = unique
    * content). One gram build, one bounded df aggregate joined back on
    * the gram key, one per-doc aggregate; integer arithmetic end to
    * end. */
  def xTextNovelty(s: SparkSession, d: String): DataFrame = {
    val g = Dedup.shingles(documents(s, d), 3)
    val df = g.groupBy("gram").agg(count(lit(1)).as("__df"))
    ordered(
      g.join(df, Seq("gram"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("__df") === 1L, 1L).otherwise(0L)).as("novel_ct"))
        .withColumn("novelty_ppm",
          expr("novel_ct * 1000000L div n_grams")),
      "doc_id")
  }

  /** Corpus card: the per-(language, quality-decile) inventory a corpus
    * release publishes — doc counts, token sums, char sums per cell. One
    * composed scan (langid + quality both map-side), one aggregate over
    * the languages × 10 bounded cell grid. The decile cut goes through
    * DECIMAL(18,6) before ×10/floor so no float boundary can flip a
    * bucket cross-engine (the xQualityRank quantization pattern). */
  def xCorpusCard(s: SparkSession, d: String): DataFrame = {
    val scored = TextAnalysis.withLangId(TextAnalysis.withQuality(documents(s, d)))
    ordered(
      scored
        .withColumn("q_decile", least(lit(9L),
          floor(expr("CAST(quality_score AS DECIMAL(18,6)) * 10")).cast("long")))
        .groupBy(col("lang_pred"), col("q_decile"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("n_tokens"),
          sum(col("n_chars")).as("n_chars")),
      "lang_pred", "q_decile")
  }

  /** Text canonicalization via the native NFC Catalyst expression +
    * lower + whitespace collapse. The appended suffix carries a
    * decomposed accent (e + U+0301), uppercase non-ASCII, and ragged
    * whitespace so the normalization is exercised on every row even
    * over an all-ASCII corpus. */
  def xTextNormalize(s: SparkSession, d: String): DataFrame =
    ordered(
      documents(s, d).select(col("doc_id"),
        TextAnalysis.normalizeText(
          concat(col("text"), lit(normSuffix))).as("text_norm")),
      "doc_id")

  // "Cafe" + COMBINING ACUTE (U+0301), decomposed — NFC must compose it
  private val normSuffix = "  Café   ÜBER   "

  /** GPT-style sequence packing: the corpus laid out as fixed
    * 512-token sequences in deterministic shard order — documents
    * spill across sequence boundaries, nothing padded or dropped.
    * Per-shard window after one hash exchange; no global prefix sum. */
  def xPackSequences(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).withColumn("n_toks",
      size(TextAnalysis.tokens(col("text"))).cast("long"))
    ordered(
      Sampling.packSequences(docs, "doc_id", "n_toks",
        budget = 512L, numShards = 8)
        .select("doc_id", "shard", "shard_pos", "n_toks",
          "start_off", "seq_id", "seq_off"),
      "doc_id")
  }

  /** Decontamination: training docs sharing >=5 distinct 3-grams with
    * any doc of the pseudo-eval set (doc_id < 100 — the vec_id<8 probe
    * pattern, sized so several planted near-dups land in the eval set).
    * The >=5 cut sits in the measured gap between random vocab
    * collisions (<=4 shared grams at sf0.01) and true contamination
    * (81 shared). Eval grams broadcast; the corpus never shuffles. */
  def xDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d)
    ordered(
      Dedup.contamination(docs, docs.filter(col("doc_id") < 100),
        n = 3, minOverlap = 5),
      "doc_id", "eval_id")
  }

  /** Int8-quantized ANN: candidate pass on integer dot products over the
    * 4×-smaller codes (exactly oracle-able — integer arithmetic), exact
    * rerank of the survivors. The memory-bound regime's search path. */
  def xAnnQuantized(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    ordered(
      Similarity.quantizedRerankTopK(vecs, vecs.filter(col("vec_id") < 8), k = 10),
      "query_id", "rank")
  }

  /** Quality-aware cluster canonicalization — near-dup clusters keep
    * their LONGEST member (n_chars desc, doc_id tie-break) instead of
    * the lowest id: the RefinedWeb/CCNet convention, on the argument
    * that the longest copy of a syndicated page is the least-truncated
    * one. Composition over the cc_clusters artifact.
    *
    * Plan, sized for 100 TB: the cluster table is pair-graph-sized
    * (tiny next to the corpus), so the winner window runs ONLY over
    * the clustered rows (inner join), never the corpus — unclustered
    * docs are kept by definition and ride a broadcast anti-join; the
    * corpus itself is scanned twice but never shuffled or sorted. */
  def xDedupKeepLongest(s: SparkSession, d: String): DataFrame = {
    val docs = documents(s, d).select(col("doc_id"), col("n_chars"))
    val cl = ccClusters(s, d).select(col("doc_id"), col("cluster_id"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("cluster_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val clustered = docs.join(broadcast(cl), Seq("doc_id"))
      .withColumn("kept", (row_number().over(w) === 1).cast("int"))
    val loners = docs.join(broadcast(cl), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"),
        col("n_chars"), lit(1).as("kept"))
    ordered(clustered.select("doc_id", "cluster_id", "n_chars", "kept")
      .unionByName(loners), "doc_id")
  }

  /** Vocabulary-coverage audit: the Zipf-curve summary (top-k type
    * coverage in ppm + total/vocab/hapax counts) over the shared word
    * tokenizer — corpus-report surface, integer end to end. */
  def xVocabCoverage(s: SparkSession, d: String): DataFrame =
    ordered(TextAnalysis.vocabCoverage(documents(s, d)), "k")

  /** Lexical-diversity audit: per-source Gini–Simpson index (1 − Σp²,
    * the probability two independently drawn tokens differ) over the
    * shared word tokenizer, plus token/vocab counts — the corpus-report
    * companion to the Zipf coverage curve: low diversity = template
    * spam, high = organic text. Integer end to end: the index renders
    * in parts-per-10⁴ as (N²−Σct²)·10⁴ div N², exact in int64 for
    * N ≤ 3·10⁷ tokens per source (ppm would overflow at the 10× probe —
    * precision traded for headroom, documented); per-source because a
    * mixed-corpus number hides which source is the degenerate one. One
    * tokenize pass, one (source, tok) aggregate, one |sources|-row
    * aggregate. */
  def xDiversity(s: SparkSession, d: String): DataFrame = {
    val tf = documents(s, d)
      .select(col("source"), explode(TextAnalysis.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("ct"))
    ordered(
      tf.groupBy(col("source"))
        .agg(sum(col("ct")).as("n_tokens"),
          count(lit(1)).as("vocab_size"),
          sum(col("ct") * col("ct")).as("__sumsq"))
        .select(col("source"), col("n_tokens"), col("vocab_size"),
          expr("(n_tokens * n_tokens - __sumsq) * 10000" +
            " div (n_tokens * n_tokens)").as("gini_simpson_pp10k")),
      "source")
  }

  /** Product-quantization ANN: the 64×-compression search path — 8
    * nibble codes per 64-dim vector, symmetric-distance candidate pass
    * via the precomputed per-subspace lookup table, exact cosine
    * rerank. Every candidate-pass number is an integer (codebooks over
    * the int8 q8 codes, lowest-id seed convention), so the FULL
    * approximate pipeline — codebook build, encode argmin, SDC top-75,
    * rerank — is replicated in the DuckDB oracle and hash-matched, not
    * just the reranked tail. */
  def xAnnPq(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    ordered(
      Similarity.pqRerankTopK(vecs, vecs.filter(col("vec_id") < 8), k = 10),
      "query_id", "rank")
  }

  /** Cosine-LSH (signed-random-projection) 16-bit signature per
    * embedding — the bucketing candidate generator for embedding dedup
    * at scale. The ±1 projection matrix is generated deterministically
    * at plan time and embedded as literals on BOTH sides, so the fold
    * is bit-exact cross-engine. */
  def xEmbedLsh(s: SparkSession, d: String): DataFrame =
    ordered(
      // dim pinned to the oracle's hardcoded 64: a testdata drift breaks
      // loudly at run time instead of hashing with a different matrix
      Similarity.withCosineLshSignature(embeddings(s, d), dim = 64)
        .select("vec_id", "lsh_sig"),
      "vec_id")

  /** Embedding norm + int8 quantization (map-side; csv-of-ints output
    * keeps the comparison integer-exact). */
  def xEmbedQuantize(s: SparkSession, d: String): DataFrame =
    ordered(
      Similarity.normalizeQuantize(embeddings(s, d))
        .select("vec_id", "l2_norm", "qscale", "q8_csv"),
      "vec_id")

  /** Per-label quantized centroid accumulators (`Similarity
    * .quantizedCentroids`): element-wise int64 code sums + counts —
    * integer-exact, full SQL oracle. */
  def xEmbedCentroid(s: SparkSession, d: String): DataFrame =
    ordered(
      Similarity.quantizedCentroids(embeddings(s, d), "label")
        .select(col("label").cast("long").as("label"), col("ct"), col("sum_csv")),
      "label")

  /** K-means assignment over int8 codes, k=4 lowest-id seeds — the
    * integer argmin is map-side over one broadcast seed row. */
  def xKmeansAssign(s: SparkSession, d: String): DataFrame =
    ordered(
      Similarity.kmeansAssign(embeddings(s, d), "vec_id", k = 4),
      "vec_id")

  /** Embedding outlier pruning — the curation step that drops vectors
    * far from their cluster's center (mislabeled / corrupted / OOD
    * points): each cluster's top ~10% by EXACT integer distance-to-
    * centroid (ceil(ct/10) in integer math, dist2-desc with vec_id
    * tie-break, so no float threshold anywhere) is flagged. One
    * map-side assign pass + one cluster-keyed window. */
  def xEmbedOutliers(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("cluster_id"))
      .orderBy(col("dist2").desc, col("vec_id").desc)
    val cw = Window.partitionBy(col("cluster_id"))
    ordered(
      Similarity.kmeansAssign(embeddings(s, d), "vec_id", k = 4)
        .withColumn("__rn", row_number().over(w))
        .withColumn("__ct", count(lit(1)).over(cw))
        .select(col("vec_id"), col("cluster_id"), col("dist2"),
          when(col("__rn") <= expr("(__ct + 9) div 10"), 1L)
            .otherwise(0L).as("is_outlier")),
      "vec_id")
  }

  /** One full Lloyd step: assign + integer centroid refresh. */
  def xKmeansStep(s: SparkSession, d: String): DataFrame =
    ordered(
      Similarity.kmeansStep(embeddings(s, d), "vec_id", k = 4)
        .select(col("cluster_id").cast("long").as("cluster_id"),
          col("ct"), col("sum_csv")),
      "cluster_id")

  def xMultimodal(s: SparkSession, d: String): DataFrame =
    ordered(
      Multimodal.extractFeatures(s, Multimodal.withPayload(documents(s, d))).toDF(),
      "doc_id")

  /** Real container-header metadata: deterministic PNG/GIF/WAV/JPEG
    * payloads built from doc_id arithmetic, then parsed BACK through
    * `functions/BinaryMeta`'s codegen'd byte-layout parsers — the gate
    * fails if either the construction or the parse deviates from the
    * public format specs. The oracle regenerates the ground truth
    * arithmetically (it never sees the bytes), so parse and
    * construction cannot share a bug. Pure map-side; payloads never
    * shuffle. */
  def xMultimodalMeta(s: SparkSession, d: String): DataFrame =
    ordered(
      Multimodal.describeMedia(
        Multimodal.syntheticContainers(documents(s, d)))
        .select(col("doc_id"), col("fmt"), col("width"), col("height"),
          col("sample_rate"), col("channels")),
      "doc_id")

  /** REAL PCM-16 audio decode: deterministic WAV payloads whose sample
    * values derive from doc_id arithmetic are decoded back through
    * `BinaryMeta.wavPcmStats` (actual little-endian byte parse) while
    * the oracle regenerates the values arithmetically — loudness/
    * clipping stats (n, peak, Σ|s|, Σs²) exact in int64. The decode
    * stub boundary now covers COMPRESSED codecs only. */
  def xWavPcm(s: SparkSession, d: String): DataFrame = {
    val stats = graft.functions.BinaryMeta.wavPcmStatsCol(col("payload"))
    ordered(
      Multimodal.syntheticWavPcm(documents(s, d))
        .select(col("doc_id"),
          element_at(stats, 1).as("n_samples"),
          element_at(stats, 2).as("peak"),
          element_at(stats, 3).as("sum_abs"),
          element_at(stats, 4).as("sum_sq")),
      "doc_id")
  }

  /** REAL FLAC decode: deterministic complete-FLAC payloads (mono
    * 16-bit, one 16-sample fixed-order-0 frame, Rice-coded residuals —
    * `Multimodal.syntheticFlacPcm`) pulled back through
    * `BinaryMeta.flacPcmStats`' actual bit reader: unary quotients,
    * zigzag unfolding, header CRC-8 and frame CRC-16 verification all
    * on the real entropy-coded stream. The oracle regenerates the
    * sample values arithmetically (it never sees bytes). With this the
    * audio stub boundary is perceptual/lossy codecs only — FLAC is
    * lossless integer prediction, so decode is exact in int64. LPC,
    * partitions, nonzero quotients and stereo decorrelation are
    * spec-covered by FlacDecodeSpec's encoder (not SQL-buildable). */
  def xFlacPcm(s: SparkSession, d: String): DataFrame = {
    val stats = graft.functions.BinaryMeta.flacPcmStatsCol(col("payload"))
    ordered(
      Multimodal.syntheticFlacPcm(documents(s, d))
        .select(col("doc_id"),
          element_at(stats, 1).as("n_samples"),
          element_at(stats, 2).as("peak"),
          element_at(stats, 3).as("sum_abs"),
          element_at(stats, 4).as("sum_sq")),
      "doc_id")
  }

  /** Container-metadata tier 2 — WebP (VP8 lossy key frame AND VP8L
    * lossless signatures, alternating per doc), TIFF IFD0 walk (both
    * byte orders supported; fixture is II), and Ogg/Opus with REAL
    * page CRCs verified on the decode path. Oracles restate all
    * fields arithmetically. */
  def xWebpMeta(s: SparkSession, d: String): DataFrame = {
    val m = graft.functions.BinaryMeta.webpMetaCol(col("payload"))
    ordered(
      Multimodal.syntheticWebp(documents(s, d))
        .select(col("doc_id"),
          element_at(m, 1).as("width"), element_at(m, 2).as("height"),
          element_at(m, 3).as("lossless"), element_at(m, 4).as("extended")),
      "doc_id")
  }

  def xTiffMeta(s: SparkSession, d: String): DataFrame = {
    val m = graft.functions.BinaryMeta.tiffMetaCol(col("payload"))
    ordered(
      Multimodal.syntheticTiff(documents(s, d))
        .select(col("doc_id"),
          element_at(m, 1).as("width"), element_at(m, 2).as("height"),
          element_at(m, 3).as("samples"), element_at(m, 4).as("compression")),
      "doc_id")
  }

  /** JPEG EXIF gate — a SQL-built JPEG whose APP1 carries a real
    * big-endian TIFF structure: IFD0 with Make/Model/Orientation/
    * DateTime (ASCII values at hand-computed TIFF-relative offsets,
    * orientation inline SHORT) and the Exif sub-IFD pointer whose
    * DateTimeOriginal is the capture timestamp. All structural bytes
    * are plan-time hex constants (fields fixed-width); the oracle
    * restates every field arithmetically. Orientation 1–8 rotates per
    * doc — the one EXIF field image pipelines MUST read before any
    * pixel op. */
  def xExifMeta(s: SparkSession, d: String): DataFrame = {
    def hxb(h: String): Array[Byte] = h.replaceAll("\\s", "")
      .sliding(2, 2).map(Integer.parseInt(_, 16).toByte).toArray
    val bin = org.apache.spark.sql.types.BinaryType
    def asc(c: org.apache.spark.sql.Column) = c.cast(bin)
    // TIFF layout (big-endian; offsets TIFF-relative, hand-computed,
    // spec-pinned in ContainerMetaSpec): IFD0@8 (5 entries), values
    // Make@74(9) Model@83(5) DateTime@88(20), sub-IFD@108 (1 entry),
    // DateTimeOriginal@126(20); TIFF total 146, APP1 len 154 = 0x9A
    val orient = unhex(concat(lit("0"),
      (pmod(col("doc_id"), lit(8L)) + 1).cast("string")))
    val payload = concat(
      lit(hxb("FFD8 FFE1 009A 457869660000")), // SOI, APP1, "Exif\0\0"
      lit(hxb("4D4D002A 00000008 0005")),      // MM 42, IFD0@8, 5 entries
      lit(hxb("010F 0002 00000009 0000004A")), // Make -> @74
      lit(hxb("0110 0002 00000005 00000053")), // Model -> @83
      lit(hxb("0112 0003 00000001 00")), orient, lit(hxb("0000")),
      lit(hxb("0132 0002 00000014 00000058")), // DateTime -> @88
      lit(hxb("8769 0004 00000001 0000006C")), // ExifIFD -> @108
      lit(hxb("00000000")),                    // next IFD: none
      asc(lit("GraftCam")), lit(hxb("00")),
      asc(concat(lit("M-"),
        lpad(pmod(col("doc_id"), lit(100L)).cast("string"), 2, "0"))),
      lit(hxb("00")),
      asc(concat(lit("2024:03:1"), pmod(col("doc_id"), lit(10L)),
        lit(" 12:34:5"), pmod(col("doc_id"), lit(6L)))), lit(hxb("00")),
      lit(hxb("0001 9003 0002 00000014 0000007E 00000000")), // sub-IFD
      asc(concat(lit("2020:06:2"), pmod(col("doc_id"), lit(10L)),
        lit(" 08:00:0"), pmod(col("doc_id"), lit(7L)))), lit(hxb("00")),
      lit(hxb("FFD9")))
    val m = graft.functions.BinaryMeta.exifMetaCol(col("payload"))
    ordered(
      documents(s, d).select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"),
          m.getField("orientation").as("orientation"),
          m.getField("make").as("make"),
          m.getField("model").as("model"),
          m.getField("datetime").as("datetime"),
          m.getField("datetime_original").as("datetime_original")),
      "doc_id")
  }

  def xOggMeta(s: SparkSession, d: String): DataFrame = {
    val m = graft.functions.BinaryMeta.oggMetaCol(col("payload"))
    ordered(
      Multimodal.syntheticOggOpus(documents(s, d))
        .select(col("doc_id"),
          element_at(m, 1).as("codec"), element_at(m, 2).as("channels"),
          element_at(m, 3).as("rate"), element_at(m, 4).as("granule")),
      "doc_id")
  }

  /** REAL ZIP archive walk: SQL-built two-entry STORED archives with
    * real fold-computed CRC-32s (`Multimodal.syntheticZip`) are opened
    * back through `Archive.zipEntries`' actual EOCD/central-directory
    * walk — names, sizes and the extracted bytes must round-trip (the
    * CRC verify is on the decode path, so a parse that slices wrong
    * bytes nulls the data and hash-mismatches). The oracle restates
    * every field arithmetically. DEFLATE members and decline contracts
    * are ArchiveSpec's ZipOutputStream round-trip (not SQL-buildable). */
  def xZipEntries(s: SparkSession, d: String): DataFrame = {
    val e = graft.functions.Archive.zipEntriesCol(col("payload"))
    Multimodal.syntheticZip(documents(s, d))
      .select(col("doc_id"), posexplode(e))
      .select(col("doc_id"),
        col("pos").cast("long").as("entry_idx"),
        col("col.name").as("name"),
        col("col.method").cast("long").as("method"),
        col("col.usize").as("usize"),
        col("col.data").cast("string").as("text"))
      .orderBy("doc_id", "entry_idx")
  }

  /** STRICT UTF-8 validation + repair: fixture payloads plant
    * doc_id-determined defects (doc_id%3 stray 0xFF bytes mid-text and,
    * on odd docs, a truncated multibyte lead at EOF) around a genuine
    * multibyte char — `Utf8Ops.utf8Scan` must count exactly the
    * invalid BYTES and replace each with U+FFFD while passing the
    * valid sequence through. The oracle restates validity, count and
    * the repaired text arithmetically. Overlongs/surrogates/>U+10FFFF
    * are Utf8OpsSpec's (not SQL-buildable portably). */
  def xUtf8Scan(s: SparkSession, d: String): DataFrame = {
    val k1 = pmod(col("doc_id"), lit(3L)).cast("int")
    val k2 = pmod(col("doc_id"), lit(2L)).cast("int")
    val payload = unhex(concat(
      hex(encode(concat(lit("doc "), col("doc_id"), lit(" caf")), "UTF-8")),
      repeat(lit("FF"), k1),
      lit("C3A9"), // é — the valid multibyte survivor
      when(k2 === 1, lit("C3")).otherwise(lit("")))) // truncated lead
    val scan = graft.functions.Utf8Ops.utf8ScanCol(payload)
    ordered(
      documents(s, d).select(col("doc_id"), scan.as("u"))
        .select(col("doc_id"),
          col("u.is_valid").as("is_valid"),
          col("u.n_invalid").cast("long").as("n_invalid"),
          col("u.text").as("text")),
      "doc_id")
  }

  /** Mojibake repair: the fixture DOUBLE-ENCODES real text in SQL
    * (UTF-8 bytes re-read as Latin-1 — Spark's own encode/decode), and
    * `Utf8Ops.fixMojibake` must reverse it exactly; a genuinely
    * accented string ("naïve") must pass through UNTOUCHED (its
    * cp1252 re-encoding is not valid UTF-8). The oracle rebuilds both
    * sides with chr() arithmetic. Accents draw from U+00E0-U+00EF so
    * the mojibake bytes stay out of the cp1252/Latin-1 divergence. */
  def xMojibake(s: SparkSession, d: String): DataFrame = {
    val accent = chr(pmod(col("doc_id"), lit(16L)) + 224L)
    val original = concat(lit("caf"), accent, lit(" id "), col("doc_id"))
    val garbled = decode(encode(original, "UTF-8"), "ISO-8859-1")
    val genuine = concat(lit("na"), chr(lit(239)), lit("ve "), col("doc_id"))
    ordered(
      documents(s, d).select(col("doc_id"),
        graft.functions.Utf8Ops.fixMojibakeCol(garbled).as("repaired"),
        graft.functions.Utf8Ops.fixMojibakeCol(genuine).as("untouched")),
      "doc_id")
  }

  /** MIME multipart walk + transfer decode: SQL-built two-part EMLs
    * (`Multimodal.syntheticEml` — quoted-printable and base64 bodies,
    * a Content-Disposition filename) pulled back through
    * `Mime.mimeParts`' actual boundary walk and decoders; the oracle
    * restates only decoded values (it never sees the encodings).
    * Nested multiparts, folded headers and charset fallbacks are
    * MimeSpec's. */
  def xMimeParts(s: SparkSession, d: String): DataFrame = {
    val parts = graft.functions.Mime.mimePartsCol(col("payload"))
    Multimodal.syntheticEml(documents(s, d))
      .select(col("doc_id"), posexplode(parts))
      .select(col("doc_id"),
        col("pos").cast("long").as("part_idx"),
        col("col.content_type").as("content_type"),
        col("col.charset").as("charset"),
        col("col.filename").as("filename"),
        col("col.text").as("text"))
      .orderBy("doc_id", "part_idx")
  }

  /** RFC 5322 headers + RFC 2047 encoded-word decode over the same
    * fixtures: the B-encoded Subject must come back as the original
    * accented text. */
  def xEmailHeaders(s: SparkSession, d: String): DataFrame = {
    val h = graft.functions.Mime.emailHeadersCol(col("payload"))
    ordered(
      Multimodal.syntheticEml(documents(s, d))
        .select(col("doc_id"),
          h.getField("from").as("from_addr"),
          h.getField("to").as("to_addr"),
          h.getField("subject").as("subject"),
          h.getField("message_id").as("message_id")),
      "doc_id")
  }

  /** mbox mailbox framing → per-message header parse: SQL-built
    * two-message mboxes (RFC 4155 postmarks, a `>From ` escape in the
    * body) split through `Mime.mboxMessages`, each message's headers
    * through `Mime.emailHeaders` — subject/from restated by the
    * oracle. */
  def xMbox(s: SparkSession, d: String): DataFrame = {
    def msg(k: Int) = concat(
      lit(s"From alice@example.com Mon Jan  1 00:00:00 2024\n" +
        s"Subject: m$k doc "), col("doc_id"),
      lit(s"\nFrom: a$k@example.com\n\nbody $k\n>From escaped\n"))
    val mbox = encode(concat(msg(0), msg(1)), "UTF-8")
    val msgs = graft.functions.Mime.mboxMessagesCol(mbox)
    val h = graft.functions.Mime.emailHeadersCol(col("msg"))
    documents(s, d)
      .select(col("doc_id"), posexplode(msgs).as(Seq("msg_idx", "msg")))
      .select(col("doc_id"), col("msg_idx").cast("long").as("msg_idx"),
        h.getField("subject").as("subject"),
        h.getField("from").as("from_addr"),
        col("msg").cast("string").contains("\nFrom escaped\n")
          .as("unescaped"))
      .orderBy("doc_id", "msg_idx")
  }

  /** Markdown → plain text (quality-scoring/shingling face): the
    * fixture composes headings, emphasis, links, inline code, lists, a
    * dropped fence and a blockquote around doc_id-derived tokens; the
    * oracle restates the expected PROSE verbatim. */
  def xMarkdownText(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val md = concat(
      lit("# Title "), id,
      lit("\n\nIntro **bold"), id, lit("** and [link text "), id,
      lit("](http://x.example/p) plus `code"), id, lit("`.\n\n- item one\n"),
      lit("- item two "), id,
      lit("\n\n```\ndef dropme(): pass\n```\n\n> quoted line "), id,
      lit("\n"))
    ordered(
      documents(s, d).select(col("doc_id"),
        TextAnalysis.markdownToText(md).as("text")),
      "doc_id")
  }

  /** Streaming ARCHIVE ingest driven end to end: batch 0 delivers tar
    * drops, batch 1 zip drops whose second entry REPEATS a tar entry's
    * bytes (content-hash dedup must catch it across batches AND across
    * container formats), then batch 1 REPLAYS and must change nothing —
    * the gate output is the post-replay docs artifact, so any
    * duplicate row hash-mismatches. Content is unique per (doc, slot)
    * so the oracle stays arithmetic. */
  def xArchiveIngest(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("arch_ingest").toString
    val seeds = documents(s, d)
      .filter(pmod(col("doc_id"), lit(50L)) === 0).select(col("doc_id"))
    def content(k: Int) =
      rpad(concat(lit("doc "), col("doc_id"), lit(s" k$k")), 16, ".")
    val b0 = Multimodal.syntheticTar(seeds, Some(content _)) // slots 1, 2
    val b1 = Multimodal.syntheticZip(seeds, Some(content _)) // slots 0, 1 (1 = dup)
    val ingest = graft.streaming.CorpusIngest.archiveIngestBatch(dir) _
    ingest(b0, 0L)
    ingest(b1, 1L)
    ingest(b1, 1L) // replayed epoch: must be a no-op
    ordered(
      s.read.parquet(s"$dir/docs")
        .select(col("doc_id"), col("batch_id").cast("long").as("batch_id"),
          col("entry_idx"), col("name"), col("text"), col("utf8_valid")),
      "doc_id", "batch_id", "entry_idx")
  }

  /** HTML table extraction: a two-table page (3×2 with a header row +
    * a 1×1 with markup inside the cell) per doc; one output row per
    * cell, oracle restates coordinates and text arithmetically. */
  def xHtmlTables(s: SparkSession, d: String): DataFrame = {
    val html = concat(
      lit("<p>prose</p><table><tr><th>k</th><th>v</th></tr>" +
        "<tr><td>id</td><td>"), col("doc_id"),
      lit("</td></tr><tr><td>twice</td><td>"), col("doc_id") * 2,
      lit("</td></tr></table><div><table><tr><td> <b>doc</b>\n"),
      col("doc_id"), lit(" </td></tr></table></div>"))
    TextAnalysis.htmlTables(
      documents(s, d).select(col("doc_id"), html.as("html")))
      .orderBy("doc_id", "table_idx", "row_idx", "col_idx")
  }

  /** Almost-JSON repair: the fixture is the classic LLM-output mess —
    * single quotes, unquoted keys, Python literals, a trailing comma,
    * a // comment, a missing closer — and the gate both restates the
    * repaired string AND parses it with Spark's own get_json_object
    * (proof the result is real JSON, not just prettier garbage). */
  def xJsonRepair(s: SparkSession, d: String): DataFrame = {
    val broken = concat(
      lit("{name: 'doc "), col("doc_id"),
      lit("', ok: True, tags: ['a', 'b',], // c\n n: "), col("doc_id"),
      lit(", inf: Infinity"))
    val repaired = graft.functions.JsonRepair.jsonRepairCol(broken)
    ordered(
      documents(s, d).select(col("doc_id"),
        repaired.as("repaired"),
        get_json_object(repaired, "$.name").as("name"),
        get_json_object(repaired, "$.n").as("n")),
      "doc_id")
  }

  /** Encoding sniff + sniffed decode: per-doc payloads rotate through
    * UTF-8-BOM / UTF-16LE-BOM / UTF-16BE-BOM / plain UTF-8 (accented)
    * / Latin-1-invalid-as-UTF-8 — the label AND the decoded text must
    * round-trip (BOM stripped, UTF-16 both orders, the cp1252
    * fallback); Spark's own encode() builds the byte forms, the
    * oracle restates only decoded values. */
  def xEncodingSniff(s: SparkSession, d: String): DataFrame = {
    val accent = chr(pmod(col("doc_id"), lit(16L)) + 224L)
    val text = concat(lit("enc caf"), accent, lit(" "), col("doc_id"))
    val m = pmod(col("doc_id"), lit(5L))
    val payload =
      when(m === 0, concat(unhex(lit("EFBBBF")), encode(text, "UTF-8")))
        .when(m === 1, concat(unhex(lit("FFFE")), encode(text, "UTF-16LE")))
        .when(m === 2, concat(unhex(lit("FEFF")), encode(text, "UTF-16BE")))
        .when(m === 3, encode(text, "UTF-8"))
        .otherwise(encode(text, "ISO-8859-1")) // é alone: invalid UTF-8
    ordered(
      documents(s, d).select(col("doc_id"),
        graft.functions.Utf8Ops.sniffEncodingCol(payload).as("encoding"),
        graft.functions.Utf8Ops.decodeSniffedCol(payload).as("text")),
      "doc_id")
  }

  /** CSV dialect sniffing: per-doc files alternate all four candidate
    * delimiters, carry a quoted field EMBEDDING the other delimiters
    * (the quote walk must not count them), and flip header presence by
    * parity — delimiter, column count and header flag all restated. */
  def xCsvSniff(s: SparkSession, d: String): DataFrame = {
    val delim = element_at(
      typedLit(Seq(",", ";", "\t", "|")),
      pmod(col("doc_id"), lit(4L)).cast("int") + 1)
    val header = concat(lit("name"), delim, lit("score"), delim, lit("id"))
    val row1 = concat(lit("\"a,;\t|b\""), delim, lit("1.5"), delim,
      col("doc_id"))
    val row2 = concat(lit("beta"), delim, lit("2"), delim,
      col("doc_id") * 2)
    val csv = when(pmod(col("doc_id"), lit(2L)) === 0,
      concat(header, lit("\n"), row1, lit("\n"), row2))
      .otherwise(concat(row1, lit("\n"), row2))
    val sn = graft.functions.CsvSniff.csvSniffCol(csv)
    ordered(
      documents(s, d).select(col("doc_id"),
        sn.getField("delimiter").as("delimiter"),
        sn.getField("n_cols").cast("long").as("n_cols"),
        sn.getField("has_header").as("has_header")),
      "doc_id")
  }

  /** Rule-based sentence segmentation: the fixture plants the classic
    * traps — an abbreviation (Dr.), a decimal (3.14), a digit-period
    * sentence end (Jan 5.), a masked No. before a number, ! and ?
    * terminators — and the oracle restates the exact 4-sentence split. */
  def xSentences(s: SparkSession, d: String): DataFrame = {
    val text = concat(
      lit("Dr. Smith paid 3.14 on Jan 5. He left early! Was No. "),
      col("doc_id"), lit(" next? Yes."))
    documents(s, d)
      .select(col("doc_id"),
        posexplode(TextAnalysis.sentenceSplit(text))
          .as(Seq("sent_idx", "sentence")))
      .select(col("doc_id"), col("sent_idx").cast("long").as("sent_idx"),
        col("sentence"))
      .orderBy("doc_id", "sent_idx")
  }

  /** REAL tar archive walk: SQL-built ustar fixtures (directory + two
    * files, checksummed headers — `Multimodal.syntheticTar`) are
    * listed back through `Archive.tarEntries`' actual header walk with
    * checksum verification; the directory row proves
    * listing-without-data. Longnames, pax skips, V7 and signed
    * checksums are ArchiveSpec's spec-side builders. */
  def xTarEntries(s: SparkSession, d: String): DataFrame = {
    val e = graft.functions.Archive.tarEntriesCol(col("payload"))
    Multimodal.syntheticTar(documents(s, d))
      .select(col("doc_id"), posexplode(e))
      .select(col("doc_id"),
        col("pos").cast("long").as("entry_idx"),
        col("col.name").as("name"),
        col("col.typeflag").as("typeflag"),
        col("col.size").as("size"),
        col("col.data").cast("string").as("text"))
      .orderBy("doc_id", "entry_idx")
  }

  /** REAL GIF LZW pixel decode: deterministic complete-GIF payloads
    * (fixed 128-color palette, doc-dependent dims and pixel values,
    * literal-coded LZW stream — `Multimodal.syntheticGifPixels`)
    * inflated back through `BinaryMeta.gifPixelStats`' actual
    * variable-width bit reader while the oracle regenerates pixel
    * values and palette sums arithmetically (it never sees bytes).
    * With x_png_pixels this puts the multimodal stub boundary at
    * DCT/lossy codecs only: LZW decode is real (dictionary growth / width bumps / KwKwK are
    * spec-pinned against the JDK ImageIO reader, which SQL-built
    * streams cannot reach). */
  def xGifPixels(s: SparkSession, d: String): DataFrame = {
    val stats = graft.functions.BinaryMeta.gifPixelStatsCol(col("payload"))
    ordered(
      Multimodal.syntheticGifPixels(documents(s, d))
        .select(col("doc_id"),
          element_at(stats, 1).as("n_px"),
          element_at(stats, 2).as("sum_r"),
          element_at(stats, 3).as("sum_g"),
          element_at(stats, 4).as("sum_b")),
      "doc_id")
  }

  /** REAL PNG pixel decode: deterministic complete-PNG payloads
    * (8-bit grayscale, stored-deflate zlib with real Adler-32/CRC-32
    * folds — `Multimodal.syntheticPngPixels`) inflated back through
    * `BinaryMeta.pngPixelStats` (JDK zlib Inflater + pure-code
    * unfiltering) while the oracle regenerates pixel sums
    * arithmetically. Compressed blocks and the four predictive filters
    * are spec-pinned against ImageIO-WRITTEN PNGs (real encoder
    * output), which SQL-built streams cannot reach. With X154's GIF
    * LZW this puts the multimodal stub boundary at DCT/lossy codecs
    * only. */
  def xPngPixels(s: SparkSession, d: String): DataFrame = {
    val stats = graft.functions.BinaryMeta.pngPixelStatsCol(col("payload"))
    ordered(
      Multimodal.syntheticPngPixels(documents(s, d))
        .select(col("doc_id"),
          element_at(stats, 1).as("n_px"),
          element_at(stats, 2).as("sum_r"),
          element_at(stats, 3).as("sum_g"),
          element_at(stats, 4).as("sum_b")),
      "doc_id")
  }

  /** REAL baseline JPEG decode: deterministic DC-only grayscale JPEGs
    * (`Multimodal.syntheticJpegPixels` — custom unary-DC Huffman
    * table, magnitude/ones-complement diffs, byte stuffing, all
    * SQL-built) decoded back through `functions/JpegBaseline`'s actual
    * marker parse + Huffman + IDCT while the oracle regenerates block
    * sums arithmetically. DC-only blocks are the integer-exact JPEG
    * slice (T.81 only bounds IDCT accuracy elsewhere), which is what
    * lets a hash-exact gate exist at all; real compressed AC streams
    * are spec-pinned against the JDK reader at ±1/pixel. The
    * multimodal stub boundary is now: lossy AUDIO codecs and color
    * JPEG reconstruction (chroma upsampling is implementation-
    * defined). */
  def xJpegPixels(s: SparkSession, d: String): DataFrame = {
    val stats = graft.functions.BinaryMeta.jpegPixelStatsCol(col("payload"))
    ordered(
      Multimodal.syntheticJpegPixels(documents(s, d))
        .select(col("doc_id"),
          element_at(stats, 1).as("n_px"),
          element_at(stats, 2).as("sum_r"),
          element_at(stats, 3).as("sum_g"),
          element_at(stats, 4).as("sum_b")),
      "doc_id")
  }

  /** REAL 4:4:4 COLOR JPEG decode: deterministic DC-only 3-component
    * interleaved-MCU JPEGs (`Multimodal.syntheticJpegColorPixels` —
    * per-component DC predictor chains through the same SQL-built
    * custom Huffman tables as x_jpeg_pixels) decoded back through
    * `functions/JpegBaseline`'s actual interleaved-scan walk, then
    * color-converted through the engine-PINNED fixed-point JFIF
    * YCbCr→RGB (constants 91881/22554/46802/116130, +2¹⁵, shift 16 —
    * the de-facto libjpeg rendering) while the oracle regenerates
    * every block's R/G/B arithmetically with integer floor division
    * (the fixture keeps every numerator positive, so floor = truncate
    * = arithmetic shift and the hash-exact method survives). 4:4:4 is
    * the color slice where NO chroma resampling exists; subsampled
    * color decodes too since round 12 (pinned box upsampling), so the
    * remaining stub boundary is lossy audio only. */
  def xJpegColor(s: SparkSession, d: String): DataFrame = {
    val stats = graft.functions.BinaryMeta.jpegColorStatsCol(col("payload"))
    ordered(
      Multimodal.syntheticJpegColorPixels(documents(s, d))
        .select(col("doc_id"),
          element_at(stats, 1).as("n_px"),
          element_at(stats, 2).as("sum_r"),
          element_at(stats, 3).as("sum_g"),
          element_at(stats, 4).as("sum_b")),
      "doc_id")
  }

  /** The WEB-CORPUS per-site curation pass composed end to end — the
    * CCNet/RefinedWeb shape, ENTERING FROM CRAWL BYTES: each page is a
    * one-record WARC blob, so stage zero is the real
    * `BinaryMeta.warcIndex` byte walk (`Multimodal.warcExtract`), then
    * messy URI → `urlCanonical` dedup key → URL-level exact dedup
    * (keep min doc_id per canonical URL) → `registrableDomain`
    * grouping → `htmlToText` extraction → PER-DOMAIN boilerplate
    * removal (the site-chrome 50%-df cut) → per-domain 3-gram
    * near-dup removal (`ngramJaccardPairsAuto`, keep-lowest) → GLOBAL
    * cross-domain near-dup over the per-domain survivors (syndicated
    * mirrors across registrable domains — the pass CCNet/RefinedWeb
    * run corpus-wide; the pair table is computed once globally, so
    * this tier is a filter, not a second LSH run). Every stage is an
    * already-gated operator (x_warc_extract, x_url_canonical,
    * x_html_text, x_boilerplate, x_dedup_ngram_auto); this gate proves
    * the COMPOSITION, x_ccnet_refine-style, against one fully composed
    * DuckDB oracle.
    *
    * Fixture: page id = doc_id mod 40 (so ~N/40 docs share each
    * canonical URL and the URL-dedup stage bites), each page wrapped
    * in deterministic HTML with a per-SITE nav banner (the per-domain
    * boilerplate), plus an "echo" repost of every document (same
    * site, /alt path, text + 2 trailing tokens) that the URL stage
    * must NOT collapse and the per-domain near-dup stage must, AND a
    * cross-site "mirror" (next site over, /syn path, different 2-token
    * suffix) that only the GLOBAL tier can catch. Ids are encoded
    * collision-free as 4·id / 4·id+1 / 4·id+2 (original/echo/mirror) —
    * an additive offset would collide with real doc_ids once the
    * corpus passes the offset. The .example.net sites all group into
    * ONE registrable domain — the multi-site-per-domain case the PSL
    * grouping exists for. Output: one row per corpus doc with its exit
    * stage (url_dup | near_dup | xdomain_dup | kept) + per-doc
    * boilerplate counts. */
  def xWebPipeline(s: SparkSession, d: String): DataFrame = {
    val base = documents(s, d).select(col("doc_id"), col("text"))
    val pid0 = pmod(col("doc_id"), lit(40L))
    val corpus = base
      .select((col("doc_id") * 4).as("doc_id"), col("text"),
        pid0.as("pid"), lit(0L).as("echo"))
      .unionByName(base.select((col("doc_id") * 4 + 1).as("doc_id"),
        concat(col("text"), lit(" repost notice")).as("text"),
        pid0.as("pid"), lit(1L).as("echo")))
      .unionByName(base.select((col("doc_id") * 4 + 2).as("doc_id"),
        concat(col("text"), lit(" syndicated copy")).as("text"),
        pid0.as("pid"), lit(2L).as("echo")))
    // the SITE a page lives on: originals/echoes on pid's site, the
    // mirror one site over (different registrable domain)
    val pid = when(col("echo") === 2, pmod(col("pid") + 1, lit(40L)))
      .otherwise(col("pid"))
    val url = concat(
      when(pmod(pid, lit(2L)) === 0, lit("HTTPS")).otherwise(lit("http")),
      lit("://"),
      when(pmod(pid, lit(3L)) === 0, lit("WWW.")).otherwise(lit("")),
      lit("Site"), pmod(pid, lit(10L)),
      element_at(array(lit(".com"), lit(".co.uk"), lit(".org"),
        lit(".example.net")), (pmod(pid, lit(4L)) + 1).cast("int")),
      when(pmod(pid, lit(5L)) === 0,
        when(pmod(pid, lit(2L)) === 0, lit(":443")).otherwise(lit(":80")))
        .otherwise(lit("")),
      when(col("echo") === 1, lit("/alt"))
        .when(col("echo") === 2, lit("/syn")).otherwise(lit("/p")),
      pmod(pid, lit(7L)),
      when(pmod(pid, lit(2L)) === 0, lit("/")).otherwise(lit("")),
      lit("?utm_campaign=w&b="), pmod(pid, lit(9L)),
      lit("&a="), pmod(pid, lit(3L)), lit("#top"))
    val esc = replace(replace(replace(col("text"),
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val html = concat(
      lit("<html><head><title>portal</title><style>nav{top:0}</style>" +
        "<script>var nav = 1 < 2;</script></head><body>" +
        "<div class=\"nav\">portal site"),
      pmod(pid, lit(10L)), lit(" home login</div><p>"), esc,
      lit("</p></body></html>"))
    // each page ships as a ONE-record uncompressed WARC blob (the
    // container a crawl actually delivers): uri in the record header,
    // the HTML as a byte-counted payload — `octet_length`, not char
    // length, so multi-byte text slices correctly — and the pipeline's
    // first stage is the real `warcIndex` byte walk + UTF-8 decode
    val blob = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: "), url,
      lit("\r\nContent-Type: text/html\r\nContent-Length: "),
      octet_length(html).cast("string"), lit("\r\n\r\n"), html,
      lit("\r\n\r\n")).cast("binary")
    val fetched = Multimodal.warcExtract(
      corpus.select(col("doc_id"), blob.as("payload")))
    // the extraction stage (the WARC walk + two multi-pass regex
    // chains over every page) is consumed by FOUR downstream
    // references (keepers, s1, survivors, the final domain map) —
    // materialize it once, the natural pipeline break a real
    // deployment writes to storage between crawl-parse and curation
    val pages = fetched.select(col("doc_id"),
      TextAnalysis.urlCanonical(col("uri")).as("canon"),
      TextAnalysis.htmlToText(col("content")).as("text"))
    val withDom = pages.withColumn("domain",
        TextAnalysis.registrableDomain(regexp_extract(col("canon"), "^([^/?]*)", 1)))
      .localCheckpoint(true)
    // stage 1: URL-level exact dedup, keep-lowest per canonical key
    val keepers = withDom.groupBy(col("canon")).agg(min(col("doc_id")).as("__keep"))
    val s1 = withDom.join(keepers, "canon")
      .withColumn("url_dup", col("doc_id") =!= col("__keep")).drop("__keep")
    val survivors = s1.filter(!col("url_dup"))
    // stage 2: per-DOMAIN boilerplate removal (site chrome df >= 50%)
    val cleaned = TextAnalysis.removeBoilerplate(
      survivors.select(col("doc_id"), col("domain"), col("text")),
      srcCol = "domain")
    // stage 3: per-domain near-dup on the CLEANED text, keep-lowest.
    // The domain map is doc-count-bounded (one narrow row per
    // surviving doc) — broadcast both lookups; the pair table is
    // near-dup-density-sized.
    val pairs = Dedup.ngramJaccardPairsAuto(
      cleaned.select(col("doc_id"), col("kept_text").as("text")),
      n = 3, threshold = 0.8)
    val doms = survivors.select(col("doc_id"), col("domain"))
    val pj = pairs
      .join(broadcast(doms.select(col("doc_id").as("d1"), col("domain").as("__m1"))), Seq("d1"))
      .join(broadcast(doms.select(col("doc_id").as("d2"), col("domain").as("__m2"))), Seq("d2"))
      .localCheckpoint(true) // consumed by both tiers; density-bounded
    val removed = pj.filter(col("__m1") === col("__m2"))
      .select(col("d2").as("doc_id")).distinct()
      .withColumn("__nd", lit(true))
    // stage 4: GLOBAL tier — cross-domain pairs whose BOTH endpoints
    // survived the per-domain stage (the sequential-composition
    // semantics: stage 4 only ever sees stage-3 survivors)
    val removedX = pj.filter(col("__m1") =!= col("__m2"))
      .join(broadcast(removed.select(col("doc_id").as("d1"))), Seq("d1"), "left_anti")
      .join(broadcast(removed.select(col("doc_id").as("d2"))), Seq("d2"), "left_anti")
      .select(col("d2").as("doc_id")).distinct()
      .withColumn("__xd", lit(true))
    ordered(
      s1.join(cleaned.select(col("doc_id"), col("kept_ct"), col("removed_ct")),
          Seq("doc_id"), "left")
        .join(broadcast(removed), Seq("doc_id"), "left")
        .join(broadcast(removedX), Seq("doc_id"), "left")
        .select(col("doc_id"),
          when(col("url_dup"), "url_dup")
            .when(col("__nd"), "near_dup")
            .when(col("__xd"), "xdomain_dup").otherwise("kept").as("stage"),
          col("domain"), col("canon"), col("kept_ct"), col("removed_ct")),
      "doc_id")
  }

  /** robots.txt compliance gate — the crawl-politeness filter ahead of
    * curation: two robots variants (even domains: a `*` group with
    * wildcard/anchored patterns; odd: a specific `graftbot` group that
    * must PREEMPT the `*` group for our UA) against six path classes,
    * decided by `TextAnalysis.parseRobots` + `robotsAllowed` (RFC 9309
    * group selection, longest-match, Allow-wins-ties, `*`/`$`
    * honored) while the oracle states every decision arithmetically
    * from the residues. */
  def xRobotsFilter(s: SparkSession, d: String): DataFrame = {
    val even = pmod(col("doc_id"), lit(2L)) === 0
    val robots = when(even, lit(
      "# variant A\nUser-agent: *\nDisallow: /private*\n" +
        "Allow: /private/ok$\nDisallow: /archive\n"))
      .otherwise(lit(
        "User-agent: graftbot\nDisallow: /\nAllow: /public*\n\n" +
          "User-agent: *\nDisallow: /none\n"))
    // path class decoupled from the parity that picks the variant
    val path = element_at(array(lit("/index"), lit("/private/page1"),
      lit("/private/ok"), lit("/archive/2020"), lit("/public/data"),
      lit("/else")), expr("CAST((doc_id div 2) % 6 AS INT) + 1"))
    val base = documents(s, d).select(col("doc_id"),
      concat(lit("site"), pmod(col("doc_id"), lit(40L)), lit(".example"))
        .as("domain"),
      robots.as("robots"), path.as("path"))
    val rules = TextAnalysis.parseRobots(
      base.select(col("domain"), col("robots")).distinct(), col("robots"))
    ordered(
      TextAnalysis.robotsAllowed(
        base.select(col("doc_id"), col("domain"), col("path")),
        rules, userAgent = "graftbot/2.1"),
      "doc_id")
  }

  /** Sitemap entry extraction gate — the crawl-frontier discovery
    * tier: even doc_ids carry a urlset of 1–3 `<url>` entries
    * (odd-j entries: whitespace-padded `<loc>` + `<lastmod>` +
    * `<changefreq>`; even-j: CDATA-wrapped `<loc>` + `<priority>`)
    * behind a commented-out decoy entry the parse must skip; odd
    * doc_ids carry a sitemapindex of two `<sitemap>` entries (one
    * with `<lastmod>`, one bare). `TextAnalysis.sitemapEntries` walks
    * both shapes while the oracle regenerates every field
    * arithmetically from the doc_id/j residues. */
  def xSitemapEntries(s: SparkSession, d: String): DataFrame = {
    val even = pmod(col("doc_id"), lit(2L)) === 0
    val site = concat(lit("https://site"), pmod(col("doc_id"), lit(40L)),
      lit(".example/"))
    val k = pmod(col("doc_id"), lit(3L)) + 1L
    val urlEntries = transform(sequence(lit(1L), k), j => {
      val jOdd = pmod(j, lit(2L)) === 1
      val locTxt = concat(site, lit("page"), j)
      val loc = when(jOdd,
        concat(lit("<loc>  "), locTxt, lit("  </loc>")))
        .otherwise(concat(lit("<loc><![CDATA["), locTxt, lit("]]></loc>")))
      val lastmod = when(jOdd, concat(lit("<lastmod>2026-0"),
        pmod(col("doc_id") + j, lit(9L)) + 1, lit("-15</lastmod>")))
        .otherwise(lit(""))
      val cf = when(jOdd, concat(lit("<changefreq>"),
        element_at(array(lit("daily"), lit("weekly"), lit("monthly")),
          (pmod(col("doc_id") + j, lit(3L)) + 1).cast("int")),
        lit("</changefreq>"))).otherwise(lit(""))
      val pr = when(!jOdd, concat(lit("<priority>0."),
        pmod(col("doc_id") + j, lit(10L)), lit("</priority>")))
        .otherwise(lit(""))
      concat(lit("<url>"), loc, lastmod, cf, pr, lit("</url>"))
    })
    val urlset = concat(
      lit("<?xml version=\"1.0\" encoding=\"UTF-8\"?>\n" +
        "<urlset xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n" +
        "<!-- <url><loc>https://bogus.example/skip</loc></url> -->\n"),
      array_join(urlEntries, "\n"), lit("\n</urlset>"))
    val index = concat(
      lit("<sitemapindex xmlns=\"http://www.sitemaps.org/schemas/sitemap/0.9\">\n<sitemap><loc>"),
      site, lit("sm1.xml</loc><lastmod>2026-01-"),
      lpad((pmod(col("doc_id"), lit(28L)) + 1).cast("string"), 2, "0"),
      lit("</lastmod></sitemap>\n<sitemap><loc>"), site,
      lit("sm2.xml</loc></sitemap>\n</sitemapindex>"))
    ordered(
      TextAnalysis.sitemapEntries(
        documents(s, d).select(col("doc_id"),
          when(even, urlset).otherwise(index).as("xml"))),
      "doc_id", "seq")
  }

  /** Crawl-frontier composition gate — the discovery→politeness pass a
    * crawler runs before fetching (composes X173 sitemap extraction,
    * X160 URL canonicalization, X172 robots compliance): every doc's
    * urlset (1–3 pages, even-j locs carrying a `utm_source` tracking
    * param the canon must strip while keeping+sorting `ref`) feeds
    * `sitemapEntries` → `urlCanonical` → domain/path split →
    * `robotsAllowed` under two per-domain-parity robots variants (even
    * domains: a lone `*` group disallowing /page3; odd: a `graftbot`
    * group — deny-all plus anchored/plain Allow carve-outs — that must
    * PREEMPT a deny-all `*` group). Round 12 adds DISCOVERY per RFC
    * 9309 §2.3: the frontier starts from ROBOTS.TXT ONLY — each
    * domain's robots advertises its sitemaps as non-group `Sitemap:`
    * lines (even docs: one line with a `WWW.`-prefixed mixed-case
    * host the canonical key must fold; odd docs: TWO lines — one
    * before the groups, one lowercase-directive after them, the
    * second naming a news sitemap whose /news1 page falls to the
    * deny-all), `robotsSitemaps` extracts them, and the canonical
    * keys join the fetched-sitemap store before any entry flows.
    * Output = frontier rows with the canonical key, sitemap priority,
    * and the decisive rule. The oracle restates every discovery /
    * canon / decision arithmetically. Scale shape: discovery+sitemap+
    * canon map-side, store join + decision are bounded-key equi-joins
    * — the frontier never shuffles on anything unbounded. */
  def xCrawlFrontier(s: SparkSession, d: String): DataFrame = {
    val even = pmod(col("doc_id"), lit(2L)) === 0
    val site = concat(lit("site"), pmod(col("doc_id"), lit(40L)),
      lit(".example"))
    val k = pmod(col("doc_id"), lit(3L)) + 1L
    val urlEntries = transform(sequence(lit(1L), k), j =>
      concat(lit("<url><loc>https://"), site, lit("/page"), j,
        when(pmod(j, lit(2L)) === 0,
          concat(lit("?utm_source=rss&ref="), j)).otherwise(lit("")),
        lit("</loc><priority>0."), pmod(col("doc_id") + j, lit(10L)),
        lit("</priority></url>")))
    val urlset = concat(lit("<urlset>\n"),
      array_join(urlEntries, "\n"), lit("\n</urlset>"))
    val newsXml = concat(lit("<urlset>\n<url><loc>https://"), site,
      lit("/news1</loc></url>\n</urlset>"))
    val robots = when(even, concat(
        lit("User-agent: *\nDisallow: /page3\nSitemap: https://WWW."),
        site, lit("/sitemap.xml\n")))
      .otherwise(concat(
        lit("Sitemap: https://"), site, lit("/sitemap.xml\n"),
        lit("User-agent: graftbot\nDisallow: /\nAllow: /page1$\n" +
          "Allow: /page3\n\nUser-agent: *\nDisallow: /\n"),
        lit("sitemap: https://"), site, lit("/sitemap-news.xml\n")))
    val base = documents(s, d).select(col("doc_id"), urlset.as("xml"),
      newsXml.as("news_xml"), site.as("domain"), robots.as("robots"))
    // the fetched-sitemap store a crawler keeps, keyed by the
    // CANONICAL sitemap url; the news sitemap exists for odd docs only
    val store = base.select(col("doc_id"),
        concat(lit("https://"), col("domain"), lit("/sitemap.xml"))
          .as("sm_url"), col("xml"))
      .unionByName(base.filter(pmod(col("doc_id"), lit(2L)) === 1)
        .select(col("doc_id"),
          concat(lit("https://"), col("domain"), lit("/sitemap-news.xml"))
            .as("sm_url"), col("news_xml").as("xml")))
      .withColumn("sm_key", TextAnalysis.urlCanonical(col("sm_url")))
    // DISCOVERY: robots -> Sitemap directives -> canonical key -> store
    val found = TextAnalysis.robotsSitemaps(
        base.select(col("doc_id"), col("robots")), col("robots"))
      .select(col("doc_id"),
        TextAnalysis.urlCanonical(col("sitemap_url")).as("sm_key"))
    val fetched = found.join(store, Seq("doc_id", "sm_key"))
    val pages = TextAnalysis.sitemapEntries(
        fetched.select(col("doc_id"), col("xml")))
      .select(col("doc_id"), col("seq"),
        TextAnalysis.urlCanonical(col("loc")).as("canon"),
        col("priority"))
      .withColumn("domain", regexp_extract(col("canon"), "^([^/?]*)", 1))
      .withColumn("path", regexp_extract(col("canon"), "^[^/]*(/.*)", 1))
      .select(col("doc_id"), col("seq"), col("canon"), col("domain"),
        col("path"), col("priority"))
    val rules = TextAnalysis.parseRobots(
      base.select(col("domain"), col("robots")).distinct(), col("robots"))
    ordered(
      TextAnalysis.robotsAllowed(pages, rules, userAgent = "graftbot/2.1"),
      "doc_id", "canon")
  }

  /** ID3v2 text-frame extraction gate: deterministic v2.3 (even
    * doc_ids — plain-u32 frame sizes) and v2.4 (odd — syncsafe sizes)
    * tags carrying TIT2/TPE1/TALB in ISO-8859-1 plus 8 padding bytes
    * (the padding-stop path), walked through the codegen'd
    * `BinaryMeta.id3TextFrames` while the oracle regenerates every
    * (frame_id, text) pair arithmetically. The audio-manifest
    * metadata tier: title/artist dedup keys and attribution. */
  def xId3Tags(s: SparkSession, d: String): DataFrame = {
    val even = pmod(col("doc_id"), lit(2L)) === 0
    val title = concat(lit("Track "), pmod(col("doc_id"), lit(1000L)))
    val artist = concat(lit("Artist "), pmod(col("doc_id"), lit(50L)))
    val album = concat(lit("Album "), pmod(col("doc_id"), lit(10L)))
    def frame(idHex: String, text: org.apache.spark.sql.Column) = {
      val sz = length(text) + 1
      val szHex = when(even, lpad(hex(sz), 8, "0"))
        .otherwise(concat(lit("000000"), lpad(hex(sz), 2, "0")))
      concat(lit(idHex), szHex, lit("0000"), lit("00"), hex(text))
    }
    val tagSize = length(title) + length(artist) + length(album) + 3 + 30 + 8
    val payload = unhex(concat(
      lit("494433"), when(even, lit("0300")).otherwise(lit("0400")),
      lit("00"), lit("000000"), lpad(hex(tagSize), 2, "0"),
      frame("54495432", title),   // TIT2
      frame("54504531", artist),  // TPE1
      frame("54414C42", album),   // TALB
      lit("00" * 8)))             // padding: the walk must stop here
    val frames = graft.functions.BinaryMeta.id3TextFramesCol(col("payload"))
    ordered(
      documents(s, d).select(col("doc_id"), payload.as("payload"))
        .select(col("doc_id"), explode(frames).as("__f"))
        .select(col("doc_id"), col("__f.frame_id").as("frame_id"),
          col("__f.text").as("text")),
      "doc_id", "frame_id")
  }

  /** Pure-WebVTT gate — the VTT faces the mixed `x_subtitle_cues`
    * fixture leaves uncovered: a header with trailing text
    * (`WEBVTT - note`), a STYLE block AND a NOTE block (both timing-
    * less — documented cue_idx position gaps at 0 and 1), a textual
    * CUE IDENTIFIER line before the first cue's timing (must drop out
    * of the text positionally), cue settings after the arrow, and
    * multi-line cue text. Oracle restates indices/times/text
    * arithmetically. */
  def xWebvttCues(s: SparkSession, d: String): DataFrame = {
    def two(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 2, "0")
    def three(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 3, "0")
    def cue(j: Long) = {
      val mm = pmod(col("doc_id") + j, lit(60L))
      val ss = pmod(col("doc_id") * 3 + j * 7, lit(58L))
      val ms = pmod(col("doc_id") * 7 + j * 13, lit(800L))
      concat(
        lit("00:"), two(mm), lit(":"), two(ss), lit("."), three(ms),
        lit(" --> 00:"), two(mm), lit(":"), two(ss + 1), lit("."),
        three(ms + 200),
        if (j == 1) lit(" position:10% align:start") else lit(""), lit("\n"),
        lit(s"vtt cue $j of doc "), col("doc_id"),
        if (j == 2) lit("\nline two") else lit(""))
    }
    val subs = concat(
      lit("WEBVTT - generated for doc "), col("doc_id"), lit("\n\n"),
      lit("STYLE\n::cue { color: red }\n\n"),
      lit("NOTE a comment block\n\n"),
      lit("intro-"), col("doc_id"), lit("\n"), cue(1), lit("\n\n"),
      cue(2), lit("\n"))
    ordered(
      TextAnalysis.subtitleCues(
        documents(s, d).select(col("doc_id"), subs.as("subs"))),
      "doc_id", "cue_idx")
  }

  /** Subtitle cue extraction gate: deterministic SRT files (even
    * doc_ids — index lines, comma milliseconds) and WebVTT files (odd
    * — header block, NOTE block to skip, dot milliseconds, cue
    * settings after the arrow) parsed through `TextAnalysis.
    * subtitleCues`' engine-portable regexp chain while the oracle
    * regenerates cue indices/times/text arithmetically. Multi-line
    * cue text joins with spaces; the VTT NOTE block leaves the
    * documented position gap in cue_idx. */
  def xSubtitleCues(s: SparkSession, d: String): DataFrame = {
    val even = pmod(col("doc_id"), lit(2L)) === 0
    val nc = pmod(col("doc_id"), lit(4L)) + 1L
    def two(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 2, "0")
    def three(c: org.apache.spark.sql.Column) = lpad(c.cast("string"), 3, "0")
    val cues = transform(sequence(lit(1L), nc), j => {
      val mm = pmod(col("doc_id") + j, lit(60L))
      val ss = pmod(col("doc_id") * 3 + j * 7, lit(58L))
      val ms = pmod(col("doc_id") * 7 + j * 13, lit(800L))
      val sep = when(even, lit(",")).otherwise(lit("."))
      val t1 = concat(lit("00:"), two(mm), lit(":"), two(ss), sep, three(ms))
      val t2 = concat(lit("00:"), two(mm), lit(":"), two(ss + 1), sep,
        three(ms + 200))
      concat(
        when(even, concat(j.cast("string"), lit("\n"))).otherwise(lit("")),
        t1, lit(" --> "), t2,
        when(even, lit("")).otherwise(lit(" align:start")), lit("\n"),
        lit("cue "), j, lit(" of doc "), col("doc_id"),
        when(pmod(j, lit(2L)) === 0, lit("\nline two")).otherwise(lit("")))
    })
    val subs = concat(
      when(even, lit("")).otherwise(lit("WEBVTT\n\nNOTE generated\n\n")),
      array_join(cues, "\n\n"))
    ordered(
      TextAnalysis.subtitleCues(
        documents(s, d).select(col("doc_id"), subs.as("subs"))),
      "doc_id", "cue_idx")
  }

  /** REAL PROGRESSIVE JPEG decode: deterministic two-scan
    * successive-approximation DC streams (`Multimodal.
    * syntheticJpegProgressive` — scan 1 carries dc>>1 at Al=1 through
    * the SQL-built unary-DC Huffman chain, scan 2 one refinement bit
    * per block at Ah=1) decoded back through `functions/JpegBaseline`'s
    * actual multi-scan Annex-G walk (coefficient store + EOI render)
    * while the oracle regenerates block sums arithmetically — DC-only
    * remains the integer-exact slice, so the hash-exact method
    * survives the progressive tier. Real multi-band AC streams with
    * refinements are spec-pinned against the JDK reader at ±1/pixel
    * (±2 for forced-4:4:4 color). */
  def xJpegProgressive(s: SparkSession, d: String): DataFrame = {
    val stats = graft.functions.BinaryMeta.jpegPixelStatsCol(col("payload"))
    ordered(
      Multimodal.syntheticJpegProgressive(documents(s, d))
        .select(col("doc_id"),
          element_at(stats, 1).as("n_px"),
          element_at(stats, 2).as("sum_r"),
          element_at(stats, 3).as("sum_g"),
          element_at(stats, 4).as("sum_b")),
      "doc_id")
  }

  /** A/V container header walk — MP3 (ID3v2 + MPEG-1 frame header),
    * ADTS AAC, and ISO-BMFF MP4 (moov/mvhd/tkhd) metadata parsed from
    * deterministic SQL-built payloads (`Multimodal.
    * syntheticAvContainers`) through `BinaryMeta.mp3Meta / adtsMeta /
    * mp4Meta` — the byte-round-trip oracle pattern of X138, extended
    * to the two biggest real-corpus media formats. Header-ONLY by
    * design (psychoacoustic/DCT decode stays the documented stub
    * boundary); a 100 TB media manifest needs exactly this tier:
    * format, rate, channels, bitrate, duration, dimensions as a pure
    * codegen'd map-side scan, payloads never shuffling. */
  def xAvMeta(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BinaryMeta
    val p = col("payload")
    val mp3 = BinaryMeta.mp3MetaCol(p)
    val aac = BinaryMeta.adtsMetaCol(p)
    val mp4 = BinaryMeta.mp4MetaCol(p)
    ordered(
      Multimodal.syntheticAvContainers(documents(s, d))
        .select(col("doc_id"),
          BinaryMeta.mediaFormat(p).as("fmt"),
          coalesce(element_at(mp3, 1), element_at(aac, 1)).as("sample_rate"),
          coalesce(element_at(mp3, 3), element_at(aac, 2)).as("channels"),
          element_at(mp3, 2).as("bitrate_kbps"),
          element_at(mp3, 4).as("id3_bytes"),
          element_at(aac, 3).as("frame_len"),
          element_at(aac, 4).as("aac_profile"),
          element_at(mp4, 1).as("timescale"),
          element_at(mp4, 2).as("duration"),
          element_at(mp4, 3).as("width"),
          element_at(mp4, 4).as("height")),
      "doc_id")
  }

  /** WARC record extraction — the entry stage of a web-corpus
    * pipeline, over the container format crawls actually ship in:
    * SQL-built uncompressed WARC blobs (real Content-Length byte
    * counting — payloads are never delimiter-scanned) walked through
    * the codegen'd `BinaryMeta.warcIndex` + payload slicing
    * (`Multimodal.warcExtract`), while the oracle regenerates every
    * record's uri/type/length/content arithmetically. Map-side only:
    * one decode walk + a Generate, no shuffle before the gate's
    * output ordering. */
  def xWarcExtract(s: SparkSession, d: String): DataFrame =
    ordered(
      Multimodal.warcExtract(Multimodal.syntheticWarc(documents(s, d))),
      "doc_id", "rec_idx")

  /** `.warc.gz` extraction — the same record walk entered from the
    * COMPRESSED framing real crawls ship (one gzip member per record):
    * `Multimodal.syntheticWarcGz` builds spec-valid multi-member gzip
    * blobs in SQL (stored deflate blocks, REAL CRC-32/ISIZE trailers),
    * `warcExtract` auto-detects the magic and routes through
    * `gunzipMembers`' verify-then-concatenate walk before the byte-
    * counted WARC split; the oracle regenerates every field
    * arithmetically. */
  def xWarcGz(s: SparkSession, d: String): DataFrame =
    ordered(
      Multimodal.warcExtract(Multimodal.syntheticWarcGz(documents(s, d))),
      "doc_id", "rec_idx")

  /** Multi-wave CRAWL-LOOP composition gate — the closed loop no other
    * gate drives end to end: wave 0 fetches the seed pages, their
    * outlinks become the frontier, wave 1 fetches EXACTLY that frontier
    * (each seed's wave-1 blob also carries a copy of the shared hub
    * page — cross-seed keep-first must admit it ONCE), wave 1 is then
    * REPLAYED (a restart re-running the last epoch) and must change
    * nothing — the gate output is the post-replay state, so any
    * duplicate page/frontier row hash-mismatches the oracle. Per-wave
    * mechanics exercised: within-batch dedup, history URL dedup through
    * the CrawlStore membership check, fetched-this-batch and
    * already-queued frontier exclusions, back-links to fetched pages
    * never re-queueing. The oracle restates every page and frontier row
    * arithmetically from the seed residues. */
  def xCrawlWaves(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files.createTempDirectory("crawl_waves").toString
    val seeds = documents(s, d)
      .filter(pmod(col("doc_id"), lit(50L)) === 0).select(col("doc_id"))
    def rec(uri: org.apache.spark.sql.Column,
            html: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      concat(lit("WARC/1.0\r\nWARC-Target-URI: "), uri,
        lit("\r\nContent-Type: text/html\r\nContent-Length: "),
        length(html).cast("string"), lit("\r\n\r\n"), html, lit("\r\n\r\n"))
    val site = concat(lit("s"), col("doc_id"), lit(".example"))
    val w0 = seeds.select(col("doc_id"), rec(
      concat(lit("https://"), site, lit("/seed")),
      lit("<p>seed <a href=\"/p1\">a</a> <a href=\"/p2\">b</a> " +
        "<a href=\"https://hub.example/shared\">h</a></p>"))
      .cast("binary").as("payload"))
    val w1 = seeds.select(col("doc_id"), concat(
      rec(concat(lit("https://"), site, lit("/p1")),
        concat(lit("<p>p1 <a href=\"/seed\">s</a> <a href=\"/deep"),
          pmod(col("doc_id"), lit(3L)), lit("\">dp</a></p>"))),
      rec(concat(lit("https://"), site, lit("/p2")),
        lit("<p>p2 <a href=\"https://hub.example/shared\">h</a> " +
          "<a href=\"https://hub.example/next\">n</a></p>")),
      rec(lit("https://hub.example/shared"), lit("<p>hub page</p>")))
      .cast("binary").as("payload"))
    val ingest = graft.streaming.CorpusIngest.crawlIngestBatch(dir) _
    ingest(w0, 0L)
    ingest(w1, 1L)
    ingest(w1, 1L) // replayed wave: must be a no-op
    val pages = s.read.parquet(s"$dir/pages")
      .select(lit("page").as("kind"), col("canon"),
        col("batch_id").cast("long").as("batch_id"), col("doc_id"))
    val frontier = s.read.parquet(s"$dir/frontier")
      .select(lit("frontier").as("kind"), col("canon"),
        col("batch_id").cast("long").as("batch_id"),
        lit(null).cast("long").as("doc_id"))
    ordered(pages.unionByName(frontier), "kind", "canon")
  }

  /** The page-2 content stream of the PDF fixture, deflated ONCE with
    * the JDK encoder and embedded as a literal — the parser's
    * FlateDecode path must do real inflation while the oracle only
    * restates the constant decoded text. */
  private lazy val pdfFlateBytes: Array[Byte] = {
    val data = "BT (flate page common) Tj ET"
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1)
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf); d.end()
    buf.take(n)
  }

  /** PDF text-extraction gate — classic layout built IN SQL with REAL
    * xref offsets (every per-doc field is fixed-width, so offsets are
    * template constants the builder computes once): two pages, page 1
    * an uncompressed content stream exercising `Tj`/`Td`/`TJ`, octal
    * escapes and hex strings over per-doc text, page 2 a REAL
    * FlateDecode stream (JDK-deflated literal). Docs with
    * `doc_id % 5 = 4` carry an `/Encrypt` trailer entry — the decline
    * contract: text null, `encrypted` true, structure metadata still
    * reported. The oracle restates every field arithmetically. */
  def xPdfText(s: SparkSession, d: String): DataFrame = {
    val bin = org.apache.spark.sql.types.BinaryType
    val did = lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 4, "0")
    val tid = lpad(pmod(col("doc_id"), lit(7L)).cast("string"), 2, "0")
    val parts = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Column]
    var off = 0
    val objAt = scala.collection.mutable.Map.empty[Int, Int]
    def s_(t: String): Unit = { parts += lit(t).cast(bin); off += t.length }
    def c_(c: org.apache.spark.sql.Column, len: Int): Unit = {
      parts += c.cast(bin); off += len
    }
    def obj(n: Int)(body: => Unit): Unit = {
      objAt(n) = off; s_(s"$n 0 obj\n"); body; s_("\nendobj\n")
    }
    s_("%PDF-1.4\n")
    obj(1)(s_("<< /Type /Catalog /Pages 2 0 R >>"))
    obj(2)(s_("<< /Type /Pages /Kids [3 0 R 5 0 R] /Count 2 >>"))
    obj(3)(s_("<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"))
    val ops1a = "BT /F1 12 Tf 72 712 Td (Doc "
    val ops1b = ") Tj 0 -14 Td [(tail \\050q\\051 ) <68692d> ("
    val ops1c = ")] TJ ET"
    val len1 = ops1a.length + 4 + ops1b.length + 2 + ops1c.length
    obj(4) {
      s_(s"<< /Length $len1 >>\nstream\n")
      s_(ops1a); c_(did, 4); s_(ops1b); c_(tid, 2); s_(ops1c)
      s_("\nendstream")
    }
    obj(5)(s_("<< /Type /Page /Parent 2 0 R /Contents 6 0 R >>"))
    obj(6) {
      s_(s"<< /Length ${pdfFlateBytes.length} /Filter /FlateDecode >>\nstream\n")
      c_(lit(pdfFlateBytes), pdfFlateBytes.length)
      s_("\nendstream")
    }
    val xrefAt = off
    s_("xref\n0 7\n" + f"${0}%010d 65535 f \n" +
      (1 to 6).map(n => f"${objAt(n)}%010d 00000 n \n").mkString)
    s_("trailer\n<< /Size 7 /Root 1 0 R")
    // the /Encrypt variant only changes the trailer — past every object
    // offset and past startxref's target, so the xref stays valid
    parts += when(pmod(col("doc_id"), lit(5L)) === 4,
      lit(" /Encrypt 9 0 R")).otherwise(lit("")).cast(bin)
    s_(s" >>\nstartxref\n$xrefAt\n%%EOF\n")
    val payload = concat(parts.toSeq: _*)
    val withP = documents(s, d).select(col("doc_id"), payload.as("payload"))
    val m = graft.functions.PdfText.pdfMetaCol(col("payload"))
    ordered(
      withP.select(col("doc_id"),
        m.getField("version").as("version"),
        m.getField("n_pages").as("n_pages"),
        m.getField("n_objects").as("n_objects"),
        m.getField("encrypted").as("encrypted"),
        graft.functions.PdfText.pdfTextCol(col("payload")).as("text")),
      "doc_id")
  }

  private def deflateOnce(data: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater()
    d.setInput(data); d.finish()
    val buf = new Array[Byte](data.length * 2 + 64)
    val n = d.deflate(buf); d.end()
    buf.take(n)
  }

  /** PDF 1.5 gate — the post-1.5 layout `x_pdf_text` cannot cover:
    * catalog/pages/page packed in a FlateDecode `/Type /ObjStm`, the
    * per-doc content stream file-resident, and a `/Type /XRef`
    * cross-reference STREAM (W [1 2 1], FlateDecode + PNG up-predictor
    * via /DecodeParms) as the ONLY xref — no classic table, no
    * `trailer` keyword. Every non-varying byte region (the ObjStm, the
    * predicted+deflated xref table) is a plan-time constant because all
    * per-doc fields are fixed-width, so offsets are template constants;
    * the parser must still inflate, un-predict, walk W-typed rows and
    * unpack the ObjStm per row. Docs with `doc_id % 5 = 4` carry
    * `/Encrypt` in the xref-stream dict (the 1.5+ trailer) — decline:
    * text null, encrypted true, structure metadata still reported. */
  def xPdfObjstm(s: SparkSession, d: String): DataFrame = {
    val bin = org.apache.spark.sql.types.BinaryType
    val did = lpad(pmod(col("doc_id"), lit(1000L)).cast("string"), 4, "0")
    val tid = lpad(pmod(col("doc_id"), lit(7L)).cast("string"), 2, "0")
    val parts = scala.collection.mutable.ArrayBuffer
      .empty[org.apache.spark.sql.Column]
    var off = 0
    def s_(t: String): Unit = { parts += lit(t).cast(bin); off += t.length }
    def c_(c: org.apache.spark.sql.Column, len: Int): Unit = {
      parts += c.cast(bin); off += len
    }
    def raw_(bs: Array[Byte]): Unit = { parts += lit(bs); off += bs.length }
    s_("%PDF-1.5\n")
    val off4 = off
    val opsA = "BT (Objstm doc "
    val opsB = " t"
    val opsC = ") Tj 0 -14 Td (xref stream page) Tj ET"
    val len4 = opsA.length + 4 + opsB.length + 2 + opsC.length
    s_(s"4 0 obj\n<< /Length $len4 >>\nstream\n")
    s_(opsA); c_(did, 4); s_(opsB); c_(tid, 2); s_(opsC)
    s_("\nendstream\nendobj\n")
    // ObjStm holding objects 1..3 — constant, deflated at plan time
    val o1 = "<< /Type /Catalog /Pages 2 0 R >>"
    val o2 = "<< /Type /Pages /Kids [3 0 R] /Count 1 >>"
    val o3 = "<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    val header = s"1 0 2 ${o1.length + 1} 3 ${o1.length + o2.length + 2}\n"
    val z5 = deflateOnce((header + Seq(o1, o2, o3).mkString(" "))
      .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    val off5 = off
    s_(s"5 0 obj\n<< /Type /ObjStm /N 3 /First ${header.length} " +
      s"/Length ${z5.length} /Filter /FlateDecode >>\nstream\n")
    raw_(z5)
    s_("\nendstream\nendobj\n")
    // XRef stream: rows (type, f2:2, f3) for objects 0..6, PNG-up rows
    val off6 = off
    val entries: Seq[(Int, Int, Int)] = Seq(
      (0, 0, 0),
      (2, 5, 0), (2, 5, 1), (2, 5, 2),
      (1, off4, 0), (1, off5, 0), (1, off6, 0))
    val rawTable = entries.flatMap { case (t, f2, f3) =>
      Seq(t.toByte, ((f2 >> 8) & 0xff).toByte, (f2 & 0xff).toByte,
        (f3 & 0xff).toByte)
    }.toArray
    val predicted = new Array[Byte](entries.length * 5)
    for (r <- entries.indices) {
      predicted(r * 5) = 2 // PNG Up
      for (c <- 0 until 4) {
        val cur = rawTable(r * 4 + c) & 0xff
        val up = if (r > 0) rawTable((r - 1) * 4 + c) & 0xff else 0
        predicted(r * 5 + 1 + c) = ((cur - up) & 0xff).toByte
      }
    }
    val z6 = deflateOnce(predicted)
    s_("6 0 obj\n<< /Type /XRef /Size 7 /W [1 2 1] /Root 1 0 R")
    parts += when(pmod(col("doc_id"), lit(5L)) === 4,
      lit(" /Encrypt 9 0 R")).otherwise(lit("")).cast(bin)
    s_(s" /Length ${z6.length} /Filter /FlateDecode" +
      " /DecodeParms << /Predictor 12 /Columns 4 >> >>\nstream\n")
    raw_(z6)
    s_("\nendstream\nendobj\n")
    s_(s"startxref\n$off6\n%%EOF\n")
    val payload = concat(parts.toSeq: _*)
    val withP = documents(s, d).select(col("doc_id"), payload.as("payload"))
    val m = graft.functions.PdfText.pdfMetaCol(col("payload"))
    ordered(
      withP.select(col("doc_id"),
        m.getField("version").as("version"),
        m.getField("n_pages").as("n_pages"),
        m.getField("n_objects").as("n_objects"),
        m.getField("encrypted").as("encrypted"),
        graft.functions.PdfText.pdfTextCol(col("payload")).as("text")),
      "doc_id")
  }

  private def linkFixture(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val url = concat(lit("https://site"), pmod(id, lit(20L)),
      lit(".example/dir/sub/page"), pmod(id, lit(3L)), lit(".html"))
    val html = concat(
      lit("<html><body>" +
        "<a href=\"https://other.example/abs\">abs</a>" +
        "<a href='//peer.example/x'>proto</a>" +
        "<a href=\"/root/r"), pmod(id, lit(5L)), lit("\">root</a>" +
        "<a href=\"img"), pmod(id, lit(4L)), lit("\">rel</a>" +
        "<a href=\"../up/q\">parent</a>" +
        "<a href=\"./same\">dot</a>" +
        "<a href=\"#top\">frag</a>" +
        "<a href=\"javascript:void(0)\">js</a>" +
        "<a href=/bare"), pmod(id, lit(2L)), lit(">bare</a>" +
        "</body></html>"))
    documents(s, d).select(id, url.as("url"), html.as("html"))
  }

  /** Outlink extraction gate — the WAT/link-graph tier: every RFC 3986
    * resolution shape in one page (absolute, protocol-relative,
    * root-relative, directory-relative, `../` fold, `./` collapse, a
    * BARE unquoted href) plus the two drop classes (fragment-only,
    * `javascript:`); link_idx keeps the extraction positions, so the
    * dropped pseudo-links leave the documented gaps. The oracle
    * restates every resolved URL arithmetically. */
  def xLinkExtract(s: SparkSession, d: String): DataFrame =
    ordered(
      TextAnalysis.extractLinks(linkFixture(s, d)),
      "doc_id", "link_idx")

  /** Host-graph composition gate — outlinks aggregate to the
    * registrable-domain edge list that feeds frontier prioritization
    * and host-level PageRank: source = the page's domain, target = the
    * resolved link's domain, one weighted edge per (src, dst). The
    * oracle regenerates edge weights from the fixture arithmetic
    * (per page: 1 edge to other.example, 1 to peer.example, 5
    * self-edges). */
  def xLinkGraph(s: SparkSession, d: String): DataFrame = {
    val base = linkFixture(s, d)
    val links = TextAnalysis.extractLinks(base)
    val withSrc = links.join(
      base.select(col("doc_id"),
        TextAnalysis.registrableDomain(
          regexp_extract(col("url"), "^[a-zA-Z]+://([^/?#]*)", 1)).as("src")),
      Seq("doc_id"))
    ordered(
      withSrc
        .withColumn("dst", TextAnalysis.registrableDomain(
          regexp_extract(col("url"), "^[a-zA-Z]+://([^/?#]*)", 1)))
        .groupBy(col("src"), col("dst"))
        .agg(count(lit(1)).as("n_links")),
      "src", "dst")
  }

  /** Host-rank composition gate — the full frontier-prioritization
    * chain: outlinks (X183) → registrable-domain edge list (X184) →
    * the fixed-point integer PageRank operator (3 iterations, 85%
    * damping — the same arithmetic the e5 gate pins on the event
    * graph, here on the crawl's own host graph). The oracle unrolls
    * the identical r0→r3 integer chain over the arithmetically
    * restated edges. */
  def xLinkRank(s: SparkSession, d: String): DataFrame =
    ordered(
      graft.operators.Graph.pageRank(
        xLinkGraph(s, d), "src", "dst", "n_links"),
      "node")

  /** Incremental host-rank gate — the STREAMING face of X184/X185,
    * driven end to end like `x_crawl_waves`: the fixture corpus splits
    * into three REAL micro-batches (`doc_id % 3`), each appends its
    * weighted edge deltas through the idempotent batch-keyed sink,
    * compaction folds mid-stream (epoch 0 into the tier, the _META
    * high-water flip), batch 2 lands post-compaction and then REPLAYS
    * (must be a no-op — a duplicated SUM delta would corrupt every
    * downstream rank). The output is `hostRank` over the maintained
    * graph; because weighted edges are sums, the merged multiset equals
    * the single-batch `x_link_rank` graph exactly, so that gate's
    * arithmetic r0→r3 integer-PageRank oracle carries over verbatim —
    * incremental == batch is the claim under test, now DuckDB-checked,
    * not just spec-asserted (HostRankSpec). */
  def xHostRankIncr(s: SparkSession, d: String): DataFrame = {
    val dir = java.nio.file.Files
      .createTempDirectory("hostrank_incr").toString
    val base = linkFixture(s, d)
    def part(k: Int) = base.filter(pmod(col("doc_id"), lit(3L)) === k)
    val ingest = graft.streaming.HostRank.edgeDeltaBatch(dir) _
    ingest(part(0), 0L)
    ingest(part(1), 1L)
    graft.streaming.HostRank.compactEdges(s, dir)
    ingest(part(2), 2L)
    ingest(part(2), 2L) // replayed epoch: must not double-count
    ordered(graft.streaming.HostRank.hostRank(s, dir), "node")
  }

  /** Link-density main-content extraction gate — the jusText/
    * Boilerpipe signal on a SINGLE page (no site corpus needed, unlike
    * the df-based chrome cut): a nav bar of pure links, a long clean
    * paragraph, a mixed paragraph under the density threshold, an
    * all-link stub, a too-short block, and a link footer — each lands
    * in exactly the kept/dropped bucket the integer rule
    * (`n_chars >= 25`, `anchor·100 <= chars·40`) dictates, and the
    * oracle restates every block's text/lengths/verdict
    * arithmetically. */
  def xContentExtract(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val html = concat(
      lit("<html><head><title>portal page</title><style>nav{top:0}" +
        "</style></head><body>"),
      lit("<div class=\"nav\"><a href=\"/\">Home</a> <a>Login</a> " +
        "<a>Site "), pmod(id, lit(10L)), lit("</a></div>"),
      lit("<p>Main paragraph of doc "), id,
      lit(" with plenty of body characters to keep.</p>"),
      lit("<p>See <a>related item "), pmod(id, lit(7L)),
      lit("</a> plus surrounding commentary text.</p>"),
      lit("<p><a>short</a></p>"),
      lit("<div>tiny</div>"),
      lit("<footer><a>About</a> <a>Terms</a></footer></body></html>"))
    ordered(
      TextAnalysis.contentBlocks(
        documents(s, d).select(id, html.as("html"))),
      "doc_id", "block_idx")
  }

  /** Robots FETCH-STATUS policy gate (RFC 9309 §2.3.1): domains whose
    * robots.txt fetch 4xx'd are fully crawlable, 5xx'd domains are
    * completely disallowed ('unreachable'), 200 domains take the
    * normal parsed-rules path (here: a `*` group disallowing /p1).
    * Status keyed per DOMAIN (site residue mod 3), path per doc — the
    * oracle restates every verdict arithmetically. */
  def xRobotsStatus(s: SparkSession, d: String): DataFrame = {
    val site = pmod(col("doc_id"), lit(30L))
    val domain = concat(lit("site"), site, lit(".example"))
    val base = documents(s, d).select(col("doc_id"), domain.as("domain"),
      site.as("__site"),
      concat(lit("/p"), pmod(col("doc_id"), lit(3L))).as("path"))
    val statuses = base
      .select(col("domain"),
        when(pmod(col("__site"), lit(3L)) === 0, lit(200))
          .when(pmod(col("__site"), lit(3L)) === 1, lit(404))
          .otherwise(lit(503)).as("robots_status"))
      .distinct()
    // rules exist only where the fetch succeeded
    val rules = TextAnalysis.parseRobots(
      base.filter(pmod(col("__site"), lit(3L)) === 0)
        .select(col("domain"),
          lit("User-agent: *\nDisallow: /p1\n").as("robots"))
        .distinct(), col("robots"))
    ordered(
      TextAnalysis.robotsAllowedWithStatus(
        base.select(col("doc_id"), col("domain"), col("path")),
        rules, statuses, userAgent = "graftbot/2.1"),
      "doc_id")
  }

  /** Crawl politeness SCHEDULE gate — the frontier-plan tier: pages
    * sequence per domain (priority desc, then path/doc_id) and each
    * gets `fetch_offset_ms = (seq−1)·delay_ms`, with the delay from
    * the domain's APPLICABLE `Crawl-delay:` group (even sites: a `*`
    * group at 2 s that also disallows /p3 — those pages vanish from
    * the plan; odd sites: a graftbot group at 1.5 s that must preempt
    * a deny-all 10 s `*` group). The oracle restates the window and
    * every offset arithmetically. */
  def xCrawlSchedule(s: SparkSession, d: String): DataFrame = {
    val site = pmod(col("doc_id"), lit(30L))
    val even = pmod(site, lit(2L)) === 0
    val domain = concat(lit("site"), site, lit(".example"))
    val robots = when(even, lit(
        "User-agent: *\nCrawl-delay: 2\nDisallow: /p3\n"))
      .otherwise(lit(
        "User-agent: graftbot\nCrawl-delay: 1.5\nDisallow: /x\n\n" +
          "User-agent: *\nCrawl-delay: 10\nDisallow: /\n"))
    val base = documents(s, d).select(col("doc_id"), domain.as("domain"),
      robots.as("robots"),
      concat(lit("/p"), pmod(col("doc_id"), lit(5L))).as("path"),
      (pmod(col("doc_id"), lit(10L)).cast("double") / 10.0).as("priority"))
    val rules = TextAnalysis.parseRobots(
      base.select(col("domain"), col("robots")).distinct(), col("robots"))
    ordered(
      TextAnalysis.frontierSchedule(
        base.select(col("doc_id"), col("domain"), col("path"), col("priority")),
        rules, userAgent = "graftbot/2.1"),
      "doc_id")
  }

  /** FETCH→EXTRACT composition — the crawl entry at full fidelity:
    * each of the four HTTP transfer shapes wraps into a one-record
    * WARC blob (`application/http;msgtype=response`, byte-counted),
    * then `Multimodal.fetchPages` runs the WARC byte walk → HTTP
    * status/header split → de-chunk/gunzip → charset-aware decode and
    * keeps only 2xx pages (the 404 and the 301 drop). The oracle
    * restates the surviving rows arithmetically. */
  def xFetchExtract(s: SparkSession, d: String): DataFrame = {
    val http = Multimodal.syntheticHttpResponses(documents(s, d))
    val header = concat(
      lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: http://f"),
      pmod(col("doc_id"), lit(50L)),
      lit(".example/p"), pmod(col("doc_id"), lit(9L)),
      lit("\r\nContent-Type: application/http;msgtype=response\r\n" +
        "Content-Length: "),
      octet_length(col("payload")).cast("string"), lit("\r\n\r\n"))
    val blob = concat(encode(header, "UTF-8"), col("payload"),
      encode(lit("\r\n\r\n"), "UTF-8"))
    ordered(
      Multimodal.fetchPages(
        http.select(col("doc_id"), blob.as("payload"))),
      "doc_id")
  }

  /** HTTP response split — WARC `response` records carry the RAW HTTP
    * exchange, so the crawl pipeline needs a status/header/body split
    * before any text extraction: `Multimodal.syntheticHttpResponses`
    * builds four transfer shapes (plain + charset param, bare-LF 404,
    * chunked with a size-line extension, gzip Content-Encoding over a
    * real stored-deflate member) and `BinaryMeta.httpMeta`/`httpBody`
    * run the actual header walk, RFC 9112 §7.1 de-chunking, and the
    * verify-then-concatenate gunzip while the oracle restates every
    * field arithmetically. */
  def xHttpResponse(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BinaryMeta
    val m = BinaryMeta.httpMetaCol(col("payload"))
    ordered(
      Multimodal.syntheticHttpResponses(documents(s, d))
        .select(col("doc_id"),
          m.getField("status").as("status"),
          m.getField("content_type").as("content_type"),
          m.getField("charset").as("charset"),
          m.getField("content_encoding").as("content_encoding"),
          m.getField("chunked").as("chunked"),
          decode(BinaryMeta.httpBodyCol(col("payload")), "UTF-8").as("body")),
      "doc_id")
  }

  /** A/V DURATION walk — the field a media manifest actually filters
    * on, and the one a single-header parse cannot give: multi-frame
    * MP3/ADTS fixtures (`Multimodal.syntheticAvFrames`) walked
    * frame-to-frame through `BinaryMeta.mp3FrameStats`/
    * `adtsFrameStats` (spec frame-length arithmetic: Layer III 144·
    * br/rate; ADTS header length field), while the oracle regenerates
    * frame counts, sample totals, integer-ms durations and byte spans
    * arithmetically. Pure codegen'd map-side scan. */
  def xAvDuration(s: SparkSession, d: String): DataFrame = {
    import graft.functions.BinaryMeta
    val p = col("payload")
    val mp3 = BinaryMeta.mp3FrameStatsCol(p)
    val aac = BinaryMeta.adtsFrameStatsCol(p)
    ordered(
      Multimodal.syntheticAvFrames(documents(s, d))
        .select(col("doc_id"),
          when(pmod(col("doc_id"), lit(2L)) === 0, "mp3").otherwise("aac")
            .as("fmt"),
          coalesce(element_at(mp3, 1), element_at(aac, 1)).as("n_frames"),
          coalesce(element_at(mp3, 2), element_at(aac, 2)).as("total_samples"),
          coalesce(element_at(mp3, 3), element_at(aac, 3)).as("duration_ms"),
          coalesce(element_at(mp3, 4), element_at(aac, 4)).as("bytes_walked")),
      "doc_id")
  }

  /** REAL G.711 companded-audio decode: µ-law/A-law WAV fixtures
    * (`Multimodal.syntheticWavG711`) decoded through
    * `BinaryMeta.wavG711Stats`' actual container parse + ITU-T
    * expansion arithmetic while the oracle expands the same bytes
    * through the G.711 formulas written directly in SQL. Lossy audio
    * stub now excludes the log-companded telephony codecs; MP3/AAC
    * remain. */
  def xWavG711(s: SparkSession, d: String): DataFrame = {
    val stats = graft.functions.BinaryMeta.wavG711StatsCol(col("payload"))
    ordered(
      Multimodal.syntheticWavG711(documents(s, d))
        .select(col("doc_id"),
          element_at(stats, 1).as("n_samples"),
          element_at(stats, 2).as("peak"),
          element_at(stats, 3).as("sum_abs"),
          element_at(stats, 4).as("sum_sq")),
      "doc_id")
  }

  /** IMAGE near-dup via perceptual dHash: 9×8 BMP fixtures where docs
    * 2k/2k+1 are sub-luma-perturbed twins (`Multimodal.
    * syntheticBmpImages`), paired by `Dedup.imageNearDupPairs` — the
    * codegen'd decode+dhash scan and the 4×16-bit banded equi-join
    * with exact-hamming verification. The oracle regenerates every
    * dHash grid cell arithmetically and pairs by a direct quadratic
    * hamming join (the exactness reference the banded path must
    * reproduce, the x_dedup_minhash gate shape for images). */
  def xImageNearDup(s: SparkSession, d: String): DataFrame =
    ordered(
      Dedup.imageNearDupPairs(
        Multimodal.syntheticBmpImages(documents(s, d)), "doc_id", "payload",
        maxDist = 3),
      "d1", "d2")

  /** HTML → text extraction gate: every document wraps into a
    * deterministic HTML page (title/style/script head, h1, entity-
    * escaped body text, literal entities and a comment planted) and
    * `TextAnalysis.htmlToText` must recover the prose — script/style
    * CONTENT dropped, tags stripped, entities decoded, whitespace
    * collapsed. The oracle runs the IDENTICAL regex/replace chain in
    * DuckDB (patterns chosen to mean the same thing in Java regex and
    * RE2), so the extraction semantics are pinned cross-engine. */
  def xHtmlText(s: SparkSession, d: String): DataFrame = {
    val esc = replace(replace(replace(col("text"),
      lit("&"), lit("&amp;")), lit("<"), lit("&lt;")), lit(">"), lit("&gt;"))
    val html = concat(
      lit("<html><head><title>t</title><style>p { color: #111; }</style>" +
        "<script type=\"text/javascript\">var x = 1 < 2 && v > 0;</script>" +
        "</head><body><h1 class=\"hd\">"),
      col("source"),
      lit("</h1><!-- nav --><p>"), esc,
      lit(" &amp; &lt;tag&gt; &quot;q&quot;&nbsp;end</p></body></html>"))
    ordered(
      documents(s, d).select(col("doc_id"),
        TextAnalysis.htmlToText(html).as("txt")),
      "doc_id")
  }

  /** URL canonicalization gate: deterministic messy URLs (mixed-case
    * scheme/host, www., default ports, trailing slashes, scrambled
    * query with a utm_ tracking param, fragment) built from doc_id
    * arithmetic; `TextAnalysis.urlCanonical` + `registrableDomain`
    * must produce the dedup key and domain grouping the oracle's
    * IDENTICAL regex/list chain produces in DuckDB. */
  def xUrlCanonical(s: SparkSession, d: String): DataFrame = {
    val u = concat(
      when(pmod(col("doc_id"), lit(2)) === 0, lit("HTTPS")).otherwise(lit("http")),
      lit("://"),
      when(pmod(col("doc_id"), lit(3)) === 0, lit("WWW.")).otherwise(lit("")),
      lit("Site"), pmod(col("doc_id"), lit(50)),
      element_at(array(lit(".com"), lit(".co.uk"), lit(".org"),
        lit(".example.net")), (pmod(col("doc_id"), lit(4)) + 1).cast("int")),
      when(pmod(col("doc_id"), lit(5)) === 0,
        when(pmod(col("doc_id"), lit(2)) === 0, lit(":443")).otherwise(lit(":80")))
        .otherwise(lit("")),
      lit("/a"), pmod(col("doc_id"), lit(7)),
      when(pmod(col("doc_id"), lit(2)) === 0, lit("/")).otherwise(lit("")),
      lit("?utm_source=x&b="), pmod(col("doc_id"), lit(9)),
      lit("&a="), pmod(col("doc_id"), lit(3)),
      lit("#sec"), pmod(col("doc_id"), lit(3)))
    val canon = TextAnalysis.urlCanonical(u)
    ordered(
      documents(s, d).select(col("doc_id"), canon.as("canon"),
        TextAnalysis.registrableDomain(
          regexp_extract(canon, "^([^/?]*)", 1)).as("domain")),
      "doc_id")
  }

  /** Frame sampling at 1 fps over the chars-as-milliseconds payload —
    * timestamps by metadata arithmetic, each frame row carrying only
    * its own 32-char slice (the video half of the multimodal
    * plumbing). */
  def xFrameSample(s: SparkSession, d: String): DataFrame =
    ordered(
      Multimodal.sampleFrames(documents(s, d)),
      "doc_id", "frame_idx")

  /** Content-defined chunking (rolling-gram boundaries, mod-8 on the
    * 3-gram h32 — expected ~8-token chunks): the insertion-robust chunk
    * table whose chunk_hash column is the corpus chunk-dedup key.
    * Map-side only — spec-pinned Exchange-free. */
  def xChunkCdc(s: SparkSession, d: String): DataFrame =
    ordered(TextAnalysis.chunkCdc(documents(s, d), grams = 3, modulus = 8),
      "doc_id", "chunk_idx")

  /** K-center greedy (farthest-point) coreset selection over the int8
    * codes, k=8: the greedy trace (round, vec_id, dist2) — dist2 is the
    * integer squared-L2 covering radius after each pick. */
  def xCoresetKcenter(s: SparkSession, d: String): DataFrame =
    ordered(Similarity.kCenterSelect(embeddings(s, d), k = 8), "round")

  /** Corpus-frequency boilerplate removal at 50% per-source document
    * frequency, over a derived corpus with a deterministic 3-token
    * per-source header planted on every document (the newline-free
    * fixture has no real chrome; the header IS one derived line, so the
    * filter must find and strip exactly it — plus any true high-df
    * collisions — in every document). */
  def xBoilerplate(s: SparkSession, d: String): DataFrame = {
    val planted = documents(s, d).select(col("doc_id"), col("source"),
      concat(col("source"), lit(" bulletin notice "), col("text")).as("text"))
    ordered(TextAnalysis.removeBoilerplate(planted), "doc_id")
  }

  /** Cross-source 3-gram overlap matrix: shared distinct grams + both
    * directed containments (integer ppm) for every source pair. */
  def xSourceOverlap(s: SparkSession, d: String): DataFrame =
    ordered(TextAnalysis.sourceOverlap(documents(s, d), n = 3),
      "src_a", "src_b")

  /** Maximal-marginal-relevance selection at λ=1/2 (integer objective
    * rel − max_sim over q8 codes, query = lowest-id vector), k=8: the
    * diversity-aware top-k trace. */
  def xCoresetMmr(s: SparkSession, d: String): DataFrame =
    ordered(Similarity.mmrSelect(embeddings(s, d), k = 8), "round")

  /** IVF index maintenance — the incremental-ingest half of ANN ops: NEW
    * vectors (a derived delta set: shifted ids, reversed embeddings —
    * deterministic and distinct, the snapshot-diff convention) are
    * assigned to the EXISTING centroids, which are never recomputed from
    * base+delta. That is the production contract: an index absorbs
    * deltas between periodic rebuilds, so assignment must depend only on
    * the frozen seed set (re-seeding would silently reshuffle every
    * existing cluster id). One broadcast of the 16 seeds + one map-side
    * argmax scan over the delta — the delta never joins the base corpus.
    * Output: each new vector's cluster plus per-cluster base/delta
    * counts (the growth report that schedules the next rebuild). */
  def xAnnAssignNew(s: SparkSession, d: String): DataFrame = {
    val vecs = embeddings(s, d)
    val seeds = Similarity.ivfSeedCentroids(s, vecs, nlist = 16)
    val delta = vecs.select((col("vec_id") + 10000000L).as("vec_id"),
      reverse(col("embedding")).as("embedding"))
    val assigned = Similarity.ivfAssignSeeds(s, delta, seeds)
      .select(col("vec_id"), col("cluster"))
    val base = Similarity.ivfAssignSeeds(s, vecs, seeds)
      .groupBy(col("cluster")).agg(count(lit(1)).as("base_ct"))
    val growth = assigned.groupBy(col("cluster")).agg(count(lit(1)).as("delta_ct"))
    ordered(
      assigned
        .join(broadcast(base), Seq("cluster"), "left")
        .join(broadcast(growth), Seq("cluster"), "left")
        .select(col("vec_id"), col("cluster").cast("long").as("cluster"),
          coalesce(col("base_ct"), lit(0L)).as("base_ct"), col("delta_ct")),
      "vec_id")
  }

  /** Rank-biased overlap (Webber et al. 2010) between the BM25 top-25
    * and the vector top-25 — the standard top-weighted agreement measure
    * between two rankings (here: how much the lexical and semantic
    * retrievers agree, the audit published next to an RRF fusion). Per
    * depth d: the integer overlap |S_:d ∩ T_:d| (an item counts from
    * depth max(rank_S, rank_T) on), agreement in integer ppm, and the
    * truncated RBO prefix sum at p=1/2 — every p^d is an exact dyadic
    * double and the running sum is ordered by depth, so the rounded
    * score is engine-stable. All work after the two (already-gated)
    * top-k lists is on ≤25-row tables — bounded at any corpus scale. */
  def xRankRbo(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val text = TextAnalysis.bm25TopK(documents(s, d), bm25Terms, k = 25)
      .select(col("doc_id"), col("rank").as("__rt"))
    val vecs = embeddings(s, d)
    val vec = Similarity.bruteForceTopK(vecs, vecs.filter(col("vec_id") === 0), k = 25)
      .select(col("nn_id").as("doc_id"), col("rank").as("__rv"))
    val m = text.join(vec, Seq("doc_id"))
      .select(greatest(col("__rt"), col("__rv")).as("__m"))
    val depths = s.range(1, 26).select(col("id").as("depth"))
    val ov = depths.join(broadcast(m), col("__m") <= col("depth"), "left")
      .groupBy(col("depth")).agg(count(col("__m")).as("overlap"))
    val w = Window.orderBy(col("depth")).rowsBetween(Window.unboundedPreceding, 0)
    ordered(
      ov.withColumn("agree_ppm", expr("overlap * 1000000L div depth"))
        .withColumn("__term",
          col("overlap").cast("double") / col("depth") * pow(lit(0.5), col("depth")))
        .withColumn("rbo_trunc", round(sum(col("__term")).over(w), 6))
        .drop("__term"),
      "depth")
  }

  /** The three gate table files as (tbl, raw file bytes) — a
    * `binaryFile` scan, i.e. the footer reader's real deployment shape
    * (in a cluster it would be a ranged GET of the last N KB; here the
    * files are small enough to read whole). */
  private def parquetRaw(s: SparkSession, d: String): DataFrame =
    s.read.format("binaryFile")
      .load(s"$d/lineitem.parquet", s"$d/orders.parquet",
        s"$d/documents.parquet")
      .select(
        regexp_extract(col("path"), "([a-z]+)\\.parquet$", 1).as("tbl"),
        col("content"))

  /** Parquet footer STATISTICS gate — `functions/ParquetFooter`'s
    * thrift-compact walk of FileMetaData, surfaced as per-column-chunk
    * (type, value count, null count, min, max) rows for the int64 /
    * int32 / byte-array columns of three parquet-cpp-written testdata
    * files. The oracle recomputes every statistic FROM THE DATA
    * (count/min/max over the same views), so a single bad varint,
    * zigzag, or little-endian decode hash-mismatches. This is the
    * planning tier of a 100 TB lake: row-group pruning, compaction
    * sizing, and inventory audits read exactly these footer fields
    * without touching data pages. Codec id is parsed but gated in
    * ParquetFooterSpec (a writer choice, not a data fact); timestamps
    * are excluded (physical unit is a writer choice too). */
  def xParquetFooter(s: SparkSession, d: String): DataFrame = {
    val wanted = Seq("l_orderkey", "l_partkey", "l_linenumber",
      "l_returnflag", "o_orderkey", "o_custkey", "o_orderstatus",
      "doc_id", "lang", "source")
    ordered(
      parquetRaw(s, d)
        .select(col("tbl"),
          explode(graft.functions.ParquetFooter.columnChunksCol(col("content")))
            .as("c"))
        .filter(col("c.col_path").isin(wanted: _*))
        .select(col("tbl"), col("c.col_path").as("col_name"),
          col("c.ptype"), col("c.num_values"), col("c.null_count"),
          col("c.min_s"), col("c.max_s")),
      "tbl", "col_name")
  }

  /** Parquet footer SCHEMA/file-level gate — num_rows (FileMetaData
    * field 3) and the row-group row total (independent footer field)
    * both oracled against `count(*)`, leaf count and sorted leaf names
    * against DESCRIBE. Proves the schema-element walk (leaf = element
    * with no children) and the row-group list walk on real files. */
  def xParquetSchema(s: SparkSession, d: String): DataFrame =
    ordered(
      parquetRaw(s, d)
        .select(col("tbl"),
          graft.functions.ParquetFooter.fileMetaCol(col("content")).as("m"))
        .select(col("tbl"), col("m.num_rows").as("num_rows"),
          col("m.rg_rows_total").as("rg_rows_total"),
          col("m.n_leaves").cast("long").as("n_leaves"),
          col("m.leaf_names").as("leaf_names")),
      "tbl")

  /** Longest-prefix-match enrichment gate — `operators/Net.lpmJoin`
    * (per-length broadcast equi-joins, most-specific-first coalesce;
    * zero shuffles, zero fact duplication) over a CIDR feed derived
    * from nation/region (three tiers: /8 default, /16 per nation, /24
    * sites, plus a never-matching block and a malformed row the parser
    * must drop) against customer "access log" addresses, some
    * malformed (total-parser pass-through). The oracle restates the
    * address arithmetic as integers and picks the longest match with a
    * window — so a wrong mask, wrong tie order, or sloppy parse
    * hash-mismatches. */
  def xIpLpm(s: SparkSession, d: String): DataFrame = {
    val nat = nation(s, d)
    val reg = region(s, d)
    val dims = nat.select(
      concat_ws("", lit("10."), col("n_nationkey"), lit(".0.0/16")).as("cidr"),
      concat_ws("", lit("nation-"), col("n_nationkey")).as("label"))
      .unionByName(nat.filter(pmod(col("n_nationkey"), lit(3)) === 0).select(
        concat_ws("", lit("10."), col("n_nationkey"), lit("."),
          pmod(col("n_nationkey") * 2, lit(256)), lit(".0/24")).as("cidr"),
        concat_ws("", lit("site-"), col("n_nationkey")).as("label")))
      .unionByName(reg.filter(col("r_regionkey") === 0)
        .select(lit("10.0.0.0/8").as("cidr"), lit("default").as("label")))
      .unionByName(reg.filter(col("r_regionkey") === 1)
        .select(lit("192.168.0.0/16").as("cidr"), lit("private").as("label")))
      .unionByName(reg.filter(col("r_regionkey") === 2)
        .select(lit("not-a-cidr").as("cidr"), lit("junk").as("label")))
    val facts = customer(s, d).select(col("c_custkey"),
      when(pmod(col("c_custkey"), lit(97)) === 0, lit("999.1.2.3"))
        .otherwise(concat_ws(".", lit("10"), pmod(col("c_custkey"), lit(40)),
          pmod(col("c_custkey") * 2, lit(256)), pmod(col("c_custkey"), lit(250))))
        .as("ip"))
    ordered(
      graft.operators.Net.lpmJoin(facts, col("ip"), dims, col("cidr"),
        Seq("label")),
      "c_custkey")
  }

  /** Spatial radius join gate — `operators/Geo.radiusJoin` (grid-cell
    * bucketed equi-join + exact haversine re-filter, modular longitude
    * cells) on synthetic customer/supplier coordinates, radius 130 km,
    * against the brute-force cross-join oracle computing the same
    * haversine. Distances meter-rounded in the output; the fixture's
    * lattice keeps every pair >10 km away from the radius boundary so
    * the gate is libm-ULP-safe. */
  def xGeoRadius(s: SparkSession, d: String): DataFrame = {
    val cust = customer(s, d).select(col("c_custkey"),
      (pmod(col("c_custkey"), lit(120)) * 0.7 - 42.0).as("clat"),
      (pmod(col("c_custkey"), lit(360)) - 180.0 + 0.25).as("clon"))
    val supp = supplier(s, d).select(col("s_suppkey"),
      (pmod(col("s_suppkey"), lit(120)) * 0.7 - 41.65).as("slat"),
      (pmod(col("s_suppkey"), lit(360)) - 180.0 + 0.45).as("slon"))
    ordered(
      graft.operators.Geo.radiusJoin(cust, "clat", "clon",
        supp, "slat", "slon", 130.0)
        .select(col("c_custkey"), col("s_suppkey"),
          round(col("dist_km"), 3).as("dist_km")),
      "c_custkey", "s_suppkey")
  }

  /** One byte as a 2-hex-digit string (fixture building). */
  private def pbyte(v: org.apache.spark.sql.Column) = lpad(hex(v), 2, "0")

  /** 80 ASCII chars derived from the document text (regex-normalized +
    * padded) — the shared base string for the codec fixtures, where
    * byte offsets and char offsets must coincide. */
  private def asciiBase80 = rpad(
    substring(regexp_replace(col("text"), "[^a-z ]", ""), 1, 80), 80, "x")

  /** Protobuf wire-format walk gate — SQL-built proto3 messages (six
    * fields: single- and multi-byte varints, a zigzag sint, a UTF-8
    * string, a fixed32, and a field number ≥16 forcing a 2-byte tag)
    * decoded by `functions/ProtoWire.fieldsCol`; the oracle restates
    * every field row arithmetically, including the zigzag decode, so
    * one wrong varint shift or tag split hash-mismatches. */
  def xProtoFields(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val v1 = pmod(id, lit(120L))
    val v2 = lit(200L) + pmod(id * 37L, lit(5000L)) // 2-byte varint
    val str = concat(lit("doc-"), id.cast("string"))
    val v4 = id * 3L + 7L // fixed32
    val v5 = pmod(id, lit(100L)) - 50L // sint
    val z5 = when(v5 < 0, -v5 * 2L - 1L).otherwise(v5 * 2L)
    val v16 = pmod(id, lit(7L))
    val payload = unhex(concat(
      lit("08"), pbyte(v1),
      lit("10"), pbyte(v2.bitwiseAND(lit(127L)) + 128L),
      pbyte(shiftrightunsigned(v2, 7)),
      lit("1A"), pbyte(length(str)), hex(str),
      lit("25"), pbyte(v4.bitwiseAND(lit(255L))),
      pbyte(shiftrightunsigned(v4, 8).bitwiseAND(lit(255L))),
      pbyte(shiftrightunsigned(v4, 16).bitwiseAND(lit(255L))),
      pbyte(shiftrightunsigned(v4, 24).bitwiseAND(lit(255L))),
      lit("28"), pbyte(z5),
      lit("8001"), pbyte(v16)))
    val fx = documents(s, d).select(id, payload.as("payload"))
    ordered(
      fx.select(id,
        explode(graft.functions.ProtoWire.fieldsCol(col("payload"))).as("f"))
        .select(id, col("f.idx"), col("f.field_no"), col("f.wire_type"),
          col("f.int_value"), col("f.sint_value"), col("f.len_value"),
          col("f.str_value")),
      "doc_id", "idx")
  }

  /** LZ4 block decode gate — SQL-built blocks exercising every format
    * face: 255-continuation literal lengths, a back-reference into the
    * literal run, an offset-1 overlapping copy (RLE), continuation
    * match lengths, and the literals-only final sequence. The oracle
    * reconstructs the decoded text with substr/repeat arithmetic. */
  def xLz4Block(s: SparkSession, d: String): DataFrame = {
    val base = asciiBase80
    val block = unhex(concat(
      // seq1: 40 literals (15+25) + match len 20 (15+4+1) at offset 40
      lit("FF"), lit("19"), hex(substring(base, 1, 40)), lit("2800"), lit("01"),
      // seq2: 1 literal + RLE copy (offset 1, len 9)
      lit("15"), hex(substring(base, 41, 1)), lit("0100"),
      // seq3 (final): 20 literals only (15+5)
      lit("F0"), lit("05"), hex(substring(base, 42, 20))))
    val fx = documents(s, d).select(col("doc_id"), block.as("block"))
    ordered(
      fx.select(col("doc_id"),
        graft.functions.BlockCodecs.lz4BlockCol(col("block")).as("dec"))
        .select(col("doc_id"), col("dec").cast("string").as("decoded"),
          octet_length(col("dec")).cast("long").as("n_bytes")),
      "doc_id")
  }

  /** Snappy raw-block decode gate — SQL-built blocks exercising the
    * 2-byte varint preamble (verified against produced length), short
    * and long-form literals, copy-1 (11-bit offset) and copy-2
    * elements, and a copy spanning two earlier elements. Oracle =
    * substr arithmetic. */
  def xSnappyBlock(s: SparkSession, d: String): DataFrame = {
    val base = asciiBase80
    val block = unhex(concat(
      lit("8701"), // preamble: 135
      lit("74"), hex(substring(base, 1, 30)), // literal 30
      lit("191E"), // copy-1: len 10, offset 30
      lit("F045"), hex(substring(base, 11, 70)), // long-form literal 70
      lit("626400"))) // copy-2: len 25, offset 100
    val fx = documents(s, d).select(col("doc_id"), block.as("block"))
    ordered(
      fx.select(col("doc_id"),
        graft.functions.BlockCodecs.snappyBlockCol(col("block")).as("dec"))
        .select(col("doc_id"), col("dec").cast("string").as("decoded"),
          octet_length(col("dec")).cast("long").as("n_bytes")),
      "doc_id")
  }

  /** Parquet DATA-PAGE read gate — `functions/ParquetPages` decodes one
    * int64 and one string column per testdata file from the raw bytes
    * (footer → page headers → our-own-snappy decompress → PLAIN dict →
    * RLE/bit-packed indices → null interleave), then aggregates the
    * decoded arrays map-side with higher-order functions; the oracle
    * recomputes count/sum/min/max/distinct FROM THE DATA, so one wrong
    * bit-unpack shift, dictionary index, or page boundary
    * hash-mismatches. The whole read is one binaryFile scan row per
    * file — values never shuffle. */
  def xParquetPages(s: SparkSession, d: String): DataFrame = {
    val intName = when(col("tbl") === "lineitem", lit("l_orderkey"))
      .when(col("tbl") === "orders", lit("o_custkey"))
      .otherwise(lit("doc_id"))
    val strName = when(col("tbl") === "lineitem", lit("l_returnflag"))
      .when(col("tbl") === "orders", lit("o_orderstatus"))
      .otherwise(lit("lang"))
    ordered(
      parquetRaw(s, d)
        .select(col("tbl"),
          graft.functions.ParquetPages.int64ColumnCol(col("content"), intName).as("v"),
          graft.functions.ParquetPages.stringColumnCol(col("content"), strName).as("sv"))
        .select(col("tbl"),
          size(col("v")).cast("long").as("n"),
          aggregate(col("v"), lit(0L), (acc, x) => acc + coalesce(x, lit(0L)))
            .as("sum_v"),
          array_min(col("v")).as("min_v"), array_max(col("v")).as("max_v"),
          size(array_distinct(col("sv"))).cast("long").as("n_distinct_s"),
          array_min(col("sv")).as("min_s"), array_max(col("sv")).as("max_s")),
      "tbl")
  }

  /** Stats-based row-group pruning gate — the composition that makes
    * the footer tier PAY: a range predicate prunes row groups by
    * footer min/max before any page I/O (`ParquetPages.int64PrunedCol`),
    * the surviving groups' pages decode, and an exact re-filter over
    * the decoded array yields the answer. One table's range misses the
    * file entirely (kept_groups = 0 — zero pages touched); the others
    * keep the group and match a slice. Oracle recomputes kept_groups
    * from min/max overlap and the match count/sum from the data. */
  def xParquetPrune(s: SparkSession, d: String): DataFrame = {
    val raw = parquetRaw(s, d)
    def face(t: String, colName: String, lo: Long, hi: Long) =
      raw.filter(col("tbl") === t)
        .select(col("tbl"),
          graft.functions.ParquetPages
            .int64PrunedCol(col("content"), lit(colName), lo, hi).as("p"),
          lit(lo).as("__lo"), lit(hi).as("__hi"))
    val u = face("lineitem", "l_orderkey", 1000L, 2000L)
      .unionByName(face("orders", "o_custkey", 900000L, 950000L))
      .unionByName(face("documents", "doc_id", 100L, 200L))
    val matched = filter(col("p.values"),
      v => v.isNotNull && v >= col("__lo") && v <= col("__hi"))
    ordered(
      u.select(col("tbl"),
        col("p.kept_groups").cast("long").as("kept_groups"),
        size(matched).cast("long").as("n_match"),
        aggregate(matched, lit(0L), (a, x) => a + x).as("sum_match")),
      "tbl")
  }

  /** Raw-DEFLATE decode gate — multi-block stored streams (BFINAL=0
    * then BFINAL=1, LEN/NLEN verified) built in SQL, decoded by
    * `functions/Inflate.rawCol` (the dependency-free RFC 1951 decoder;
    * its fixed/dynamic Huffman paths are spec-proven against real
    * Deflater output at every level/strategy — Huffman bitstreams
    * aren't SQL-expressible). Oracle = substr arithmetic. */
  def xInflateRaw(s: SparkSession, d: String): DataFrame = {
    val base = asciiBase80
    def le16(v: org.apache.spark.sql.Column) =
      concat(pbyte(v.bitwiseAND(lit(255L))),
        pbyte(shiftrightunsigned(v, 8).bitwiseAND(lit(255L))))
    def stored(finalBit: String, body: org.apache.spark.sql.Column) =
      concat(lit(finalBit), le16(length(body).cast("long")),
        le16(lit(65535L) - length(body).cast("long")), hex(body))
    val stream = unhex(concat(
      stored("00", substring(base, 1, 50)),
      stored("01", substring(base, 51, 30))))
    ordered(
      documents(s, d).select(col("doc_id"),
        graft.functions.Inflate.rawCol(stream).as("dec"))
        .select(col("doc_id"), col("dec").cast("string").as("decoded"),
          octet_length(col("dec")).cast("long").as("n_bytes")),
      "doc_id")
  }

  /** Plan-time Avro OCF header (magic + metadata map + sync) for the
    * fixture schema, as a hex constant. */
  private def avroHeaderHex(codec: String): String = {
    val schema = """{"type":"record","name":"r","fields":""" +
      """[{"name":"id","type":"long"},{"name":"name","type":"string"}]}"""
    def zz(n: Long): Seq[Byte] = {
      var v = (n << 1) ^ (n >> 63)
      val b = scala.collection.mutable.ArrayBuffer.empty[Byte]
      do {
        var x = v & 0x7f; v >>>= 7
        if (v != 0) x |= 0x80
        b += x.toByte
      } while (v != 0)
      b.toSeq
    }
    val bb = scala.collection.mutable.ArrayBuffer.empty[Byte]
    bb ++= "Obj".getBytes("UTF-8"); bb += 1
    bb ++= zz(2)
    def kv(k: String, v: String): Unit = {
      bb ++= zz(k.length); bb ++= k.getBytes("UTF-8")
      bb ++= zz(v.length); bb ++= v.getBytes("UTF-8")
    }
    kv("avro.schema", schema); kv("avro.codec", codec)
    bb += 0
    bb ++= avroSyncBytes
    bb.map(x => f"${x & 0xff}%02X").mkString
  }
  private val avroSyncBytes: Seq[Byte] = (0 until 16).map(i => (0xa0 + i).toByte)
  private val avroSyncHex: String =
    avroSyncBytes.map(x => f"${x & 0xff}%02X").mkString

  /** Zigzag varint of a small nonnegative long column, as hex (values
    * < 8192 → 1–2 bytes). */
  private def zzvHex(v: org.apache.spark.sql.Column) = {
    val z = v * 2
    when(z < 128, pbyte(z))
      .otherwise(concat(pbyte(z.bitwiseAND(lit(127L)) + 128L),
        pbyte(shiftrightunsigned(z, 7))))
  }

  /** Avro OCF read gate — `functions/AvroRead` decodes SQL-built
    * container files end to end: schema JSON through the in-house
    * parser, zigzag block framing, sync-marker verification, record
    * bodies (zigzag longs, length-prefixed strings), and BOTH the null
    * codec and the deflate codec (each block a stored raw-DEFLATE
    * stream routed through our own Inflate). Oracle restates record
    * counts, per-file id sums, and the joined name list. Real-writer
    * lineage (DataFileWriter, all codecs, nullable unions, multi-block)
    * is AvroReadSpec's job. */
  def xAvroRead(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val name1 = concat(lit("doc-"), id.cast("string"))
    val name2 = concat(lit("n"), id.cast("string"))
    def rec(idc: org.apache.spark.sql.Column, n: org.apache.spark.sql.Column) =
      concat(zzvHex(idc), zzvHex(length(n).cast("long")), hex(n))
    val bodyHex = concat(rec(id, name1), rec(id + 7L, name2))
    val bodyLen = (length(bodyHex) / 2).cast("long")
    val blockN = concat(lit("04"), zzvHex(bodyLen), bodyHex, lit(avroSyncHex))
    val ocfN = unhex(concat(lit(avroHeaderHex("null")), blockN))
    // deflate codec: the block payload is a stored raw-DEFLATE frame
    def le16(v: org.apache.spark.sql.Column) =
      concat(pbyte(v.bitwiseAND(lit(255L))),
        pbyte(shiftrightunsigned(v, 8).bitwiseAND(lit(255L))))
    val framed = concat(lit("01"), le16(bodyLen), le16(lit(65535L) - bodyLen),
      bodyHex)
    val blockD = concat(lit("04"), zzvHex(bodyLen + 5L), framed,
      lit(avroSyncHex))
    val ocfD = unhex(concat(lit(avroHeaderHex("deflate")), blockD))

    def face(variant: String, ocf: org.apache.spark.sql.Column) =
      documents(s, d).select(id, lit(variant).as("variant"), ocf.as("ocf"))
        .select(id, col("variant"),
          graft.functions.AvroRead.fileMetaCol(col("ocf")).as("m"),
          graft.functions.AvroRead.int64ColumnCol(col("ocf"), lit("id")).as("ids"),
          graft.functions.AvroRead.stringColumnCol(col("ocf"), lit("name")).as("names"))
        .select(id, col("variant"),
          col("m.n_records").as("n_records"),
          col("m.codec").as("codec"),
          col("m.field_names").as("field_names"),
          aggregate(col("ids"), lit(0L), (a, x) => a + x).as("sum_id"),
          array_join(col("names"), ",").as("names"))
    ordered(face("null", ocfN).unionByName(face("deflate", ocfD)),
      "doc_id", "variant")
  }

  /** Parquet MAP + nested-list fixture: Spark writes orders-derived
    * map<string,bigint> and array<array<bigint>> columns with a tiny
    * page size, so records split MID-LIST across v1 pages — the case
    * that breaks any per-page assembly. Once per sf-dir per JVM. */
  private def parquetMapFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#pqmap", _ => {
      val p = java.nio.file.Files.createTempDirectory("pq_map")
      orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        when(col("o_orderkey") % 7 === 0, lit(null))
          .when(col("o_orderkey") % 5 === 0, map())
          .otherwise(map(
            lit("ck"), col("o_custkey").cast("long"),
            lit("k2"), col("o_orderkey") * 2)).as("m"),
        when(col("o_orderkey") % 11 === 0, lit(null))
          .otherwise(array(
            array(col("o_orderkey").cast("long")),
            array(col("o_custkey").cast("long"),
              col("o_orderkey") + 1))).as("aa"))
        .coalesce(1).write
        .option("compression", "snappy")
        .option("parquet.page.size", "1024")
        .mode("overwrite").parquet(p.toString)
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      p.toString
    })

  /** Parquet MAP + nested-list gate — the generalized def/rep
    * reconstruction: a map<string,bigint> column (two leaf chunks
    * zipped into sorted `k=v` CSVs) and an array<array<bigint>> column
    * (depth-2 Dremel assembly), both Spark-written with records split
    * mid-list across pages; every surfaced number restated from orders
    * in the oracle. */
  def xParquetMap(s: SparkSession, d: String): DataFrame = {
    val dir = parquetMapFixture(s, d)
    val P = graft.functions.ParquetPages
    ordered(
      s.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".parquet"))
        .select(
          P.int64ColumnCol(col("content"), lit("k")).as("ks"),
          P.mapInt64CsvCol(col("content"), lit("m")).as("ms"),
          P.int64List2ColumnCol(col("content"), lit("aa")).as("aas"))
        .select(explode(arrays_zip(col("ks"), col("ms"), col("aas")))
          .as("r"))
        .select(col("r.ks").as("k"), col("r.ms").as("m_csv"),
          col("r.aas").as("aa"))
        .select(col("k"), col("m_csv"),
          col("aa").isNull.cast("long").as("aa_null"),
          coalesce(size(col("aa")), lit(-1)).cast("long").as("n_outer"),
          coalesce(aggregate(col("aa"), lit(0L),
            (a, xs) => a + aggregate(xs, lit(0L),
              (b, y) => b + coalesce(y, lit(0L)))), lit(0L)).as("sum_aa")),
      "k")
  }

  /** Parquet STRUCT fixture: a Spark-written nested-struct column
    * (nullable outer, struct-in-struct) derived from orders. */
  private def parquetStructFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#pqstruct", _ => {
      val p = java.nio.file.Files.createTempDirectory("pq_struct")
      orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        when(col("o_orderkey") % 7 === 0, lit(null)).otherwise(struct(
          col("o_custkey").cast("long").as("ck"),
          col("o_orderstatus").as("st"),
          struct(round(col("o_totalprice") * 100).cast("long").as("cents"))
            .as("inner"))).as("meta"))
        .coalesce(1).write.option("compression", "snappy")
        .mode("overwrite").parquet(p.toString)
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      p.toString
    })

  /** Parquet STRUCT gate — dotted-path reads through nested struct
    * groups (the def-level interleave distinguishes a null OUTER
    * struct from a null field): three depths surfaced per row and
    * restated from orders with CASE arithmetic. */
  def xParquetStruct(s: SparkSession, d: String): DataFrame = {
    val dir = parquetStructFixture(s, d)
    val P = graft.functions.ParquetPages
    ordered(
      s.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".parquet"))
        .select(
          P.int64ColumnCol(col("content"), lit("k")).as("ks"),
          P.int64ColumnCol(col("content"), lit("meta.ck")).as("cks"),
          P.stringColumnCol(col("content"), lit("meta.st")).as("sts"),
          P.int64ColumnCol(col("content"), lit("meta.inner.cents"))
            .as("cents"))
        .select(explode(arrays_zip(col("ks"), col("cks"), col("sts"),
          col("cents"))).as("r"))
        .select(col("r.ks").as("k"), col("r.cks").as("ck"),
          col("r.sts").as("st"), col("r.cents").as("cents")),
      "k")
  }

  /** Nested-Avro fixture: one OCF per order priority written by the
    * generic tree writer (nested record, array, map, nullable union;
    * codec cycling null/deflate/zstandard by priority index), rows
    * sorted by key for determinism. Written once per sf-dir per JVM. */
  private def avroNestedFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#avro_nested", _ => {
      val dir = java.nio.file.Files.createTempDirectory("avro_nested")
      val schemaJson =
        """{"type":"record","name":"e","fields":[
          |  {"name":"prio","type":"string"},
          |  {"name":"k","type":"long"},
          |  {"name":"meta","type":{"type":"record","name":"m0","fields":[
          |    {"name":"st","type":"string"},{"name":"ck","type":"long"}]}},
          |  {"name":"parts","type":{"type":"array","items":"long"}},
          |  {"name":"m","type":{"type":"map","values":"long"}},
          |  {"name":"opt","type":["null","long"]}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      val codecs = Array("null", "deflate", "zstandard")
      val rows = orders(s, d).select(col("o_orderpriority"),
        col("o_orderkey").cast("long"), col("o_orderstatus"),
        col("o_custkey").cast("long")).collect() // fixture build only
      rows.groupBy(_.getString(0)).foreach { case (prio, rs) =>
        val i = prio.head - '1' // "1-URGENT" → 0 … "5-LOW" → 4
        val recs = rs.sortBy(_.getLong(1)).map { r =>
          val k = r.getLong(1)
          Map[String, Any](
            "prio" -> prio, "k" -> k,
            "meta" -> Map[String, Any]("st" -> r.getString(2),
              "ck" -> r.getLong(3)),
            "parts" -> Seq[Any](k, k + 1L),
            "m" -> scala.collection.mutable.LinkedHashMap[String, Any](
              "kk" -> k, "k2" -> 2 * k),
            "opt" -> (if (k % 13 == 0) null
              else java.lang.Long.valueOf(2 * k)))
        }
        java.nio.file.Files.write(dir.resolve(s"group-$i.avro"),
          graft.functions.AvroWrite.genericFileBytes(
            schemaJson, recs.toSeq, codecs(i % 3)))
      }
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Nested-Avro READ gate — the full schema tree through the faces:
    * dotted paths into nested records, array + string→long map fields,
    * nullable unions, all three codecs; every surfaced number restated
    * from orders in the oracle (a wrong branch index, block count, or
    * path step hash-mismatches). */
  def xAvroNested(s: SparkSession, d: String): DataFrame = {
    val dir = avroNestedFixture(s, d)
    val A = graft.functions.AvroRead
    ordered(
      s.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".avro"))
        .select(
          A.fileMetaCol(col("content")).as("fm"),
          A.stringColumnCol(col("content"), lit("prio")).as("prios"),
          A.int64ColumnCol(col("content"), lit("k")).as("ks"),
          A.stringColumnCol(col("content"), lit("meta.st")).as("sts"),
          A.int64ColumnCol(col("content"), lit("meta.ck")).as("cks"),
          A.int64ListColumnCol(col("content"), lit("parts")).as("parts"),
          A.mapInt64CsvCol(col("content"), lit("m")).as("ms"),
          A.int64ColumnCol(col("content"), lit("opt")).as("opts"))
        .select(
          element_at(col("prios"), 1).as("prio"),
          col("fm.codec").as("codec"),
          col("fm.n_records").as("n"),
          aggregate(col("ks"), lit(0L), (a, x) => a + x).as("sum_k"),
          array_min(col("sts")).as("min_st"),
          array_max(col("sts")).as("max_st"),
          aggregate(col("cks"), lit(0L), (a, x) => a + x).as("sum_ck"),
          aggregate(col("parts"), lit(0L),
            (a, xs) => a + aggregate(xs, lit(0L), (b, y) => b + y))
            .as("sum_parts"),
          element_at(col("ms"), 1).as("first_m"),
          size(filter(col("opts"), x => x.isNull)).cast("long")
            .as("n_null_opt"),
          aggregate(col("opts"), lit(0L),
            (a, x) => a + coalesce(x, lit(0L))).as("sum_opt")),
      "prio")
  }

  /** Parquet WRITE gate — the format tier closed as a loop:
    * `ParquetWrite.parquetFile` aggregates each order-priority group
    * into a complete parquet file BLOB (PLAIN pages, thrift footer,
    * stats; deterministic under shuffle order), and the same query
    * decodes the blobs back through ParquetFooter + ParquetPages. The
    * oracle recomputes every group aggregate from the data, so a wrong
    * thrift field id, page size, or value encoding breaks the chain.
    * Spark's own parquet reader consuming these blobs is
    * ParquetWriteSpec's cross-implementation check. */
  def xParquetWrite(s: SparkSession, d: String): DataFrame = {
    val blobs = orders(s, d).groupBy(col("o_orderpriority"))
      .agg(graft.functions.ParquetWrite
        .parquetFile(col("o_orderkey"), col("o_orderstatus"), "k", "st")
        .as("f"))
    ordered(
      blobs.select(col("o_orderpriority"),
        graft.functions.ParquetFooter.fileMetaCol(col("f")).as("m"),
        graft.functions.ParquetPages.int64ColumnCol(col("f"), lit("k")).as("ks"),
        graft.functions.ParquetPages.stringColumnCol(col("f"), lit("st")).as("sts"))
        .select(col("o_orderpriority"),
          col("m.num_rows").as("n_records"),
          aggregate(col("ks"), lit(0L), (a, x) => a + x).as("sum_key"),
          array_min(col("sts")).as("min_status"),
          array_max(col("sts")).as("max_status")),
      "o_orderpriority")
  }

  /** ORC tail gate — the third lake format, read almost entirely with
    * machinery other gates already prove: Spark writes the orders pair
    * to ORC in all three supported codecs (none / zlib / snappy), and
    * `functions/OrcMeta` walks the PostScript + Footer protobuf with
    * ProtoWire, de-frames the 3-byte chunk framing, inflates ZLIB
    * chunks with our own Inflate and snappy chunks with our block
    * decoder, and surfaces row counts, stripe totals, and per-column
    * min/max/sum statistics — all oracled against the data. */
  /** ORC fixture dirs, written once per (sf-dir, codec) per JVM and
    * registered for exit-time deletion — repeated gate invocations
    * must not re-write or leak temp dirs (the write is a driver-side
    * side effect of query CONSTRUCTION, so it has to be idempotent). */
  private val orcFixtureDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def orcFixture(src: DataFrame, d: String, codec: String): String =
    orcFixtureDirs.computeIfAbsent(s"$d|$codec", _ => {
      val p = java.nio.file.Files.createTempDirectory(s"orc_meta_$codec")
      src.coalesce(1).write.option("compression", codec)
        .mode("overwrite").orc(p.toString)
      // deleteOnExit runs in reverse registration order: register the
      // dir first (pre-order walk) so children delete before parents
      val walk = java.nio.file.Files.walk(p)
      try {
        walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      } finally walk.close()
      p.toString
    })

  def xOrcMeta(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d).select(col("o_orderkey"), col("o_orderstatus"))
    val faces = Seq("none", "zlib", "snappy", "zstd").map { codec =>
      val dir = orcFixture(src, d, codec)
      val m = graft.functions.OrcMeta.fileMetaCol(col("content")).as("m")
      val ks = graft.functions.OrcMeta
        .colStatsCol(col("content"), lit("o_orderkey")).as("ks")
      val ss = graft.functions.OrcMeta
        .colStatsCol(col("content"), lit("o_orderstatus")).as("ss")
      s.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".orc"))
        .select(lit(codec).as("codec"), m, ks, ss)
        .select(col("codec"),
          col("m.n_rows").as("n_rows"),
          col("m.stripe_rows_total").as("stripe_rows_total"),
          col("m.field_names").as("field_names"),
          col("ks.min_l").as("min_key"), col("ks.max_l").as("max_key"),
          col("ks.sum_l").as("sum_key"),
          col("ss.min_s").as("min_status"), col("ss.max_s").as("max_status"))
    }
    ordered(faces.reduce(_ unionByName _), "codec")
  }

  /** Avro WRITE gate — the row-format twin of x_parquet_write:
    * `AvroWrite.avroFile` aggregates each order-priority group into a
    * complete OCF blob (deterministic under shuffle order, multi-block
    * past 4096 records), decoded back in the same query through our
    * AvroRead; group aggregates oracled from the data. The REAL
    * avro-java DataFileReader consuming these blobs is AvroWriteSpec's
    * cross-implementation check. */
  def xAvroWrite(s: SparkSession, d: String): DataFrame = {
    val blobs = orders(s, d).groupBy(col("o_orderpriority"))
      .agg(graft.functions.AvroWrite
        .avroFile(col("o_orderkey"), col("o_orderstatus"), "k", "st")
        .as("f"))
    ordered(
      blobs.select(col("o_orderpriority"),
        graft.functions.AvroRead.fileMetaCol(col("f")).as("m"),
        graft.functions.AvroRead.int64ColumnCol(col("f"), lit("k")).as("ks"),
        graft.functions.AvroRead.stringColumnCol(col("f"), lit("st")).as("sts"))
        .select(col("o_orderpriority"),
          col("m.n_records").as("n_records"),
          aggregate(col("ks"), lit(0L), (a, x) => a + x).as("sum_key"),
          array_min(col("sts")).as("min_status"),
          array_max(col("sts")).as("max_status")),
      "o_orderpriority")
  }

  /** Delta-table fixture: a hand-committed table per the public Delta
    * protocol — one parquet file per order priority, three JSON
    * commits (meta+3 adds; 2 more adds; one tombstone), partitioned
    * on `prio` via partitionValues. Written once per sf-dir per JVM. */
  private def deltaFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#delta", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_tab")
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      def writePart(p: String, name: String): Long = {
        val tmp = java.nio.file.Files.createTempDirectory("dpart").toString
        orders(s, d).filter(col("o_orderpriority") === p)
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = dir.resolve(name)
        java.nio.file.Files.move(part.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.size(dest)
      }
      def commit(v: Long, lines: Seq[String]): Unit = {
        val p = dir.resolve("_delta_log").resolve(f"$v%020d.json")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, lines.mkString("\n") + "\n")
      }
      def add(name: String, prio: String, size: Long): String =
        s"""{"add":{"path":"$name","partitionValues":{"prio":"$prio"},""" +
          s""""size":$size,"dataChange":true}}"""
      val schemaJson = org.apache.spark.sql.types.StructType
        .fromDDL("k BIGINT, st STRING, prio STRING").json
        .replace("\\", "\\\\").replace("\"", "\\\"")
      val sizes = prios.zipWithIndex.map { case (p, i) =>
        writePart(p, s"part-$i.parquet")
      }
      commit(0, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"orders","schemaString":"$schemaJson",""" +
          s""""partitionColumns":["prio"]}}""") ++
        (0 to 2).map(i => add(s"part-$i.parquet", prios(i), sizes(i))))
      commit(1, (3 to 4).map(i => add(s"part-$i.parquet", prios(i), sizes(i))))
      commit(2, Seq("""{"remove":{"path":"part-1.parquet",""" +
        """"deletionTimestamp":1,"dataChange":true}}"""))
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  private val IceSnap1 = 3051729675574597001L
  private val IceSnap2 = 3051729675574597002L

  /** Iceberg-table fixture: a hand-built table per the public Iceberg
    * spec layout — parquet data files per order priority, Avro
    * manifests + manifest lists written by the generic nested Avro
    * writer, v1 metadata.json with TWO snapshots (63-bit ids): snap1
    * adds priorities 1–3; snap2 rewrites that manifest with 2-HIGH
    * DELETED and adds 4–5. Recorded location differs from the actual
    * dir, so every path exercises the rebase. Once per sf-dir per JVM. */
  private def icebergFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#iceberg", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_tab")
      val loc = "file:///warehouse/orders_ice"
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val counts = orders(s, d).groupBy(col("o_orderpriority"))
        .count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      def writePart(p: String, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("icepart").toString
        orders(s, d).filter(col("o_orderpriority") === p)
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"), col("o_orderpriority").as("prio"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val part = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = dir.resolve("data").resolve(name)
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.move(part.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      val manifestSchema =
        """{"type":"record","name":"manifest_entry","fields":[
          |  {"name":"status","type":"int"},
          |  {"name":"snapshot_id","type":["null","long"]},
          |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          |    {"name":"file_path","type":"string"},
          |    {"name":"file_format","type":"string"},
          |    {"name":"record_count","type":"long"},
          |    {"name":"file_size_in_bytes","type":"long"}]}}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      val listSchema =
        """{"type":"record","name":"manifest_file","fields":[
          |  {"name":"manifest_path","type":"string"},
          |  {"name":"manifest_length","type":"long"},
          |  {"name":"partition_spec_id","type":"int"},
          |  {"name":"content","type":"int"},
          |  {"name":"added_snapshot_id","type":["null","long"]}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      def entry(status: Int, snapId: Long, i: Int): Map[String, Any] = Map(
        "status" -> status,
        "snapshot_id" -> java.lang.Long.valueOf(snapId),
        "data_file" -> Map(
          "file_path" -> s"$loc/data/part-$i.parquet",
          "file_format" -> "PARQUET",
          "record_count" -> counts.getOrElse(prios(i), 0L),
          "file_size_in_bytes" -> 1L))
      def writeManifest(name: String, es: Seq[Map[String, Any]]): Unit = {
        val p = dir.resolve("metadata").resolve(name)
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.write(p, graft.functions.AvroWrite
          .genericFileBytes(manifestSchema, es))
      }
      def writeList(name: String, manifests: Seq[String]): Unit =
        java.nio.file.Files.write(dir.resolve("metadata").resolve(name),
          graft.functions.AvroWrite.genericFileBytes(listSchema,
            manifests.map(m => Map[String, Any](
              "manifest_path" -> s"$loc/metadata/$m",
              "manifest_length" -> 1L, "partition_spec_id" -> 0,
              "content" -> 0, "added_snapshot_id" -> null))))
      prios.indices.foreach(i => writePart(prios(i), s"part-$i.parquet"))
      writeManifest("manifest-1.avro",
        (0 to 2).map(i => entry(1, IceSnap1, i)))
      writeList("snap-1.avro", Seq("manifest-1.avro"))
      writeManifest("manifest-1r.avro", Seq(
        entry(0, IceSnap1, 0), entry(2, IceSnap2, 1), entry(0, IceSnap1, 2)))
      writeManifest("manifest-2.avro",
        (3 to 4).map(i => entry(1, IceSnap2, i)))
      writeList("snap-2.avro", Seq("manifest-1r.avro", "manifest-2.avro"))
      java.nio.file.Files.writeString(
        dir.resolve("metadata").resolve("v2.metadata.json"),
        s"""{
          |  "format-version": 1,
          |  "table-uuid": "9c12f1b2-0000-4000-8000-00000000000b",
          |  "location": "$loc",
          |  "last-updated-ms": 1700000000000,
          |  "schema": {"type": "struct", "fields": [
          |    {"id": 1, "name": "k", "required": true, "type": "long"},
          |    {"id": 2, "name": "st", "required": false, "type": "string"},
          |    {"id": 3, "name": "prio", "required": false, "type": "string"}]},
          |  "partition-spec": [],
          |  "current-snapshot-id": $IceSnap2,
          |  "snapshots": [
          |    {"snapshot-id": $IceSnap1, "timestamp-ms": 1700000001000,
          |     "summary": {"operation": "append"},
          |     "manifest-list": "$loc/metadata/snap-1.avro"},
          |    {"snapshot-id": $IceSnap2, "parent-snapshot-id": $IceSnap1,
          |     "timestamp-ms": 1700000002000,
          |     "summary": {"operation": "overwrite"},
          |     "manifest-list": "$loc/metadata/snap-2.avro"}]
          |}""".stripMargin)
      java.nio.file.Files.writeString(
        dir.resolve("metadata").resolve("version-hint.text"), "2\n")
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg prune-fixture: one snapshot over five orderkey-bucketed
    * parquet files whose manifest entries carry real per-file
    * lower/upper bounds for `k` (field id 1) in Iceberg single-value
    * (8-byte LE) serialization. Mirrors deltaPruneFixture. */
  private def icebergPruneFixture(s: SparkSession, d: String,
                                  w: Long): String =
    parquetNestedDirs.computeIfAbsent(s"$d#iceprune", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_prune")
      val loc = "file:///warehouse/orders_ice_prune"
      def le64(v: Long): Array[Byte] =
        (0 until 8).map(k => ((v >>> (8 * k)) & 0xff).toByte).toArray
      val manifestSchema =
        """{"type":"record","name":"manifest_entry","fields":[
          |  {"name":"status","type":"int"},
          |  {"name":"snapshot_id","type":["null","long"]},
          |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          |    {"name":"file_path","type":"string"},
          |    {"name":"file_format","type":"string"},
          |    {"name":"record_count","type":"long"},
          |    {"name":"file_size_in_bytes","type":"long"},
          |    {"name":"partition","type":["null",{"type":"record",
          |      "name":"r102","fields":[
          |        {"name":"b","type":["null","long"],"default":null}]}],
          |     "default":null},
          |    {"name":"lower_bounds","type":["null",{"type":"array","items":
          |      {"type":"record","name":"kv1","fields":[
          |        {"name":"key","type":"int"},
          |        {"name":"value","type":"bytes"}]}}],"default":null},
          |    {"name":"upper_bounds","type":["null",{"type":"array","items":
          |      {"type":"record","name":"kv2","fields":[
          |        {"name":"key","type":"int"},
          |        {"name":"value","type":"bytes"}]}}],"default":null}]}}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      val listSchema =
        """{"type":"record","name":"manifest_file","fields":[
          |  {"name":"manifest_path","type":"string"},
          |  {"name":"manifest_length","type":"long"},
          |  {"name":"partition_spec_id","type":"int"},
          |  {"name":"content","type":"int"},
          |  {"name":"added_snapshot_id","type":["null","long"]}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      val entries = (0 until 5).flatMap { i =>
        val lo = i * w + 1
        val hi = (i + 1) * w
        val tag = ('a' + i).toChar.toString // per-bucket string stat
        val part = orders(s, d)
          .filter(col("o_orderkey").between(lo, hi))
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"), lit(tag).as("tag"),
            lit(i.toLong).as("b"))
        val stats = part.agg(min("k"), max("k"), count(lit(1)))
          .collect().head
        if (stats.getLong(2) == 0) None
        else {
          val tmp = java.nio.file.Files.createTempDirectory("ip").toString
          part.coalesce(1).write.mode("overwrite").parquet(tmp)
          val f = new java.io.File(tmp).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dest = dir.resolve("data").resolve(s"bucket-$i.parquet")
          java.nio.file.Files.createDirectories(dest.getParent)
          java.nio.file.Files.move(f.toPath, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          Some(Map[String, Any]("status" -> 1,
            "snapshot_id" -> java.lang.Long.valueOf(IceSnap1),
            "data_file" -> Map[String, Any](
              "file_path" -> s"$loc/data/bucket-$i.parquet",
              "file_format" -> "PARQUET",
              "record_count" -> stats.getLong(2),
              "file_size_in_bytes" -> java.nio.file.Files.size(dest),
              "partition" -> Map[String, Any]("b" -> i.toLong),
              "lower_bounds" -> Seq(
                Map[String, Any]("key" -> 1,
                  "value" -> le64(stats.getLong(0))),
                Map[String, Any]("key" -> 3,
                  "value" -> tag.getBytes("UTF-8"))),
              "upper_bounds" -> Seq(
                Map[String, Any]("key" -> 1,
                  "value" -> le64(stats.getLong(1))),
                Map[String, Any]("key" -> 3,
                  "value" -> tag.getBytes("UTF-8"))))))
        }
      }
      val metaP = dir.resolve("metadata")
      java.nio.file.Files.createDirectories(metaP)
      java.nio.file.Files.write(metaP.resolve("manifest-1.avro"),
        graft.functions.AvroWrite.genericFileBytes(manifestSchema, entries))
      java.nio.file.Files.write(metaP.resolve("snap-1.avro"),
        graft.functions.AvroWrite.genericFileBytes(listSchema,
          Seq(Map[String, Any](
            "manifest_path" -> s"$loc/metadata/manifest-1.avro",
            "manifest_length" -> 1L, "partition_spec_id" -> 0,
            "content" -> 0, "added_snapshot_id" -> null))))
      java.nio.file.Files.writeString(metaP.resolve("v1.metadata.json"),
        s"""{
          |  "format-version": 1,
          |  "table-uuid": "9c12f1b2-0000-4000-8000-00000000000c",
          |  "location": "$loc",
          |  "last-updated-ms": 1700000000000,
          |  "schema": {"type": "struct", "fields": [
          |    {"id": 1, "name": "k", "required": true, "type": "long"},
          |    {"id": 2, "name": "st", "required": false, "type": "string"},
          |    {"id": 3, "name": "tag", "required": false, "type": "string"},
          |    {"id": 4, "name": "b", "required": false, "type": "long"}]},
          |  "partition-spec": [{"source-id": 4, "field-id": 1000,
          |    "name": "b", "transform": "identity"}],
          |  "current-snapshot-id": $IceSnap1,
          |  "snapshots": [
          |    {"snapshot-id": $IceSnap1, "timestamp-ms": 1700000001000,
          |     "summary": {"operation": "append"},
          |     "manifest-list": "$loc/metadata/snap-1.avro"}]
          |}""".stripMargin)
      java.nio.file.Files.writeString(
        metaP.resolve("version-hint.text"), "1\n")
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Nested-schema Iceberg fixture: one data file whose TABLE SCHEMA
    * nests a struct (rec: ck/st) and a list (arr = [k, 2k]) — the
    * metadata's type JSON uses Iceberg's nested struct/list objects,
    * exercising the recursive type mapping end-to-end. */
  private def icebergNestedFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#icenest", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_nest")
      val loc = "file:///warehouse/orders_ice_nest"
      val n = {
        val tmp = java.nio.file.Files.createTempDirectory("in").toString
        val df = orders(s, d).select(
          col("o_orderkey").cast("long").as("k"),
          struct(col("o_custkey").cast("long").as("ck"),
            col("o_orderstatus").as("st")).as("rec"),
          array(col("o_orderkey").cast("long"),
            (col("o_orderkey") * 2).cast("long")).as("arr"))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = dir.resolve("data").resolve("part-0.parquet")
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.move(f.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        df.count()
      }
      val manifestSchema =
        """{"type":"record","name":"manifest_entry","fields":[
          |  {"name":"status","type":"int"},
          |  {"name":"snapshot_id","type":["null","long"]},
          |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          |    {"name":"file_path","type":"string"},
          |    {"name":"file_format","type":"string"},
          |    {"name":"record_count","type":"long"},
          |    {"name":"file_size_in_bytes","type":"long"}]}}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      val listSchema =
        """{"type":"record","name":"manifest_file","fields":[
          |  {"name":"manifest_path","type":"string"},
          |  {"name":"manifest_length","type":"long"},
          |  {"name":"partition_spec_id","type":"int"},
          |  {"name":"content","type":"int"},
          |  {"name":"added_snapshot_id","type":["null","long"]}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      val metaP = dir.resolve("metadata")
      java.nio.file.Files.createDirectories(metaP)
      java.nio.file.Files.write(metaP.resolve("manifest-1.avro"),
        graft.functions.AvroWrite.genericFileBytes(manifestSchema,
          Seq(Map[String, Any]("status" -> 1,
            "snapshot_id" -> java.lang.Long.valueOf(IceSnap1),
            "data_file" -> Map[String, Any](
              "file_path" -> s"$loc/data/part-0.parquet",
              "file_format" -> "PARQUET", "record_count" -> n,
              "file_size_in_bytes" -> 1L)))))
      java.nio.file.Files.write(metaP.resolve("snap-1.avro"),
        graft.functions.AvroWrite.genericFileBytes(listSchema,
          Seq(Map[String, Any](
            "manifest_path" -> s"$loc/metadata/manifest-1.avro",
            "manifest_length" -> 1L, "partition_spec_id" -> 0,
            "content" -> 0, "added_snapshot_id" -> null))))
      java.nio.file.Files.writeString(metaP.resolve("v1.metadata.json"),
        s"""{
          |  "format-version": 2,
          |  "table-uuid": "9c12f1b2-0000-4000-8000-00000000000f",
          |  "location": "$loc",
          |  "last-updated-ms": 1700000000000,
          |  "last-sequence-number": 1,
          |  "current-schema-id": 0,
          |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
          |    {"id": 1, "name": "k", "required": true, "type": "long"},
          |    {"id": 2, "name": "rec", "required": false, "type":
          |      {"type": "struct", "fields": [
          |        {"id": 4, "name": "ck", "required": false, "type": "long"},
          |        {"id": 5, "name": "st", "required": false,
          |         "type": "string"}]}},
          |    {"id": 3, "name": "arr", "required": false, "type":
          |      {"type": "list", "element-id": 6, "element": "long",
          |       "element-required": false}}]}],
          |  "default-spec-id": 0,
          |  "partition-specs": [{"spec-id": 0, "fields": []}],
          |  "current-snapshot-id": $IceSnap1,
          |  "snapshots": [
          |    {"snapshot-id": $IceSnap1, "timestamp-ms": 1700000001000,
          |     "sequence-number": 1,
          |     "summary": {"operation": "append"},
          |     "manifest-list": "$loc/metadata/snap-1.avro"}]
          |}""".stripMargin)
      java.nio.file.Files.writeString(
        metaP.resolve("version-hint.text"), "1\n")
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg NESTED-SCHEMA gate — the recursive type mapping made
    * real: the table schema nests a struct and a list, the pinned
    * read resolves both, and leaf aggregates (struct fields as group
    * key and measure, list element by ordinal) are oracled from
    * orders — a mis-mapped nested type nulls a leaf and
    * hash-mismatches. */
  def xIcebergNested(s: SparkSession, d: String): DataFrame = {
    val snap = graft.operators.IcebergLite.snapshot(
      s, icebergNestedFixture(s, d))
    ordered(
      snap.groupBy(col("rec.st").as("st"))
        .agg(count(lit(1)).as("n"),
          sum(col("rec.ck")).as("sum_ck"),
          sum(element_at(col("arr"), 2)).as("sum_a2")),
      "st")
  }

  /** Column-mapped Delta fixture: parquet parts carry PHYSICAL
    * `col-…` names; metaData records name-mode column mapping with
    * per-field physicalName metadata; partitionValues keyed by the
    * physical partition name; protocol minReaderVersion 2. */
  private def deltaCmapFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#deltacmap", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_cmap")
      import org.apache.spark.sql.types._
      def phys(logical: String, p: String, dt: DataType): StructField =
        StructField(logical, dt, nullable = true,
          new MetadataBuilder()
            .putString("delta.columnMapping.physicalName", p)
            .putLong("delta.columnMapping.id", logical.length.toLong)
            .build())
      val schema = StructType(Seq(
        phys("k", "col-11aa", LongType),
        phys("st", "col-22bb", StringType),
        phys("prio", "col-33cc", StringType)))
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val sizes = prios.zipWithIndex.map { case (p, i) =>
        val tmp = java.nio.file.Files.createTempDirectory("dcm").toString
        orders(s, d).filter(col("o_orderpriority") === p)
          .select(col("o_orderkey").cast("long").as("col-11aa"),
            col("o_orderstatus").as("col-22bb"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = dir.resolve(s"part-$i.parquet")
        java.nio.file.Files.move(f.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.size(dest)
      }
      val schemaJson = schema.json
        .replace("\\", "\\\\").replace("\"", "\\\"")
      val lines = Seq(
        """{"protocol":{"minReaderVersion":2,"minWriterVersion":5}}""",
        s"""{"metaData":{"id":"cmap","schemaString":"$schemaJson",""" +
          """"partitionColumns":["prio"],"configuration":{""" +
          """"delta.columnMapping.mode":"name",""" +
          """"delta.columnMapping.maxColumnId":"3"}}}""") ++
        prios.indices.map(i =>
          s"""{"add":{"path":"part-$i.parquet","partitionValues":""" +
            s"""{"col-33cc":"${prios(i)}"},"size":${sizes(i)},""" +
            s""""dataChange":true}}""")
      val p = dir.resolve("_delta_log").resolve(f"${0L}%020d.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, lines.mkString("\n") + "\n")
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta COLUMN-MAPPING gate (name mode): the snapshot reads parquet
    * by physical `col-…` names and surfaces the LOGICAL schema, with
    * partition values resolved through the physical key; aggregates
    * oracled from orders — a missed rename or physical-key lookup
    * hash-mismatches. */
  def xDeltaCmap(s: SparkSession, d: String): DataFrame = {
    val snap = graft.operators.DeltaLite.snapshot(s, deltaCmapFixture(s, d))
    ordered(
      snap.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("st")).as("min_st"), max(col("st")).as("max_st")),
      "prio")
  }

  /** Delta deletion-vector fixture: per-priority data files (rows
    * sorted by orderkey so position == rank), protocol v3 with
    * readerFeatures=[deletionVectors]; 2-HIGH carries a `p`-storage DV
    * (real org.roaringbitmap bytes in the protocol's file framing)
    * deleting its EVEN positions, 5-LOW an INLINE base85 DV deleting
    * position 0. */
  private def deltaDvFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#deltadv", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_dv")
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val counts = orders(s, d).groupBy(col("o_orderpriority"))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val sizes = prios.indices.map { i =>
        val tmp = java.nio.file.Files.createTempDirectory("ddv").toString
        orders(s, d).filter(col("o_orderpriority") === prios(i))
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"),
            col("o_orderpriority").as("prio"))
          .repartition(1).sortWithinPartitions("k")
          .write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = dir.resolve(s"part-$i.parquet")
        java.nio.file.Files.move(f.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.size(dest)
      }
      def dvData(positions: Seq[Long]): Array[Byte] = {
        val rb = new org.roaringbitmap.RoaringBitmap()
        positions.foreach(p => rb.add(p.toInt))
        rb.runOptimize()
        val out = new java.io.ByteArrayOutputStream()
        def le32(v: Int): Unit =
          (0 until 4).foreach(k => out.write((v >>> (8 * k)) & 0xff))
        le32(graft.functions.DeletionVectors.PortableMagic)
        le32(1); le32(0)
        rb.serialize(new java.io.DataOutputStream(out))
        out.toByteArray
      }
      def b85(b0: Array[Byte]): String = {
        val b = java.util.Arrays.copyOf(b0, (b0.length + 3) / 4 * 4)
        val alpha = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
          "abcdefghijklmnopqrstuvwxyz!#$%&()*+-;<=>?@^_`{|}~"
        b.grouped(4).map { g =>
          var v = 0L
          g.foreach(x => v = (v << 8) | (x & 0xffL))
          (4 to 0 by -1).map(k =>
            alpha(((v / math.pow(85, k).toLong) % 85).toInt)).mkString
        }.mkString
      }
      val nHigh = counts.getOrElse("2-HIGH", 0L)
      val dHigh = dvData(0L.until(nHigh, 2L))
      val fileOut = new java.io.ByteArrayOutputStream()
      fileOut.write(1)
      def be32(v: Long): Unit = (3 to 0 by -1).foreach(k =>
        fileOut.write(((v >>> (8 * k)) & 0xff).toInt))
      be32(dHigh.length.toLong)
      fileOut.write(dHigh, 0, dHigh.length)
      val crc = new java.util.zip.CRC32
      crc.update(dHigh)
      be32(crc.getValue)
      java.nio.file.Files.write(dir.resolve("dv-high.bin"),
        fileOut.toByteArray)
      val dLow = dvData(Seq(0L))
      val schemaJson = org.apache.spark.sql.types.StructType
        .fromDDL("k BIGINT, st STRING, prio STRING").json
        .replace("\\", "\\\\").replace("\"", "\\\"")
      def add(i: Int, dv: String): String =
        s"""{"add":{"path":"part-$i.parquet","partitionValues":{},""" +
          s""""size":${sizes(i)},"dataChange":true$dv}}"""
      val lines = Seq(
        """{"protocol":{"minReaderVersion":3,"minWriterVersion":7,""" +
          """"readerFeatures":["deletionVectors"]}}""",
        s"""{"metaData":{"id":"dv","schemaString":"$schemaJson",""" +
          """"partitionColumns":[]}}""",
        add(0, ""), add(2, ""), add(3, ""),
        add(1, s""","deletionVector":{"storageType":"p",""" +
          s""""pathOrInlineDv":"dv-high.bin","offset":1,""" +
          s""""sizeInBytes":${dHigh.length},""" +
          s""""cardinality":${(nHigh + 1) / 2}}"""),
        add(4, s""","deletionVector":{"storageType":"i",""" +
          s""""pathOrInlineDv":"${b85(dLow)}","offset":0,""" +
          s""""sizeInBytes":${dLow.length},"cardinality":1}"""))
      val p = dir.resolve("_delta_log").resolve(f"${0L}%020d.json")
      java.nio.file.Files.createDirectories(p.getParent)
      java.nio.file.Files.writeString(p, lines.mkString("\n") + "\n")
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta DELETION-VECTOR gate — row-level deletes through the log:
    * p-storage (framed DV file) and inline base85 descriptors decode
    * through the in-house roaring/base85 tier and anti-join
    * `_metadata.row_index`; the oracle recomputes survivors by
    * excluding the even orderkey-ranks of 2-HIGH and the first row of
    * 5-LOW — one wrong bitmap bit or row ordinal hash-mismatches. */
  def xDeltaDv(s: SparkSession, d: String): DataFrame = {
    val snap = graft.operators.DeltaLite.snapshot(s, deltaDvFixture(s, d))
    ordered(
      snap.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("st")).as("min_st"), max(col("st")).as("max_st")),
      "prio")
  }

  private val IceSnap3 = 3051729675574597003L

  /** Append-chain Iceberg fixture: three `append` snapshots — snap1
    * adds priorities 1+2, snap2 (child) adds 3, snap3 (child) adds
    * 4+5; later manifest lists re-list earlier manifests (whose ADDED
    * entries keep their original snapshot ids), so attribution must
    * not double-count. */
  private def icebergAppendsFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#iceapp", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_app")
      val loc = "file:///warehouse/orders_ice_app"
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val counts = orders(s, d).groupBy(col("o_orderpriority"))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      prios.indices.foreach { i =>
        val tmp = java.nio.file.Files.createTempDirectory("ia").toString
        orders(s, d).filter(col("o_orderpriority") === prios(i))
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"),
            col("o_orderpriority").as("prio"))
          .coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = dir.resolve("data").resolve(s"part-$i.parquet")
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.move(f.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      val manifestSchema =
        """{"type":"record","name":"manifest_entry","fields":[
          |  {"name":"status","type":"int"},
          |  {"name":"snapshot_id","type":["null","long"]},
          |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          |    {"name":"file_path","type":"string"},
          |    {"name":"file_format","type":"string"},
          |    {"name":"record_count","type":"long"},
          |    {"name":"file_size_in_bytes","type":"long"}]}}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      val listSchema =
        """{"type":"record","name":"manifest_file","fields":[
          |  {"name":"manifest_path","type":"string"},
          |  {"name":"manifest_length","type":"long"},
          |  {"name":"partition_spec_id","type":"int"},
          |  {"name":"content","type":"int"},
          |  {"name":"added_snapshot_id","type":["null","long"]}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      def entry(snapId: Long, i: Int): Map[String, Any] = Map(
        "status" -> 1, "snapshot_id" -> java.lang.Long.valueOf(snapId),
        "data_file" -> Map[String, Any](
          "file_path" -> s"$loc/data/part-$i.parquet",
          "file_format" -> "PARQUET",
          "record_count" -> counts.getOrElse(prios(i), 0L),
          "file_size_in_bytes" -> 1L))
      val metaP = dir.resolve("metadata")
      java.nio.file.Files.createDirectories(metaP)
      def man(name: String, es: Seq[Map[String, Any]]): Unit =
        java.nio.file.Files.write(metaP.resolve(name),
          graft.functions.AvroWrite.genericFileBytes(manifestSchema, es))
      man("m1.avro", Seq(entry(IceSnap1, 0), entry(IceSnap1, 1)))
      man("m2.avro", Seq(entry(IceSnap2, 2)))
      man("m3.avro", Seq(entry(IceSnap3, 3), entry(IceSnap3, 4)))
      def list(name: String, ms: Seq[String]): Unit =
        java.nio.file.Files.write(metaP.resolve(name),
          graft.functions.AvroWrite.genericFileBytes(listSchema,
            ms.map(m => Map[String, Any](
              "manifest_path" -> s"$loc/metadata/$m",
              "manifest_length" -> 1L, "partition_spec_id" -> 0,
              "content" -> 0, "added_snapshot_id" -> null))))
      list("snap-1.avro", Seq("m1.avro"))
      list("snap-2.avro", Seq("m1.avro", "m2.avro"))
      list("snap-3.avro", Seq("m1.avro", "m2.avro", "m3.avro"))
      java.nio.file.Files.writeString(metaP.resolve("v1.metadata.json"),
        s"""{
          |  "format-version": 1,
          |  "table-uuid": "9c12f1b2-0000-4000-8000-000000000010",
          |  "location": "$loc",
          |  "last-updated-ms": 1700000000000,
          |  "schema": {"type": "struct", "fields": [
          |    {"id": 1, "name": "k", "required": true, "type": "long"},
          |    {"id": 2, "name": "st", "required": false, "type": "string"},
          |    {"id": 3, "name": "prio", "required": false, "type": "string"}]},
          |  "partition-spec": [],
          |  "current-snapshot-id": $IceSnap3,
          |  "snapshots": [
          |    {"snapshot-id": $IceSnap1, "timestamp-ms": 1700000001000,
          |     "summary": {"operation": "append"},
          |     "manifest-list": "$loc/metadata/snap-1.avro"},
          |    {"snapshot-id": $IceSnap2, "parent-snapshot-id": $IceSnap1,
          |     "timestamp-ms": 1700000002000,
          |     "summary": {"operation": "append"},
          |     "manifest-list": "$loc/metadata/snap-2.avro"},
          |    {"snapshot-id": $IceSnap3, "parent-snapshot-id": $IceSnap2,
          |     "timestamp-ms": 1700000003000,
          |     "summary": {"operation": "append"},
          |     "manifest-list": "$loc/metadata/snap-3.avro"}]
          |}""".stripMargin)
      java.nio.file.Files.writeString(
        metaP.resolve("version-hint.text"), "1\n")
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg WRITE fixture: a table OUR OWN `commitAppend` writes in
    * two snapshots (priorities 1–3, then 4–5); the first snapshot id
    * rides back in a sidecar file for the gate's pinning face. */
  private def icebergWriteFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#icewrite", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_write")
      def sel(ps: Seq[String]) = orders(s, d)
        .filter(col("o_orderpriority").isin(ps: _*))
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      // PARTITIONED by prio (identity): data files drop the column,
      // the gate's per-priority faces then hash-verify the tuple
      // reconstruction — with a space-bearing value in the loop
      val snap1 = graft.operators.IcebergLite.commitAppend(s,
        dir.toString, sel(Seq("1-URGENT", "2-HIGH", "3-MEDIUM")),
        partitionBy = Seq("prio"))
      graft.operators.IcebergLite.commitAppend(s,
        dir.toString, sel(Seq("4-NOT SPECIFIED", "5-LOW")),
        partitionBy = Seq("prio"))
      java.nio.file.Files.writeString(dir.resolve("SNAP1"),
        snap1.toString)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg WRITE gate — the Delta-write parity for format #2: our
    * commitAppend's output (manifests, manifest list, chained
    * metadata, written bounds) replays through our own scan reader
    * (current + pinned first snapshot) AND appendsBetween; every
    * (face, priority) aggregate restated from orders. */
  def xIcebergWrite(s: SparkSession, d: String): DataFrame = {
    val dir = icebergWriteFixture(s, d)
    val snap1 = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "SNAP1")).trim.toLong
    def face(label: String, df: DataFrame) =
      df.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("st")).as("min_st"))
        .select(lit(label).as("face"), col("prio"), col("n"),
          col("sum_k"), col("min_st"))
    ordered(
      face("cur", graft.operators.IcebergLite.snapshot(s, dir))
        .unionByName(face("v1",
          graft.operators.IcebergLite.snapshot(s, dir,
            snapshotId = snap1)))
        .unionByName(face("inc",
          graft.operators.IcebergLite.appendsBetween(s, dir, snap1)
            .drop("_snapshot_id"))),
      "face", "prio")
  }

  /** Iceberg INCREMENTAL-APPEND gate — the delta-loop consumer face:
    * `appendsBetween(snap1)` surfaces exactly the snap2/snap3
    * arrivals, attributed per snapshot (re-listed earlier manifests
    * never double-count); the oracle restates each (snapshot,
    * priority) group from orders. */
  def xIcebergAppends(s: SparkSession, d: String): DataFrame = {
    val ch = graft.operators.IcebergLite.appendsBetween(
      s, icebergAppendsFixture(s, d), IceSnap1)
    ordered(
      ch.groupBy(
        when(col("_snapshot_id") === IceSnap2, "s2").otherwise("s3")
          .as("snap"),
        col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k")),
      "snap", "prio")
  }

  /** Delta CHECKPOINT fixture: appends at v0 (prios 1–2) and v1
    * (prio 3), an OPTIMIZE rewrite at v2, an append at v3 (prio 4),
    * then a classic checkpoint at 3 and LOG CLEANUP — v0..v3's JSON
    * commits are gone, the checkpoint alone anchors them — and a
    * final append at v4 (prio 5) on top. */
  private def deltaCheckpointFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#deltacp", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_cp")
      def sel(ps: Seq[String]) = orders(s, d)
        .filter(col("o_orderpriority").isin(ps: _*))
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        sel(Seq("1-URGENT", "2-HIGH")))
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        sel(Seq("3-MEDIUM")))
      graft.operators.DeltaLite.commitCompact(s, dir.toString)
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        sel(Seq("4-NOT SPECIFIED")))
      graft.operators.DeltaLite.commitCheckpoint(s, dir.toString)
      graft.operators.DeltaLite.cleanLog(s, dir.toString)
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        sel(Seq("5-LOW")))
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta CHECKPOINT gate — bounded log replay at scale: the `cur`
    * face reads the table THROUGH the checkpoint plus the JSON tail
    * (the pre-checkpoint commits are deleted — a replay that ignored
    * the checkpoint has nothing to read), and the `cp` face
    * time-travels TO the checkpoint version, proving the reconciled
    * adds/tombstones/metaData in the checkpoint alone reproduce the
    * exact pre-cleanup state (compaction tombstones included). */
  def xDeltaCheckpoint(s: SparkSession, d: String): DataFrame = {
    val dir = deltaCheckpointFixture(s, d)
    def face(label: String, df: DataFrame) =
      df.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("st")).as("min_st"))
        .select(lit(label).as("face"), col("*"))
    ordered(
      face("cur", graft.operators.DeltaLite.snapshot(s, dir))
        .unionByName(face("cp",
          graft.operators.DeltaLite.snapshot(s, dir, versionAsOf = 3))),
      "face", "prio")
  }

  /** Delta VACUUM fixture: one-file appends at v0 (prios 1–3) and a
    * compaction at v1 (tombstoning v0's file at ts=1), an append at
    * v2 (prios 4–5), then `vacuum` with an aged-out cutoff — exactly
    * ONE file (v0's pre-compaction part) is deletable; the sidecar
    * records the deleted count for the gate's maint face. */
  private def deltaVacuumFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#deltavac", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_vac")
      def sel(ps: Seq[String]) = orders(s, d)
        .filter(col("o_orderpriority").isin(ps: _*)).coalesce(1)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        sel(Seq("1-URGENT", "2-HIGH", "3-MEDIUM")))
      graft.operators.DeltaLite.commitCompact(s, dir.toString)
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        sel(Seq("4-NOT SPECIFIED", "5-LOW")))
      val deleted = graft.operators.DeltaLite.vacuum(s, dir.toString,
        retentionMs = 1000L, nowMs = 1L << 40)
      java.nio.file.Files.writeString(dir.resolve("DELETED"),
        deleted.length.toString)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta VACUUM gate — the storage half of retention maintenance:
    * the `cur` face proves the snapshot reads EXACTLY after the
    * tombstoned pre-compaction file is physically deleted (a vacuum
    * that touched a live file would lose rows here), the `maint` row
    * pins that exactly one file aged out. */
  def xDeltaVacuum(s: SparkSession, d: String): DataFrame = {
    val dir = deltaVacuumFixture(s, d)
    val nDeleted = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "DELETED")).trim.toLong
    ordered(
      graft.operators.DeltaLite.snapshot(s, dir).groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .select(lit("cur").as("face"), col("*"))
        .unionByName(s.range(1).select(lit("maint").as("face"),
          lit("deleted").as("prio"), lit(nDeleted).as("n"),
          lit(0L).as("sum_k"))),
      "face", "prio")
  }

  /** Delta ROW-DELETE fixture: one partitioned append, then a
    * copy-on-write `commitDelete` of every row whose key is divisible
    * by 7 — the decontamination shape: only files holding matches
    * rewrite, and the commit carries an explicit `cdc` delete feed. */
  private def deltaDeleteFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#deltadel", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_del")
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        orders(s, d).coalesce(1)
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"),
            col("o_orderpriority").as("prio")), Seq("prio"))
      graft.operators.DeltaLite.commitDelete(s, dir.toString,
        col("k") % 7 === 0)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta ROW-DELETE gate — copy-on-write decontamination: the `cur`
    * face aggregates the post-delete snapshot (a rewrite that lost a
    * surviving row, or kept a matching one, hash-mismatches), the
    * `cdf` face replays the commit's explicit change feed — exactly
    * the deleted rows, as `delete` rows, nothing synthesized. */
  def xDeltaDelete(s: SparkSession, d: String): DataFrame = {
    val dir = deltaDeleteFixture(s, d)
    ordered(
      graft.operators.DeltaLite.snapshot(s, dir).groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .select(lit("cur").as("face"), col("*"))
        .unionByName(
          graft.operators.DeltaLite.changes(s, dir, 1L, 1L)
            .groupBy(col("prio"), col("_change_type"))
            .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
            .select(concat(lit("cdf_"), col("_change_type")).as("face"),
              col("prio"), col("n"), col("sum_k"))),
      "face", "prio")
  }

  /** Iceberg ROW-DELETE fixture: two appends, then the same
    * divisible-by-7 copy-on-write delete — one `overwrite` snapshot
    * carries the rewritten files plus DELETED entries. */
  private def icebergRowDeleteFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#icerowdel", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_del")
      def sel(ps: Seq[String]) = orders(s, d)
        .filter(col("o_orderpriority").isin(ps: _*)).coalesce(1)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      graft.operators.IcebergLite.commitAppend(s, dir.toString,
        sel(Seq("1-URGENT", "2-HIGH", "3-MEDIUM")))
      val pre = graft.operators.IcebergLite.commitAppend(s, dir.toString,
        sel(Seq("4-NOT SPECIFIED", "5-LOW")))
      graft.operators.IcebergLite.commitDelete(s, dir.toString,
        col("k") % 7 === 0)
      java.nio.file.Files.writeString(dir.resolve("PRE"), pre.toString)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg ROW-DELETE gate — the overwrite-snapshot face of
    * decontamination: `cur` aggregates the post-delete table, `pre`
    * time-travels to the snapshot before the delete and must read the
    * ORIGINAL files untouched (copy-on-write never mutates them). */
  def xIcebergDelete(s: SparkSession, d: String): DataFrame = {
    val dir = icebergRowDeleteFixture(s, d)
    val pre = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "PRE")).trim.toLong
    def face(label: String, df: DataFrame) =
      df.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .select(lit(label).as("face"), col("*"))
    ordered(
      face("cur", graft.operators.IcebergLite.snapshot(s, dir))
        .unionByName(face("pre",
          graft.operators.IcebergLite.snapshot(s, dir,
            snapshotId = pre))),
      "face", "prio")
  }

  /** Delta MERGE fixture: a partitioned table, then one upsert —
    * every k divisible by 5 updates its status to 'UP', three
    * synthetic negative-key rows insert under a brand-new partition
    * value. */
  private def deltaMergeFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#deltamerge", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_merge")
      val base = orders(s, d).coalesce(1)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      graft.operators.DeltaLite.commitAppend(s, dir.toString, base,
        Seq("prio"))
      val src = base.filter(col("k") % 5 === 0)
        .withColumn("st", lit("UP"))
        .unionByName(s.range(1, 4).select((-col("id")).as("k"),
          lit("NW").as("st"), lit("9-SYN").as("prio")))
      graft.operators.DeltaLite.commitMerge(s, dir.toString, src,
        Seq("k"))
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta MERGE gate — upsert with the protocol's CDC: the `cur`
    * face proves every matched row updated in place (n_upd counts
    * 'UP' statuses per priority) and the inserts landed under their
    * new partition; the `cdf_*` faces replay the commit's
    * update_preimage / update_postimage / insert rows — the postimage
    * carries the new values, the preimage the old. */
  def xDeltaMerge(s: SparkSession, d: String): DataFrame = {
    val dir = deltaMergeFixture(s, d)
    val cur = graft.operators.DeltaLite.snapshot(s, dir)
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count(when(col("st") === "UP", 1)).as("n_upd"))
      .select(lit("cur").as("face"), col("*"))
    val cdf = graft.operators.DeltaLite.changes(s, dir, 1L, 1L)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count(when(col("st") === "UP", 1)).as("n_upd"))
      .select(concat(lit("cdf_"), col("_change_type")).as("face"),
        lit("all").as("prio"), col("n"), col("sum_k"), col("n_upd"))
    ordered(cur.unionByName(cdf), "face", "prio")
  }

  /** Iceberg MERGE fixture: unpartitioned orders projection, one
    * upsert — k divisible by 5 updates to 'UP', three negative keys
    * insert — committed as ONE overwrite snapshot. */
  private def icebergMergeFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#icemerge", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_merge")
      val base = orders(s, d).coalesce(1)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      val pre = graft.operators.IcebergLite.commitAppend(s,
        dir.toString, base)
      val src = base.filter(col("k") % 5 === 0)
        .withColumn("st", lit("UP"))
        .unionByName(s.range(1, 4).select((-col("id")).as("k"),
          lit("NW").as("st"), lit("9-SYN").as("prio")))
      graft.operators.IcebergLite.commitMerge(s, dir.toString, src,
        Seq("k"))
      java.nio.file.Files.writeString(dir.resolve("PRE"), pre.toString)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg MERGE gate: `cur` proves the upserted table (updates in
    * place, inserts present), `pre` time-travels to the snapshot
    * before the merge and must read the ORIGINAL rows — copy-on-write
    * never mutates committed files. */
  def xIcebergMerge(s: SparkSession, d: String): DataFrame = {
    val dir = icebergMergeFixture(s, d)
    val pre = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "PRE")).trim.toLong
    def face(label: String, df: DataFrame) =
      df.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          count(when(col("st") === "UP", 1)).as("n_upd"))
        .select(lit(label).as("face"), col("*"))
    ordered(
      face("cur", graft.operators.IcebergLite.snapshot(s, dir))
        .unionByName(face("pre",
          graft.operators.IcebergLite.snapshot(s, dir,
            snapshotId = pre))),
      "face", "prio")
  }

  /** Delta UPDATE fixture: unpartitioned orders projection, one
    * copy-on-write update — every k divisible by 3 gets st='UX'. */
  private def deltaUpdateFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#deltaupd", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_upd")
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        orders(s, d).coalesce(1)
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"),
            col("o_orderpriority").as("prio")))
      graft.operators.DeltaLite.commitUpdate(s, dir.toString,
        col("k") % 3 === 0, Seq("st" -> lit("UX")))
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta UPDATE gate: `cur` proves in-place set-expression rewrites
    * (n_upd counts 'UX' per priority — exactly the k%3 rows), the
    * `cdf_*` faces replay the commit's preimage/postimage pairs. */
  def xDeltaUpdate(s: SparkSession, d: String): DataFrame = {
    val dir = deltaUpdateFixture(s, d)
    val cur = graft.operators.DeltaLite.snapshot(s, dir)
      .groupBy(col("prio"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count(when(col("st") === "UX", 1)).as("n_upd"))
      .select(lit("cur").as("face"), col("*"))
    val cdf = graft.operators.DeltaLite.changes(s, dir, 1L, 1L)
      .groupBy(col("_change_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        count(when(col("st") === "UX", 1)).as("n_upd"))
      .select(concat(lit("cdf_"), col("_change_type")).as("face"),
        lit("all").as("prio"), col("n"), col("sum_k"), col("n_upd"))
    ordered(cur.unionByName(cdf), "face", "prio")
  }

  /** Iceberg UPDATE fixture: unpartitioned orders projection, the
    * same k%3 copy-on-write update, one overwrite snapshot. */
  private def icebergUpdateFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#iceupd", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_upd")
      val pre = graft.operators.IcebergLite.commitAppend(s, dir.toString,
        orders(s, d).coalesce(1)
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"),
            col("o_orderpriority").as("prio")))
      graft.operators.IcebergLite.commitUpdate(s, dir.toString,
        col("k") % 3 === 0, Seq("st" -> lit("UX")))
      java.nio.file.Files.writeString(dir.resolve("PRE"), pre.toString)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg UPDATE gate: `cur` proves the set-expression rewrite,
    * `pre` time-travels to the untouched originals. */
  def xIcebergUpdate(s: SparkSession, d: String): DataFrame = {
    val dir = icebergUpdateFixture(s, d)
    val pre = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "PRE")).trim.toLong
    def face(label: String, df: DataFrame) =
      df.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          count(when(col("st") === "UX", 1)).as("n_upd"))
        .select(lit(label).as("face"), col("*"))
    ordered(
      face("cur", graft.operators.IcebergLite.snapshot(s, dir))
        .unionByName(face("pre",
          graft.operators.IcebergLite.snapshot(s, dir,
            snapshotId = pre))),
      "face", "prio")
  }

  /** Iceberg EXPIRE-SNAPSHOTS fixture: three appends (prios 1–2,
    * 3–4, 5), then `expireSnapshots` older-than the second commit's
    * timestamp — the first two snapshots expire (their manifest
    * lists delete; append-only manifests and data survive through
    * the current snapshot's re-listing). */
  private def icebergExpireFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#iceexpire", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_expire")
      def sel(ps: Seq[String]) = orders(s, d)
        .filter(col("o_orderpriority").isin(ps: _*)).coalesce(1)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      graft.operators.IcebergLite.commitAppend(s, dir.toString,
        sel(Seq("1-URGENT", "2-HIGH")))
      graft.operators.IcebergLite.commitAppend(s, dir.toString,
        sel(Seq("3-MEDIUM", "4-NOT SPECIFIED")))
      graft.operators.IcebergLite.commitAppend(s, dir.toString,
        sel(Seq("5-LOW")))
      val expired = graft.operators.IcebergLite.expireSnapshots(s,
        dir.toString, olderThanMs = 1700000002000L)
      java.nio.file.Files.writeString(dir.resolve("EXPIRED"),
        expired.length.toString)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg EXPIRE-SNAPSHOTS gate — the Delta-maintenance parity for
    * format #2: the `cur` face proves the trimmed metadata still
    * plans and reads the full table exactly (reachability deleted
    * only expired-only files), the `maint` row pins two snapshots
    * expired and three data files still planned. */
  def xIcebergExpire(s: SparkSession, d: String): DataFrame = {
    val dir = icebergExpireFixture(s, d)
    val nExpired = java.nio.file.Files.readString(
      java.nio.file.Paths.get(dir, "EXPIRED")).trim.toLong
    val scan = graft.operators.IcebergLite.scan(s, dir)
    ordered(
      scan.data.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .select(lit("cur").as("face"), col("*"))
        .unionByName(s.range(1).select(lit("maint").as("face"),
          lit("expired").as("prio"), lit(nExpired).as("n"),
          lit(scan.nDataFiles.toLong).as("sum_k"))),
      "face", "prio")
  }

  /** Iceberg SCHEMA-EVOLUTION fixture: file A written under the
    * created schema (k:1, amount:2, grp:3, st:4), then
    * `commitSchemaUpdate` RENAMES amount→revenue (field id 2 kept),
    * DROPS st (id 4) and RE-ADDS st under fresh id 5; file B appends
    * under the new schema. Reading the table is then sound only via
    * field-id resolution: by name, file A's revenue would silently
    * null and its retired st would resurrect. */
  private def icebergEvolveFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#iceevolve", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_evolve")
      def sel(ps: Seq[String], revName: String) = orders(s, d)
        .filter(col("o_orderpriority").isin(ps: _*))
        .select(col("o_orderkey").cast("long").as("k"),
          round(col("o_totalprice") * 100).cast("long").as(revName),
          col("o_orderpriority").as("grp"),
          col("o_orderstatus").as("st"))
      graft.operators.IcebergLite.commitAppend(s, dir.toString,
        sel(Seq("1-URGENT", "2-HIGH", "3-MEDIUM"), "amount"))
      graft.operators.IcebergLite.commitSchemaUpdate(s, dir.toString,
        Seq((1L, "k", org.apache.spark.sql.types.LongType, true),
          (2L, "revenue", org.apache.spark.sql.types.LongType, true),
          (3L, "grp", org.apache.spark.sql.types.StringType, true),
          (5L, "st", org.apache.spark.sql.types.StringType, true)))
      graft.operators.IcebergLite.commitAppend(s, dir.toString,
        sel(Seq("4-NOT SPECIFIED", "5-LOW"), "revenue"))
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg SCHEMA-EVOLUTION gate: `agg` face aggregates the evolved
    * table — sum_rev must include file A's pre-rename values, and
    * n_st must count ONLY file B's re-added values; the `nost` face
    * FILTERS on the re-added column being null, the exact predicate
    * whose name-bound parquet pushdown wrongly pruned old files'
    * row groups before the collision-alias read. */
  def xIcebergEvolve(s: SparkSession, d: String): DataFrame = {
    val snap = graft.operators.IcebergLite.snapshot(
      s, icebergEvolveFixture(s, d))
    def aggs(df: DataFrame) = df.groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
        sum(col("revenue")).as("sum_rev"), count(col("st")).as("n_st"))
    ordered(
      aggs(snap).select(lit("agg").as("face"), col("*"))
        .unionByName(aggs(snap.filter(col("st").isNull))
          .select(lit("nost").as("face"), col("*"))),
      "face", "grp")
  }

  /** Delta WRITE fixture: a table our own `commitAppend` writes in two
    * commits (priorities 1–3, then 4–5), PARTITIONED by prio — the
    * "4-NOT SPECIFIED" value forces the path percent-encoding round
    * trip. Data bytes flow Spark-distributed; the log carries written
    * per-file stats. */
  private def deltaWriteFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#deltawrite", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_write")
      def sel(ps: Seq[String]) = orders(s, d)
        .filter(col("o_orderpriority").isin(ps: _*))
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        sel(Seq("1-URGENT", "2-HIGH", "3-MEDIUM")), Seq("prio"))
      graft.operators.DeltaLite.commitAppend(s, dir.toString,
        sel(Seq("4-NOT SPECIFIED", "5-LOW")), Seq("prio"))
      // v2: OPTIMIZE-style rewrite — the gate's cur face then proves
      // content identity THROUGH compaction, and the cdf face (range
      // includes v2) proves compaction is invisible to consumers
      graft.operators.DeltaLite.commitCompact(s, dir.toString)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta WRITE gate — the table tier's write direction: our
    * commitAppend's output replays through our own snapshot reader
    * (current + versionAsOf time travel) AND the CDF reader, with
    * percent-encoded partition paths and written stats in the loop;
    * every (face, priority) aggregate restated from orders. */
  def xDeltaWrite(s: SparkSession, d: String): DataFrame = {
    val dir = deltaWriteFixture(s, d)
    def face(label: String, df: DataFrame) =
      df.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("st")).as("min_st"))
        .select(lit(label).as("face"), col("prio"), col("n"),
          col("sum_k"), col("min_st"))
    ordered(
      face("cur", graft.operators.DeltaLite.snapshot(s, dir))
        .unionByName(face("v0",
          graft.operators.DeltaLite.snapshot(s, dir, versionAsOf = 0)))
        .unionByName(face("cdf",
          graft.operators.DeltaLite.changes(s, dir, 1, 2))),
      "face", "prio")
  }

  /** CDF fixture: v0 adds 1-URGENT + 3-MEDIUM, v1 adds 2-HIGH and
    * removes 3-MEDIUM, v2 is an explicit cdc commit whose
    * `_change_data` parquet inserts the 5-LOW rows (carrying its own
    * `_change_type` column, per the protocol). */
  private def deltaCdfFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#deltacdf", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_cdf")
      def movePart(df: DataFrame, name: String): Long = {
        val tmp = java.nio.file.Files.createTempDirectory("dcdf").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = dir.resolve(name)
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.move(f.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        java.nio.file.Files.size(dest)
      }
      def sel(p: String) = orders(s, d)
        .filter(col("o_orderpriority") === p)
        .select(col("o_orderkey").cast("long").as("k"),
          col("o_orderstatus").as("st"),
          col("o_orderpriority").as("prio"))
      val s0 = movePart(sel("1-URGENT"), "part-0.parquet")
      val s2 = movePart(sel("3-MEDIUM"), "part-2.parquet")
      val s1 = movePart(sel("2-HIGH"), "part-1.parquet")
      val scdc = movePart(
        sel("5-LOW").withColumn("_change_type", lit("insert")),
        "_change_data/cdc-0.parquet")
      val schemaJson = org.apache.spark.sql.types.StructType
        .fromDDL("k BIGINT, st STRING, prio STRING").json
        .replace("\\", "\\\\").replace("\"", "\\\"")
      def commit(v: Long, lines: Seq[String]): Unit = {
        val p = dir.resolve("_delta_log").resolve(f"$v%020d.json")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, lines.mkString("\n") + "\n")
      }
      def add(name: String, size: Long): String =
        s"""{"add":{"path":"$name","partitionValues":{},""" +
          s""""size":$size,"dataChange":true}}"""
      commit(0, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"cdf","schemaString":"$schemaJson",""" +
          """"partitionColumns":[],"configuration":{""" +
          """"delta.enableChangeDataFeed":"true"}}}""",
        add("part-0.parquet", s0), add("part-2.parquet", s2)))
      commit(1, Seq(add("part-1.parquet", s1),
        """{"remove":{"path":"part-2.parquet","deletionTimestamp":1,""" +
          """"dataChange":true}}"""))
      commit(2, Seq(
        s"""{"cdc":{"path":"_change_data/cdc-0.parquet",""" +
          s""""partitionValues":{},"size":$scdc,"dataChange":false}}"""))
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta CHANGE-DATA-FEED gate — the incremental-consumer face:
    * `changes(0, 2)` surfaces v0/v1 synthesized inserts, the v1
    * delete replaying the removed file's content, and the v2 explicit
    * cdc commit verbatim; the oracle restates each (version,
    * change_type, priority) group's count and key-sum from orders. */
  def xDeltaCdf(s: SparkSession, d: String): DataFrame = {
    val ch = graft.operators.DeltaLite.changes(
      s, deltaCdfFixture(s, d), 0L, 2L)
    ordered(
      ch.groupBy(col("_commit_version").as("v"),
        col("_change_type").as("ct"), col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k")),
      "v", "ct", "prio")
  }

  /** Iceberg v2 position-delete fixture: one snapshot, five per-priority
    * data files (rows sorted by orderkey so file position == rank), a
    * delete manifest (content=1) whose position-delete parquet removes
    * the EVEN positions of the 2-HIGH file. */
  private def icebergDeleteFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#icedel", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_del")
      val loc = "file:///warehouse/orders_ice_del"
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val manifestSchema =
        """{"type":"record","name":"manifest_entry","fields":[
          |  {"name":"status","type":"int"},
          |  {"name":"snapshot_id","type":["null","long"]},
          |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          |    {"name":"content","type":"int"},
          |    {"name":"file_path","type":"string"},
          |    {"name":"file_format","type":"string"},
          |    {"name":"record_count","type":"long"},
          |    {"name":"file_size_in_bytes","type":"long"}]}}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      val listSchema =
        """{"type":"record","name":"manifest_file","fields":[
          |  {"name":"manifest_path","type":"string"},
          |  {"name":"manifest_length","type":"long"},
          |  {"name":"partition_spec_id","type":"int"},
          |  {"name":"content","type":"int"},
          |  {"name":"added_snapshot_id","type":["null","long"]}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      def movePart(df: DataFrame, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("idp").toString
        df.write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = dir.resolve("data").resolve(name)
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.move(f.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      val counts = orders(s, d).groupBy(col("o_orderpriority"))
        .count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      prios.indices.foreach { i =>
        movePart(orders(s, d).filter(col("o_orderpriority") === prios(i))
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"),
            col("o_orderpriority").as("prio"))
          .repartition(1).sortWithinPartitions("k"), s"part-$i.parquet")
      }
      val nHigh = counts.getOrElse("2-HIGH", 0L)
      movePart(s.range(0, (nHigh + 1) / 2)
        .select(lit(s"$loc/data/part-1.parquet").as("file_path"),
          (col("id") * 2).as("pos"))
        .repartition(1).sortWithinPartitions("pos"), "posdel-1.parquet")
      def entry(content: Int, path: String, n: Long): Map[String, Any] =
        Map("status" -> 1,
          "snapshot_id" -> java.lang.Long.valueOf(IceSnap1),
          "data_file" -> Map[String, Any]("content" -> content,
            "file_path" -> s"$loc/data/$path",
            "file_format" -> "PARQUET", "record_count" -> n,
            "file_size_in_bytes" -> 1L))
      val metaP = dir.resolve("metadata")
      java.nio.file.Files.createDirectories(metaP)
      java.nio.file.Files.write(metaP.resolve("manifest-1.avro"),
        graft.functions.AvroWrite.genericFileBytes(manifestSchema,
          prios.indices.map(i =>
            entry(0, s"part-$i.parquet", counts.getOrElse(prios(i), 0L)))))
      java.nio.file.Files.write(metaP.resolve("manifest-del.avro"),
        graft.functions.AvroWrite.genericFileBytes(manifestSchema,
          Seq(entry(1, "posdel-1.parquet", (nHigh + 1) / 2))))
      java.nio.file.Files.write(metaP.resolve("snap-1.avro"),
        graft.functions.AvroWrite.genericFileBytes(listSchema,
          Seq(("manifest-1.avro", 0), ("manifest-del.avro", 1)).map {
            case (m, c) => Map[String, Any](
              "manifest_path" -> s"$loc/metadata/$m",
              "manifest_length" -> 1L, "partition_spec_id" -> 0,
              "content" -> c, "added_snapshot_id" -> null)
          }))
      java.nio.file.Files.writeString(metaP.resolve("v1.metadata.json"),
        s"""{
          |  "format-version": 2,
          |  "table-uuid": "9c12f1b2-0000-4000-8000-00000000000d",
          |  "location": "$loc",
          |  "last-updated-ms": 1700000000000,
          |  "last-sequence-number": 1,
          |  "current-schema-id": 0,
          |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
          |    {"id": 1, "name": "k", "required": true, "type": "long"},
          |    {"id": 2, "name": "st", "required": false, "type": "string"},
          |    {"id": 3, "name": "prio", "required": false, "type": "string"}]}],
          |  "default-spec-id": 0,
          |  "partition-specs": [{"spec-id": 0, "fields": []}],
          |  "current-snapshot-id": $IceSnap1,
          |  "snapshots": [
          |    {"snapshot-id": $IceSnap1, "timestamp-ms": 1700000001000,
          |     "sequence-number": 1,
          |     "summary": {"operation": "overwrite"},
          |     "manifest-list": "$loc/metadata/snap-1.avro"}]
          |}""".stripMargin)
      java.nio.file.Files.writeString(
        metaP.resolve("version-hint.text"), "1\n")
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg EQUALITY-delete fixture: data files at sequence 1, one
    * equality-delete parquet of (prio, st) pairs at sequence 2 —
    * deleting (2-HIGH, F) and (5-LOW, O) rows. */
  private def icebergEqDelFixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#iceeq", _ => {
      val dir = java.nio.file.Files.createTempDirectory("ice_eq")
      val loc = "file:///warehouse/orders_ice_eq"
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val entrySchema =
        """{"type":"record","name":"manifest_entry","fields":[
          |  {"name":"status","type":"int"},
          |  {"name":"snapshot_id","type":["null","long"]},
          |  {"name":"sequence_number","type":["null","long"],"default":null},
          |  {"name":"data_file","type":{"type":"record","name":"r2","fields":[
          |    {"name":"content","type":"int"},
          |    {"name":"file_path","type":"string"},
          |    {"name":"file_format","type":"string"},
          |    {"name":"record_count","type":"long"},
          |    {"name":"file_size_in_bytes","type":"long"},
          |    {"name":"equality_ids","type":["null",
          |      {"type":"array","items":"int"}],"default":null}]}}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      val listSchema =
        """{"type":"record","name":"manifest_file","fields":[
          |  {"name":"manifest_path","type":"string"},
          |  {"name":"manifest_length","type":"long"},
          |  {"name":"partition_spec_id","type":"int"},
          |  {"name":"content","type":"int"},
          |  {"name":"sequence_number","type":["null","long"],"default":null},
          |  {"name":"added_snapshot_id","type":["null","long"]}]}"""
          .stripMargin.replaceAll("\n\\s*", "")
      def movePart(df: DataFrame, name: String): Unit = {
        val tmp = java.nio.file.Files.createTempDirectory("ieq").toString
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        val f = new java.io.File(tmp).listFiles()
          .filter(_.getName.endsWith(".parquet")).head
        val dest = dir.resolve("data").resolve(name)
        java.nio.file.Files.createDirectories(dest.getParent)
        java.nio.file.Files.move(f.toPath, dest,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      }
      prios.indices.foreach(i => movePart(
        orders(s, d).filter(col("o_orderpriority") === prios(i))
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"),
            col("o_orderpriority").as("prio")), s"part-$i.parquet"))
      movePart(s.createDataFrame(Seq(
        ("2-HIGH", "F"), ("5-LOW", "O"))).toDF("prio", "st"),
        "eqdel-1.parquet")
      def entry(content: Int, path: String,
                eqIds: Seq[Int]): Map[String, Any] =
        Map("status" -> 1,
          "snapshot_id" -> java.lang.Long.valueOf(IceSnap1),
          "sequence_number" -> null, // inherit from the list row
          "data_file" -> Map[String, Any]("content" -> content,
            "file_path" -> s"$loc/data/$path",
            "file_format" -> "PARQUET", "record_count" -> 1L,
            "file_size_in_bytes" -> 1L,
            "equality_ids" -> (if (eqIds.isEmpty) null else eqIds)))
      val metaP = dir.resolve("metadata")
      java.nio.file.Files.createDirectories(metaP)
      java.nio.file.Files.write(metaP.resolve("manifest-1.avro"),
        graft.functions.AvroWrite.genericFileBytes(entrySchema,
          prios.indices.map(i => entry(0, s"part-$i.parquet", Nil))))
      java.nio.file.Files.write(metaP.resolve("manifest-eq.avro"),
        graft.functions.AvroWrite.genericFileBytes(entrySchema,
          Seq(entry(2, "eqdel-1.parquet", Seq(3, 2))))) // prio id 3, st id 2
      java.nio.file.Files.write(metaP.resolve("snap-1.avro"),
        graft.functions.AvroWrite.genericFileBytes(listSchema,
          Seq(("manifest-1.avro", 0, 1L), ("manifest-eq.avro", 1, 2L))
            .map { case (m, c, sq) => Map[String, Any](
              "manifest_path" -> s"$loc/metadata/$m",
              "manifest_length" -> 1L, "partition_spec_id" -> 0,
              "content" -> c,
              "sequence_number" -> java.lang.Long.valueOf(sq),
              "added_snapshot_id" -> null)
            }))
      java.nio.file.Files.writeString(metaP.resolve("v1.metadata.json"),
        s"""{
          |  "format-version": 2,
          |  "table-uuid": "9c12f1b2-0000-4000-8000-00000000000e",
          |  "location": "$loc",
          |  "last-updated-ms": 1700000000000,
          |  "last-sequence-number": 2,
          |  "current-schema-id": 0,
          |  "schemas": [{"schema-id": 0, "type": "struct", "fields": [
          |    {"id": 1, "name": "k", "required": true, "type": "long"},
          |    {"id": 2, "name": "st", "required": false, "type": "string"},
          |    {"id": 3, "name": "prio", "required": false, "type": "string"}]}],
          |  "default-spec-id": 0,
          |  "partition-specs": [{"spec-id": 0, "fields": []}],
          |  "current-snapshot-id": $IceSnap1,
          |  "snapshots": [
          |    {"snapshot-id": $IceSnap1, "timestamp-ms": 1700000001000,
          |     "sequence-number": 2,
          |     "summary": {"operation": "overwrite"},
          |     "manifest-list": "$loc/metadata/snap-1.avro"}]
          |}""".stripMargin)
      java.nio.file.Files.writeString(
        metaP.resolve("version-hint.text"), "1\n")
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Iceberg EQUALITY-delete gate — the second v2 delete kind:
    * delete rows match (prio, st) pairs null-safely and apply only to
    * data files with a strictly smaller sequence number; the oracle
    * recomputes survivors by excluding the two deleted pairs. */
  def xIcebergEqdel(s: SparkSession, d: String): DataFrame = {
    val sc = graft.operators.IcebergLite.scan(s, icebergEqDelFixture(s, d))
    ordered(
      sc.data.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("st")).as("min_st"), max(col("st")).as("max_st"))
        .select(col("prio"),
          lit(sc.nDeleteFiles).cast("long").as("n_del_files"),
          col("n"), col("sum_k"), col("min_st"), col("max_st")),
      "prio")
  }

  /** Iceberg v2 POSITION-DELETE gate — row-level deletes applied
    * through the manifest tier: the delete manifest's parquet names
    * (file, pos) pairs, the reader anti-joins them against
    * `_metadata.row_index`, and the oracle recomputes the surviving
    * per-priority aggregates by excluding the even orderkey-ranks of
    * 2-HIGH — one mis-assembled row ordinal hash-mismatches. */
  def xIcebergDeletes(s: SparkSession, d: String): DataFrame = {
    val sc = graft.operators.IcebergLite.scan(
      s, icebergDeleteFixture(s, d))
    ordered(
      sc.data.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("st")).as("min_st"), max(col("st")).as("max_st"))
        .select(col("prio"),
          lit(sc.nDeleteFiles).cast("long").as("n_del_files"),
          col("n"), col("sum_k"), col("min_st"), col("max_st")),
      "prio")
  }

  /** Iceberg FILE-SKIPPING gate — manifest pruning in all THREE
    * planning dimensions, the x_delta_prune parity for format #2:
    * (k) int bounds — manifest entries carry real per-file
    * lower/upper bounds and `prunedScan` keeps only files whose range
    * can intersect the predicate; (tag) string bounds — the UTF-8
    * single-value face; (part) partition-transform skipping — the
    * manifest partition tuple under the identity transform keeps only
    * the matching partition's file. Each face re-filters the kept
    * data exactly; the oracle recomputes kept counts from the same
    * bucket arithmetic plus the data aggregates. */
  def xIcebergPrune(s: SparkSession, d: String): DataFrame = {
    val maxK = orders(s, d).agg(max(col("o_orderkey"))).collect()
      .head.getLong(0)
    val w = maxK / 5 + 1
    val lo = w + 10
    val hi = 2 * w - 10 // strictly inside bucket 1
    val dir = icebergPruneFixture(s, d, w)
    val p = graft.operators.IcebergLite.prunedScan(s, dir, "k", lo, hi)
    def face(label: String, pr: graft.operators.IcebergLite.Scan,
             keepRows: org.apache.spark.sql.Column) =
      pr.data.filter(keepRows)
        .agg(
          lit(pr.nDataFiles).cast("long").as("n_files"),
          lit(pr.keptFiles).cast("long").as("kept_files"),
          count(lit(1)).as("n_match"),
          coalesce(sum(col("k")), lit(0L)).as("sum_match"))
        .select(lit(label).as("face"), col("n_files"), col("kept_files"),
          col("n_match"), col("sum_match"))
    val ps = graft.operators.IcebergLite.prunedScanString(
      s, dir, "tag", "c", "c")
    val pp = graft.operators.IcebergLite.partitionPrunedScan(
      s, dir, "b", 2L)
    ordered(
      face("k", p, col("k").between(lo, hi))
        .unionByName(face("tag", ps, col("tag") === "c"))
        .unionByName(face("part", pp, col("b") === 2L)),
      "face")
  }

  /** Iceberg SNAPSHOT gate — the manifest tier made real: the current
    * snapshot's manifest list + manifests (nested Avro decoded by our
    * own tree reader) enumerate live data files AFTER DELETED-entry
    * semantics, the read schema comes from metadata.json, and pinning
    * the 63-bit FIRST snapshot id time-travels to the pre-delete set.
    * The oracle recomputes both faces' per-priority aggregates from
    * orders — the Delta parity gate (x_delta_snapshot) for format #2. */
  def xIcebergSnapshot(s: SparkSession, d: String): DataFrame = {
    val dir = icebergFixture(s, d)
    val cur = graft.operators.IcebergLite.scan(s, dir)
    val first = graft.operators.IcebergLite.scan(s, dir,
      snapshotId = IceSnap1)
    // timestamp travel lands between the two snapshot timestamps →
    // resolves to snap1, so the asof face must EQUAL the first face
    val asof = graft.operators.IcebergLite.scanAsOfTimestamp(
      s, dir, 1700000001500L)
    def face(label: String, sc: graft.operators.IcebergLite.Scan) =
      sc.data.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("st")).as("min_st"), max(col("st")).as("max_st"))
        .select(lit(label).as("snap"), col("prio"),
          lit(sc.nDataFiles).cast("long").as("n_files"),
          col("n"), col("sum_k"), col("min_st"), col("max_st"))
    ordered(face("current", cur).unionByName(face("first", first))
      .unionByName(face("asof", asof)),
      "snap", "prio")
  }

  /** Iceberg metadata.json gate — the second table format's planning
    * tier: SQL-built v2 metadata documents (schemas by id, partition
    * specs by id, a two-snapshot log with summaries) decoded by
    * `functions/IcebergMeta`; every surfaced field — current snapshot
    * resolution, schema/spec selection, summary numbers, the
    * append-count over the snapshot array — restated arithmetically
    * in the oracle. */
  def xIcebergMeta(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id")
    val snap1 = id * 10 + 1
    val snap2 = id * 10 + 2
    val json = concat(
      lit("""{"format-version": 2, "table-uuid": "u-"""), id.cast("string"),
      lit("""", "current-schema-id": 1, "schemas": ["""),
      lit("""{"schema-id": 0, "type": "struct", "fields": [{"id":1,"name":"old","required":true,"type":"long"}]},"""),
      lit("""{"schema-id": 1, "type": "struct", "fields": [{"id":1,"name":"k","required":true,"type":"long"},{"id":2,"name":"v","required":false,"type":"string"}]}],"""),
      lit(""""default-spec-id": 0, "partition-specs": [{"spec-id": 0, "fields": [{"source-id":1,"field-id":1000,"name":"k_bucket","transform":"bucket[16]"}]}],"""),
      lit(""""current-snapshot-id": """), snap2.cast("string"),
      lit(""", "snapshots": ["""),
      lit("""{"snapshot-id": """), snap1.cast("string"),
      lit(""", "timestamp-ms": 1700000000001, "sequence-number": 1, "summary": {"operation": "append", "total-records": """),
      (id + 100).cast("string"), lit(""", "total-data-files": 4}},"""),
      lit("""{"snapshot-id": """), snap2.cast("string"),
      lit(""", "parent-snapshot-id": """), snap1.cast("string"),
      lit(""", "timestamp-ms": 1700000000002, "sequence-number": 2, "summary": {"operation": "overwrite", "total-records": """),
      (id + 90).cast("string"), lit(""", "total-data-files": 3}}]}"""))
    val fx = documents(s, d).select(id, encode(json, "UTF-8").as("b"))
    ordered(
      fx.select(id,
        graft.functions.IcebergMeta.tableMetaCol(col("b")).as("m"),
        graft.functions.IcebergMeta.snapshotsCol(col("b")).as("snaps"))
        .select(id,
          col("m.format_version").cast("long").as("fv"),
          col("m.current_snapshot_id").as("cur_snap"),
          col("m.n_snapshots").cast("long").as("n_snaps"),
          col("m.schema_fields").as("schema_fields"),
          col("m.partition_fields").as("partition_fields"),
          col("m.total_records").as("total_records"),
          col("m.total_files").as("total_files"),
          size(filter(col("snaps"), x => x.getField("operation") === "append"))
            .cast("long").as("n_appends"),
          aggregate(col("snaps"), lit(0L),
            (a, x) => a + x.getField("total_records")).as("sum_records")),
      "doc_id")
  }

  /** Prune-fixture: five orderkey-bucketed files whose adds carry
    * real per-file min/max stats (the file-skipping metadata). */
  private def deltaPruneFixture(s: SparkSession, d: String,
                                w: Long): String =
    parquetNestedDirs.computeIfAbsent(s"$d#delta2", _ => {
      val dir = java.nio.file.Files.createTempDirectory("delta_prune")
      def commit(v: Long, lines: Seq[String]): Unit = {
        val p = dir.resolve("_delta_log").resolve(f"$v%020d.json")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, lines.mkString("\n") + "\n")
      }
      val schemaJson = org.apache.spark.sql.types.StructType
        .fromDDL("k BIGINT, st STRING, tag STRING").json
        .replace("\\", "\\\\").replace("\"", "\\\"")
      val adds = (0 until 5).flatMap { i =>
        val lo = i * w + 1
        val hi = (i + 1) * w
        val tag = ('a' + i).toChar.toString // per-bucket string stat
        val part = orders(s, d)
          .filter(col("o_orderkey").between(lo, hi))
          .select(col("o_orderkey").cast("long").as("k"),
            col("o_orderstatus").as("st"), lit(tag).as("tag"))
        val stats = part.agg(min("k"), max("k"), count(lit(1))).collect().head
        if (stats.getLong(2) == 0) None
        else {
          val tmp = java.nio.file.Files.createTempDirectory("dp").toString
          part.coalesce(1).write.mode("overwrite").parquet(tmp)
          val f = new java.io.File(tmp).listFiles()
            .filter(_.getName.endsWith(".parquet")).head
          val dest = dir.resolve(s"bucket-$i.parquet")
          java.nio.file.Files.move(f.toPath, dest,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
          Some(s"""{"add":{"path":"bucket-$i.parquet","partitionValues":{},""" +
            s""""size":${java.nio.file.Files.size(dest)},"dataChange":true,""" +
            s""""stats":"{\\"numRecords\\":${stats.getLong(2)},""" +
            s"""\\"minValues\\":{\\"k\\":${stats.getLong(0)},""" +
            s"""\\"tag\\":\\"$tag\\"},""" +
            s"""\\"maxValues\\":{\\"k\\":${stats.getLong(1)},""" +
            s"""\\"tag\\":\\"$tag\\"}}"}}""")
        }
      }
      commit(0, Seq(
        """{"protocol":{"minReaderVersion":1,"minWriterVersion":2}}""",
        s"""{"metaData":{"id":"prune","schemaString":"$schemaJson",""" +
          """"partitionColumns":[]}}""") ++ adds)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** Delta FILE-SKIPPING gate — the stats pruning that makes a 100 TB
    * table's point query touch metadata, not the table: adds carry
    * per-file min/max, `prunedSnapshot` keeps only the files whose
    * range can intersect the predicate, and an exact re-filter over
    * the kept data yields the answer. The oracle recomputes the kept
    * count from the SAME bucket arithmetic plus the aggregates from
    * the data. */
  def xDeltaPrune(s: SparkSession, d: String): DataFrame = {
    val maxK = orders(s, d).agg(max(col("o_orderkey"))).collect()
      .head.getLong(0)
    val w = maxK / 5 + 1
    val lo = w + 10
    val hi = 2 * w - 10 // strictly inside bucket 1
    val dir = deltaPruneFixture(s, d, w)
    val p = graft.operators.DeltaLite.prunedSnapshot(s, dir, "k", lo, hi)
    val faceK = p.data.filter(col("k").between(lo, hi))
      .agg(
        lit(p.nFiles).cast("long").as("n_files"),
        lit(p.keptFiles).cast("long").as("kept_files"),
        count(lit(1)).as("n_match"),
        coalesce(sum(col("k")), lit(0L)).as("sum_match"))
      .select(lit("k").as("face"), col("n_files"), col("kept_files"),
        col("n_match"), col("sum_match"))
    // string face: lexicographic stats pruning pins bucket 2 ("c")
    val ps = graft.operators.DeltaLite.prunedSnapshotString(
      s, dir, "tag", "c", "c")
    val faceS = ps.data.filter(col("tag") === "c")
      .agg(
        lit(ps.nFiles).cast("long").as("n_files"),
        lit(ps.keptFiles).cast("long").as("kept_files"),
        count(lit(1)).as("n_match"),
        coalesce(sum(col("k")), lit(0L)).as("sum_match"))
      .select(lit("tag").as("face"), col("n_files"), col("kept_files"),
        col("n_match"), col("sum_match"))
    ordered(faceK.unionByName(faceS), "face")
  }

  /** Delta SNAPSHOT gate — the table-format tier on top of the
    * file-format tier: `operators/DeltaLite` replays a hand-committed
    * Delta log (public protocol: versioned JSON actions, tombstones,
    * partitionValues) into the live-file snapshot and reads it as a
    * DataFrame with partition columns reconstructed. The fixture
    * tombstones the 2-HIGH file at v2, so the oracle recomputes the
    * surviving per-priority aggregates from orders minus that
    * priority — one wrong replay rule (a dropped add, a surviving
    * tombstone, a mis-cast partition value) hash-mismatches. */
  def xDeltaSnapshot(s: SparkSession, d: String): DataFrame = {
    val snap = graft.operators.DeltaLite.snapshot(s, deltaFixture(s, d))
    ordered(
      snap.groupBy(col("prio"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"),
          min(col("st")).as("min_st"), max(col("st")).as("max_st")),
      "prio")
  }

  /** INT96 fixture, Spark-written once per sf-dir per JVM (legacy
    * timestamp lineage — outputTimestampType toggled around the
    * write and restored). */
  private def parquetInt96Fixture(s: SparkSession, d: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#int96", _ => {
      val p = java.nio.file.Files.createTempDirectory("pq_int96")
      val key = "spark.sql.parquet.outputTimestampType"
      val prev = s.conf.get(key)
      s.conf.set(key, "INT96")
      try orders(s, d).select(
        when(pmod(col("o_orderkey"), lit(13)) === 0, lit(null))
          .otherwise(col("o_orderdate")).as("ts"))
        .coalesce(1).write.option("compression", "snappy")
        .mode("overwrite").parquet(p.toString)
      finally s.conf.set(key, prev)
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      p.toString
    })

  /** Parquet TEMPORAL gate — both timestamp lineages: the parquet-cpp
    * testdata file stores TIMESTAMP(us) as physical INT64, readable
    * logical-type-agnostically through the int64 face; a Spark-written
    * INT96 fixture (the legacy Hive lineage Spark still emits by
    * default) decodes through the Julian-day + nanos-of-day
    * conversion, dictionary and null paths included. Sums at second
    * granularity (micros would overflow the 15k-row sum); min/max stay
    * exact micros. */
  def xParquetTemporal(s: SparkSession, d: String): DataFrame = {
    val pq = s.read.format("binaryFile").load(s"$d/orders.parquet")
      .select(lit("int64us").as("face"),
        graft.functions.ParquetPages
          .int64ColumnCol(col("content"), lit("o_orderdate")).as("vs"))
    val i96 = s.read.format("binaryFile").load(parquetInt96Fixture(s, d))
      .filter(col("path").endsWith(".parquet"))
      .select(lit("int96").as("face"),
        graft.functions.ParquetPages
          .int96MicrosCol(col("content"), lit("ts")).as("vs"))
    ordered(
      pq.unionByName(i96).select(col("face"),
        size(col("vs")).cast("long").as("n"),
        size(filter(col("vs"), x => x.isNull)).cast("long").as("n_null"),
        aggregate(col("vs"), lit(0L),
          (a, x) => a + coalesce((x / lit(1000000L)).cast("long"), lit(0L)))
          .as("sum_secs"),
        array_min(col("vs")).as("min_micros"),
        array_max(col("vs")).as("max_micros")),
      "face")
  }

  /** ORC TEMPORAL gate — DATE and TIMESTAMP stripe decode: days from
    * the RLEv2 DATA stream; timestamps from the seconds (2015-based,
    * signed) + SECONDARY nanos (trailing-zero scale) stream pair,
    * incl. the pre-2015 negative-relative regime orders data lives
    * in. PRESENT bits interleave nulls for both. Oracled with
    * epoch_us / day arithmetic in DuckDB. */
  def xOrcTemporal(s: SparkSession, d: String): DataFrame = {
    val src = orders(s, d).select(
      when(pmod(col("o_orderkey"), lit(13)) === 0, lit(null))
        .otherwise(col("o_orderdate")).as("ts"),
      when(pmod(col("o_orderkey"), lit(17)) === 0, lit(null))
        .otherwise(col("o_orderdate").cast("date")).as("dt"))
    val dir = orcFixture(src, s"$d#temporal", "zlib")
    ordered(
      s.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".orc"))
        .select(
          graft.functions.OrcValues
            .timestampMicrosCol(col("content"), lit("ts")).as("tss"),
          graft.functions.OrcValues
            .dateDaysCol(col("content"), lit("dt")).as("dts"))
        .select(
          size(col("tss")).cast("long").as("n"),
          size(filter(col("tss"), x => x.isNull)).cast("long").as("n_null_ts"),
          // sum at second granularity: 15k x 8e14 micros would overflow
          aggregate(col("tss"), lit(0L),
            (a, x) => a + coalesce((x / lit(1000000L)).cast("long"), lit(0L)))
            .as("sum_secs"),
          array_min(col("tss")).as("min_micros"),
          array_max(col("tss")).as("max_micros"),
          size(filter(col("dts"), x => x.isNull)).cast("long").as("n_null_dt"),
          aggregate(col("dts"), lit(0L), (a, x) => a + coalesce(x, lit(0L)))
            .as("sum_days")),
      "n")
  }

  /** Lake DOUBLE-column gate — the floating-point face of both
    * readers in one query, cross-writer: ParquetPages decodes
    * o_totalprice from the parquet-cpp-written TESTDATA file itself
    * (a writer lineage none of our fixtures produce), and OrcValues
    * decodes a nullable double column from the Spark-written ORC
    * fixture (IEEE 754 LE direct stream + PRESENT bits). Sums are
    * cent-exact bigints so the oracle never touches float summation
    * order; min/max compare the IEEE values themselves. */
  def xLakeDoubles(s: SparkSession, d: String): DataFrame = {
    val pq = s.read.format("binaryFile").load(s"$d/orders.parquet")
      .select(lit("parquet").as("fmt"),
        graft.functions.ParquetPages
          .doubleColumnCol(col("content"), lit("o_totalprice")).as("vs"))
    val dir = orcFixture(orcValuesSrc(s, d), s"$d#values", "zlib")
    val orc = s.read.format("binaryFile").load(dir)
      .filter(col("path").endsWith(".orc"))
      .select(lit("orc").as("fmt"),
        graft.functions.OrcValues
          .doubleColumnCol(col("content"), lit("tp")).as("vs"))
    ordered(
      pq.unionByName(orc).select(col("fmt"),
        size(col("vs")).cast("long").as("n"),
        size(filter(col("vs"), x => x.isNull)).cast("long").as("n_null"),
        aggregate(col("vs"), lit(0L),
          (a, x) => a + coalesce(round(x * 100).cast("long"), lit(0L)))
          .as("sum_cents"),
        array_min(col("vs")).as("min_v"),
        array_max(col("vs")).as("max_v")),
      "fmt")
  }

  /** Zstandard frame-walk gate — SQL-built RFC 8878 frames decoded by
    * `functions/ZstdDecode`: a single-segment frame with a 1-byte
    * frame-content-size and a raw block, a skippable frame the walk
    * must hop, and a second frame mixing an RLE block with a raw last
    * block (multi-frame concatenation). The oracle reconstructs the
    * decoded text with substr/repeat arithmetic, so one wrong header
    * bit, block-size shift, or frame boundary hash-mismatches. The
    * compressed-block machinery (FSE/Huffman/sequences) is pinned
    * byte-exact against real zstd-jni in ZstdDecodeSpec — a stronger
    * check than any SQL oracle could express. */
  def xZstdFrames(s: SparkSession, d: String): DataFrame = {
    val base = asciiBase80
    val frames = unhex(concat(
      // frame 1: single-segment, FCS=0x50, one raw last block (80 B)
      lit("28B52FFD"), lit("20"), lit("50"),
      lit("810200"), hex(substring(base, 1, 80)),
      // skippable frame: magic, 4-byte size, 4 payload bytes to hop
      lit("502A4D18"), lit("04000000"), lit("DEADBEEF"),
      // frame 2: FCS=0x32: RLE block (30 x base[41]) + raw last (20 B)
      lit("28B52FFD"), lit("20"), lit("32"),
      lit("F20000"), hex(substring(base, 41, 1)),
      lit("A10000"), hex(substring(base, 42, 20))))
    val fx = documents(s, d).select(col("doc_id"), frames.as("frames"))
    ordered(
      fx.select(col("doc_id"),
        graft.functions.ZstdDecode.decompressCol(col("frames")).as("dec"))
        .select(col("doc_id"), col("dec").cast("string").as("decoded"),
          octet_length(col("dec")).cast("long").as("n_bytes")),
      "doc_id")
  }

  /** Parquet WRITE-OPTIONS gate — the round-16 writer generality in
    * one loop: `ParquetWrite.parquetFileOpts` aggregates each
    * order-priority group into a parquet blob with a NULLABLE string
    * column (definition levels), dictionary page pairs, literal-only
    * SNAPPY pages, and 1024-row row groups with per-group stats; the
    * same query decodes the blobs back through ParquetFooter (group
    * count) + ParquetPages (values + null interleave). Oracle
    * recomputes group count and aggregates from orders. Spark's own
    * reader consuming these exact variants is ParquetWriteSpec. */
  def xParquetWrite2(s: SparkSession, d: String): DataFrame = {
    val blobs = orders(s, d).groupBy(col("o_orderpriority"))
      .agg(graft.functions.ParquetWrite.parquetFileOpts(
        col("o_orderkey"),
        when(pmod(col("o_orderkey"), lit(9)) === 0, lit(null))
          .otherwise(col("o_orderstatus")),
        "k", "st", codec = 1, dict = true, groupRows = 1024)
        .as("f"))
    ordered(
      blobs.select(col("o_orderpriority"),
        graft.functions.ParquetFooter.fileMetaCol(col("f")).as("m"),
        graft.functions.ParquetPages.int64ColumnCol(col("f"), lit("k")).as("ks"),
        graft.functions.ParquetPages.stringColumnCol(col("f"), lit("st")).as("sts"))
        .select(col("o_orderpriority"),
          col("m.num_rows").as("n_records"),
          col("m.n_row_groups").cast("long").as("n_groups"),
          aggregate(col("ks"), lit(0L), (a, x) => a + x).as("sum_key"),
          size(filter(col("sts"), x => x.isNull)).cast("long").as("n_null_st"),
          size(array_distinct(filter(col("sts"), x => x.isNotNull)))
            .cast("long").as("n_st"),
          array_min(col("sts")).as("min_st"),
          array_max(col("sts")).as("max_st")),
      "o_orderpriority")
  }

  /** ORC VALUE-READ gate — the stripe-data tier `x_orc_meta` plans
    * over, now actually read: Spark writes a fixture with nullable
    * bigint (PRESENT streams), a 3-value status string
    * (DICTIONARY_V2), and an md5-derived high-cardinality string
    * (DIRECT_V2) in all three codecs, and `functions/OrcValues`
    * decodes the stripes raw — RLE v2 integers, byte-RLE present
    * bits, both string encodings, chunk de-framing through our own
    * inflate/snappy. Aggregates of the decoded arrays are oracled
    * from orders, so one wrong bit-packed width, patch, or dictionary
    * index hash-mismatches. */
  /** Fixture source shared by x_orc_values and x_lake_doubles — both
    * read the same cached dirs, so the select list must stay
    * identical between them. */
  private def orcValuesSrc(s: SparkSession, d: String): DataFrame =
    orders(s, d).select(
      col("o_orderkey").cast("long").as("k"),
      when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null))
        .otherwise(col("o_custkey").cast("long")).as("ck"),
      when(pmod(col("o_orderkey"), lit(11)) === 0, lit(null))
        .otherwise(col("o_orderstatus")).as("status"),
      md5(col("o_orderkey").cast("string")).as("h"),
      when(pmod(col("o_orderkey"), lit(5)) === 0, lit(null))
        .otherwise(col("o_totalprice")).as("tp"))

  def xOrcValues(s: SparkSession, d: String): DataFrame = {
    val src = orcValuesSrc(s, d)
    val faces = Seq("none", "zlib", "snappy", "zstd").map { codec =>
      val dir = orcFixture(src, s"$d#values", codec)
      s.read.format("binaryFile").load(dir)
        .filter(col("path").endsWith(".orc"))
        .select(lit(codec).as("codec"),
          graft.functions.OrcValues
            .int64ColumnCol(col("content"), lit("k")).as("ks"),
          graft.functions.OrcValues
            .int64ColumnCol(col("content"), lit("ck")).as("cks"),
          graft.functions.OrcValues
            .stringColumnCol(col("content"), lit("status")).as("sts"),
          graft.functions.OrcValues
            .stringColumnCol(col("content"), lit("h")).as("hs"))
        .select(col("codec"),
          size(col("ks")).cast("long").as("n"),
          aggregate(col("ks"), lit(0L), (a, x) => a + x).as("sum_key"),
          aggregate(col("cks"), lit(0L), (a, x) => a + coalesce(x, lit(0L)))
            .as("sum_ck"),
          size(filter(col("cks"), x => x.isNull)).cast("long").as("n_null_ck"),
          size(array_distinct(filter(col("sts"), x => x.isNotNull)))
            .cast("long").as("n_status"),
          array_min(col("hs")).as("min_h"),
          array_max(col("hs")).as("max_h"))
    }
    ordered(faces.reduce(_ unionByName _), "codec")
  }

  /** ORC-WRITE fixture: orders collected into [[graft.functions
    * .OrcWrite]] bytes (a bounded fixture build, like every hand-built
    * lake fixture) — nullable bigint (PRESENT streams), nullable
    * status string, a double column, multi-stripe. One dir per codec
    * per sf-dir per JVM. */
  private def orcWriteFixture(s: SparkSession, d: String, codec: String,
                              rle: String): String =
    parquetNestedDirs.computeIfAbsent(s"$d#orcwrite-$codec-$rle", _ => {
      val dir = java.nio.file.Files.createTempDirectory("orc_write")
      val rows = orders(s, d).select(
        col("o_orderkey").cast("long").as("k"),
        when(pmod(col("o_orderkey"), lit(7)) === 0, lit(null))
          .otherwise(col("o_custkey").cast("long")).as("ck"),
        when(pmod(col("o_orderkey"), lit(11)) === 0, lit(null))
          .otherwise(col("o_orderstatus")).as("st"),
        col("o_totalprice").as("tp"),
        datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
          .as("dt"))
        .orderBy("k").collect()
        .map(r => Seq[Any](
          java.lang.Long.valueOf(r.getLong(0)),
          if (r.isNullAt(1)) null else java.lang.Long.valueOf(r.getLong(1)),
          if (r.isNullAt(2)) null else r.getString(2),
          java.lang.Double.valueOf(r.getDouble(3)),
          java.lang.Long.valueOf(r.getLong(4)))).toSeq
      val b = graft.functions.OrcWrite.fileBytes(
        Seq(("k", 'l'), ("ck", 'l'), ("st", 's'), ("tp", 'd'),
          ("dt", 'a')),
        rows, codec, stripeRows = 4096, rle = rle)
      java.nio.file.Files.write(dir.resolve("part-0.orc"), b)
      val walk = java.nio.file.Files.walk(dir)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      dir.toString
    })

  /** ORC WRITE gate — the format tier's third writer, proven against
    * BOTH consumers in one hash: our OrcWrite bytes read back by
    * Spark's native ORC reader (the third-party proof) AND by our own
    * OrcValues stripe decoder, per codec; every aggregate restated
    * from orders, so one wrong RLE run, present bit, or stream length
    * hash-mismatches in at least one face. */
  def xOrcWrite(s: SparkSession, d: String): DataFrame = {
    // the codec axis doubles as the RLE-generation axis: none↔v1
    // (Hive-0.11 DIRECT), zlib↔v2 (DIRECT_V2)
    val faces = Seq(("none", "v1"), ("zlib", "v2")).flatMap {
      case (codec, rle) =>
        val dir = orcWriteFixture(s, d, codec, rle)
        val sparkFace = s.read.orc(dir)
          .agg(count(lit(1)).as("n"),
            sum(col("k")).as("sum_k"),
            sum(coalesce(col("ck"), lit(0L))).as("sum_ck"),
            count(when(col("ck").isNull, 1)).as("n_null_ck"),
            min(col("st")).as("min_st"), max(col("st")).as("max_st"),
            sum(round(col("tp") * 100).cast("long")).as("sum_cents"),
            sum(datediff(col("dt"), lit("1970-01-01")).cast("long"))
              .as("sum_days"))
          .select(lit(codec).as("codec"), lit("spark").as("reader"),
            col("n"), col("sum_k"), col("sum_ck"), col("n_null_ck"),
            col("min_st"), col("max_st"), col("sum_cents"),
            col("sum_days"))
        val ovFace = s.read.format("binaryFile").load(dir)
          .filter(col("path").endsWith(".orc"))
          .select(
            graft.functions.OrcValues
              .int64ColumnCol(col("content"), lit("k")).as("ks"),
            graft.functions.OrcValues
              .int64ColumnCol(col("content"), lit("ck")).as("cks"),
            graft.functions.OrcValues
              .stringColumnCol(col("content"), lit("st")).as("sts"),
            graft.functions.OrcValues
              .doubleColumnCol(col("content"), lit("tp")).as("tps"),
            graft.functions.OrcValues
              .dateDaysCol(col("content"), lit("dt")).as("dts"))
          .select(lit(codec).as("codec"), lit("orcvalues").as("reader"),
            size(col("ks")).cast("long").as("n"),
            aggregate(col("ks"), lit(0L), (a, x) => a + x).as("sum_k"),
            aggregate(col("cks"), lit(0L),
              (a, x) => a + coalesce(x, lit(0L))).as("sum_ck"),
            size(filter(col("cks"), x => x.isNull)).cast("long")
              .as("n_null_ck"),
            array_min(col("sts")).as("min_st"),
            array_max(col("sts")).as("max_st"),
            aggregate(col("tps"), lit(0L),
              (a, x) => a + round(x * 100).cast("long")).as("sum_cents"),
            aggregate(col("dts"), lit(0L), (a, x) => a + x).as("sum_days"))
        Seq(sparkFace, ovFace)
    }
    ordered(faces.reduce(_ unionByName _), "codec", "reader")
  }

  /** Parquet fixture dirs for the nested/gzip gate, written once per
    * sf-dir per JVM (same idempotence contract as [[orcFixture]]). */
  private val parquetNestedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  private def parquetNestedFixture(src: DataFrame, d: String): String =
    parquetNestedDirs.computeIfAbsent(d, _ => {
      val p = java.nio.file.Files.createTempDirectory("pq_nested")
      src.coalesce(1).write
        .option("compression", "gzip")
        .option("parquet.page.size", "4096") // many pages: lists split mid-page
        .mode("overwrite").parquet(p.toString)
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().forEachRemaining(q => q.toFile.deleteOnExit())
      finally walk.close()
      p.toString
    })

  /** Parquet NESTED + GZIP gate — the two round-15 decline boundaries
    * closed in one loop: Spark writes a fixture with a list<bigint>
    * column (null lists, empty lists, null elements) and a
    * list<string> column under GZIP compression, and `ParquetPages`
    * reads it back raw — RFC 1952 pages through our own Inflate,
    * repetition levels through the generic def/rep decoder, list
    * reassembly across page boundaries. The decoded lists aggregate
    * per key and the oracle recomputes every figure from lineitem, so
    * one wrong rep level, def threshold, or gzip window copy
    * hash-mismatches. */
  def xParquetNested(s: SparkSession, d: String): DataFrame = {
    val src = lineitem(s, d)
      .groupBy(col("l_orderkey").cast("long").as("k"))
      .agg(
        sort_array(collect_list(col("l_linenumber").cast("long"))).as("nums0"),
        sort_array(collect_list(col("l_returnflag"))).as("flags0"))
      .select(col("k"),
        when(pmod(col("k"), lit(50)) === 0, lit(null))
          .otherwise(transform(col("nums0"),
            x => when(x === 3, lit(null)).otherwise(x))).as("nums"),
        when(pmod(col("k"), lit(31)) === 0, array().cast("array<string>"))
          .otherwise(col("flags0")).as("flags"),
        when(pmod(col("k"), lit(41)) === 0, lit(null))
          .otherwise(pmod(col("k"), lit(3)) === 0).as("even3"))
    val dir = parquetNestedFixture(src, d)
    val decoded = s.read.format("binaryFile").load(dir)
      .filter(col("path").endsWith(".parquet"))
      .select(
        graft.functions.ParquetPages
          .int64ColumnCol(col("content"), lit("k")).as("ks"),
        graft.functions.ParquetPages
          .int64ListColumnCol(col("content"), lit("nums")).as("nums"),
        graft.functions.ParquetPages
          .stringListColumnCol(col("content"), lit("flags")).as("flags"),
        graft.functions.ParquetPages
          .boolColumnCol(col("content"), lit("even3")).as("bools"))
      .select(explode(arrays_zip(col("ks"), col("nums"), col("flags"),
        col("bools"))).as("r"))
      .select(col("r.ks").as("k"), col("r.nums").as("nums"),
        col("r.flags").as("flags"), col("r.bools").as("even3"))
    ordered(
      decoded.select(col("k"),
        size(col("nums")).cast("long").as("n_nums"),
        aggregate(col("nums"), lit(0L), (a, x) => a + coalesce(x, lit(0L)))
          .as("sum_nums"),
        size(col("flags")).cast("long").as("n_flags"),
        array_min(col("flags")).as("min_flag"),
        array_max(col("flags")).as("max_flag"),
        col("even3").cast("long").as("even3")),
      "k")
  }

  /** Deflate-codec twin of x_avro_write: the writer emits stored-block
    * RFC 1951 payloads and the same query decodes them back through
    * AvroRead's in-house Inflate; real avro-java consuming the blobs
    * is AvroWriteSpec's cross-implementation check. Same oracle — the
    * decoded records are identical by construction. */
  def xAvroWriteDeflate(s: SparkSession, d: String): DataFrame = {
    val blobs = orders(s, d).groupBy(col("o_orderpriority"))
      .agg(graft.functions.AvroWrite
        .avroFile(col("o_orderkey"), col("o_orderstatus"), "k", "st", "deflate")
        .as("f"))
    ordered(
      blobs.select(col("o_orderpriority"),
        graft.functions.AvroRead.fileMetaCol(col("f")).as("m"),
        graft.functions.AvroRead.int64ColumnCol(col("f"), lit("k")).as("ks"),
        graft.functions.AvroRead.stringColumnCol(col("f"), lit("st")).as("sts"))
        .select(col("o_orderpriority"),
          col("m.n_records").as("n_records"),
          aggregate(col("ks"), lit(0L), (a, x) => a + x).as("sum_key"),
          array_min(col("sts")).as("min_status"),
          array_max(col("sts")).as("max_status")),
      "o_orderpriority")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "x_text_tokens"       -> (xTextTokens _),
    "x_text_quality"      -> (xTextQuality _),
    "x_text_langid"       -> (xTextLangid _),
    "x_lang_confusion"    -> (xLangConfusion _),
    "x_text_fingerprint"  -> (xTextFingerprint _),
    "x_dedup_exact"       -> (xDedupExact _),
    "x_dedup_lines"       -> (xDedupLines _),
    "x_dedup_substrings"  -> (xDedupSubstrings _),
    "x_zorder_key"        -> (xZorderKey _),
    "x_bpe_pairs"         -> (xBpePairs _),
    "x_corpus_refine"     -> (xCorpusRefine _),
    "x_dedup_ngram"       -> (xDedupNgram _),
    "x_chunk_overlap"     -> (xChunkOverlap _),
    "x_text_winnow"       -> (xTextWinnow _),
    "x_quality_rules"     -> (xQualityRules _),
    "x_hybrid_rrf"        -> (xHybridRrf _),
    "x_corpus_card"       -> (xCorpusCard _),
    "x_text_novelty"      -> (xTextNovelty _),
    "x_ccnet_refine"      -> (xCcnetRefine _),
    "x_dedup_contain"     -> (xDedupContain _),
    "x_contain_apply"     -> (xContainApply _),
    "x_dedup_contain_prefix" -> (xDedupContainPrefix _),
    "x_lm_typicality"     -> (xLmTypicality _),
    "x_dedup_ngram_ppjoin" -> (xDedupNgramPpjoin _),
    "x_dedup_ngram_auto"  -> (xDedupNgramAuto _),
    "x_dedup_minhash"     -> (xDedupMinhash _),
    "x_dedup_simhash"     -> (xDedupSimhash _),
    "x_dedup_embedding_nn" -> (xDedupEmbeddingNn _),
    "x_ann_topk"          -> (xAnnTopk _),
    "x_ann_ivf"           -> (xAnnIvf _),
    "x_semdedup"          -> (xSemDedup _),
    "x_ann_nn_join"       -> (xAnnNnJoin _),
    "x_ann_sketch"        -> (xAnnSketch _),
    "x_ann_recall"        -> ((s: SparkSession, d: String) => xAnnRecall(s, d)),
    "x_dedup_apply"       -> (xDedupApply _),
    "x_dedup_clusters"    -> (xDedupClusters _),
    "x_sample_stratified" -> (xSampleStratified _),
    "x_sample_split"      -> (xSampleSplit _),
    "x_sample_taken"      -> (xSampleTaken _),
    "x_sample_mixture"    -> (xSampleMixture _),
    "x_sample_shard"      -> (xSampleShard _),
    "x_sample_weighted"   -> (xSampleWeighted _),
    "x_sample_examples"   -> (xSampleExamples _),
    "x_sample_pps"        -> (xSamplePps _),
    "x_typo_pairs"        -> (xTypoPairs _),
    "x_dsir_weights"      -> (xDsirWeights _),
    "x_quality_rank"      -> (xQualityRank _),
    "x_quality_rank_scale" -> (xQualityRankScale _),
    "x_negatives"         -> (xNegatives _),
    "x_sample_curriculum" -> (xSampleCurriculum _),
    "x_chunk"             -> (xChunk _),
    "x_text_cooccur"      -> (xTextCooccur _),
    "x_text_index"        -> (xTextIndex _),
    "x_text_repetition"   -> (xTextRepetition _),
    "x_text_topterms"     -> (xTextTopterms _),
    "x_text_bm25"         -> (xTextBm25 _),
    "x_text_bm25_topk"    -> (xTextBm25TopK _),
    "x_text_normalize"    -> (xTextNormalize _),
    "x_pack_sequences"    -> (xPackSequences _),
    "x_pii_redact"        -> (xPiiRedact _),
    "x_decontaminate"     -> (xDecontaminate _),
    "x_embed_quantize"    -> (xEmbedQuantize _),
    "x_embed_centroid"    -> (xEmbedCentroid _),
    "x_kmeans_assign"     -> (xKmeansAssign _),
    "x_embed_outliers"    -> (xEmbedOutliers _),
    "x_kmeans_step"       -> (xKmeansStep _),
    "x_embed_lsh"         -> (xEmbedLsh _),
    "x_ann_quantized"     -> (xAnnQuantized _),
    "x_ann_pq"            -> (xAnnPq _),
    "x_ann_ivfpq"         -> (xAnnIvfPq _),
    "x_vocab_coverage"    -> (xVocabCoverage _),
    "x_diversity"         -> (xDiversity _),
    "x_dedup_keep_longest" -> (xDedupKeepLongest _),
    "x_dedup_indoc"       -> (xDedupIndoc _),
    "x_snapshot_diff"     -> (xSnapshotDiff _),
    "x_token_budget"      -> (xTokenBudget _),
    "x_dedup_eval"        -> (xDedupEval _),
    "x_quality_calibrate" -> (xQualityCalibrate _),
    "x_mixture_audit"     -> (xMixtureAudit _),
    "x_split_leakage_safe" -> (xSplitLeakageSafe _),
    "x_corpus_pipeline"   -> (xCorpusPipeline _),
    "x_corpus_assembly"   -> (xCorpusAssembly _),
    "x_multimodal"        -> (xMultimodal _),
    "x_multimodal_meta"   -> (xMultimodalMeta _),
    "x_wav_pcm"           -> (xWavPcm _),
    "x_flac_pcm"          -> (xFlacPcm _),
    "x_zip_entries"       -> (xZipEntries _),
    "x_tar_entries"       -> (xTarEntries _),
    "x_utf8_scan"         -> (xUtf8Scan _),
    "x_mojibake"          -> (xMojibake _),
    "x_mime_parts"        -> (xMimeParts _),
    "x_email_headers"     -> (xEmailHeaders _),
    "x_mbox"              -> (xMbox _),
    "x_markdown_text"     -> (xMarkdownText _),
    "x_sentences"         -> (xSentences _),
    "x_csv_sniff"         -> (xCsvSniff _),
    "x_encoding_sniff"    -> (xEncodingSniff _),
    "x_archive_ingest"    -> (xArchiveIngest _),
    "x_html_tables"       -> (xHtmlTables _),
    "x_json_repair"       -> (xJsonRepair _),
    "x_webp_meta"         -> (xWebpMeta _),
    "x_tiff_meta"         -> (xTiffMeta _),
    "x_ogg_meta"          -> (xOggMeta _),
    "x_gif_pixels"        -> (xGifPixels _),
    "x_png_pixels"        -> (xPngPixels _),
    "x_jpeg_pixels"       -> (xJpegPixels _),
    "x_jpeg_color"        -> (xJpegColor _),
    "x_av_meta"           -> (xAvMeta _),
    "x_web_pipeline"      -> (xWebPipeline _),
    "x_warc_gz"           -> (xWarcGz _),
    "x_pdf_text"          -> (xPdfText _),
    "x_pdf_objstm"        -> (xPdfObjstm _),
    "x_crawl_waves"       -> (xCrawlWaves _),
    "x_http_response"     -> (xHttpResponse _),
    "x_fetch_extract"     -> (xFetchExtract _),
    "x_crawl_schedule"    -> (xCrawlSchedule _),
    "x_robots_status"     -> (xRobotsStatus _),
    "x_content_extract"   -> (xContentExtract _),
    "x_link_extract"      -> (xLinkExtract _),
    "x_link_graph"        -> (xLinkGraph _),
    "x_link_rank"         -> (xLinkRank _),
    "x_host_rank_incr"    -> (xHostRankIncr _),
    "x_av_duration"       -> (xAvDuration _),
    "x_warc_extract"      -> (xWarcExtract _),
    "x_jpeg_progressive"  -> (xJpegProgressive _),
    "x_subtitle_cues"     -> (xSubtitleCues _),
    "x_webvtt_cues"       -> (xWebvttCues _),
    "x_exif_meta"         -> (xExifMeta _),
    "x_id3_tags"          -> (xId3Tags _),
    "x_robots_filter"     -> (xRobotsFilter _),
    "x_sitemap_entries"   -> (xSitemapEntries _),
    "x_crawl_frontier"    -> (xCrawlFrontier _),
    "x_wav_g711"          -> (xWavG711 _),
    "x_image_neardup"     -> (xImageNearDup _),
    "x_html_text"         -> (xHtmlText _),
    "x_url_canonical"     -> (xUrlCanonical _),
    "x_frame_sample"      -> (xFrameSample _),
    "x_chunk_cdc"         -> (xChunkCdc _),
    "x_coreset_kcenter"   -> (xCoresetKcenter _),
    "x_boilerplate"       -> (xBoilerplate _),
    "x_source_overlap"    -> (xSourceOverlap _),
    "x_coreset_mmr"       -> (xCoresetMmr _),
    "x_rank_rbo"          -> (xRankRbo _),
    "x_ann_assign_new"    -> (xAnnAssignNew _),
    "x_search_phrase"     -> (xSearchPhrase _),
    "x_dedup_snm"         -> (xDedupSnm _),
    "x_parquet_footer"    -> (xParquetFooter _),
    "x_parquet_schema"    -> (xParquetSchema _),
    "x_ip_lpm"            -> (xIpLpm _),
    "x_geo_radius"        -> (xGeoRadius _),
    "x_proto_fields"      -> (xProtoFields _),
    "x_lz4_block"         -> (xLz4Block _),
    "x_snappy_block"      -> (xSnappyBlock _),
    "x_parquet_pages"     -> (xParquetPages _),
    "x_parquet_prune"     -> (xParquetPrune _),
    "x_inflate_raw"       -> (xInflateRaw _),
    "x_avro_read"         -> (xAvroRead _),
    "x_avro_nested"       -> (xAvroNested _),
    "x_parquet_map"       -> (xParquetMap _),
    "x_parquet_struct"    -> (xParquetStruct _),
    "x_parquet_write"     -> (xParquetWrite _),
    "x_orc_meta"          -> (xOrcMeta _),
    "x_orc_values"        -> (xOrcValues _),
    "x_orc_write"         -> (xOrcWrite _),
    "x_zstd_frames"       -> (xZstdFrames _),
    "x_lake_doubles"      -> (xLakeDoubles _),
    "x_orc_temporal"      -> (xOrcTemporal _),
    "x_parquet_temporal"  -> (xParquetTemporal _),
    "x_delta_snapshot"    -> (xDeltaSnapshot _),
    "x_delta_prune"       -> (xDeltaPrune _),
    "x_iceberg_meta"      -> (xIcebergMeta _),
    "x_iceberg_snapshot"  -> (xIcebergSnapshot _),
    "x_iceberg_appends"   -> (xIcebergAppends _),
    "x_iceberg_write"     -> (xIcebergWrite _),
    "x_iceberg_nested"    -> (xIcebergNested _),
    "x_iceberg_evolve"    -> (xIcebergEvolve _),
    "x_delta_checkpoint"  -> (xDeltaCheckpoint _),
    "x_delta_vacuum"      -> (xDeltaVacuum _),
    "x_iceberg_expire"    -> (xIcebergExpire _),
    "x_delta_delete"      -> (xDeltaDelete _),
    "x_iceberg_delete"    -> (xIcebergDelete _),
    "x_delta_merge"       -> (xDeltaMerge _),
    "x_iceberg_merge"     -> (xIcebergMerge _),
    "x_delta_update"      -> (xDeltaUpdate _),
    "x_iceberg_update"    -> (xIcebergUpdate _),
    "x_iceberg_prune"     -> (xIcebergPrune _),
    "x_iceberg_deletes"   -> (xIcebergDeletes _),
    "x_iceberg_eqdel"     -> (xIcebergEqdel _),
    "x_delta_dv"          -> (xDeltaDv _),
    "x_delta_cmap"        -> (xDeltaCmap _),
    "x_delta_cdf"         -> (xDeltaCdf _),
    "x_delta_write"       -> (xDeltaWrite _),
    "x_avro_write"        -> (xAvroWrite _),
    "x_avro_write_deflate" -> (xAvroWriteDeflate _),
    "x_parquet_write2"    -> (xParquetWrite2 _),
    "x_parquet_nested"    -> (xParquetNested _))

  private val toksSql =
    "list_filter(str_split_regex(lower(text), '[^a-z0-9]+'), t -> t <> '')"

  /** BM25 scored-documents CTE chain (k1=1.2, b=0.75, Lucene ln-idf over
    * `bm25Terms`) — shared by the top-k retrieval gate and the hybrid-RRF
    * fusion so the two can never assert different BM25 semantics. */
  private lazy val bm25ScoredCte =
    s"""t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       |base AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl,
       |${bm25Terms.zipWithIndex.map { case (t, i) =>
           s"  CAST(len(list_filter(toks, x -> x = '$t')) AS BIGINT) AS tf$i"
         }.mkString(",\n")}
       |  FROM t),
       |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(dl) AS BIGINT) AS tot,
       |${bm25Terms.indices.map { i =>
           s"  CAST(count(*) FILTER (WHERE tf$i > 0) AS BIGINT) AS df$i"
         }.mkString(",\n")}
       |  FROM base),
       |s2 AS (SELECT *, tot / n_docs AS avgdl FROM stats),
       |scored AS (SELECT doc_id,
       |${bm25Terms.indices.map { i =>
           s"  (((tf$i * CAST(${1.2 + 1} AS DOUBLE)) / (tf$i + CAST(${1.2} AS DOUBLE) * " +
             s"(CAST(${1 - 0.75} AS DOUBLE) + CAST(${0.75} AS DOUBLE) * (dl / avgdl)))) * " +
             s"ln(CAST(1.0 AS DOUBLE) + (n_docs - df$i + CAST(0.5 AS DOUBLE)) / (df$i + CAST(0.5 AS DOUBLE))))"
         }.mkString("\n  + ")} AS score
       |  FROM base CROSS JOIN s2)""".stripMargin

  /** Hash-seeded IVF centroid-assignment CTE chain (nlist=16, the exact
    * seed + rounded-cosine + cluster tie-break rule of
    * `Similarity.ivfSeedCentroids`/`ivfAssignSeeds`) — shared by the IVF
    * probe gate and SemDeDup so one seed-rule change cannot diverge them. */
  private lazy val ivfAssignCte =
    """c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
      |seeds AS (
      |  SELECT e AS se,
      |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cluster
      |  FROM c ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
      |assign AS (
      |  SELECT vec_id, cluster, e FROM (
      |    SELECT c.vec_id, s.cluster, c.e,
      |           row_number() OVER (PARTITION BY c.vec_id
      |             ORDER BY round(list_cosine_similarity(c.e, s.se), 6) DESC, s.cluster) AS rn
      |    FROM c CROSS JOIN seeds s) WHERE rn = 1)""".stripMargin

  /** Hashed bigram-LM per-doc score CTE (mirrors
    * `TextAnalysis.lmTypicality` at 512 buckets) — shared by the
    * typicality gate and the CCNet-refine composition. */
  private lazy val lmScoreCte =
    s"""toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
       |bg AS (SELECT doc_id,
       |    unnest(list_transform(range(1, len(ts)),
       |      i -> struct_pack(p := ts[i], c := ts[i+1]))) AS b
       |  FROM toks WHERE len(ts) >= 2),
       |hb AS (SELECT doc_id,
       |    CAST(CONCAT('0x', substr(md5(b.p), 1, 15)) AS BIGINT) % 512 AS bp,
       |    CAST(CONCAT('0x', substr(md5(b.c), 1, 15)) AS BIGINT) % 512 AS bc
       |  FROM bg),
       |c2 AS (SELECT bp, bc, COUNT(*) AS n2 FROM hb GROUP BY 1, 2),
       |c1 AS (SELECT bp, COUNT(*) AS n1 FROM hb GROUP BY 1),
       |ppm AS (SELECT doc_id,
       |    (n2 + 1) * 1000000 // (n1 + 512) AS p
       |  FROM hb JOIN c2 USING (bp, bc) JOIN c1 USING (bp)),
       |sc AS (SELECT doc_id, COUNT(*) AS n_bigrams,
       |    CAST(SUM(p) AS BIGINT) AS lm_score FROM ppm GROUP BY 1)""".stripMargin

  /** Directed containment over distinct 3-gram sets — shared by the
    * direct exactness gate and the prefix-filter scale gate (identical
    * output by construction). */
  private lazy val containOracle =
    s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
       |grams AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
       |          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
       |          WHERE len(ts) >= 3),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n
       |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
       |          GROUP BY 1, 2),
       |dirs AS (
       |  SELECT d1 AS d_sub, d2 AS d_super, n / s1.sz AS containment
       |  FROM inter JOIN sizes s1 ON d1 = s1.doc_id
       |  UNION ALL
       |  SELECT d2, d1, n / s2.sz
       |  FROM inter JOIN sizes s2 ON d2 = s2.doc_id)
       |SELECT d_sub, d_super, containment FROM dirs
       |WHERE containment >= 0.9
       |ORDER BY d_sub, d_super""".stripMargin

  /** 24 hashes / 4 bands of 6 — must mirror minhashLshPairs' defaults. */
  private val minhashParams: String = (0 until 24)
    .map(j => s"($j, ${2 * j + 1}, ${7919L * j + 12345L})").mkString(", ")

  /** The >=0.8 MinHash-LSH verified pair CTE (full banding scheme, the
    * same one x_dedup_minhash proves), shared by the dedup oracles.
    * Verification mirrors the engine's round-5 shape: set-Jaccard over
    * per-doc DISTINCT 32-bit gram hashes (md5-derived on both sides, so
    * any hash collision is identical cross-engine). */
  private val lshPairsCte =
    s"""toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
       |grams AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
       |          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
       |          WHERE len(ts) >= 3),
       |h AS (SELECT doc_id, g, CAST(CONCAT('0x', substr(md5(g), 1, 8)) AS BIGINT) AS h32 FROM grams),
       |params(j, a, b) AS (VALUES $minhashParams),
       |sigs AS (SELECT doc_id, j, min((a * h32 + b) % 4294967311) AS s
       |         FROM h CROSS JOIN params GROUP BY 1, 2),
       |bands AS (SELECT doc_id, j // 6 AS band,
       |            string_agg(CAST(s AS VARCHAR), '_' ORDER BY j) AS bkey
       |          FROM sigs GROUP BY 1, 2),
       |cand AS (SELECT DISTINCT x.doc_id AS d1, y.doc_id AS d2
       |         FROM bands x JOIN bands y
       |           ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
       |hsets AS (SELECT doc_id, list_distinct(list(h32)) AS hs,
       |            count(DISTINCT h32) AS sz FROM h GROUP BY 1),
       |inter AS (SELECT d1, d2, len(list_intersect(a.hs, b.hs)) AS n,
       |            a.sz AS sz1, b.sz AS sz2
       |          FROM cand JOIN hsets a ON a.doc_id = d1
       |          JOIN hsets b ON b.doc_id = d2),
       |pairs AS (SELECT d1, d2, n / (sz1 + sz2 - n) AS jaccard
       |          FROM inter WHERE n / (sz1 + sz2 - n) >= 0.8)""".stripMargin

  private val stopwordsSql =
    TextAnalysis.stopwords.map(w => s"'$w'").mkString("[", ", ", "]")

  private def markerSql(lang: String): String =
    TextAnalysis.langMarkers.toMap.apply(lang).map(w => s"'$w'").mkString("[", ", ", "]")

  private lazy val qualityRankOracle =
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |q AS (SELECT doc_id,
         |    least(1.0, CAST(len(toks) AS BIGINT) / 100.0) * 0.4
         |    + (CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 0.3
         |    + (CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t2 -> list_contains($stopwordsSql, t2))) AS DOUBLE) / len(toks) ELSE 0.0 END) * 0.3
         |    AS score
         |  FROM t),
         |p AS (SELECT doc_id, CAST(CAST(score AS DECIMAL(18,6)) * 1000000 AS BIGINT) AS q_ppm FROM q),
         |r AS (SELECT doc_id, q_ppm,
         |  CAST(rank() OVER (ORDER BY q_ppm) - 1 AS BIGINT) AS rank_below,
         |  (SELECT COUNT(*) FROM p) AS n FROM p)
         |SELECT doc_id, q_ppm, rank_below,
         |  CASE WHEN n > 1 THEN rank_below * 1000000 // (n - 1) ELSE 0 END AS pct_ppm
         |FROM r ORDER BY doc_id""".stripMargin

  /** The r0→r3 integer-PageRank unroll over the link fixture's host
    * graph — shared by `x_link_rank` (one batch) and
    * `x_host_rank_incr` (three batches + compaction + replay): summed
    * edge deltas merge to the identical graph, so both faces must
    * produce these exact ranks. */
  private val linkRankOracleSql: String =
    """WITH d AS (SELECT doc_id,
      |    'site' || (doc_id % 20) || '.example' AS src FROM documents),
      |e0 AS (
      |  SELECT src, 'other.example' AS dst, 1 AS c FROM d
      |  UNION ALL SELECT src, 'peer.example', 1 FROM d
      |  UNION ALL SELECT src, src, 5 FROM d),
      |e AS (SELECT src, dst, SUM(c) AS w FROM e0 GROUP BY 1, 2),
      |sh AS (SELECT src, dst,
      |  CAST(w * 1000000 // SUM(w) OVER (PARTITION BY src) AS BIGINT) AS share
      |  FROM e),
      |nodes AS (SELECT src AS node FROM e UNION SELECT dst AS node FROM e),
      |nn AS (SELECT COUNT(*) AS n FROM nodes),
      |base AS (SELECT node, CAST(1000000000000 // n AS BIGINT) AS r0,
      |  CAST((1000000000000 // n) * 15 // 100 AS BIGINT) AS b FROM nodes, nn),
      |r0 AS (SELECT node, r0 AS r FROM base),
      |r1 AS (SELECT base.node, CAST(b + COALESCE(SUM(
      |    (p.r * sh.share // 1000000) * 85 // 100), 0) AS BIGINT) AS r
      |  FROM base LEFT JOIN sh ON sh.dst = base.node
      |  LEFT JOIN r0 p ON p.node = sh.src GROUP BY base.node, b),
      |r2 AS (SELECT base.node, CAST(b + COALESCE(SUM(
      |    (p.r * sh.share // 1000000) * 85 // 100), 0) AS BIGINT) AS r
      |  FROM base LEFT JOIN sh ON sh.dst = base.node
      |  LEFT JOIN r1 p ON p.node = sh.src GROUP BY base.node, b),
      |r3 AS (SELECT base.node, CAST(b + COALESCE(SUM(
      |    (p.r * sh.share // 1000000) * 85 // 100), 0) AS BIGINT) AS r
      |  FROM base LEFT JOIN sh ON sh.dst = base.node
      |  LEFT JOIN r2 p ON p.node = sh.src GROUP BY base.node, b)
      |SELECT node, r AS rank FROM r3 ORDER BY node""".stripMargin

  /** (table, column, parquet physical type) triples for the footer-stats
    * gate: the physical types are fixed by the table schemas every other
    * gate already depends on (BIGINT→INT64, INTEGER→INT32,
    * VARCHAR→BYTE_ARRAY). */
  private val footerGateCols = Seq(
    ("lineitem", "l_orderkey", "INT64"), ("lineitem", "l_partkey", "INT64"),
    ("lineitem", "l_linenumber", "INT32"),
    ("lineitem", "l_returnflag", "BYTE_ARRAY"),
    ("orders", "o_orderkey", "INT64"), ("orders", "o_custkey", "INT64"),
    ("orders", "o_orderstatus", "BYTE_ARRAY"),
    ("documents", "doc_id", "INT64"), ("documents", "lang", "BYTE_ARRAY"),
    ("documents", "source", "BYTE_ARRAY"))

  private lazy val parquetFooterOracle: String =
    footerGateCols.map { case (t, c, pt) =>
      s"SELECT '$t' AS tbl, '$c' AS col_name, '$pt' AS ptype, " +
        s"count(*) AS num_values, count(*) - count($c) AS null_count, " +
        s"CAST(min($c) AS VARCHAR) AS min_s, CAST(max($c) AS VARCHAR) AS max_s " +
        s"FROM $t"
    }.mkString("", " UNION ALL ", " ORDER BY tbl, col_name")

  private lazy val parquetSchemaOracle: String =
    Seq("documents", "lineitem", "orders").map { t =>
      s"SELECT '$t' AS tbl, (SELECT count(*) FROM $t) AS num_rows, " +
        s"(SELECT count(*) FROM $t) AS rg_rows_total, " +
        s"(SELECT count(*) FROM (DESCRIBE $t)) AS n_leaves, " +
        "(SELECT string_agg(column_name, ',' ORDER BY column_name) " +
        s"FROM (DESCRIBE $t)) AS leaf_names"
    }.mkString("", " UNION ALL ", " ORDER BY tbl")

  private lazy val ipLpmOracle: String =
    """WITH dims AS (
      |  SELECT 16 AS len, (CAST(10 AS BIGINT)<<24) + (n_nationkey<<16) AS net,
      |         'nation-' || CAST(n_nationkey AS VARCHAR) AS label FROM nation
      |  UNION ALL
      |  SELECT 24, (CAST(10 AS BIGINT)<<24) + (n_nationkey<<16)
      |         + (((n_nationkey*2)%256)<<8),
      |         'site-' || CAST(n_nationkey AS VARCHAR) FROM nation
      |  WHERE n_nationkey % 3 = 0
      |  UNION ALL
      |  SELECT 8, CAST(10 AS BIGINT)<<24, 'default' FROM region
      |  WHERE r_regionkey = 0
      |  UNION ALL
      |  SELECT 16, (CAST(192 AS BIGINT)<<24) + (168<<16), 'private' FROM region
      |  WHERE r_regionkey = 1
      |),
      |facts AS (SELECT c_custkey,
      |  CASE WHEN c_custkey % 97 = 0 THEN '999.1.2.3'
      |       ELSE '10.' || CAST(c_custkey%40 AS VARCHAR) || '.'
      |            || CAST((c_custkey*2)%256 AS VARCHAR) || '.'
      |            || CAST(c_custkey%250 AS VARCHAR) END AS ip,
      |  CASE WHEN c_custkey % 97 = 0 THEN NULL
      |       ELSE (CAST(10 AS BIGINT)<<24) + ((c_custkey%40)<<16)
      |            + (((c_custkey*2)%256)<<8) + (c_custkey%250) END AS ipnum
      |  FROM customer),
      |m AS (SELECT f.c_custkey, d.len, d.label,
      |    row_number() OVER (PARTITION BY f.c_custkey ORDER BY d.len DESC) AS rn
      |  FROM facts f JOIN dims d
      |    ON ((f.ipnum >> (32-d.len)) << (32-d.len)) = d.net)
      |SELECT f.c_custkey, f.ip, m.len AS prefix_len, m.label
      |FROM facts f LEFT JOIN m ON m.c_custkey = f.c_custkey AND m.rn = 1
      |ORDER BY f.c_custkey""".stripMargin

  private lazy val geoRadiusOracle: String =
    """WITH c AS (SELECT c_custkey,
      |    (c_custkey%120)*0.7 - 42.0 AS clat,
      |    (c_custkey%360) - 180.0 + 0.25 AS clon FROM customer),
      |s AS (SELECT s_suppkey,
      |    (s_suppkey%120)*0.7 - 41.65 AS slat,
      |    (s_suppkey%360) - 180.0 + 0.45 AS slon FROM supplier),
      |p AS (SELECT c_custkey, s_suppkey,
      |    2*6371.0088*asin(sqrt(
      |      pow(sin(radians(slat-clat)/2), 2)
      |      + cos(radians(clat))*cos(radians(slat))
      |        * pow(sin(radians(slon-clon)/2), 2))) AS dist
      |  FROM c CROSS JOIN s)
      |SELECT c_custkey, s_suppkey, round(dist, 3) AS dist_km
      |FROM p WHERE dist <= 130.0
      |ORDER BY c_custkey, s_suppkey""".stripMargin

  private lazy val protoFieldsOracle: String = {
    // zigzag decode of a raw varint in SQL
    def zz(raw: String) =
      s"CASE WHEN ($raw)%2=0 THEN ($raw)//2 ELSE -(($raw)//2)-1 END"
    """WITH f AS (
      |SELECT doc_id, 0 AS idx, 1 AS field_no, 0 AS wire_type,
      |  doc_id%120 AS int_value, ZZ1 AS sint_value,
      |  CAST(NULL AS BIGINT) AS len_value, CAST(NULL AS VARCHAR) AS str_value
      |FROM documents
      |UNION ALL SELECT doc_id, 1, 2, 0, 200+(doc_id*37)%5000, ZZ2,
      |  NULL, NULL FROM documents
      |UNION ALL SELECT doc_id, 2, 3, 2, NULL, NULL,
      |  4+length(CAST(doc_id AS VARCHAR)),
      |  'doc-' || CAST(doc_id AS VARCHAR) FROM documents
      |UNION ALL SELECT doc_id, 3, 4, 5, doc_id*3+7, NULL, NULL, NULL
      |FROM documents
      |UNION ALL SELECT doc_id, 4, 5, 0,
      |  CASE WHEN doc_id%100-50 < 0 THEN -(doc_id%100-50)*2-1
      |       ELSE (doc_id%100-50)*2 END,
      |  doc_id%100-50, NULL, NULL FROM documents
      |UNION ALL SELECT doc_id, 5, 16, 0, doc_id%7, ZZ3, NULL, NULL
      |FROM documents)
      |SELECT * FROM f ORDER BY doc_id, idx""".stripMargin
      .replace("ZZ1", zz("doc_id%120"))
      .replace("ZZ2", zz("200+(doc_id*37)%5000"))
      .replace("ZZ3", zz("doc_id%7"))
  }

  private val codecBaseCte =
    "b AS (SELECT doc_id, rpad(substr(regexp_replace(text, '[^a-z ]', '', " +
      "'g'), 1, 80), 80, 'x') AS base FROM documents)"

  private lazy val lz4BlockOracle: String =
    s"""WITH $codecBaseCte
       |SELECT doc_id,
       |  substr(base,1,40) || substr(base,1,20)
       |    || repeat(substr(base,41,1), 10) || substr(base,42,20) AS decoded,
       |  CAST(90 AS BIGINT) AS n_bytes
       |FROM b ORDER BY doc_id""".stripMargin

  private lazy val snappyBlockOracle: String =
    s"""WITH $codecBaseCte
       |SELECT doc_id,
       |  substr(base,1,30) || substr(base,1,10) || substr(base,11,70)
       |    || substr(base,11,20) || substr(base,1,5) AS decoded,
       |  CAST(135 AS BIGINT) AS n_bytes
       |FROM b ORDER BY doc_id""".stripMargin

  private lazy val parquetPagesOracle: String =
    Seq(("documents", "doc_id", "lang"),
        ("lineitem", "l_orderkey", "l_returnflag"),
        ("orders", "o_custkey", "o_orderstatus")).map { case (t, ic, sc) =>
      s"SELECT '$t' AS tbl, count(*) AS n, CAST(sum($ic) AS BIGINT) AS sum_v, " +
        s"min($ic) AS min_v, max($ic) AS max_v, " +
        s"CAST(count(DISTINCT $sc) AS BIGINT) AS n_distinct_s, " +
        s"min($sc) AS min_s, max($sc) AS max_s FROM $t"
    }.mkString("", " UNION ALL ", " ORDER BY tbl")

  private lazy val parquetPruneOracle: String =
    Seq(("documents", "doc_id", 100L, 200L),
        ("lineitem", "l_orderkey", 1000L, 2000L),
        ("orders", "o_custkey", 900000L, 950000L)).map { case (t, c, lo, hi) =>
      s"SELECT '$t' AS tbl, " +
        s"CAST(CASE WHEN min($c) > $hi OR max($c) < $lo THEN 0 ELSE 1 END " +
        s"AS BIGINT) AS kept_groups, " +
        s"CAST(count(*) FILTER (WHERE $c BETWEEN $lo AND $hi) AS BIGINT) " +
        s"AS n_match, " +
        s"CAST(coalesce(sum($c) FILTER (WHERE $c BETWEEN $lo AND $hi), 0) " +
        s"AS BIGINT) AS sum_match FROM $t"
    }.mkString("", " UNION ALL ", " ORDER BY tbl")

  private lazy val inflateRawOracle: String =
    s"""WITH $codecBaseCte
       |SELECT doc_id, substr(base,1,80) AS decoded,
       |  CAST(80 AS BIGINT) AS n_bytes
       |FROM b ORDER BY doc_id""".stripMargin

  private lazy val avroReadOracle: String =
    Seq("deflate", "null").map { v =>
      s"SELECT doc_id, '$v' AS variant, CAST(2 AS BIGINT) AS n_records, " +
        s"'$v' AS codec, 'id,name' AS field_names, " +
        "CAST(doc_id * 2 + 7 AS BIGINT) AS sum_id, " +
        "'doc-' || CAST(doc_id AS VARCHAR) || ',n' || CAST(doc_id AS VARCHAR) " +
        "AS names FROM documents"
    }.mkString("", " UNION ALL ", " ORDER BY doc_id, variant")

  private lazy val parquetWriteOracle: String =
    "SELECT o_orderpriority, count(*) AS n_records, " +
      "CAST(sum(o_orderkey) AS BIGINT) AS sum_key, " +
      "min(o_orderstatus) AS min_status, max(o_orderstatus) AS max_status " +
      "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"

  private lazy val parquetWrite2Oracle: String =
    "SELECT o_orderpriority, count(*) AS n_records, " +
      "CAST((count(*) + 1023) // 1024 AS BIGINT) AS n_groups, " +
      "CAST(sum(o_orderkey) AS BIGINT) AS sum_key, " +
      "CAST(count(*) FILTER (WHERE o_orderkey % 9 = 0) AS BIGINT) " +
      "AS n_null_st, " +
      "CAST(count(DISTINCT CASE WHEN o_orderkey % 9 = 0 THEN NULL " +
      "ELSE o_orderstatus END) AS BIGINT) AS n_st, " +
      "min(CASE WHEN o_orderkey % 9 = 0 THEN NULL ELSE o_orderstatus END) " +
      "AS min_st, " +
      "max(CASE WHEN o_orderkey % 9 = 0 THEN NULL ELSE o_orderstatus END) " +
      "AS max_st " +
      "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"

  private lazy val parquetNestedOracle: String =
    """WITH g AS (
      |  SELECT l_orderkey AS k,
      |    CAST(count(*) AS BIGINT) AS cnt,
      |    CAST(sum(CASE WHEN l_linenumber = 3 THEN 0
      |             ELSE l_linenumber END) AS BIGINT) AS sm,
      |    min(l_returnflag) AS mn, max(l_returnflag) AS mx
      |  FROM lineitem GROUP BY 1)
      |SELECT k,
      |  CASE WHEN k % 50 = 0 THEN NULL ELSE cnt END AS n_nums,
      |  CASE WHEN k % 50 = 0 THEN NULL ELSE sm END AS sum_nums,
      |  CASE WHEN k % 31 = 0 THEN CAST(0 AS BIGINT) ELSE cnt END AS n_flags,
      |  CASE WHEN k % 31 = 0 THEN NULL ELSE mn END AS min_flag,
      |  CASE WHEN k % 31 = 0 THEN NULL ELSE mx END AS max_flag,
      |  CASE WHEN k % 41 = 0 THEN NULL
      |       ELSE CAST(k % 3 = 0 AS BIGINT) END AS even3
      |FROM g ORDER BY k""".stripMargin

  private lazy val orcMetaOracle: String =
    Seq("none", "snappy", "zlib", "zstd").map { codec =>
      s"SELECT '$codec' AS codec, count(*) AS n_rows, " +
        "count(*) AS stripe_rows_total, " +
        "'o_orderkey,o_orderstatus' AS field_names, " +
        "min(o_orderkey) AS min_key, max(o_orderkey) AS max_key, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS sum_key, " +
        "min(o_orderstatus) AS min_status, max(o_orderstatus) AS max_status " +
        "FROM orders"
    }.mkString("", " UNION ALL ", " ORDER BY codec")

  private lazy val parquetTemporalOracle: String =
    """SELECT 'int64us' AS face, CAST(count(*) AS BIGINT) AS n,
      |  CAST(0 AS BIGINT) AS n_null,
      |  CAST(sum(epoch_us(o_orderdate) // 1000000) AS BIGINT) AS sum_secs,
      |  CAST(min(epoch_us(o_orderdate)) AS BIGINT) AS min_micros,
      |  CAST(max(epoch_us(o_orderdate)) AS BIGINT) AS max_micros
      |FROM orders
      |UNION ALL
      |SELECT 'int96', CAST(count(*) AS BIGINT),
      |  CAST(count(*) FILTER (WHERE o_orderkey % 13 = 0) AS BIGINT),
      |  CAST(sum(CASE WHEN o_orderkey % 13 = 0 THEN 0
      |       ELSE epoch_us(o_orderdate) // 1000000 END) AS BIGINT),
      |  CAST(min(CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |       ELSE epoch_us(o_orderdate) END) AS BIGINT),
      |  CAST(max(CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |       ELSE epoch_us(o_orderdate) END) AS BIGINT)
      |FROM orders ORDER BY face""".stripMargin

  private lazy val orcTemporalOracle: String =
    """SELECT CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (WHERE o_orderkey % 13 = 0) AS BIGINT)
      |    AS n_null_ts,
      |  CAST(sum(CASE WHEN o_orderkey % 13 = 0 THEN 0
      |       ELSE epoch_us(o_orderdate) // 1000000 END) AS BIGINT)
      |    AS sum_secs,
      |  CAST(min(CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |       ELSE epoch_us(o_orderdate) END) AS BIGINT) AS min_micros,
      |  CAST(max(CASE WHEN o_orderkey % 13 = 0 THEN NULL
      |       ELSE epoch_us(o_orderdate) END) AS BIGINT) AS max_micros,
      |  CAST(count(*) FILTER (WHERE o_orderkey % 17 = 0) AS BIGINT)
      |    AS n_null_dt,
      |  CAST(sum(CASE WHEN o_orderkey % 17 = 0 THEN 0
      |       ELSE (CAST(o_orderdate AS DATE) - DATE '1970-01-01') END)
      |    AS BIGINT) AS sum_days
      |FROM orders""".stripMargin

  private lazy val lakeDoublesOracle: String =
    """SELECT 'orc' AS fmt, CAST(count(*) AS BIGINT) AS n,
      |  CAST(count(*) FILTER (WHERE o_orderkey % 5 = 0) AS BIGINT) AS n_null,
      |  CAST(sum(CASE WHEN o_orderkey % 5 = 0 THEN 0
      |       ELSE CAST(round(o_totalprice * 100) AS BIGINT) END) AS BIGINT)
      |    AS sum_cents,
      |  min(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END)
      |    AS min_v,
      |  max(CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_totalprice END)
      |    AS max_v
      |FROM orders
      |UNION ALL
      |SELECT 'parquet', CAST(count(*) AS BIGINT), CAST(0 AS BIGINT),
      |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT),
      |  min(o_totalprice), max(o_totalprice)
      |FROM orders ORDER BY fmt""".stripMargin

  private lazy val zstdFramesOracle: String =
    s"""WITH $codecBaseCte
       |SELECT doc_id,
       |  substr(base,1,80) || repeat(substr(base,41,1), 30)
       |    || substr(base,42,20) AS decoded,
       |  CAST(130 AS BIGINT) AS n_bytes
       |FROM b ORDER BY doc_id""".stripMargin

  private lazy val orcValuesOracle: String =
    Seq("none", "snappy", "zlib", "zstd").map { codec =>
      s"SELECT '$codec' AS codec, CAST(count(*) AS BIGINT) AS n, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS sum_key, " +
        "CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 0 ELSE o_custkey END) " +
        "AS BIGINT) AS sum_ck, " +
        "CAST(count(*) FILTER (WHERE o_orderkey % 7 = 0) AS BIGINT) " +
        "AS n_null_ck, " +
        "CAST(count(DISTINCT CASE WHEN o_orderkey % 11 = 0 THEN NULL " +
        "ELSE o_orderstatus END) AS BIGINT) AS n_status, " +
        "min(md5(CAST(o_orderkey AS VARCHAR))) AS min_h, " +
        "max(md5(CAST(o_orderkey AS VARCHAR))) AS max_h FROM orders"
    }.mkString("", " UNION ALL ", " ORDER BY codec")

  val oracle: Map[String, String] = Map(
    "x_parquet_footer" -> parquetFooterOracle,
    "x_parquet_schema" -> parquetSchemaOracle,
    "x_ip_lpm" -> ipLpmOracle,
    "x_geo_radius" -> geoRadiusOracle,
    "x_proto_fields" -> protoFieldsOracle,
    "x_lz4_block" -> lz4BlockOracle,
    "x_snappy_block" -> snappyBlockOracle,
    "x_parquet_pages" -> parquetPagesOracle,
    "x_parquet_prune" -> parquetPruneOracle,
    "x_inflate_raw" -> inflateRawOracle,
    "x_avro_read" -> avroReadOracle,
    "x_avro_nested" ->
      ("SELECT o_orderpriority AS prio, " +
        "CASE (CAST(substr(o_orderpriority,1,1) AS INT)-1) % 3 " +
        "WHEN 0 THEN 'null' WHEN 1 THEN 'deflate' " +
        "ELSE 'zstandard' END AS codec, " +
        "count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_k, " +
        "min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck, " +
        "CAST(sum(2*o_orderkey + 1) AS BIGINT) AS sum_parts, " +
        "'k2=' || CAST(2*min(o_orderkey) AS VARCHAR) || ',kk=' || " +
        "CAST(min(o_orderkey) AS VARCHAR) AS first_m, " +
        "CAST(sum(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END) " +
        "AS BIGINT) AS n_null_opt, " +
        "CAST(sum(CASE WHEN o_orderkey % 13 = 0 THEN 0 " +
        "ELSE 2*o_orderkey END) AS BIGINT) AS sum_opt " +
        "FROM orders GROUP BY 1 ORDER BY prio"),
    "x_parquet_write" -> parquetWriteOracle,
    "x_avro_write" -> parquetWriteOracle,
    "x_avro_write_deflate" -> parquetWriteOracle,
    "x_parquet_nested" -> parquetNestedOracle,
    "x_parquet_write2" -> parquetWrite2Oracle,
    "x_orc_meta" -> orcMetaOracle,
    "x_orc_values" -> orcValuesOracle,
    "x_orc_write" ->
      """WITH a AS (SELECT count(*) AS n,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |    CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 0
        |      ELSE o_custkey END) AS BIGINT) AS sum_ck,
        |    CAST(sum(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_null_ck,
        |    min(CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |      ELSE o_orderstatus END) AS min_st,
        |    max(CASE WHEN o_orderkey % 11 = 0 THEN NULL
        |      ELSE o_orderstatus END) AS max_st,
        |    CAST(sum(round(o_totalprice * 100)) AS BIGINT) AS sum_cents,
        |    CAST(sum(date_diff('day', DATE '1970-01-01', o_orderdate))
        |      AS BIGINT) AS sum_days
        |  FROM orders)
        |SELECT 'none' AS codec, 'orcvalues' AS reader, a.* FROM a
        |UNION ALL SELECT 'none', 'spark', a.* FROM a
        |UNION ALL SELECT 'zlib', 'orcvalues', a.* FROM a
        |UNION ALL SELECT 'zlib', 'spark', a.* FROM a
        |ORDER BY codec, reader""".stripMargin,
    "x_zstd_frames" -> zstdFramesOracle,
    "x_lake_doubles" -> lakeDoublesOracle,
    "x_orc_temporal" -> orcTemporalOracle,
    "x_parquet_temporal" -> parquetTemporalOracle,
    "x_iceberg_meta" ->
      ("SELECT doc_id, CAST(2 AS BIGINT) AS fv, " +
        "CAST(doc_id * 10 + 2 AS BIGINT) AS cur_snap, " +
        "CAST(2 AS BIGINT) AS n_snaps, " +
        "'k,v' AS schema_fields, 'k_bucket' AS partition_fields, " +
        "CAST(doc_id + 90 AS BIGINT) AS total_records, " +
        "CAST(3 AS BIGINT) AS total_files, " +
        "CAST(1 AS BIGINT) AS n_appends, " +
        "CAST(2 * doc_id + 190 AS BIGINT) AS sum_records " +
        "FROM documents ORDER BY doc_id"),
    "x_parquet_map" ->
      ("SELECT CAST(o_orderkey AS BIGINT) AS k, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN NULL " +
        "WHEN o_orderkey % 5 = 0 THEN '' " +
        "ELSE 'ck=' || CAST(o_custkey AS VARCHAR) || ',k2=' || " +
        "CAST(2*o_orderkey AS VARCHAR) END AS m_csv, " +
        "CAST(CASE WHEN o_orderkey % 11 = 0 THEN 1 ELSE 0 END AS BIGINT) " +
        "AS aa_null, " +
        "CAST(CASE WHEN o_orderkey % 11 = 0 THEN -1 ELSE 2 END AS BIGINT) " +
        "AS n_outer, " +
        "CAST(CASE WHEN o_orderkey % 11 = 0 THEN 0 " +
        "ELSE 2*o_orderkey + o_custkey + 1 END AS BIGINT) AS sum_aa " +
        "FROM orders ORDER BY k"),
    "x_iceberg_snapshot" ->
      ("SELECT 'current' AS snap, o_orderpriority AS prio, " +
        "CAST(4 AS BIGINT) AS n_files, count(*) AS n, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS sum_k, " +
        "min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st " +
        "FROM orders WHERE o_orderpriority <> '2-HIGH' GROUP BY 2 " +
        "UNION ALL " +
        "SELECT 'first', o_orderpriority, CAST(3 AS BIGINT), count(*), " +
        "CAST(sum(o_orderkey) AS BIGINT), " +
        "min(o_orderstatus), max(o_orderstatus) " +
        "FROM orders WHERE CAST(substr(o_orderpriority,1,1) AS INT) <= 3 " +
        "GROUP BY 2 " +
        "UNION ALL " +
        "SELECT 'asof', o_orderpriority, CAST(3 AS BIGINT), count(*), " +
        "CAST(sum(o_orderkey) AS BIGINT), " +
        "min(o_orderstatus), max(o_orderstatus) " +
        "FROM orders WHERE CAST(substr(o_orderpriority,1,1) AS INT) <= 3 " +
        "GROUP BY 2 ORDER BY snap, prio"),
    "x_delta_update" ->
      """WITH b AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderkey AS BIGINT) AS k FROM orders)
        |SELECT 'cdf_update_postimage' AS face, 'all' AS prio,
        |  count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
        |  count(*) AS n_upd FROM b WHERE k % 3 = 0
        |UNION ALL
        |SELECT 'cdf_update_preimage', 'all', count(*),
        |  CAST(sum(k) AS BIGINT), CAST(0 AS BIGINT)
        |FROM b WHERE k % 3 = 0
        |UNION ALL
        |SELECT 'cur', prio, count(*), CAST(sum(k) AS BIGINT),
        |  CAST(count(CASE WHEN k % 3 = 0 THEN 1 END) AS BIGINT)
        |FROM b GROUP BY 2
        |ORDER BY face, prio""".stripMargin,
    "x_iceberg_update" ->
      """WITH b AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderkey AS BIGINT) AS k FROM orders)
        |SELECT 'cur' AS face, prio, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(count(CASE WHEN k % 3 = 0 THEN 1 END) AS BIGINT) AS n_upd
        |FROM b GROUP BY 2
        |UNION ALL
        |SELECT 'pre', prio, count(*), CAST(sum(k) AS BIGINT),
        |  CAST(0 AS BIGINT)
        |FROM b GROUP BY 2
        |ORDER BY face, prio""".stripMargin,
    "x_delta_merge" ->
      """WITH b AS (SELECT o_orderpriority AS prio, o_orderstatus AS st,
        |    CAST(o_orderkey AS BIGINT) AS k FROM orders)
        |SELECT 'cdf_insert' AS face, 'all' AS prio, CAST(3 AS BIGINT)
        |  AS n, CAST(-6 AS BIGINT) AS sum_k, CAST(0 AS BIGINT) AS n_upd
        |UNION ALL
        |SELECT 'cdf_update_postimage', 'all', count(*),
        |  CAST(sum(k) AS BIGINT), count(*) FROM b WHERE k % 5 = 0
        |UNION ALL
        |SELECT 'cdf_update_preimage', 'all', count(*),
        |  CAST(sum(k) AS BIGINT),
        |  CAST(count(CASE WHEN st = 'UP' THEN 1 END) AS BIGINT)
        |FROM b WHERE k % 5 = 0
        |UNION ALL
        |SELECT 'cur', prio, count(*), CAST(sum(k) AS BIGINT),
        |  CAST(count(CASE WHEN k % 5 = 0 THEN 1 END) AS BIGINT)
        |FROM b GROUP BY 2
        |UNION ALL
        |SELECT 'cur', '9-SYN', CAST(3 AS BIGINT), CAST(-6 AS BIGINT),
        |  CAST(0 AS BIGINT)
        |ORDER BY face, prio""".stripMargin,
    "x_iceberg_merge" ->
      """WITH b AS (SELECT o_orderpriority AS prio, o_orderstatus AS st,
        |    CAST(o_orderkey AS BIGINT) AS k FROM orders)
        |SELECT 'cur' AS face, prio, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k,
        |  CAST(count(CASE WHEN k % 5 = 0 THEN 1 END) AS BIGINT) AS n_upd
        |FROM b GROUP BY 2
        |UNION ALL
        |SELECT 'cur', '9-SYN', CAST(3 AS BIGINT), CAST(-6 AS BIGINT),
        |  CAST(0 AS BIGINT)
        |UNION ALL
        |SELECT 'pre', prio, count(*), CAST(sum(k) AS BIGINT),
        |  CAST(count(CASE WHEN st = 'UP' THEN 1 END) AS BIGINT)
        |FROM b GROUP BY 2
        |ORDER BY face, prio""".stripMargin,
    "x_delta_delete" ->
      """WITH b AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderkey AS BIGINT) AS k FROM orders)
        |SELECT 'cdf_delete' AS face, prio, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM b WHERE k % 7 = 0 GROUP BY 2
        |UNION ALL
        |SELECT 'cur', prio, count(*), CAST(sum(k) AS BIGINT)
        |FROM b WHERE k % 7 <> 0 GROUP BY 2
        |ORDER BY face, prio""".stripMargin,
    "x_iceberg_delete" ->
      """WITH b AS (SELECT o_orderpriority AS prio,
        |    CAST(o_orderkey AS BIGINT) AS k FROM orders)
        |SELECT 'cur' AS face, prio, count(*) AS n,
        |  CAST(sum(k) AS BIGINT) AS sum_k
        |FROM b WHERE k % 7 <> 0 GROUP BY 2
        |UNION ALL
        |SELECT 'pre', prio, count(*), CAST(sum(k) AS BIGINT)
        |FROM b GROUP BY 2
        |ORDER BY face, prio""".stripMargin,
    "x_delta_vacuum" ->
      """SELECT 'cur' AS face, o_orderpriority AS prio,
        |  count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_k
        |FROM orders GROUP BY 2
        |UNION ALL
        |SELECT 'maint', 'deleted', CAST(1 AS BIGINT), CAST(0 AS BIGINT)
        |ORDER BY face, prio""".stripMargin,
    "x_iceberg_expire" ->
      """SELECT 'cur' AS face, o_orderpriority AS prio,
        |  count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_k
        |FROM orders GROUP BY 2
        |UNION ALL
        |SELECT 'maint', 'expired', CAST(2 AS BIGINT), CAST(3 AS BIGINT)
        |ORDER BY face, prio""".stripMargin,
    "x_delta_checkpoint" ->
      """WITH p AS (SELECT o_orderpriority AS prio, count(*) AS n,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |    min(o_orderstatus) AS min_st
        |  FROM orders GROUP BY 1)
        |SELECT 'cp' AS face, prio, n, sum_k, min_st FROM p
        |WHERE prio <> '5-LOW'
        |UNION ALL
        |SELECT 'cur', prio, n, sum_k, min_st FROM p
        |ORDER BY face, prio""".stripMargin,
    "x_iceberg_evolve" ->
      """WITH b AS (SELECT o_orderpriority AS grp, count(*) AS n,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |    CAST(sum(CAST(round(o_totalprice*100) AS BIGINT)) AS BIGINT)
        |      AS sum_rev
        |  FROM orders GROUP BY 1)
        |SELECT 'agg' AS face, grp, n, sum_k, sum_rev,
        |  CASE WHEN grp IN ('4-NOT SPECIFIED','5-LOW') THEN n
        |       ELSE CAST(0 AS BIGINT) END AS n_st
        |FROM b
        |UNION ALL
        |SELECT 'nost', grp, n, sum_k, sum_rev, CAST(0 AS BIGINT)
        |FROM b WHERE grp IN ('1-URGENT','2-HIGH','3-MEDIUM')
        |ORDER BY face, grp""".stripMargin,
    "x_parquet_struct" ->
      ("SELECT CAST(o_orderkey AS BIGINT) AS k, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN NULL " +
        "ELSE CAST(o_custkey AS BIGINT) END AS ck, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN NULL " +
        "ELSE o_orderstatus END AS st, " +
        "CASE WHEN o_orderkey % 7 = 0 THEN NULL " +
        "ELSE CAST(round(o_totalprice * 100) AS BIGINT) END AS cents " +
        "FROM orders ORDER BY k"),
    "x_delta_cmap" ->
      ("SELECT o_orderpriority AS prio, count(*) AS n, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS sum_k, " +
        "min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st " +
        "FROM orders GROUP BY 1 ORDER BY prio"),
    "x_delta_write" ->
      """WITH p AS (SELECT o_orderpriority AS prio, count(*) AS n,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |    min(o_orderstatus) AS min_st
        |  FROM orders GROUP BY 1)
        |SELECT 'cdf' AS face, prio, n, sum_k, min_st FROM p
        |WHERE prio IN ('4-NOT SPECIFIED', '5-LOW')
        |UNION ALL
        |SELECT 'cur', prio, n, sum_k, min_st FROM p
        |UNION ALL
        |SELECT 'v0', prio, n, sum_k, min_st FROM p
        |WHERE prio IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        |ORDER BY face, prio""".stripMargin,
    "x_delta_cdf" ->
      """WITH p AS (SELECT o_orderpriority AS prio, count(*) AS n,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sum_k
        |  FROM orders GROUP BY 1)
        |SELECT CAST(0 AS BIGINT) AS v, 'insert' AS ct, prio, n, sum_k
        |FROM p WHERE prio IN ('1-URGENT', '3-MEDIUM')
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), 'delete', prio, n, sum_k
        |FROM p WHERE prio = '3-MEDIUM'
        |UNION ALL
        |SELECT CAST(1 AS BIGINT), 'insert', prio, n, sum_k
        |FROM p WHERE prio = '2-HIGH'
        |UNION ALL
        |SELECT CAST(2 AS BIGINT), 'insert', prio, n, sum_k
        |FROM p WHERE prio = '5-LOW'
        |ORDER BY v, ct, prio""".stripMargin,
    "x_delta_dv" ->
      """WITH r AS (SELECT o_orderpriority AS prio, o_orderkey,
        |    o_orderstatus,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderkey) - 1 AS pos
        |  FROM orders)
        |SELECT prio, count(*) AS n,
        |  CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |  min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st
        |FROM r WHERE NOT (prio = '2-HIGH' AND pos % 2 = 0)
        |  AND NOT (prio = '5-LOW' AND pos = 0)
        |GROUP BY 1 ORDER BY prio""".stripMargin,
    "x_iceberg_eqdel" ->
      ("SELECT o_orderpriority AS prio, CAST(1 AS BIGINT) AS n_del_files, " +
        "count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_k, " +
        "min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st " +
        "FROM orders " +
        "WHERE NOT (o_orderpriority = '2-HIGH' AND o_orderstatus = 'F') " +
        "AND NOT (o_orderpriority = '5-LOW' AND o_orderstatus = 'O') " +
        "GROUP BY 1 ORDER BY prio"),
    "x_iceberg_deletes" ->
      """WITH r AS (SELECT o_orderpriority AS prio, o_orderkey,
        |    o_orderstatus,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderkey) - 1 AS pos
        |  FROM orders)
        |SELECT prio, CAST(1 AS BIGINT) AS n_del_files,
        |  count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |  min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st
        |FROM r WHERE NOT (prio = '2-HIGH' AND pos % 2 = 0)
        |GROUP BY 1 ORDER BY prio""".stripMargin,
    "x_iceberg_write" ->
      """WITH p AS (SELECT o_orderpriority AS prio, count(*) AS n,
        |    CAST(sum(o_orderkey) AS BIGINT) AS sum_k,
        |    min(o_orderstatus) AS min_st
        |  FROM orders GROUP BY 1)
        |SELECT 'cur' AS face, prio, n, sum_k, min_st FROM p
        |UNION ALL
        |SELECT 'inc', prio, n, sum_k, min_st FROM p
        |WHERE prio IN ('4-NOT SPECIFIED', '5-LOW')
        |UNION ALL
        |SELECT 'v1', prio, n, sum_k, min_st FROM p
        |WHERE prio IN ('1-URGENT', '2-HIGH', '3-MEDIUM')
        |ORDER BY face, prio""".stripMargin,
    "x_iceberg_appends" ->
      ("SELECT CASE WHEN o_orderpriority = '3-MEDIUM' THEN 's2' " +
        "ELSE 's3' END AS snap, o_orderpriority AS prio, " +
        "count(*) AS n, CAST(sum(o_orderkey) AS BIGINT) AS sum_k " +
        "FROM orders WHERE o_orderpriority IN " +
        "('3-MEDIUM', '4-NOT SPECIFIED', '5-LOW') " +
        "GROUP BY 1, 2 ORDER BY snap, prio"),
    "x_iceberg_nested" ->
      ("SELECT o_orderstatus AS st, count(*) AS n, " +
        "CAST(sum(o_custkey) AS BIGINT) AS sum_ck, " +
        "CAST(sum(2 * o_orderkey) AS BIGINT) AS sum_a2 " +
        "FROM orders GROUP BY 1 ORDER BY st"),
    "x_iceberg_prune" ->
      """WITH w AS (SELECT max(o_orderkey) // 5 + 1 AS w FROM orders),
        |b AS (SELECT (o_orderkey - 1) // w.w AS bucket,
        |    min(o_orderkey) AS mn, max(o_orderkey) AS mx
        |  FROM orders, w GROUP BY 1),
        |r AS (SELECT w.w + 10 AS lo, 2 * w.w - 10 AS hi FROM w)
        |SELECT 'k' AS face,
        |  CAST((SELECT count(*) FROM b) AS BIGINT) AS n_files,
        |  CAST((SELECT count(*) FROM b, r
        |        WHERE b.mn <= r.hi AND b.mx >= r.lo) AS BIGINT)
        |    AS kept_files,
        |  CAST(count(*) AS BIGINT) AS n_match,
        |  CAST(coalesce(sum(o_orderkey), 0) AS BIGINT) AS sum_match
        |FROM orders, r WHERE o_orderkey BETWEEN r.lo AND r.hi
        |UNION ALL
        |SELECT 'part',
        |  CAST((SELECT count(*) FROM b) AS BIGINT),
        |  CAST((SELECT count(*) FROM b WHERE bucket = 2) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(o_orderkey), 0) AS BIGINT)
        |FROM orders, w WHERE (o_orderkey - 1) // w.w = 2
        |UNION ALL
        |SELECT 'tag',
        |  CAST((SELECT count(*) FROM b) AS BIGINT),
        |  CAST((SELECT count(*) FROM b WHERE bucket = 2) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(o_orderkey), 0) AS BIGINT)
        |FROM orders, w WHERE (o_orderkey - 1) // w.w = 2
        |ORDER BY face""".stripMargin,
    "x_delta_snapshot" ->
      ("SELECT o_orderpriority AS prio, count(*) AS n, " +
        "CAST(sum(o_orderkey) AS BIGINT) AS sum_k, " +
        "min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st " +
        "FROM orders WHERE o_orderpriority <> '2-HIGH' " +
        "GROUP BY 1 ORDER BY prio"),
    "x_delta_prune" ->
      """WITH w AS (SELECT max(o_orderkey) // 5 + 1 AS w FROM orders),
        |b AS (SELECT (o_orderkey - 1) // w.w AS bucket,
        |    min(o_orderkey) AS mn, max(o_orderkey) AS mx
        |  FROM orders, w GROUP BY 1),
        |r AS (SELECT w.w + 10 AS lo, 2 * w.w - 10 AS hi FROM w)
        |SELECT 'k' AS face,
        |  CAST((SELECT count(*) FROM b) AS BIGINT) AS n_files,
        |  CAST((SELECT count(*) FROM b, r
        |        WHERE b.mn <= r.hi AND b.mx >= r.lo) AS BIGINT)
        |    AS kept_files,
        |  CAST(count(*) AS BIGINT) AS n_match,
        |  CAST(coalesce(sum(o_orderkey), 0) AS BIGINT) AS sum_match
        |FROM orders, r WHERE o_orderkey BETWEEN r.lo AND r.hi
        |UNION ALL
        |SELECT 'tag',
        |  CAST((SELECT count(*) FROM b) AS BIGINT),
        |  CAST((SELECT count(*) FROM b WHERE bucket = 2) AS BIGINT),
        |  CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(o_orderkey), 0) AS BIGINT)
        |FROM orders, w WHERE (o_orderkey - 1) // w.w = 2
        |ORDER BY face""".stripMargin,
    "x_lm_typicality" ->
      s"""WITH $lmScoreCte
         |SELECT d.doc_id,
         |  CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
         |  CAST(coalesce(sc.lm_score, 0) AS BIGINT) AS lm_score,
         |  CAST(coalesce(sc.lm_score // sc.n_bigrams, 0) AS BIGINT) AS typ_ppm
         |FROM documents d LEFT JOIN sc USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin,
    "x_ccnet_refine" ->
      s"""WITH $lmScoreCte,
         |typ AS (SELECT d.doc_id,
         |    CAST(coalesce(sc.lm_score // sc.n_bigrams, 0) AS BIGINT) AS typ_ppm
         |  FROM documents d LEFT JOIN sc USING (doc_id)),
         |rk AS (SELECT doc_id, typ_ppm,
         |    (rank() OVER (ORDER BY typ_ppm) - 1) * 1000000
         |      // (COUNT(*) OVER () - 1) AS pct_ppm
         |  FROM typ),
         |b AS (SELECT doc_id, typ_ppm,
         |    CASE WHEN pct_ppm * 3 < 1000000 THEN 'tail'
         |         WHEN pct_ppm * 3 < 2000000 THEN 'middle'
         |         ELSE 'head' END AS bucket
         |  FROM rk),
         |s AS (SELECT *,
         |    CASE bucket WHEN 'head' THEN CAST(1.0 AS DOUBLE)
         |         WHEN 'middle' THEN CAST(0.5 AS DOUBLE)
         |         ELSE CAST(0.125 AS DOUBLE) END AS sample_rate,
         |    CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |      / 4294967296.0 AS u
         |  FROM b)
         |SELECT doc_id, bucket, typ_ppm, sample_rate,
         |  CAST(1.0 AS DOUBLE) / sample_rate AS sample_weight
         |FROM s WHERE u < sample_rate ORDER BY doc_id""".stripMargin,
    "x_text_tokens" ->
      s"""SELECT doc_id,
         |  CAST(len($toksSql) AS BIGINT) AS n_tokens,
         |  CAST(len(list_filter(str_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS n_ws_tokens,
         |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9\\s]')) AS BIGINT) AS n_bpe_pieces
         |FROM documents ORDER BY doc_id""".stripMargin,
    "x_text_quality" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |  q AS (SELECT doc_id, text,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio,
         |    CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t2 -> list_contains($stopwordsSql, t2))) AS DOUBLE) / len(toks) ELSE 0.0 END AS stopword_ratio,
         |    CASE WHEN len(toks) > 0 THEN CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / len(toks) ELSE 0.0 END AS mean_token_len
         |  FROM t)
         |SELECT doc_id, n_chars, n_tokens, alpha_ratio, stopword_ratio, mean_token_len,
         |  least(1.0, n_tokens / 100.0) * 0.4 + alpha_ratio * 0.3 + stopword_ratio * 0.3 AS quality_score
         |FROM q ORDER BY doc_id""".stripMargin,
    "x_text_langid" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($toksSql) AS toks FROM documents),
         |  s AS (SELECT doc_id,
         |    len(list_intersect(toks, ${markerSql("en")})) AS s_en,
         |    len(list_intersect(toks, ${markerSql("de")})) AS s_de,
         |    len(list_intersect(toks, ${markerSql("fr")})) AS s_fr,
         |    len(list_intersect(toks, ${markerSql("es")})) AS s_es,
         |    len(list_intersect(toks, ${markerSql("zh")})) AS s_zh
         |  FROM t)
         |SELECT doc_id,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'unknown'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
         |       WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
         |       WHEN s_es >= s_zh THEN 'es'
         |       ELSE 'zh' END AS lang_pred,
         |  CAST(greatest(s_en, s_de, s_fr, s_es, s_zh) AS BIGINT) AS lang_score
         |FROM s ORDER BY doc_id""".stripMargin,
    "x_lang_confusion" ->
      s"""WITH t AS (SELECT doc_id, list_distinct($toksSql) AS toks FROM documents),
         |  s AS (SELECT doc_id,
         |    len(list_intersect(toks, ${markerSql("en")})) AS s_en,
         |    len(list_intersect(toks, ${markerSql("de")})) AS s_de,
         |    len(list_intersect(toks, ${markerSql("fr")})) AS s_fr,
         |    len(list_intersect(toks, ${markerSql("es")})) AS s_es,
         |    len(list_intersect(toks, ${markerSql("zh")})) AS s_zh
         |  FROM t),
         |p AS (SELECT doc_id,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'unknown'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
         |       WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
         |       WHEN s_es >= s_zh THEN 'es'
         |       ELSE 'zh' END AS detected
         |  FROM s)
         |SELECT d.lang AS declared, p.detected, COUNT(*) AS ct,
         |  CAST(SUM(CASE WHEN d.lang = p.detected THEN 1 ELSE 0 END)
         |    AS BIGINT) AS agree_ct
         |FROM documents d JOIN p USING (doc_id)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_text_fingerprint" ->
      s"""SELECT doc_id,
         |  md5(array_to_string(list_sort(list_distinct($toksSql)), ' ')) AS fingerprint
         |FROM documents ORDER BY doc_id""".stripMargin,
    "x_dedup_exact" ->
      """SELECT md5(lower(text)) AS content_hash, min(doc_id) AS keep_doc_id,
        |  COUNT(*) AS dup_ct
        |FROM documents GROUP BY 1 ORDER BY content_hash""".stripMargin,
    "x_corpus_refine" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |                  unnest(range(0, len(string_split(text, ' ')))) AS i
        |           FROM documents),
        |c AS (SELECT doc_id, i // 3 AS pi, string_agg(word, ' ' ORDER BY i) AS line
        |      FROM w GROUP BY 1, 2),
        |f AS (SELECT line, count(*) AS ct FROM c GROUP BY 1),
        |dl AS (SELECT c.doc_id,
        |  coalesce(string_agg(CASE WHEN f.ct <= 4 THEN c.line END, chr(10) ORDER BY c.pi), '') AS kept_text,
        |  count(CASE WHEN f.ct <= 4 THEN 1 END)::BIGINT AS kept_ct,
        |  count(CASE WHEN f.ct > 4 THEN 1 END)::BIGINT AS removed_ct
        |  FROM c JOIN f USING (line) GROUP BY 1),
        |k AS (SELECT doc_id, kept_ct, removed_ct, length(kept_text)::BIGINT AS n_chars
        |      FROM dl WHERE kept_ct >= 8)
        |SELECT doc_id, kept_ct, removed_ct, n_chars,
        |  CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 AS INT) AS shard
        |FROM k ORDER BY doc_id""".stripMargin,
    "x_bpe_pairs" ->
      s"""WITH w AS (SELECT unnest($toksSql) AS word FROM documents),
         |wc AS (SELECT word, count(*) AS wcnt FROM w GROUP BY 1),
         |syms AS (SELECT wcnt,
         |  list_append(list_transform(range(1, len(word)+1), i -> word[i:i]), '</w>') AS s
         |  FROM wc),
         |p AS (SELECT wcnt,
         |  unnest(list_transform(range(1, len(s)), i -> struct_pack(l := s[i], r := s[i+1]))) AS pr
         |  FROM syms)
         |SELECT pr.l AS left_sym, pr.r AS right_sym,
         |  CAST(sum(wcnt) AS BIGINT) AS pair_count
         |FROM p GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_zorder_key" ->
      """SELECT o_orderkey,
        |  CAST(list_sum(list_transform(range(0, 16),
        |    i -> (((x >> i) & 1) << (2*i)) + (((y >> i) & 1) << (2*i + 1)))) AS BIGINT) AS zkey
        |FROM (SELECT o_orderkey,
        |        least(greatest(o_custkey, 0), 1048575) * 65535 // 1048575 AS x,
        |        least(greatest(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT), 0), 67108863) * 65535 // 67108863 AS y
        |      FROM orders)
        |ORDER BY o_orderkey""".stripMargin,
    "x_dedup_lines" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |                  unnest(range(0, len(string_split(text, ' ')))) AS i
        |           FROM documents),
        |c AS (SELECT doc_id, i // 3 AS pi, string_agg(word, ' ' ORDER BY i) AS line
        |      FROM w GROUP BY 1, 2),
        |f AS (SELECT line, count(*) AS ct FROM c GROUP BY 1)
        |SELECT c.doc_id,
        |  coalesce(string_agg(CASE WHEN f.ct <= 4 THEN c.line END, chr(10) ORDER BY c.pi), '') AS kept_text,
        |  count(CASE WHEN f.ct <= 4 THEN 1 END)::BIGINT AS kept_ct,
        |  count(CASE WHEN f.ct > 4 THEN 1 END)::BIGINT AS removed_ct
        |FROM c JOIN f USING (line)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_dedup_substrings" ->
      """WITH d AS (SELECT doc_id, text, length(text) AS n FROM documents),
        |pos AS (SELECT doc_id, text, unnest(generate_series(1, n - 30 + 1)) AS o
        |        FROM d WHERE n >= 30),
        |g AS (SELECT doc_id, o,
        |  CAST(CONCAT('0x', substr(md5(substr(text, o, 30)), 1, 15)) AS BIGINT) AS gh
        |  FROM pos),
        |dup AS (SELECT gh FROM g GROUP BY gh HAVING count(*) >= 2),
        |m AS (SELECT doc_id, o FROM g WHERE gh IN (SELECT gh FROM dup)),
        |isl AS (SELECT doc_id, o,
        |  CASE WHEN o > coalesce(max(o + 30) OVER (PARTITION BY doc_id ORDER BY o
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), -1) THEN 1 ELSE 0 END AS brk
        |  FROM m),
        |isl2 AS (SELECT doc_id, o,
        |  SUM(brk) OVER (PARTITION BY doc_id ORDER BY o ROWS UNBOUNDED PRECEDING) AS island
        |  FROM isl),
        |spans AS (SELECT doc_id, island, MIN(o) AS s, MAX(o) + 30 AS e
        |          FROM isl2 GROUP BY 1, 2),
        |segs AS (SELECT doc_id, s, e,
        |  coalesce(lag(e) OVER (PARTITION BY doc_id ORDER BY s), 1) AS ks FROM spans),
        |built AS (SELECT segs.doc_id,
        |    coalesce(string_agg(substr(d.text, ks, s - ks), '' ORDER BY s), '') ||
        |      substr(d.text, max(e), d.n - max(e) + 1) AS kept_text,
        |    count(*) AS dup_spans, CAST(sum(e - s) AS BIGINT) AS dup_chars
        |  FROM segs JOIN d USING (doc_id) GROUP BY segs.doc_id, d.text, d.n)
        |SELECT doc_id, kept_text, dup_spans, dup_chars FROM built
        |UNION ALL
        |SELECT doc_id, text AS kept_text, CAST(0 AS BIGINT), CAST(0 AS BIGINT)
        |FROM d WHERE doc_id NOT IN (SELECT doc_id FROM spans)
        |ORDER BY doc_id""".stripMargin,
    "x_dedup_ngram" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |grams AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
         |          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
         |          WHERE len(ts) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n
         |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT d1, d2, n / (s1.sz + s2.sz - n) AS jaccard
         |FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         |WHERE n / (s1.sz + s2.sz - n) >= 0.8
         |ORDER BY d1, d2""".stripMargin,
    "x_dedup_contain" -> containOracle,
    "x_dedup_contain_prefix" -> containOracle,
    "x_contain_apply" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |grams AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
         |          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
         |          WHERE len(ts) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n
         |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |dirs AS (
         |  SELECT d1 AS d_sub, d2 AS d_super FROM inter JOIN sizes s1 ON d1 = s1.doc_id
         |  WHERE n / s1.sz >= 0.9
         |  UNION ALL
         |  SELECT d2, d1 FROM inter JOIN sizes s2 ON d2 = s2.doc_id
         |  WHERE n / s2.sz >= 0.9),
         |cond AS (SELECT DISTINCT d_sub FROM dirs a
         |  WHERE NOT (a.d_sub < a.d_super AND EXISTS (
         |    SELECT 1 FROM dirs b
         |    WHERE b.d_sub = a.d_super AND b.d_super = a.d_sub)))
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT d_sub FROM cond)
         |ORDER BY doc_id""".stripMargin,
    "x_dedup_ngram_ppjoin" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |grams AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
         |          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
         |          WHERE len(ts) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n
         |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT d1, d2, n / (s1.sz + s2.sz - n) AS jaccard
         |FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         |WHERE n / (s1.sz + s2.sz - n) >= 0.8
         |ORDER BY d1, d2""".stripMargin,
    "x_dedup_ngram_auto" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |grams AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
         |          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
         |          WHERE len(ts) >= 3),
         |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n
         |          FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT d1, d2, n / (s1.sz + s2.sz - n) AS jaccard
         |FROM inter JOIN sizes s1 ON d1 = s1.doc_id JOIN sizes s2 ON d2 = s2.doc_id
         |WHERE n / (s1.sz + s2.sz - n) >= 0.8
         |ORDER BY d1, d2""".stripMargin,
    "x_dedup_minhash" ->
      s"""WITH $lshPairsCte
         |SELECT d1, d2, jaccard FROM pairs
         |ORDER BY d1, d2""".stripMargin,
    "x_dedup_simhash" ->
      s"""WITH toks AS (SELECT DISTINCT doc_id, unnest($toksSql) AS tok FROM documents),
         |h AS (SELECT doc_id, tok, CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT) AS th FROM toks),
         |bits AS (SELECT doc_id, b, SUM(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
         |         FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) GROUP BY 1, 2),
         |fp AS (SELECT doc_id, SUM(CASE WHEN s > 0 THEN CAST(1 AS BIGINT) << b ELSE 0 END) AS simhash
         |       FROM bits GROUP BY 1)
         |SELECT a.doc_id AS d1, b.doc_id AS d2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         |FROM fp a JOIN fp b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY d1, d2""".stripMargin,
    "x_dedup_embedding_nn" ->
      """WITH pairs AS (
        |  SELECT a.vec_id AS vec_id, b.vec_id AS nn_id,
        |    round(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                 CAST(b.embedding AS DOUBLE[])), 6) AS cos_sim
        |  FROM embeddings a JOIN embeddings b ON a.vec_id <> b.vec_id)
        |SELECT vec_id, nn_id, cos_sim FROM pairs
        |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY cos_sim DESC, nn_id) = 1
        |ORDER BY vec_id""".stripMargin,
    "x_ann_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 8),
        |scored AS (
        |  SELECT query_id, c.vec_id AS nn_id,
        |    round(list_cosine_similarity(CAST(qe AS DOUBLE[]),
        |                                 CAST(c.embedding AS DOUBLE[])), 6) AS cos_sim
        |  FROM q JOIN embeddings c ON c.vec_id <> query_id),
        |ranked AS (
        |  SELECT query_id, CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nn_id) AS BIGINT) AS rank,
        |    nn_id, cos_sim
        |  FROM scored)
        |SELECT query_id, rank, nn_id, cos_sim FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "x_quality_rules" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS ts FROM documents),
         |m AS (SELECT doc_id,
         |  CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio,
         |  CASE WHEN len(ts) > 0 THEN CAST(len(list_filter(ts, t2 -> list_contains($stopwordsSql, t2))) AS DOUBLE) / len(ts) ELSE 0.0 END AS stopword_ratio,
         |  CASE WHEN len(ts) > 0 THEN CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS DOUBLE) / len(ts) ELSE 0.0 END AS mean_token_len,
         |  CASE WHEN len(ts) >= 3
         |       THEN CAST(1.0 AS DOUBLE) - CAST(len(list_distinct(
         |              list_transform(generate_series(1, len(ts) - 2),
         |                i -> array_to_string(ts[i:i+2], ' ')))) AS DOUBLE)
         |            / (len(ts) - 2)
         |       ELSE CAST(0.0 AS DOUBLE) END AS dup_gram_ratio,
         |  CASE WHEN len(ts) > 0
         |       THEN CAST(list_max(list_transform(list_distinct(ts),
         |              t2 -> len(list_filter(ts, x -> x = t2)))) AS DOUBLE) / len(ts)
         |       ELSE CAST(0.0 AS DOUBLE) END AS top_token_ratio
         |FROM t),
         |v AS (SELECT doc_id,
         |  (CASE WHEN n_tokens < 20 THEN 1 ELSE 0 END +
         |   CASE WHEN mean_token_len < 3.0 OR mean_token_len > 10.0 THEN 2 ELSE 0 END +
         |   CASE WHEN alpha_ratio < 0.6 THEN 4 ELSE 0 END +
         |   CASE WHEN stopword_ratio < 0.02 THEN 8 ELSE 0 END +
         |   CASE WHEN dup_gram_ratio > 0.3 THEN 16 ELSE 0 END +
         |   CASE WHEN top_token_ratio > 0.2 THEN 32 ELSE 0 END) AS violations
         |FROM m)
         |SELECT doc_id, CAST(violations AS BIGINT) AS violations,
         |       CAST(CASE WHEN violations = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM v ORDER BY doc_id""".stripMargin,
    "x_text_winnow" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |g AS (SELECT doc_id, i AS pos,
         |        CAST(CONCAT('0x', substr(md5(array_to_string(ts[i:i+2], ' ')), 1, 8)) AS BIGINT) AS h
         |      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
         |      WHERE len(ts) >= 3),
         |n AS (SELECT doc_id, count(*) AS m FROM g GROUP BY 1),
         |starts AS (
         |  SELECT doc_id, pos AS s,
         |         min(h) OVER (PARTITION BY doc_id ORDER BY pos
         |           ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
         |  FROM g),
         |fullstarts AS (SELECT st.doc_id, st.s, st.wmin
         |               FROM starts st JOIN n USING (doc_id) WHERE st.s <= n.m - 3),
         |sel AS (
         |  SELECT f.doc_id, f.s, max(g.pos) AS fp_pos, f.wmin AS fp_hash
         |  FROM fullstarts f JOIN g ON g.doc_id = f.doc_id
         |    AND g.pos BETWEEN f.s AND f.s + 3 AND g.h = f.wmin
         |  GROUP BY f.doc_id, f.s, f.wmin)
         |SELECT DISTINCT doc_id, fp_pos, fp_hash FROM sel
         |ORDER BY doc_id, fp_pos, fp_hash""".stripMargin,
    "x_chunk_overlap" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |st AS (SELECT doc_id, ts,
         |         unnest(generate_series(1, len(ts), 48)) AS s
         |       FROM toks WHERE len(ts) >= 1)
         |SELECT doc_id, CAST((s - 1) / 48 AS BIGINT) AS chunk_idx,
         |       array_to_string(ts[s:least(s + 63, len(ts))], ' ') AS chunk_text,
         |       CAST(least(64, len(ts) - s + 1) AS BIGINT) AS n_tokens
         |FROM st ORDER BY doc_id, chunk_idx""".stripMargin,
    "x_semdedup" ->
      s"""WITH $ivfAssignCte,
        |removed AS (
        |  SELECT DISTINCT a.vec_id
        |  FROM assign a JOIN assign b ON a.cluster = b.cluster AND a.vec_id > b.vec_id
        |  WHERE round(list_cosine_similarity(a.e, b.e), 6) >= 0.4)
        |SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster,
        |       CASE WHEN r.vec_id IS NULL THEN 1 ELSE 0 END AS kept
        |FROM assign a LEFT JOIN removed r ON a.vec_id = r.vec_id
        |ORDER BY a.vec_id""".stripMargin,
    "x_ann_ivf" ->
      s"""WITH $ivfAssignCte,
        |q AS (SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < 8),
        |probes AS (
        |  SELECT query_id, qe, cluster FROM (
        |    SELECT q.query_id, q.qe, s.cluster,
        |           row_number() OVER (PARTITION BY q.query_id
        |             ORDER BY round(list_cosine_similarity(q.qe, s.se), 6) DESC, s.cluster) AS rn
        |    FROM q CROSS JOIN seeds s) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS nn_id,
        |         round(list_cosine_similarity(p.qe, a.e), 6) AS cos_sim
        |  FROM probes p JOIN assign a USING (cluster)
        |  WHERE a.vec_id <> p.query_id),
        |ranked AS (
        |  SELECT query_id,
        |         CAST(row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nn_id) AS BIGINT) AS rank,
        |         nn_id, cos_sim
        |  FROM scored)
        |SELECT query_id, rank, nn_id, cos_sim FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "x_ann_sketch" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < 8),
        |cand AS (
        |  SELECT query_id, c2.vec_id AS nn_id, qe, c2.e AS ce
        |  FROM q JOIN c c2 ON c2.vec_id <> query_id
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY round(list_cosine_similarity(qe[1:48], c2.e[1:48]), 6) DESC, c2.vec_id) <= 75),
        |ranked AS (
        |  SELECT query_id,
        |         CAST(row_number() OVER (PARTITION BY query_id
        |           ORDER BY round(list_cosine_similarity(qe, ce), 6) DESC, nn_id) AS BIGINT) AS rank,
        |         nn_id, round(list_cosine_similarity(qe, ce), 6) AS cos_sim
        |  FROM cand)
        |SELECT query_id, rank, nn_id, cos_sim FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "x_ann_recall" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |seeds AS (
        |  SELECT e AS se,
        |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cluster
        |  FROM c ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |assign AS (
        |  SELECT vec_id, cluster, e FROM (
        |    SELECT c.vec_id, s.cluster, c.e,
        |           row_number() OVER (PARTITION BY c.vec_id
        |             ORDER BY round(list_cosine_similarity(c.e, s.se), 6) DESC, s.cluster) AS rn
        |    FROM c CROSS JOIN seeds s) WHERE rn = 1),
        |q AS (SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < 8),
        |probes AS (
        |  SELECT query_id, qe, cluster FROM (
        |    SELECT q.query_id, q.qe, s.cluster,
        |           row_number() OVER (PARTITION BY q.query_id
        |             ORDER BY round(list_cosine_similarity(q.qe, s.se), 6) DESC, s.cluster) AS rn
        |    FROM q CROSS JOIN seeds s) WHERE rn <= 4),
        |iscored AS (
        |  SELECT p.query_id, a.vec_id AS nn_id,
        |         round(list_cosine_similarity(p.qe, a.e), 6) AS cos_sim
        |  FROM probes p JOIN assign a USING (cluster)
        |  WHERE a.vec_id <> p.query_id),
        |ivf AS (
        |  SELECT query_id, nn_id FROM iscored
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nn_id) <= 10),
        |sketch AS (
        |  SELECT query_id, c2.vec_id AS nn_id, qe, c2.e AS ce
        |  FROM q JOIN c c2 ON c2.vec_id <> query_id
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY round(list_cosine_similarity(qe[1:48], c2.e[1:48]), 6) DESC, c2.vec_id) <= 75),
        |rerank AS (
        |  SELECT query_id, nn_id FROM sketch
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY round(list_cosine_similarity(qe, ce), 6) DESC, nn_id) <= 10),
        |bscored AS (
        |  SELECT query_id, c2.vec_id AS nn_id,
        |         round(list_cosine_similarity(qe, c2.e), 6) AS cos_sim
        |  FROM q JOIN c c2 ON c2.vec_id <> query_id),
        |brute AS (
        |  SELECT query_id, nn_id FROM bscored
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nn_id) <= 10),
        |i8 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(e, v -> v * v)), (a, b) -> a + b)) AS nrm,
        |  list_max(list_transform(e, v -> abs(v))) AS amax FROM c),
        |i8q AS (SELECT vec_id, e, nrm, amax / CAST(127.0 AS DOUBLE) AS qsc,
        |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS INT))
        |       ELSE list_transform(e, v -> 0) END AS q8 FROM i8),
        |i8cand AS (
        |  SELECT a.vec_id AS query_id, b.vec_id AS nn_id, a.e AS qe8, b.e AS ce8
        |  FROM i8q a JOIN i8q b ON a.vec_id < 8 AND b.vec_id <> a.vec_id
        |    AND a.nrm > 0 AND b.nrm > 0
        |  QUALIFY row_number() OVER (PARTITION BY a.vec_id ORDER BY
        |    CAST(list_reduce(list_prepend(0,
        |      list_transform(generate_series(1, len(a.q8)), i -> a.q8[i] * b.q8[i])),
        |      (x, y) -> x + y) AS DOUBLE)
        |      * a.qsc * b.qsc / (a.nrm * b.nrm) DESC, b.vec_id) <= 75),
        |quant AS (
        |  SELECT query_id, nn_id FROM i8cand
        |  QUALIFY row_number() OVER (PARTITION BY query_id
        |    ORDER BY round(list_cosine_similarity(qe8, ce8), 6) DESC, nn_id) <= 10),
        |methods AS (
        |  SELECT 'ivf_nprobe4' AS method, query_id, nn_id FROM ivf
        |  UNION ALL
        |  SELECT 'sketch_rerank' AS method, query_id, nn_id FROM rerank
        |  UNION ALL
        |  SELECT 'int8_rerank' AS method, query_id, nn_id FROM quant),
        |hit AS (
        |  SELECT m.method AS hmethod, m.query_id AS hquery_id, count(*) AS n
        |  FROM methods m JOIN brute b ON m.query_id = b.query_id AND m.nn_id = b.nn_id
        |  GROUP BY 1, 2)
        |SELECT q.query_id, t.method, coalesce(n, 0) / 10.0 AS recall_at_10
        |FROM q CROSS JOIN (SELECT DISTINCT method FROM methods) t
        |LEFT JOIN hit ON q.query_id = hquery_id AND t.method = hmethod
        |ORDER BY query_id, method""".stripMargin,
    "x_ann_nn_join" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |seeds AS (
        |  SELECT e AS se,
        |         row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) - 1 AS cluster
        |  FROM c ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16),
        |assign AS (
        |  SELECT vec_id, cluster, e FROM (
        |    SELECT c.vec_id, s.cluster, c.e,
        |           row_number() OVER (PARTITION BY c.vec_id
        |             ORDER BY round(list_cosine_similarity(c.e, s.se), 6) DESC, s.cluster) AS rn
        |    FROM c CROSS JOIN seeds s) WHERE rn = 1),
        |probes AS (
        |  SELECT query_id, qe, cluster FROM (
        |    SELECT c.vec_id AS query_id, c.e AS qe, s.cluster,
        |           row_number() OVER (PARTITION BY c.vec_id
        |             ORDER BY round(list_cosine_similarity(c.e, s.se), 6) DESC, s.cluster) AS rn
        |    FROM c CROSS JOIN seeds s) WHERE rn <= 4),
        |scored AS (
        |  SELECT p.query_id, a.vec_id AS nn_id,
        |         round(list_cosine_similarity(p.qe, a.e), 6) AS cos_sim
        |  FROM probes p JOIN assign a USING (cluster)
        |  WHERE a.vec_id <> p.query_id)
        |SELECT query_id AS vec_id, nn_id, cos_sim FROM scored
        |QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, nn_id) = 1
        |ORDER BY vec_id""".stripMargin,
    "x_dedup_apply" ->
      s"""WITH $lshPairsCte
         |SELECT doc_id, n_chars FROM documents
         |WHERE doc_id NOT IN (SELECT d2 FROM pairs)
         |ORDER BY doc_id""".stripMargin,
    "x_corpus_pipeline" ->
      s"""WITH $lshPairsCte,
         |t2 AS (SELECT doc_id, text, $toksSql AS toks2 FROM documents),
         |q AS (SELECT doc_id,
         |    CAST(len(toks2) AS BIGINT) AS n_tokens,
         |    CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio,
         |    CASE WHEN len(toks2) > 0 THEN CAST(len(list_filter(toks2, t3 -> list_contains($stopwordsSql, t3))) AS DOUBLE) / len(toks2) ELSE 0.0 END AS stopword_ratio,
         |    list_distinct(toks2) AS dtoks
         |  FROM t2),
         |scored AS (SELECT doc_id, n_tokens,
         |    least(1.0, n_tokens / 100.0) * 0.4 + alpha_ratio * 0.3 + stopword_ratio * 0.3 AS quality_score,
         |    len(list_intersect(dtoks, ${markerSql("en")})) AS s_en,
         |    len(list_intersect(dtoks, ${markerSql("de")})) AS s_de,
         |    len(list_intersect(dtoks, ${markerSql("fr")})) AS s_fr,
         |    len(list_intersect(dtoks, ${markerSql("es")})) AS s_es,
         |    len(list_intersect(dtoks, ${markerSql("zh")})) AS s_zh
         |  FROM q)
         |SELECT doc_id, quality_score, n_tokens FROM scored
         |WHERE quality_score >= 0.45
         |  AND greatest(s_en, s_de, s_fr, s_es, s_zh) > 0
         |  AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh
         |  AND doc_id NOT IN (SELECT d2 FROM pairs)
         |ORDER BY doc_id""".stripMargin,
    "x_dedup_clusters" ->
      s"""WITH RECURSIVE $lshPairsCte,
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |           FROM reach GROUP BY src),
         |sized AS (SELECT cluster_id, count(*) AS cluster_size FROM labels GROUP BY 1)
         |SELECT l.doc_id, l.cluster_id, s.cluster_size,
         |  CAST(l.doc_id = l.cluster_id AS INT) AS is_canonical
         |FROM labels l JOIN sized s USING (cluster_id)
         |ORDER BY doc_id""".stripMargin,
    "x_sample_stratified" ->
      """WITH s AS (SELECT doc_id, lang,
        |  CASE WHEN lang = 'en' THEN CAST(0.25 AS DOUBLE)
        |       WHEN lang = 'zh' THEN CAST(0.5 AS DOUBLE)
        |       ELSE CAST(1.0 AS DOUBLE) END AS sample_rate,
        |  CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    / 4294967296.0 AS u
        |  FROM documents)
        |SELECT doc_id, lang AS stratum, sample_rate,
        |  CAST(1.0 AS DOUBLE) / sample_rate AS sample_weight
        |FROM s WHERE u < sample_rate ORDER BY doc_id""".stripMargin,
    "x_chunk" ->
      """WITH t AS (SELECT doc_id, text, CAST(length(text) AS BIGINT) AS len FROM documents),
        |n AS (SELECT doc_id, text, greatest(1, (len - 100 + 299) // 300) AS n FROM t),
        |u AS (SELECT doc_id, text, unnest(range(0, n)) AS chunk_id FROM n)
        |SELECT doc_id, chunk_id, chunk_id * 300 AS char_off,
        |  substr(text, CAST(chunk_id * 300 + 1 AS INT), 400) AS chunk
        |FROM u ORDER BY doc_id, chunk_id""".stripMargin,
    "x_text_cooccur" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |uc AS (SELECT w, count(*) AS c FROM
         |        (SELECT unnest(toks) AS w FROM t) GROUP BY 1),
         |n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM uc),
         |big AS (SELECT unnest(toks[1:len(toks)-1]) AS w1,
         |               unnest(toks[2:len(toks)]) AS w2 FROM t),
         |bc AS (SELECT w1, w2, count(*) AS c12 FROM big
         |       GROUP BY 1, 2 HAVING count(*) >= 3)
         |SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2,
         |  CAST(c12 * n.n AS DOUBLE) / CAST(u1.c * u2.c AS DOUBLE) AS pmi_ratio
         |FROM bc JOIN uc u1 ON bc.w1 = u1.w JOIN uc u2 ON bc.w2 = u2.w
         |CROSS JOIN n ORDER BY w1, w2""".stripMargin,
    "x_text_index" ->
      s"""WITH td AS (SELECT doc_id, unnest(list_distinct($toksSql)) AS term
         |            FROM documents)
         |SELECT term, count(*) AS df,
         |  array_to_string(list_transform(list_sort(list(doc_id))[1:32],
         |    x -> CAST(x AS VARCHAR)), ',') AS postings
         |FROM td GROUP BY term ORDER BY term""".stripMargin,
    "x_negatives" ->
      """WITH r AS (SELECT vec_id,
        |  CAST(CONCAT('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS b,
        |  row_number() OVER (PARTITION BY
        |    CAST(CONCAT('0x', substr(md5(CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT) % 32
        |    ORDER BY CAST(CONCAT('0x', substr(md5('r:' || CAST(vec_id AS VARCHAR)), 1, 8)) AS BIGINT),
        |      vec_id) - 1 AS rnk
        |  FROM embeddings),
        |s AS (SELECT b, COUNT(*) AS bs FROM r GROUP BY 1),
        |p AS (SELECT e.vec_id AS anchor, i.i,
        |  CAST(CONCAT('0x', substr(md5(CAST(e.vec_id AS VARCHAR) || ':' || CAST(i.i AS VARCHAR)), 1, 8)) AS BIGINT) % 32 AS b
        |  FROM embeddings e CROSS JOIN (SELECT unnest(generate_series(0, 3)) AS i) i),
        |p2 AS (SELECT p.anchor, p.i, p.b,
        |  CAST(CONCAT('0x', substr(md5(CAST(p.anchor AS VARCHAR) || '~' || CAST(p.i AS VARCHAR)), 1, 8)) AS BIGINT) % s.bs AS rnk
        |  FROM p JOIN s USING (b))
        |SELECT p2.anchor AS anchor_id, p2.i AS probe_idx, r.vec_id AS neg_id
        |FROM p2 JOIN r ON r.b = p2.b AND r.rnk = p2.rnk
        |WHERE r.vec_id <> p2.anchor
        |ORDER BY anchor_id, probe_idx""".stripMargin,
    "x_quality_rank_scale" -> qualityRankOracle,
    "x_quality_rank" -> qualityRankOracle,
    "x_dsir_weights" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |u AS (SELECT doc_id, doc_id % 7 = 0 AS tgt, unnest(ts) AS tok FROM toks),
         |tb AS (SELECT doc_id, tgt,
         |  CAST(CONCAT('0x', substr(md5(tok), 1, 15)) AS BIGINT) % 4096 AS b
         |  FROM u),
         |st AS (SELECT b, COUNT(*) AS sc,
         |  SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS tc FROM tb GROUP BY 1),
         |tot AS (SELECT COUNT(*) AS s_tot,
         |  SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS t_tot FROM tb),
         |r AS (SELECT b,
         |  CAST((tc + 1) * 1000000 // (t_tot + 4096) AS BIGINT)
         |    * CAST(s_tot + 4096 AS BIGINT) // CAST(sc + 1 AS BIGINT) AS ratio
         |  FROM st CROSS JOIN tot),
         |sc AS (SELECT tb.doc_id, COUNT(*) AS n_tokens, SUM(r.ratio) AS score
         |       FROM tb JOIN r USING (b) GROUP BY 1)
         |SELECT d.doc_id, COALESCE(sc.n_tokens, 0) AS n_tokens,
         |  CAST(COALESCE(sc.score, 0) AS BIGINT) AS dsir_score
         |FROM documents d LEFT JOIN sc USING (doc_id) ORDER BY doc_id""".stripMargin,
    "x_sample_curriculum" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_toks FROM documents),
         |c AS (SELECT quantile_cont(n_toks, 0.25) AS q1,
         |             quantile_cont(n_toks, 0.50) AS q2,
         |             quantile_cont(n_toks, 0.75) AS q3 FROM t)
         |SELECT doc_id, n_toks,
         |  CAST(CASE WHEN n_toks >= q1 THEN 1 ELSE 0 END
         |     + CASE WHEN n_toks >= q2 THEN 1 ELSE 0 END
         |     + CASE WHEN n_toks >= q3 THEN 1 ELSE 0 END AS INT) AS bin
         |FROM t CROSS JOIN c ORDER BY doc_id""".stripMargin,
    "x_sample_weighted" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |q AS (SELECT doc_id,
         |    least(1.0, CAST(len(toks) AS BIGINT) / 100.0) * 0.4 +
         |    (CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 0.3 +
         |    (CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t2 -> list_contains($stopwordsSql, t2))) AS DOUBLE) / len(toks) ELSE 0.0 END) * 0.3
         |      AS quality_score
         |  FROM t),
         |w AS (SELECT doc_id, quality_score,
         |    CAST(CAST(quality_score AS DECIMAL(18,3)) * 1000 AS BIGINT) AS wm,
         |    CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h
         |  FROM q)
         |SELECT doc_id, quality_score, 1000.0 / wm AS sample_weight
         |FROM w WHERE h * 1000 < wm * 4294967296 ORDER BY doc_id""".stripMargin,
    "x_typo_pairs" ->
      """WITH toks AS (SELECT list_filter(str_split_regex(lower(c_name),
        |    '[^a-z0-9]+'), t -> t <> '') AS ts FROM customer),
        |v AS (SELECT tok, COUNT(*) AS df
        |      FROM (SELECT unnest(ts) AS tok FROM toks) GROUP BY 1),
        |f AS (SELECT * FROM v WHERE length(tok) >= 4)
        |SELECT a.tok AS w1, b.tok AS w2, a.df AS df1, b.df AS df2
        |FROM f a JOIN f b ON a.tok < b.tok AND levenshtein(a.tok, b.tok) <= 1
        |ORDER BY w1, w2""".stripMargin,
    "x_sample_pps" ->
      """WITH b AS (SELECT doc_id, CAST(n_chars AS BIGINT) AS w
        |  FROM documents),
        |c AS (SELECT doc_id, w,
        |    CAST(SUM(w) OVER (ORDER BY doc_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c_hi
        |  FROM b),
        |t AS (SELECT CAST(SUM(w) AS BIGINT) AS total FROM b),
        |pts AS (SELECT (t.total * (j.j * 2 + 1)) // 50 AS p
        |  FROM t, LATERAL (SELECT unnest(generate_series(0, 24)) AS j) j)
        |SELECT c.doc_id, c.w AS weight, c.c_hi - c.w AS c_lo, c.c_hi,
        |  COUNT(*) AS multiplicity
        |FROM c JOIN pts ON pts.p > c.c_hi - c.w AND pts.p <= c.c_hi
        |GROUP BY 1, 2, 3, 4 ORDER BY doc_id""".stripMargin,
    "x_sample_examples" ->
      """WITH h AS (SELECT source, doc_id,
        |    ((doc_id % 2147483648) * 2654435761) % 2147483648 AS hv
        |  FROM documents),
        |r AS (SELECT source, doc_id,
        |    row_number() OVER (PARTITION BY source ORDER BY hv, doc_id) - 1
        |      AS rank
        |  FROM h)
        |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id
        |FROM r WHERE rank < 8 ORDER BY source, rank""".stripMargin,
    "x_sample_split" ->
      """WITH s AS (SELECT doc_id,
        |  CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    / 4294967296.0 AS u
        |  FROM documents)
        |SELECT doc_id,
        |  CASE WHEN u < 0.75 THEN 'train' WHEN u < 0.875 THEN 'val'
        |       ELSE 'test' END AS split
        |FROM s ORDER BY doc_id""".stripMargin,
    "x_sample_taken" ->
      """SELECT doc_id, lang AS stratum, CAST(rn AS BIGINT) AS sample_rank FROM (
        |  SELECT doc_id, lang,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) WHERE rn <= 10 ORDER BY doc_id""".stripMargin,
    "x_sample_mixture" ->
      """WITH bysrc AS (SELECT source, sum(n_chars) AS tot FROM documents GROUP BY 1),
        |nrm AS (SELECT list_reduce(
        |  list_prepend(CAST(0.0 AS DOUBLE),
        |    list(sqrt(CAST(tot AS DOUBLE)) ORDER BY source)),
        |  (a, b) -> a + b) AS S FROM bysrc),
        |rates AS (SELECT source,
        |  least(CAST(1.0 AS DOUBLE),
        |    CAST(140000 AS DOUBLE) * sqrt(CAST(tot AS DOUBLE)) / S
        |      / CAST(tot AS DOUBLE)) AS sample_rate
        |  FROM bysrc CROSS JOIN nrm),
        |s AS (SELECT d.doc_id, d.source, r.sample_rate,
        |  CAST(CONCAT('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    / 4294967296.0 AS u
        |  FROM documents d JOIN rates r USING (source))
        |SELECT doc_id, source, sample_rate,
        |  CAST(1.0 AS DOUBLE) / sample_rate AS sample_weight
        |FROM s WHERE u < sample_rate ORDER BY doc_id""".stripMargin,
    "x_corpus_assembly" ->
      s"""WITH RECURSIVE $lshPairsCte,
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |removed AS (SELECT src AS doc_id FROM reach GROUP BY src
         |            HAVING src > least(src, min(dst))),
         |t2 AS (SELECT doc_id, source, n_chars, text, $toksSql AS toks2 FROM documents),
         |q AS (SELECT doc_id, source, n_chars,
         |    CAST(len(toks2) AS BIGINT) AS n_tokens,
         |    CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END AS alpha_ratio,
         |    CASE WHEN len(toks2) > 0 THEN CAST(len(list_filter(toks2, t3 -> list_contains($stopwordsSql, t3))) AS DOUBLE) / len(toks2) ELSE 0.0 END AS stopword_ratio,
         |    list_distinct(toks2) AS dtoks
         |  FROM t2),
         |scored AS (SELECT doc_id, source, n_chars,
         |    least(1.0, n_tokens / 100.0) * 0.4 + alpha_ratio * 0.3 + stopword_ratio * 0.3 AS quality_score,
         |    len(list_intersect(dtoks, ${markerSql("en")})) AS s_en,
         |    len(list_intersect(dtoks, ${markerSql("de")})) AS s_de,
         |    len(list_intersect(dtoks, ${markerSql("fr")})) AS s_fr,
         |    len(list_intersect(dtoks, ${markerSql("es")})) AS s_es,
         |    len(list_intersect(dtoks, ${markerSql("zh")})) AS s_zh
         |  FROM q),
         |kept AS (SELECT doc_id, source, n_chars FROM scored
         |  WHERE quality_score >= 0.45
         |    AND greatest(s_en, s_de, s_fr, s_es, s_zh) > 0
         |    AND s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh
         |    AND doc_id NOT IN (SELECT doc_id FROM removed)),
         |bysrc AS (SELECT source, sum(n_chars) AS tot FROM kept GROUP BY 1),
         |nrm AS (SELECT list_reduce(
         |  list_prepend(CAST(0.0 AS DOUBLE),
         |    list(sqrt(CAST(tot AS DOUBLE)) ORDER BY source)),
         |  (a, b) -> a + b) AS S FROM bysrc),
         |rates AS (SELECT source,
         |  least(CAST(1.0 AS DOUBLE),
         |    CAST(30000 AS DOUBLE) * sqrt(CAST(tot AS DOUBLE)) / S
         |      / CAST(tot AS DOUBLE)) AS sample_rate
         |  FROM bysrc CROSS JOIN nrm),
         |mixed AS (SELECT k.doc_id, k.source,
         |    CAST(1.0 AS DOUBLE) / r.sample_rate AS sample_weight
         |  FROM kept k JOIN rates r USING (source)
         |  WHERE CAST(CONCAT('0x', substr(md5(CAST(k.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |          / 4294967296.0 < r.sample_rate)
         |SELECT doc_id, source, sample_weight,
         |  CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4 AS INT) AS shard,
         |  CAST(row_number() OVER (
         |    PARTITION BY CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 4
         |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS shard_pos
         |FROM mixed ORDER BY doc_id""".stripMargin,
    "x_decontaminate" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |grams AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
         |          FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
         |          WHERE len(ts) >= 3)
         |SELECT t.doc_id, e.doc_id AS eval_id, count(*) AS n_shared
         |FROM grams t JOIN grams e
         |  ON t.g = e.g AND e.doc_id < 100 AND t.doc_id <> e.doc_id
         |GROUP BY 1, 2 HAVING count(*) >= 5
         |ORDER BY 1, 2""".stripMargin,
    "x_embed_lsh" -> {
      // the identical ±1 literal matrix the Spark plan embeds
      val signs = Similarity.signMatrix(64, 16)
      val sigExpr = (0 until 16).map { j =>
        val lst = signs(j).mkString("[", ", ", "]")
        s"""CASE WHEN list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           |  list_transform(generate_series(1, 64), i -> ($lst)[i] * e[i])),
           |  (a, b) -> a + b) > 0 THEN ${1L << j} ELSE 0 END""".stripMargin
      }.mkString(" + ")
      s"""WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
         |SELECT vec_id, CAST($sigExpr AS BIGINT) AS lsh_sig
         |FROM c ORDER BY vec_id""".stripMargin
    },
    "x_embed_quantize" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(e, v -> v * v)), (a, b) -> a + b)) AS l2_norm,
        |  list_max(list_transform(e, v -> abs(v))) AS amax
        |  FROM c)
        |SELECT vec_id, l2_norm, amax / CAST(127.0 AS DOUBLE) AS qscale,
        |  CASE WHEN amax > 0 THEN
        |    array_to_string(list_transform(e,
        |      v -> CAST(CAST(round(v / amax * 127) AS INT) AS VARCHAR)), ',')
        |  ELSE array_to_string(list_transform(e, v -> '0'), ',') END AS q8_csv
        |FROM m ORDER BY vec_id""".stripMargin,
    "x_embed_centroid" ->
      """WITH c AS (SELECT label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT label, e, list_max(list_transform(e, v -> abs(v))) AS amax FROM c),
        |qz AS (SELECT label,
        |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS BIGINT))
        |       ELSE list_transform(e, v -> CAST(0 AS BIGINT)) END AS q8
        |  FROM m),
        |u AS (SELECT label, unnest(q8) AS q, generate_subscripts(q8, 1) AS ord FROM qz),
        |ps AS (SELECT label, ord, SUM(q) AS s FROM u GROUP BY 1, 2),
        |agg AS (SELECT label, array_to_string(list(CAST(s AS VARCHAR) ORDER BY ord), ',') AS sum_csv
        |        FROM ps GROUP BY 1),
        |ct AS (SELECT label, COUNT(*) AS ct FROM c GROUP BY 1)
        |SELECT CAST(ct.label AS BIGINT) AS label, ct.ct, agg.sum_csv
        |FROM ct JOIN agg USING (label) ORDER BY label""".stripMargin,
    "x_embed_outliers" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, list_max(list_transform(e, v -> abs(v))) AS amax FROM c),
        |qz AS (SELECT vec_id,
        |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS BIGINT))
        |       ELSE list_transform(e, v -> CAST(0 AS BIGINT)) END AS q8
        |  FROM m),
        |s AS (SELECT vec_id AS sid, q8 AS sq8 FROM qz ORDER BY vec_id LIMIT 4),
        |d AS (SELECT qz.vec_id, s.sid,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(generate_series(1, len(q8)),
        |      i -> (q8[i] - sq8[i]) * (q8[i] - sq8[i]))),
        |    (a, b) -> a + b) AS dist2
        |  FROM qz CROSS JOIN s),
        |a AS (SELECT vec_id, sid AS cluster_id, dist2 FROM d
        |      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, sid) = 1),
        |r AS (SELECT vec_id, cluster_id, dist2,
        |        row_number() OVER (PARTITION BY cluster_id ORDER BY dist2 DESC, vec_id DESC) AS rn,
        |        count(*) OVER (PARTITION BY cluster_id) AS ct
        |      FROM a)
        |SELECT vec_id, cluster_id, dist2,
        |       CAST(CASE WHEN rn <= (ct + 9) // 10 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM r ORDER BY vec_id""".stripMargin,
    "x_kmeans_assign" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, list_max(list_transform(e, v -> abs(v))) AS amax FROM c),
        |qz AS (SELECT vec_id,
        |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS BIGINT))
        |       ELSE list_transform(e, v -> CAST(0 AS BIGINT)) END AS q8
        |  FROM m),
        |s AS (SELECT vec_id AS sid, q8 AS sq8 FROM qz ORDER BY vec_id LIMIT 4),
        |d AS (SELECT qz.vec_id, s.sid,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(generate_series(1, len(q8)),
        |      i -> (q8[i] - sq8[i]) * (q8[i] - sq8[i]))),
        |    (a, b) -> a + b) AS dist2
        |  FROM qz CROSS JOIN s)
        |SELECT vec_id, sid AS cluster_id, dist2 FROM d
        |QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, sid) = 1
        |ORDER BY vec_id""".stripMargin,
    "x_kmeans_step" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, list_max(list_transform(e, v -> abs(v))) AS amax FROM c),
        |qz AS (SELECT vec_id,
        |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS BIGINT))
        |       ELSE list_transform(e, v -> CAST(0 AS BIGINT)) END AS q8
        |  FROM m),
        |s AS (SELECT vec_id AS sid, q8 AS sq8 FROM qz ORDER BY vec_id LIMIT 4),
        |d AS (SELECT qz.vec_id, s.sid,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(generate_series(1, len(q8)),
        |      i -> (q8[i] - sq8[i]) * (q8[i] - sq8[i]))),
        |    (a, b) -> a + b) AS dist2
        |  FROM qz CROSS JOIN s),
        |a AS (SELECT vec_id, sid AS cluster_id FROM d
        |      QUALIFY row_number() OVER (PARTITION BY vec_id ORDER BY dist2, sid) = 1),
        |j AS (SELECT a.cluster_id, qz.q8 FROM a JOIN qz USING (vec_id)),
        |u AS (SELECT cluster_id, unnest(q8) AS q, generate_subscripts(q8, 1) AS ord FROM j),
        |ps AS (SELECT cluster_id, ord, SUM(q) AS sv FROM u GROUP BY 1, 2),
        |agg AS (SELECT cluster_id,
        |  array_to_string(list(CAST(sv AS VARCHAR) ORDER BY ord), ',') AS sum_csv
        |  FROM ps GROUP BY 1),
        |ct AS (SELECT cluster_id, COUNT(*) AS ct FROM a GROUP BY 1)
        |SELECT ct.cluster_id, ct.ct, agg.sum_csv FROM ct JOIN agg USING (cluster_id)
        |ORDER BY cluster_id""".stripMargin,
    "x_ann_quantized" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(e, v -> v * v)), (a, b) -> a + b)) AS nrm,
        |  list_max(list_transform(e, v -> abs(v))) AS amax
        |  FROM c),
        |qz AS (SELECT vec_id, e, nrm, amax / CAST(127.0 AS DOUBLE) AS qs,
        |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS INT))
        |       ELSE list_transform(e, v -> 0) END AS q8
        |  FROM m),
        |qq AS (SELECT vec_id AS query_id, e AS qe, nrm AS qn, qs AS qqs, q8 AS qcode
        |       FROM qz WHERE vec_id < 8 AND nrm > 0),
        |cand AS (
        |  SELECT query_id, cz.vec_id AS nn_id, qe, cz.e AS ce
        |  FROM qq JOIN qz cz ON cz.vec_id <> query_id AND cz.nrm > 0
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY
        |    CAST(list_reduce(list_prepend(0,
        |      list_transform(generate_series(1, len(qcode)), i -> qcode[i] * cz.q8[i])),
        |      (a, b) -> a + b) AS DOUBLE)
        |      * qqs * cz.qs / (qn * cz.nrm) DESC, cz.vec_id) <= 75),
        |ranked AS (
        |  SELECT query_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(list_cosine_similarity(qe, ce), 6) DESC, nn_id) AS BIGINT) AS rank,
        |    nn_id, round(list_cosine_similarity(qe, ce), 6) AS cos_sim
        |  FROM cand)
        |SELECT query_id, rank, nn_id, cos_sim FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "x_split_leakage_safe" ->
      s"""WITH RECURSIVE $lshPairsCte,
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |           FROM reach GROUP BY src),
         |f AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
         |      FROM documents d LEFT JOIN labels l USING (doc_id)),
         |s AS (SELECT doc_id, cluster_id,
         |  CAST(CONCAT('0x', substr(md5(CAST(cluster_id AS VARCHAR)), 1, 8)) AS BIGINT)
         |    / 4294967296.0 AS u
         |  FROM f)
         |SELECT doc_id, cluster_id,
         |  CASE WHEN u < 0.75 THEN 'train' WHEN u < 0.875 THEN 'val'
         |       ELSE 'test' END AS split
         |FROM s ORDER BY doc_id""".stripMargin,
    "x_mixture_audit" ->
      """WITH bysrc AS (SELECT source, sum(n_chars) AS tot FROM documents GROUP BY 1),
        |nrm AS (SELECT list_reduce(
        |  list_prepend(CAST(0.0 AS DOUBLE),
        |    list(sqrt(CAST(tot AS DOUBLE)) ORDER BY source)),
        |  (a, b) -> a + b) AS S FROM bysrc),
        |rates AS (SELECT source,
        |  least(CAST(1.0 AS DOUBLE),
        |    CAST(140000 AS DOUBLE) * sqrt(CAST(tot AS DOUBLE)) / S
        |      / CAST(tot AS DOUBLE)) AS sample_rate
        |  FROM bysrc CROSS JOIN nrm),
        |kept AS (SELECT d.doc_id, d.source, d.n_chars, r.sample_rate
        |  FROM documents d JOIN rates r USING (source)
        |  WHERE CAST(CONCAT('0x', substr(md5(CAST(d.doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
        |    / 4294967296.0 < r.sample_rate),
        |per AS (SELECT source, count(*) AS n_kept, sum(n_chars) AS chars_kept,
        |          any_value(sample_rate) AS sample_rate
        |        FROM kept GROUP BY 1),
        |t AS (SELECT CAST(sum(chars_kept) AS BIGINT) AS tot_kept FROM per)
        |SELECT source, CAST(n_kept AS BIGINT) AS n_kept,
        |  CAST(chars_kept AS BIGINT) AS chars_kept,
        |  CAST(chars_kept AS BIGINT) * 1000000 // tot_kept AS achieved_ppm,
        |  sample_rate
        |FROM per CROSS JOIN t ORDER BY source""".stripMargin,
    "x_quality_calibrate" ->
      s"""WITH $lmScoreCte,
         |typ AS (SELECT d.doc_id, d.source,
         |    CAST(coalesce(sc.lm_score // sc.n_bigrams, 0) AS BIGINT) AS typ_ppm
         |  FROM documents d LEFT JOIN sc USING (doc_id)),
         |n AS (SELECT source, count(*) AS ng FROM typ GROUP BY 1)
         |SELECT t.doc_id, t.source, t.typ_ppm,
         |  CAST(rank() OVER (PARTITION BY t.source ORDER BY t.typ_ppm) - 1 AS BIGINT)
         |    AS rank_below,
         |  CASE WHEN n.ng > 1 THEN
         |    (rank() OVER (PARTITION BY t.source ORDER BY t.typ_ppm) - 1) * 1000000
         |      // (n.ng - 1)
         |  ELSE 0 END AS pct_ppm
         |FROM typ t JOIN n USING (source)
         |ORDER BY doc_id""".stripMargin,
    "x_dedup_eval" ->
      s"""WITH $lshPairsCte,
         |egrams AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
         |           FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
         |           WHERE len(ts) >= 3),
         |esizes AS (SELECT doc_id, count(*) AS sz FROM egrams GROUP BY 1),
         |einter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n
         |           FROM egrams a JOIN egrams b ON a.g = b.g AND a.doc_id < b.doc_id
         |           GROUP BY 1, 2),
         |epairs AS (SELECT d1, d2 FROM einter
         |           JOIN esizes s1 ON d1 = s1.doc_id
         |           JOIN esizes s2 ON d2 = s2.doc_id
         |           WHERE n / (s1.sz + s2.sz - n) >= 0.8),
         |l AS (SELECT count(*) AS n_lsh FROM pairs),
         |x AS (SELECT count(*) AS n_exact FROM epairs),
         |c AS (SELECT count(*) AS n_common FROM pairs JOIN epairs USING (d1, d2))
         |SELECT CAST(n_lsh AS BIGINT) AS n_lsh,
         |  CAST(n_exact AS BIGINT) AS n_exact,
         |  CAST(n_common AS BIGINT) AS n_common,
         |  n_common * 1000000 // n_lsh AS precision_ppm,
         |  n_common * 1000000 // n_exact AS recall_ppm
         |FROM l CROSS JOIN x CROSS JOIN c""".stripMargin,
    "x_token_budget" ->
      s"""WITH $lmScoreCte,
         |typ AS (SELECT d.doc_id,
         |    CAST(coalesce(sc.lm_score // sc.n_bigrams, 0) AS BIGINT) AS typ_ppm,
         |    CAST(len($toksSql) AS BIGINT) AS n_tokens
         |  FROM documents d LEFT JOIN sc USING (doc_id)),
         |bv AS (SELECT typ_ppm AS v, sum(n_tokens) AS vtok FROM typ GROUP BY 1),
         |ann AS (SELECT v, vtok,
         |    sum(vtok) OVER (ORDER BY v DESC ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM bv),
         |b AS (SELECT sum(n_tokens) * 600000 // 1000000 AS budget FROM typ),
         |x AS (SELECT t.doc_id, t.typ_ppm, t.n_tokens, a.cum,
         |    a.cum - a.vtok AS prev, b.budget,
         |    sum(t.n_tokens) OVER (PARTITION BY t.typ_ppm ORDER BY t.doc_id
         |      ROWS UNBOUNDED PRECEDING) AS run
         |  FROM typ t JOIN ann a ON a.v = t.typ_ppm CROSS JOIN b)
         |SELECT doc_id, typ_ppm, n_tokens,
         |  CASE WHEN cum <= budget THEN 1
         |       WHEN prev >= budget THEN 0
         |       WHEN prev + run <= budget THEN 1 ELSE 0 END AS selected
         |FROM x ORDER BY doc_id""".stripMargin,
    "x_snapshot_diff" ->
      """WITH o AS (SELECT doc_id, md5(text) AS fo FROM documents),
        |v2 AS (SELECT doc_id,
        |         CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text
        |       FROM documents WHERE doc_id % 17 <> 0
        |       UNION ALL
        |       SELECT doc_id + 10000000 AS doc_id, text
        |       FROM documents WHERE doc_id % 19 = 0),
        |n AS (SELECT doc_id, md5(text) AS fn FROM v2)
        |SELECT doc_id,
        |  CASE WHEN fo IS NULL THEN 'added'
        |       WHEN fn IS NULL THEN 'removed'
        |       WHEN fo = fn THEN 'unchanged'
        |       ELSE 'changed' END AS status
        |FROM o FULL OUTER JOIN n USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "x_dedup_indoc" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word,
        |                  unnest(range(0, len(string_split(text, ' ')))) AS i
        |           FROM documents),
        |c AS (SELECT doc_id, i // 3 AS pi, string_agg(word, ' ' ORDER BY i) AS line
        |      FROM w GROUP BY 1, 2),
        |r AS (SELECT doc_id, pi, line,
        |        row_number() OVER (PARTITION BY doc_id, line ORDER BY pi) AS rn
        |      FROM c)
        |SELECT doc_id,
        |  coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY pi), '') AS kept_text,
        |  count(CASE WHEN rn = 1 THEN 1 END)::BIGINT AS kept_ct,
        |  count(CASE WHEN rn > 1 THEN 1 END)::BIGINT AS removed_ct
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_dedup_keep_longest" ->
      s"""WITH RECURSIVE $lshPairsCte,
         |edges AS (SELECT d1 AS src, d2 AS dst FROM pairs
         |          UNION ALL SELECT d2 AS src, d1 AS dst FROM pairs),
         |reach(src, dst) AS (
         |  SELECT src, dst FROM edges
         |  UNION
         |  SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         |labels AS (SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
         |           FROM reach GROUP BY src),
         |f AS (SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id,
         |             d.n_chars
         |      FROM documents d LEFT JOIN labels l USING (doc_id))
         |SELECT doc_id, cluster_id, n_chars,
         |  CAST(row_number() OVER (PARTITION BY cluster_id
         |    ORDER BY n_chars DESC, doc_id) = 1 AS INT) AS kept
         |FROM f ORDER BY doc_id""".stripMargin,
    "x_diversity" ->
      s"""WITH tk AS (SELECT source, unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT source, tok, count(*) AS ct FROM tk GROUP BY 1, 2)
         |SELECT source, CAST(sum(ct) AS BIGINT) AS n_tokens,
         |  CAST(count(*) AS BIGINT) AS vocab_size,
         |  (CAST(sum(ct) AS BIGINT) * CAST(sum(ct) AS BIGINT)
         |    - CAST(sum(ct * ct) AS BIGINT)) * 10000
         |    // (CAST(sum(ct) AS BIGINT) * CAST(sum(ct) AS BIGINT))
         |    AS gini_simpson_pp10k
         |FROM tf GROUP BY source ORDER BY source""".stripMargin,
    "x_vocab_coverage" ->
      s"""WITH tk AS (SELECT unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT tok, count(*) AS ct FROM tk GROUP BY 1),
         |st AS (SELECT CAST(sum(ct) AS BIGINT) AS total_tokens,
         |              CAST(count(*) AS BIGINT) AS vocab_size,
         |              CAST(sum(CASE WHEN ct = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax_types
         |       FROM tf),
         |rk AS (SELECT tok, ct,
         |         CAST(row_number() OVER (ORDER BY ct DESC, tok) AS BIGINT) AS rnk
         |       FROM tf QUALIFY rnk <= 1000),
         |ks(k) AS (VALUES (1), (10), (100), (1000))
         |SELECT CAST(k AS BIGINT) AS k,
         |  CAST(count(*) AS BIGINT) AS n_types,
         |  CAST(sum(ct) AS BIGINT) AS covered_tokens,
         |  CAST(sum(ct) AS BIGINT) * 1000000 // total_tokens AS coverage_ppm,
         |  total_tokens, vocab_size, hapax_types
         |FROM ks JOIN rk ON rnk <= k CROSS JOIN st
         |GROUP BY k, total_tokens, vocab_size, hapax_types
         |ORDER BY k""".stripMargin,
    "x_ann_ivfpq" ->
      s"""WITH $ivfAssignCte,
         |m0 AS (SELECT vec_id, e,
         |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         |    list_transform(e, v -> v * v)), (a, b) -> a + b)) AS nrm,
         |  list_max(list_transform(e, v -> abs(v))) AS amax
         |  FROM c),
         |qz AS (SELECT vec_id, e, nrm,
         |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS INT))
         |       ELSE list_transform(e, v -> 0) END AS q8
         |  FROM m0),
         |pseeds AS (SELECT q8, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS r
         |           FROM (SELECT * FROM qz ORDER BY vec_id LIMIT 16)),
         |codes AS (
         |  SELECT v.vec_id, t.mi, s.r AS code
         |  FROM qz v
         |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS mi) t
         |  JOIN pseeds s ON TRUE
         |  QUALIFY row_number() OVER (PARTITION BY v.vec_id, t.mi ORDER BY
         |    list_reduce(list_prepend(0, list_transform(generate_series(1, 8),
         |      i -> (v.q8[t.mi*8+i] - s.q8[t.mi*8+i]) * (v.q8[t.mi*8+i] - s.q8[t.mi*8+i]))),
         |      (a, b) -> a + b), s.r) = 1),
         |q AS (SELECT vec_id AS query_id, e AS qe FROM c WHERE vec_id < 8),
         |probes AS (SELECT query_id, cluster FROM (
         |    SELECT q.query_id, s.cluster,
         |           row_number() OVER (PARTITION BY q.query_id
         |             ORDER BY round(list_cosine_similarity(q.qe, s.se), 6) DESC, s.cluster) AS rn
         |    FROM q CROSS JOIN seeds s) WHERE rn <= 4),
         |qcodes AS (SELECT cd.vec_id AS query_id, cd.mi, cd.code
         |  FROM codes cd JOIN qz z ON z.vec_id = cd.vec_id
         |  WHERE cd.vec_id < 8 AND z.nrm > 0),
         |sdc AS (
         |  SELECT qc.query_id, cc.vec_id AS nn_id,
         |    SUM(list_reduce(list_prepend(0, list_transform(generate_series(1, 8),
         |      i -> (sq.q8[qc.mi*8+i] - sc.q8[qc.mi*8+i]) * (sq.q8[qc.mi*8+i] - sc.q8[qc.mi*8+i]))),
         |      (a, b) -> a + b)) AS d
         |  FROM qcodes qc
         |  JOIN codes cc ON cc.mi = qc.mi AND cc.vec_id <> qc.query_id
         |  JOIN assign a ON a.vec_id = cc.vec_id
         |  JOIN probes p ON p.query_id = qc.query_id AND p.cluster = a.cluster
         |  JOIN qz cz ON cz.vec_id = cc.vec_id AND cz.nrm > 0
         |  JOIN pseeds sq ON sq.r = qc.code
         |  JOIN pseeds sc ON sc.r = cc.code
         |  GROUP BY 1, 2),
         |cand AS (SELECT query_id, nn_id FROM sdc
         |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, nn_id) <= 75),
         |ranked AS (
         |  SELECT query_id,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY round(list_cosine_similarity(qe.e, ce.e), 6) DESC, nn_id) AS BIGINT) AS rank,
         |    nn_id, round(list_cosine_similarity(qe.e, ce.e), 6) AS cos_sim
         |  FROM cand JOIN qz qe ON qe.vec_id = query_id JOIN qz ce ON ce.vec_id = nn_id)
         |SELECT query_id, rank, nn_id, cos_sim FROM ranked WHERE rank <= 10
         |ORDER BY query_id, rank""".stripMargin,
    "x_ann_pq" ->
      """WITH c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m0 AS (SELECT vec_id, e,
        |  sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
        |    list_transform(e, v -> v * v)), (a, b) -> a + b)) AS nrm,
        |  list_max(list_transform(e, v -> abs(v))) AS amax
        |  FROM c),
        |qz AS (SELECT vec_id, e, nrm,
        |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS INT))
        |       ELSE list_transform(e, v -> 0) END AS q8
        |  FROM m0),
        |seeds AS (SELECT q8, CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS r
        |          FROM (SELECT * FROM qz ORDER BY vec_id LIMIT 16)),
        |codes AS (
        |  SELECT v.vec_id, t.mi, s.r AS code
        |  FROM qz v
        |  CROSS JOIN (SELECT unnest(generate_series(0, 7)) AS mi) t
        |  JOIN seeds s ON TRUE
        |  QUALIFY row_number() OVER (PARTITION BY v.vec_id, t.mi ORDER BY
        |    list_reduce(list_prepend(0, list_transform(generate_series(1, 8),
        |      i -> (v.q8[t.mi*8+i] - s.q8[t.mi*8+i]) * (v.q8[t.mi*8+i] - s.q8[t.mi*8+i]))),
        |      (a, b) -> a + b), s.r) = 1),
        |qcodes AS (SELECT cd.vec_id AS query_id, cd.mi, cd.code
        |  FROM codes cd JOIN qz z ON z.vec_id = cd.vec_id
        |  WHERE cd.vec_id < 8 AND z.nrm > 0),
        |sdc AS (
        |  SELECT qc.query_id, cc.vec_id AS nn_id,
        |    SUM(list_reduce(list_prepend(0, list_transform(generate_series(1, 8),
        |      i -> (sq.q8[qc.mi*8+i] - sc.q8[qc.mi*8+i]) * (sq.q8[qc.mi*8+i] - sc.q8[qc.mi*8+i]))),
        |      (a, b) -> a + b)) AS d
        |  FROM qcodes qc
        |  JOIN codes cc ON cc.mi = qc.mi AND cc.vec_id <> qc.query_id
        |  JOIN qz cz ON cz.vec_id = cc.vec_id AND cz.nrm > 0
        |  JOIN seeds sq ON sq.r = qc.code
        |  JOIN seeds sc ON sc.r = cc.code
        |  GROUP BY 1, 2),
        |cand AS (SELECT query_id, nn_id FROM sdc
        |  QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY d, nn_id) <= 75),
        |ranked AS (
        |  SELECT query_id,
        |    CAST(row_number() OVER (PARTITION BY query_id
        |      ORDER BY round(list_cosine_similarity(qe.e, ce.e), 6) DESC, nn_id) AS BIGINT) AS rank,
        |    nn_id, round(list_cosine_similarity(qe.e, ce.e), 6) AS cos_sim
        |  FROM cand JOIN qz qe ON qe.vec_id = query_id JOIN qz ce ON ce.vec_id = nn_id)
        |SELECT query_id, rank, nn_id, cos_sim FROM ranked WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin,
    "x_text_repetition" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |g AS (SELECT doc_id, ts,
         |  CASE WHEN len(ts) >= 3
         |       THEN list_transform(generate_series(1, len(ts) - 2),
         |              i -> array_to_string(ts[i:i+2], ' '))
         |       ELSE [] END AS grams
         |  FROM t)
         |SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
         |  CASE WHEN len(grams) > 0
         |       THEN CAST(1.0 AS DOUBLE)
         |            - CAST(len(list_distinct(grams)) AS DOUBLE) / len(grams)
         |       ELSE CAST(0.0 AS DOUBLE) END AS dup_gram_ratio,
         |  CASE WHEN len(ts) > 0
         |       THEN CAST(list_max(list_transform(list_distinct(ts),
         |              t2 -> len(list_filter(ts, x -> x = t2)))) AS DOUBLE) / len(ts)
         |       ELSE CAST(0.0 AS DOUBLE) END AS top_token_ratio
         |FROM g ORDER BY doc_id""".stripMargin,
    "x_text_topterms" ->
      s"""WITH tk AS (SELECT doc_id, unnest($toksSql) AS tok FROM documents),
         |tf AS (SELECT doc_id, tok, count(*) AS tf FROM tk GROUP BY 1, 2),
         |idf AS (SELECT tok, count(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT count(*) AS n FROM documents)
         |SELECT doc_id, tok, score, rank FROM (
         |  SELECT doc_id, tok,
         |    CAST(tf AS DOUBLE) * n / df AS score,
         |    CAST(row_number() OVER (PARTITION BY doc_id
         |      ORDER BY CAST(tf AS DOUBLE) * n / df DESC, tok) AS BIGINT) AS rank
         |  FROM tf CROSS JOIN n JOIN idf USING (tok))
         |WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "x_text_bm25" ->
      s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
         |base AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl FROM t),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
         |            CAST(sum(dl) AS BIGINT) AS tot FROM base),
         |stats2 AS (SELECT n_docs, tot / n_docs AS avgdl FROM stats),
         |stacked AS (
         |  SELECT doc_id, dl, term, tf FROM (
         |    SELECT doc_id, dl, term,
         |      CAST(len(list_filter(toks, x -> x = term)) AS BIGINT) AS tf
         |    FROM base CROSS JOIN (SELECT unnest(${bm25Terms.map(t => s"'$t'").mkString("[", ", ", "]")}) AS term))
         |  WHERE tf > 0),
         |dfs AS (SELECT term, count(*) AS df FROM stacked GROUP BY 1)
         |SELECT s.doc_id, s.term, s.tf,
         |  ((s.tf * CAST(${1.2 + 1} AS DOUBLE)) / (s.tf + CAST(${1.2} AS DOUBLE) *
         |    (CAST(${1 - 0.75} AS DOUBLE) + CAST(${0.75} AS DOUBLE) * (s.dl / st.avgdl)))) *
         |  ((st.n_docs - d2.df + CAST(0.5 AS DOUBLE)) / (d2.df + CAST(0.5 AS DOUBLE))) AS score
         |FROM stacked s JOIN dfs d2 USING (term) CROSS JOIN stats2 st
         |ORDER BY term, doc_id""".stripMargin,
    "x_text_bm25_topk" ->
      s"""WITH $bm25ScoredCte
         |SELECT doc_id,
         |  CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank
         |FROM scored ORDER BY score DESC, doc_id LIMIT 25""".stripMargin,
    "x_text_novelty" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |g AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS gram
         |      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
         |      WHERE len(ts) >= 3),
         |df AS (SELECT gram, count(*) AS c FROM g GROUP BY 1)
         |SELECT doc_id, COUNT(*) AS n_grams,
         |       CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) AS novel_ct,
         |       CAST(COUNT(*) FILTER (WHERE c = 1) AS BIGINT) * 1000000 // COUNT(*) AS novelty_ppm
         |FROM g JOIN df USING (gram)
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "x_corpus_card" ->
      s"""WITH t AS (SELECT doc_id, text, $toksSql AS toks FROM documents),
         |q AS (SELECT doc_id, toks,
         |    CAST(length(text) AS BIGINT) AS n_chars,
         |    CAST(len(toks) AS BIGINT) AS n_tokens,
         |    least(1.0, len(toks) / 100.0) * 0.4
         |      + (CASE WHEN length(text) > 0 THEN CAST(length(regexp_replace(lower(text), '[^a-z]', '', 'g')) AS DOUBLE) / length(text) ELSE 0.0 END) * 0.3
         |      + (CASE WHEN len(toks) > 0 THEN CAST(len(list_filter(toks, t2 -> list_contains($stopwordsSql, t2))) AS DOUBLE) / len(toks) ELSE 0.0 END) * 0.3
         |      AS quality_score
         |  FROM t),
         |l AS (SELECT doc_id,
         |    len(list_intersect(list_distinct(toks), ${markerSql("en")})) AS s_en,
         |    len(list_intersect(list_distinct(toks), ${markerSql("de")})) AS s_de,
         |    len(list_intersect(list_distinct(toks), ${markerSql("fr")})) AS s_fr,
         |    len(list_intersect(list_distinct(toks), ${markerSql("es")})) AS s_es,
         |    len(list_intersect(list_distinct(toks), ${markerSql("zh")})) AS s_zh
         |  FROM q),
         |lp AS (SELECT doc_id,
         |  CASE WHEN greatest(s_en, s_de, s_fr, s_es, s_zh) = 0 THEN 'unknown'
         |       WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
         |       WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
         |       WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
         |       WHEN s_es >= s_zh THEN 'es'
         |       ELSE 'zh' END AS lang_pred
         |  FROM l),
         |cells AS (SELECT lp.lang_pred,
         |    least(9, CAST(floor(CAST(q.quality_score AS DECIMAL(18,6)) * 10) AS BIGINT)) AS q_decile,
         |    q.n_tokens, q.n_chars
         |  FROM q JOIN lp USING (doc_id))
         |SELECT lang_pred, q_decile, COUNT(*) AS n_docs,
         |       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
         |       CAST(SUM(n_chars) AS BIGINT) AS n_chars
         |FROM cells GROUP BY 1, 2
         |ORDER BY lang_pred, q_decile""".stripMargin,
    "x_hybrid_rrf" ->
      s"""WITH $bm25ScoredCte,
         |ttop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_text
         |  FROM scored ORDER BY score DESC, doc_id LIMIT 25),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |vsc AS (SELECT c.vec_id AS doc_id,
         |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), q.qe), 6) AS cs
         |  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> 0),
         |vtop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY cs DESC, doc_id) AS BIGINT) AS rank_vec
         |  FROM vsc ORDER BY cs DESC, doc_id LIMIT 25),
         |f AS (SELECT COALESCE(tt.doc_id, vt.doc_id) AS doc_id,
         |        CAST(COALESCE(tt.rank_text, 0) AS BIGINT) AS rank_text,
         |        CAST(COALESCE(vt.rank_vec, 0) AS BIGINT) AS rank_vec
         |      FROM ttop tt FULL OUTER JOIN vtop vt ON tt.doc_id = vt.doc_id),
         |g AS (SELECT doc_id, rank_text, rank_vec,
         |        (CASE WHEN rank_text > 0 THEN 1.0 / (60.0 + rank_text) ELSE 0.0 END +
         |         CASE WHEN rank_vec > 0 THEN 1.0 / (60.0 + rank_vec) ELSE 0.0 END) AS rrf
         |      FROM f)
         |SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS BIGINT) AS rank,
         |       doc_id, rank_text, rank_vec, rrf
         |FROM g ORDER BY rank""".stripMargin,
    "x_text_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(nfc_normalize(lower(
        |    text || '  Cafe' || chr(769) || '   ÜBER   ')), '\s+', ' ', 'g')) AS text_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_pack_sequences" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toksSql) AS BIGINT) AS n_toks FROM documents),
         |sh AS (SELECT doc_id, n_toks,
         |         CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INT) AS shard
         |       FROM t),
         |pos AS (SELECT doc_id, shard, n_toks,
         |          CAST(row_number() OVER w AS BIGINT) AS shard_pos,
         |          CAST(COALESCE(SUM(n_toks) OVER (PARTITION BY shard
         |            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
         |            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_off
         |        FROM sh WINDOW w AS (PARTITION BY shard ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id))
         |SELECT doc_id, shard, shard_pos, n_toks, start_off,
         |  start_off // 512 AS seq_id, start_off % 512 AS seq_off
         |FROM pos ORDER BY doc_id""".stripMargin,
    "x_pii_redact" ->
      """WITH s AS (SELECT c_custkey,
        |  c_name || '@corp.example tel 42-555-'
        |    || lpad(CAST(c_custkey % 1000 AS VARCHAR), 3, '0') || '-'
        |    || lpad(CAST(c_custkey % 10000 AS VARCHAR), 4, '0')
        |    || ' host 10.0.' || CAST(c_custkey % 23 AS VARCHAR) || '.7' AS contact
        |  FROM customer)
        |SELECT c_custkey, contact,
        |  regexp_replace(regexp_replace(regexp_replace(contact,
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
        |    '\b[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g'),
        |    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '[IP]', 'g') AS redacted
        |FROM s ORDER BY c_custkey""".stripMargin,
    "x_sample_shard" ->
      """SELECT doc_id, shard, CAST(rn AS BIGINT) AS shard_pos FROM (
        |  SELECT doc_id,
        |    CAST(CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8 AS INT) AS shard,
        |    row_number() OVER (
        |      PARTITION BY CAST(CONCAT('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 8
        |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
        |  FROM documents) ORDER BY doc_id""".stripMargin,
    "x_frame_sample" ->
      """WITH m AS (SELECT doc_id, text, length(text) * 40 AS duration_ms FROM documents),
        |f AS (SELECT doc_id, text,
        |        unnest(range(0, (duration_ms - 1) // 1000 + 1)) AS frame_idx
        |      FROM m)
        |SELECT doc_id, frame_idx, frame_idx * 1000 AS ts_ms,
        |  substr(text, CAST((frame_idx * 1000) // 40 AS BIGINT) + 1, 32) AS frame
        |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "x_multimodal" ->
      """SELECT doc_id,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
        |  md5(text) AS checksum,
        |  CAST(n_chars % 64 + 16 AS INT) AS width,
        |  CAST(doc_id % 32 + 16 AS INT) AS height,
        |  CAST(list_sum(list_transform(range(1, octet_length(encode(text)) + 1),
        |         i -> CAST(('0x' || substr(to_hex(encode(text)), 2*i-1, 2)) AS INT))) AS DOUBLE)
        |    / octet_length(encode(text)) AS mean_byte
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_wav_pcm" ->
      """WITH s AS (SELECT d.doc_id,
        |    (d.doc_id * 31 + i.i * 17) % 65536 AS u
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(1, 16))
        |    AS i) i),
        |v AS (SELECT doc_id,
        |    CASE WHEN u >= 32768 THEN u - 65536 ELSE u END AS sv FROM s)
        |SELECT doc_id, COUNT(*) AS n_samples,
        |  CAST(MAX(abs(sv)) AS BIGINT) AS peak,
        |  CAST(SUM(abs(sv)) AS BIGINT) AS sum_abs,
        |  CAST(SUM(sv * sv) AS BIGINT) AS sum_sq
        |FROM v GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_flac_pcm" ->
      """WITH s AS (SELECT d.doc_id,
        |    (d.doc_id * 31 + i.i * 17) % 64 - 32 AS sv
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(1, 16))
        |    AS i) i)
        |SELECT doc_id, COUNT(*) AS n_samples,
        |  CAST(MAX(abs(sv)) AS BIGINT) AS peak,
        |  CAST(SUM(abs(sv)) AS BIGINT) AS sum_abs,
        |  CAST(SUM(sv * sv) AS BIGINT) AS sum_sq
        |FROM s GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_encoding_sniff" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 5 AS INT)
        |    WHEN 0 THEN 'utf-8-bom' WHEN 1 THEN 'utf-16le'
        |    WHEN 2 THEN 'utf-16be' WHEN 3 THEN 'utf-8'
        |    ELSE 'windows-1252' END AS encoding,
        |  'enc caf' || chr(CAST(224 + doc_id % 16 AS INT)) || ' ' || doc_id
        |    AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_csv_sniff" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN ',' WHEN 1 THEN ';'
        |    WHEN 2 THEN chr(9) ELSE '|' END AS delimiter,
        |  CAST(3 AS BIGINT) AS n_cols,
        |  doc_id % 2 = 0 AS has_header
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_archive_ingest" ->
      """WITH s AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
        |k AS (SELECT s.doc_id, i.i
        |  FROM s, LATERAL (SELECT unnest(generate_series(0, 2)) AS i) i)
        |SELECT doc_id,
        |  CAST(CASE WHEN i = 0 THEN 1 ELSE 0 END AS BIGINT) AS batch_id,
        |  CAST(CASE WHEN i = 0 THEN 0 ELSE i END AS BIGINT) AS entry_idx,
        |  CASE WHEN i = 2 THEN 'f1.txt' ELSE 'f0.txt' END AS name,
        |  rpad('doc ' || doc_id || ' k' || i, 16, '.') AS text,
        |  TRUE AS utf8_valid
        |FROM k ORDER BY doc_id, batch_id, entry_idx""".stripMargin,
    "x_html_tables" ->
      """WITH c AS (SELECT d.doc_id, k.k
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(0, 6))
        |    AS k) k)
        |SELECT doc_id,
        |  CAST(CASE WHEN k < 6 THEN 0 ELSE 1 END AS BIGINT) AS table_idx,
        |  CAST(CASE WHEN k < 6 THEN k // 2 ELSE 0 END AS BIGINT) AS row_idx,
        |  CAST(CASE WHEN k < 6 THEN k % 2 ELSE 0 END AS BIGINT) AS col_idx,
        |  CASE k
        |    WHEN 0 THEN 'k' WHEN 1 THEN 'v'
        |    WHEN 2 THEN 'id' WHEN 3 THEN CAST(doc_id AS VARCHAR)
        |    WHEN 4 THEN 'twice' WHEN 5 THEN CAST(doc_id * 2 AS VARCHAR)
        |    ELSE 'doc ' || doc_id END AS cell
        |FROM c ORDER BY doc_id, table_idx, row_idx, col_idx""".stripMargin,
    "x_json_repair" ->
      """SELECT doc_id,
        |  '{"name": "doc ' || doc_id || '", "ok": true, ' ||
        |  '"tags": ["a", "b"], ' || chr(10) || ' "n": ' || doc_id ||
        |  ', "inf": null}' AS repaired,
        |  'doc ' || doc_id AS name,
        |  CAST(doc_id AS VARCHAR) AS n
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_webp_meta" ->
      """SELECT doc_id,
        |  CAST(doc_id % 500 + 1 AS BIGINT) AS width,
        |  CAST(doc_id % 300 + 1 AS BIGINT) AS height,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS BIGINT)
        |    AS lossless,
        |  CAST(0 AS BIGINT) AS extended
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_tiff_meta" ->
      """SELECT doc_id,
        |  CAST(doc_id % 2000 + 1 AS BIGINT) AS width,
        |  CAST(doc_id % 1200 + 1 AS BIGINT) AS height,
        |  CAST(3 AS BIGINT) AS samples,
        |  CAST(1 AS BIGINT) AS compression
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_ogg_meta" ->
      """SELECT doc_id,
        |  CAST(2 AS BIGINT) AS codec,
        |  CAST(doc_id % 7 + 1 AS BIGINT) AS channels,
        |  CAST(48000 AS BIGINT) AS rate,
        |  CAST(doc_id * 960 + 960 AS BIGINT) AS granule
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_zip_entries" ->
      """WITH e AS (SELECT d.doc_id, k.k
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(0, 1))
        |    AS k) k),
        |c AS (SELECT doc_id, k,
        |    string_agg(chr(CAST(97 + (doc_id*7 + k*13 + j.j*3) % 26
        |      AS INT)), '' ORDER BY j.j) AS text
        |  FROM e, LATERAL (SELECT unnest(generate_series(0, 15)) AS j) j
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(k AS BIGINT) AS entry_idx,
        |  'f' || k || '.txt' AS name, CAST(0 AS BIGINT) AS method,
        |  CAST(16 AS BIGINT) AS usize, text
        |FROM c ORDER BY doc_id, entry_idx""".stripMargin,
    "x_tar_entries" ->
      """WITH e AS (SELECT d.doc_id, k.k
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(0, 2))
        |    AS k) k),
        |c AS (SELECT doc_id, k,
        |    CASE WHEN k = 0 THEN NULL ELSE
        |      string_agg(chr(CAST(97 + (doc_id*7 + k*13 + j.j*3) % 26
        |        AS INT)), '' ORDER BY j.j) END AS text
        |  FROM e, LATERAL (SELECT unnest(generate_series(0, 15)) AS j) j
        |  GROUP BY 1, 2)
        |SELECT doc_id, CAST(k AS BIGINT) AS entry_idx,
        |  CASE WHEN k = 0 THEN 'd/' ELSE 'f' || (k - 1) || '.txt' END AS name,
        |  CASE WHEN k = 0 THEN '5' ELSE '0' END AS typeflag,
        |  CAST(CASE WHEN k = 0 THEN 0 ELSE 16 END AS BIGINT) AS size,
        |  text
        |FROM c ORDER BY doc_id, entry_idx""".stripMargin,
    "x_utf8_scan" ->
      """SELECT doc_id,
        |  (doc_id % 3 = 0 AND doc_id % 2 = 0) AS is_valid,
        |  CAST(doc_id % 3 + doc_id % 2 AS BIGINT) AS n_invalid,
        |  'doc ' || doc_id || ' caf' || repeat('�', CAST(doc_id % 3 AS INT))
        |    || 'é' || CASE WHEN doc_id % 2 = 1 THEN '�' ELSE '' END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_mojibake" ->
      """SELECT doc_id,
        |  'caf' || chr(CAST(224 + doc_id % 16 AS INT)) || ' id ' || doc_id
        |    AS repaired,
        |  'na' || chr(239) || 've ' || doc_id AS untouched
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_mime_parts" ->
      """WITH p AS (SELECT d.doc_id, k.k
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(0, 1))
        |    AS k) k)
        |SELECT doc_id, CAST(k AS BIGINT) AS part_idx,
        |  CASE k WHEN 0 THEN 'text/plain' ELSE 'text/html' END
        |    AS content_type,
        |  'utf-8' AS charset,
        |  CASE k WHEN 0 THEN NULL
        |    ELSE 'doc' || doc_id || '.html' END AS filename,
        |  CASE k WHEN 0 THEN
        |      'caf' || chr(CAST(224 + doc_id % 16 AS INT))
        |        || ' body ' || doc_id
        |    ELSE '<p>doc ' || doc_id || '</p>' END AS text
        |FROM p ORDER BY doc_id, part_idx""".stripMargin,
    "x_email_headers" ->
      """SELECT doc_id,
        |  'alice@example.com' AS from_addr,
        |  'bob@example.com' AS to_addr,
        |  'Re: caf' || chr(CAST(224 + doc_id % 16 AS INT)) || ' ' || doc_id
        |    AS subject,
        |  '<m' || doc_id || '@example>' AS message_id
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_mbox" ->
      """WITH m AS (SELECT d.doc_id, k.k
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(0, 1))
        |    AS k) k)
        |SELECT doc_id, CAST(k AS BIGINT) AS msg_idx,
        |  'm' || k || ' doc ' || doc_id AS subject,
        |  'a' || k || '@example.com' AS from_addr,
        |  TRUE AS unescaped
        |FROM m ORDER BY doc_id, msg_idx""".stripMargin,
    "x_markdown_text" ->
      """SELECT doc_id,
        |  'Title ' || doc_id || chr(10) || chr(10) ||
        |  'Intro bold' || doc_id || ' and link text ' || doc_id ||
        |  ' plus code' || doc_id || '.' || chr(10) || chr(10) ||
        |  'item one' || chr(10) || 'item two ' || doc_id ||
        |  chr(10) || chr(10) || 'quoted line ' || doc_id AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_sentences" ->
      """WITH k AS (SELECT d.doc_id, i.i
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(0, 3))
        |    AS i) i)
        |SELECT doc_id, CAST(i AS BIGINT) AS sent_idx,
        |  CASE i
        |    WHEN 0 THEN 'Dr. Smith paid 3.14 on Jan 5.'
        |    WHEN 1 THEN 'He left early!'
        |    WHEN 2 THEN 'Was No. ' || doc_id || ' next?'
        |    ELSE 'Yes.' END AS sentence
        |FROM k ORDER BY doc_id, sent_idx""".stripMargin,
    "x_gif_pixels" ->
      """WITH m AS (SELECT doc_id,
        |    (doc_id % 5 + 2) * (doc_id % 3 + 2) AS n FROM documents),
        |p AS (SELECT doc_id, (doc_id * 7 + i.i * 13) % 128 AS px
        |  FROM m, LATERAL (SELECT unnest(generate_series(0, n - 1))
        |    AS i) i)
        |SELECT doc_id, COUNT(*) AS n_px,
        |  CAST(SUM(px * 3 % 256) AS BIGINT) AS sum_r,
        |  CAST(SUM((px * 5 + 1) % 256) AS BIGINT) AS sum_g,
        |  CAST(SUM((px * 7 + 2) % 256) AS BIGINT) AS sum_b
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_url_canonical" ->
      """WITH u AS (SELECT doc_id,
        |  (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS' ELSE 'http' END) || '://' ||
        |  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' ELSE '' END) ||
        |  'Site' || (doc_id % 50) ||
        |  (CASE doc_id % 4 WHEN 0 THEN '.com' WHEN 1 THEN '.co.uk'
        |        WHEN 2 THEN '.org' ELSE '.example.net' END) ||
        |  (CASE WHEN doc_id % 5 = 0 THEN
        |     CASE WHEN doc_id % 2 = 0 THEN ':443' ELSE ':80' END
        |   ELSE '' END) ||
        |  '/a' || (doc_id % 7) ||
        |  (CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) ||
        |  '?utm_source=x&b=' || (doc_id % 9) || '&a=' || (doc_id % 3) ||
        |  '#sec' || (doc_id % 3) AS url
        |  FROM documents),
        |c AS (SELECT doc_id,
        |  lower(regexp_extract(url, '^([a-zA-Z][a-zA-Z0-9+.-]*)://', 1)) AS scheme,
        |  regexp_replace(lower(regexp_extract(url,
        |    '^[a-zA-Z][a-zA-Z0-9+.-]*://([^/?#]*)', 1)), '^www\.', '') AS nowww,
        |  regexp_replace(regexp_extract(url,
        |    '^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)', 1), '/+$', '') AS path,
        |  array_to_string(list_sort(list_filter(
        |    string_split(regexp_extract(url, '^[^#?]*\?([^#]*)', 1), '&'),
        |    p -> p <> '' AND NOT starts_with(p, 'utm_'))), '&') AS q
        |  FROM u),
        |h AS (SELECT doc_id,
        |  CASE WHEN scheme = 'http' THEN regexp_replace(nowww, ':80$', '')
        |       WHEN scheme = 'https' THEN regexp_replace(nowww, ':443$', '')
        |       ELSE nowww END AS host, path, q FROM c),
        |canon AS (SELECT doc_id, host,
        |  CASE WHEN host <> '' THEN host || path ||
        |    CASE WHEN q <> '' THEN '?' || q ELSE '' END END AS canon FROM h),
        |dom AS (SELECT doc_id, canon,
        |  string_split(regexp_replace(host, ':[0-9]+$', ''), '.') AS ls
        |  FROM canon)
        |SELECT doc_id, canon,
        |  CASE WHEN len(ls) >= 3 AND
        |         ls[-2] IN ('co','com','net','org','gov','ac','edu')
        |       THEN ls[-3] || '.' || ls[-2] || '.' || ls[-1]
        |       WHEN len(ls) >= 2 THEN ls[-2] || '.' || ls[-1] END AS domain
        |FROM dom ORDER BY doc_id""".stripMargin,
    "x_html_text" ->
      ("""WITH h AS (SELECT doc_id,
        |  '<html><head><title>t</title><style>p { color: #111; }</style>' ||
        |  '<script type="text/javascript">var x = 1 < 2 && v > 0;</script>' ||
        |  '</head><body><h1 class="hd">' || source ||
        |  '</h1><!-- nav --><p>' ||
        |  replace(replace(replace(text, '&', '&amp;'), '<', '&lt;'), '>', '&gt;') ||
        |  ' &amp; &lt;tag&gt; &quot;q&quot;&nbsp;end</p></body></html>' AS html
        |  FROM documents)
        |SELECT doc_id, trim(regexp_replace(
        |  replace(replace(replace(replace(replace(replace(
        |    regexp_replace(
        |      regexp_replace(
        |        regexp_replace(
        |          regexp_replace(html,
        |            '(?is)<script\b[^>]*>.*?</script\s*>', ' ', 'g'),
        |          '(?is)<style\b[^>]*>.*?</style\s*>', ' ', 'g'),
        |        '(?s)<!--.*?-->', ' ', 'g'),
        |      '(?s)<[^>]*>', ' ', 'g'),
        |    '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
        |    '&apos;', $Q), '&nbsp;', ' '), '&amp;', '&'),
        |  '\s+', ' ', 'g')) AS txt
        |FROM h ORDER BY doc_id""").stripMargin
        .replace("$Q", "''''"),
    "x_image_neardup" ->
      """WITH px AS (
        |  SELECT d.doc_id, x.x, y.y,
        |    ((d.doc_id // 2)*7 + x.x*13 + y.y*29) % 200 + 20 AS r,
        |    ((d.doc_id // 2)*11 + x.x*3 + y.y*17) % 200 + 20 AS g,
        |    ((d.doc_id // 2)*5 + x.x*19 + y.y*7) % 200 + 20 + d.doc_id % 2 AS b
        |  FROM documents d,
        |    LATERAL (SELECT unnest(generate_series(0, 8)) AS x) x,
        |    LATERAL (SELECT unnest(generate_series(0, 7)) AS y) y),
        |lum AS (SELECT doc_id, x, y,
        |    (299*r + 587*g + 114*b) // 1000 AS l FROM px),
        |bits AS (
        |  SELECT a.doc_id, a.x AS i, a.y AS j,
        |    CASE WHEN b.l > a.l THEN 1 ELSE 0 END AS bv
        |  FROM lum a JOIN lum b
        |    ON a.doc_id = b.doc_id AND b.y = a.y AND b.x = a.x + 1
        |  WHERE a.x < 8)
        |SELECT a.doc_id AS d1, b.doc_id AS d2,
        |  CAST(SUM(CASE WHEN a.bv <> b.bv THEN 1 ELSE 0 END) AS BIGINT)
        |    AS hamming
        |FROM bits a JOIN bits b
        |  ON a.i = b.i AND a.j = b.j AND a.doc_id < b.doc_id
        |GROUP BY 1, 2 HAVING hamming <= 3 ORDER BY 1, 2""".stripMargin,
    "x_wav_g711" ->
      """WITH raw AS (SELECT d.doc_id,
        |    (d.doc_id * 13 + i.i * 29) % 256 AS u
        |  FROM documents d, LATERAL (SELECT unnest(generate_series(0, 23))
        |    AS i) i),
        |dec AS (SELECT doc_id,
        |    CASE WHEN doc_id % 2 = 0 THEN
        |      -- mu-law: invert, bias-expand, sign via segment arithmetic
        |      CASE WHEN (255 - u) >= 128
        |        THEN 132 - (((255 - u) % 16) * 8 + 132)
        |             * CAST(pow(2, ((255 - u) // 16) % 8) AS BIGINT)
        |        ELSE (((255 - u) % 16) * 8 + 132)
        |             * CAST(pow(2, ((255 - u) // 16) % 8) AS BIGINT) - 132
        |      END
        |    ELSE
        |      -- A-law: xor 0x55, segment 0/1 special cases, MSB = positive
        |      CASE WHEN xor(u, 85) >= 128
        |        THEN CASE ((xor(u, 85) // 16) % 8)
        |          WHEN 0 THEN (xor(u, 85) % 16) * 16 + 8
        |          WHEN 1 THEN (xor(u, 85) % 16) * 16 + 264
        |          ELSE ((xor(u, 85) % 16) * 16 + 264)
        |            * CAST(pow(2, ((xor(u, 85) // 16) % 8) - 1) AS BIGINT)
        |        END
        |        ELSE -(CASE ((xor(u, 85) // 16) % 8)
        |          WHEN 0 THEN (xor(u, 85) % 16) * 16 + 8
        |          WHEN 1 THEN (xor(u, 85) % 16) * 16 + 264
        |          ELSE ((xor(u, 85) % 16) * 16 + 264)
        |            * CAST(pow(2, ((xor(u, 85) // 16) % 8) - 1) AS BIGINT)
        |        END)
        |      END
        |    END AS s
        |  FROM raw)
        |SELECT doc_id, COUNT(*) AS n_samples,
        |  CAST(MAX(abs(s)) AS BIGINT) AS peak,
        |  CAST(SUM(abs(s)) AS BIGINT) AS sum_abs,
        |  CAST(SUM(s * s) AS BIGINT) AS sum_sq
        |FROM dec GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_jpeg_pixels" ->
      """WITH m AS (SELECT doc_id,
        |    (doc_id % 3 + 1) * (doc_id % 2 + 1) AS nb FROM documents),
        |p AS (SELECT doc_id, nb,
        |    64 * (128 + (doc_id * 5 + b.b * 7) % 21 - 10) AS bsum
        |  FROM m, LATERAL (SELECT unnest(generate_series(0, nb - 1))
        |    AS b) b)
        |SELECT doc_id, CAST(64 * nb AS BIGINT) AS n_px,
        |  CAST(SUM(bsum) AS BIGINT) AS sum_r,
        |  CAST(SUM(bsum) AS BIGINT) AS sum_g,
        |  CAST(SUM(bsum) AS BIGINT) AS sum_b
        |FROM p GROUP BY 1, nb ORDER BY 1""".stripMargin,
    "x_robots_filter" ->
      """WITH p AS (SELECT doc_id, doc_id % 2 AS par,
        |    (doc_id // 2) % 6 AS q FROM documents)
        |SELECT doc_id,
        |  'site' || (doc_id % 40) || '.example' AS domain,
        |  ['/index', '/private/page1', '/private/ok', '/archive/2020',
        |   '/public/data', '/else'][CAST(q AS INT) + 1] AS path,
        |  CASE WHEN par = 0 THEN q IN (0, 2, 4, 5) ELSE q = 4 END AS allowed,
        |  CASE WHEN par = 0 THEN
        |    CASE CAST(q AS INT) WHEN 1 THEN '/private*'
        |         WHEN 2 THEN '/private/ok$' WHEN 3 THEN '/archive' END
        |  ELSE CASE WHEN q = 4 THEN '/public*' ELSE '/' END
        |  END AS matched_pattern,
        |  CASE WHEN par = 0 THEN
        |    CASE CAST(q AS INT) WHEN 1 THEN 'disallow'
        |         WHEN 2 THEN 'allow' WHEN 3 THEN 'disallow' END
        |  ELSE CASE WHEN q = 4 THEN 'allow' ELSE 'disallow' END
        |  END AS matched_rule
        |FROM p ORDER BY doc_id""".stripMargin,
    "x_sitemap_entries" ->
      """WITH u AS (SELECT doc_id, j
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    CAST(doc_id % 3 + 1 AS INT))) AS j) j
        |  WHERE doc_id % 2 = 0),
        |s AS (SELECT doc_id, j
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1, 2))
        |    AS j) j
        |  WHERE doc_id % 2 = 1),
        |e AS (
        |  SELECT doc_id, CAST(j - 1 AS BIGINT) AS seq,
        |    'url' AS entry_type,
        |    'https://site' || (doc_id % 40) || '.example/page' || j AS loc,
        |    CASE WHEN j % 2 = 1 THEN
        |      '2026-0' || ((doc_id + j) % 9 + 1) || '-15' END AS lastmod,
        |    CASE WHEN j % 2 = 1 THEN ['daily', 'weekly', 'monthly']
        |      [CAST((doc_id + j) % 3 AS INT) + 1] END AS changefreq,
        |    CASE WHEN j % 2 = 0 THEN
        |      CAST('0.' || ((doc_id + j) % 10) AS DOUBLE) END AS priority
        |  FROM u
        |  UNION ALL
        |  SELECT doc_id, CAST(j - 1 AS BIGINT), 'sitemap',
        |    'https://site' || (doc_id % 40) || '.example/sm' || j
        |      || '.xml',
        |    CASE WHEN j = 1 THEN '2026-01-' ||
        |      lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0') END,
        |    NULL, NULL
        |  FROM s)
        |SELECT doc_id, seq, entry_type, loc, lastmod, changefreq,
        |  priority
        |FROM e ORDER BY doc_id, seq""".stripMargin,
    "x_crawl_frontier" ->
      """WITH u AS (SELECT doc_id, j
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    CAST(doc_id % 3 + 1 AS INT))) AS j) j),
        |p AS (SELECT doc_id, CAST(j - 1 AS BIGINT) AS seq, j,
        |    doc_id % 2 AS par,
        |    'site' || (doc_id % 40) || '.example' AS domain,
        |    '/page' || j ||
        |      CASE WHEN j % 2 = 0 THEN '?ref=' || j ELSE '' END AS path,
        |    CAST('0.' || ((doc_id + j) % 10) AS DOUBLE) AS priority
        |  FROM u
        |  UNION ALL
        |  SELECT doc_id, CAST(0 AS BIGINT), 0, 1,
        |    'site' || (doc_id % 40) || '.example', '/news1',
        |    CAST(NULL AS DOUBLE)
        |  FROM documents WHERE doc_id % 2 = 1)
        |SELECT doc_id, seq, domain || path AS canon, domain, path,
        |  priority,
        |  CASE WHEN par = 0 THEN j <> 3
        |       WHEN j = 0 THEN FALSE ELSE j <> 2 END AS allowed,
        |  CASE WHEN par = 0 THEN CASE WHEN j = 3 THEN '/page3' END
        |       ELSE CASE WHEN j = 1 THEN '/page1$'
        |                 WHEN j = 3 THEN '/page3' ELSE '/' END
        |  END AS matched_pattern,
        |  CASE WHEN par = 0 THEN CASE WHEN j = 3 THEN 'disallow' END
        |       WHEN j IN (0, 2) THEN 'disallow' ELSE 'allow'
        |  END AS matched_rule
        |FROM p ORDER BY doc_id, canon""".stripMargin,
    "x_id3_tags" ->
      """WITH f AS (
        |  SELECT doc_id, 'TALB' AS frame_id,
        |    'Album ' || (doc_id % 10) AS text FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'TIT2', 'Track ' || (doc_id % 1000) FROM documents
        |  UNION ALL
        |  SELECT doc_id, 'TPE1', 'Artist ' || (doc_id % 50) FROM documents)
        |SELECT doc_id, frame_id, text FROM f
        |ORDER BY doc_id, frame_id""".stripMargin,
    "x_subtitle_cues" ->
      """WITH c AS (SELECT doc_id, j
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    doc_id % 4 + 1)) AS j))
        |SELECT doc_id,
        |  CAST(CASE WHEN doc_id % 2 = 0 THEN j - 1 ELSE j END
        |    AS BIGINT) AS cue_idx,
        |  CAST(((doc_id + j) % 60) * 60000 + ((doc_id * 3 + j * 7) % 58)
        |    * 1000 + (doc_id * 7 + j * 13) % 800 AS BIGINT) AS start_ms,
        |  CAST(((doc_id + j) % 60) * 60000 + ((doc_id * 3 + j * 7) % 58 + 1)
        |    * 1000 + (doc_id * 7 + j * 13) % 800 + 200 AS BIGINT) AS end_ms,
        |  'cue ' || j || ' of doc ' || doc_id ||
        |    CASE WHEN j % 2 = 0 THEN ' line two' ELSE '' END AS text
        |FROM c ORDER BY doc_id, cue_idx""".stripMargin,
    "x_webvtt_cues" ->
      """WITH c AS (SELECT doc_id, j
        |  FROM documents, (VALUES (1), (2)) t(j))
        |SELECT doc_id, CAST(j + 1 AS BIGINT) AS cue_idx,
        |  CAST(((doc_id + j) % 60) * 60000 + ((doc_id * 3 + j * 7) % 58)
        |    * 1000 + (doc_id * 7 + j * 13) % 800 AS BIGINT) AS start_ms,
        |  CAST(((doc_id + j) % 60) * 60000 + ((doc_id * 3 + j * 7) % 58 + 1)
        |    * 1000 + (doc_id * 7 + j * 13) % 800 + 200 AS BIGINT) AS end_ms,
        |  'vtt cue ' || j || ' of doc ' || doc_id ||
        |    CASE WHEN j = 2 THEN ' line two' ELSE '' END AS text
        |FROM c ORDER BY doc_id, cue_idx""".stripMargin,
    "x_exif_meta" ->
      """SELECT doc_id,
        |  CAST(doc_id % 8 + 1 AS INT) AS orientation,
        |  'GraftCam' AS make,
        |  'M-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') AS model,
        |  '2024:03:1' || (doc_id % 10) || ' 12:34:5' || (doc_id % 6)
        |    AS datetime,
        |  '2020:06:2' || (doc_id % 10) || ' 08:00:0' || (doc_id % 7)
        |    AS datetime_original
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_jpeg_progressive" ->
      """WITH m AS (SELECT doc_id,
        |    (doc_id % 3 + 1) * (doc_id % 2 + 1) AS nb FROM documents),
        |p AS (SELECT doc_id, nb,
        |    64 * (128 + (doc_id * 5 + b.b * 7) % 21) AS bsum
        |  FROM m, LATERAL (SELECT unnest(generate_series(0, nb - 1))
        |    AS b) b)
        |SELECT doc_id, CAST(64 * nb AS BIGINT) AS n_px,
        |  CAST(SUM(bsum) AS BIGINT) AS sum_r,
        |  CAST(SUM(bsum) AS BIGINT) AS sum_g,
        |  CAST(SUM(bsum) AS BIGINT) AS sum_b
        |FROM p GROUP BY 1, nb ORDER BY 1""".stripMargin,
    "x_jpeg_color" ->
      """WITH m AS (SELECT doc_id,
        |    (doc_id % 3 + 1) * (doc_id % 2 + 1) AS nb FROM documents),
        |ycc AS (SELECT doc_id, nb,
        |    128 + (doc_id * 5 + b.b * 7) % 21 - 10 AS y,
        |    128 + (doc_id * 5 + b.b * 7 + 31) % 21 - 10 AS cb,
        |    128 + (doc_id * 5 + b.b * 7 + 62) % 21 - 10 AS cr
        |  FROM m, LATERAL (SELECT unnest(generate_series(0, nb - 1))
        |    AS b) b),
        |rgb AS (SELECT doc_id, nb,
        |    (y * 65536 + 91881 * (cr - 128) + 32768) // 65536 AS r,
        |    (y * 65536 - 22554 * (cb - 128) - 46802 * (cr - 128) + 32768)
        |      // 65536 AS g,
        |    (y * 65536 + 116130 * (cb - 128) + 32768) // 65536 AS bl
        |  FROM ycc)
        |SELECT doc_id, CAST(64 * nb AS BIGINT) AS n_px,
        |  CAST(64 * SUM(r) AS BIGINT) AS sum_r,
        |  CAST(64 * SUM(g) AS BIGINT) AS sum_g,
        |  CAST(64 * SUM(bl) AS BIGINT) AS sum_b
        |FROM rgb GROUP BY 1, nb ORDER BY 1""".stripMargin,
    "x_png_pixels" ->
      """WITH m AS (SELECT doc_id,
        |    (doc_id % 6 + 2) * (doc_id % 4 + 2) AS n FROM documents),
        |p AS (SELECT doc_id, (doc_id * 11 + i.i * 7) % 256 AS px
        |  FROM m, LATERAL (SELECT unnest(generate_series(0, n - 1))
        |    AS i) i)
        |SELECT doc_id, COUNT(*) AS n_px,
        |  CAST(SUM(px) AS BIGINT) AS sum_r,
        |  CAST(SUM(px) AS BIGINT) AS sum_g,
        |  CAST(SUM(px) AS BIGINT) AS sum_b
        |FROM p GROUP BY 1 ORDER BY 1""".stripMargin,
    // the fully composed per-site web-curation oracle: URL canon keys
    // regenerated arithmetically (the regex chain is separately gated
    // by x_url_canonical), extracted tokens = banner + raw-text tokens
    // (htmlToText is separately gated by x_html_text and the esc/
    // decode round-trip is exact), then the x_boilerplate and
    // x_dedup_ngram CTE idioms composed per registrable domain
    "x_web_pipeline" ->
      s"""WITH corpus AS (
         |  SELECT doc_id * 4 AS doc_id, text, doc_id % 40 AS pid, 0 AS echo
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id * 4 + 1, text || ' repost notice', doc_id % 40, 1
         |  FROM documents
         |  UNION ALL
         |  SELECT doc_id * 4 + 2, text || ' syndicated copy', doc_id % 40, 2
         |  FROM documents),
         |meta0 AS (SELECT doc_id, text, echo,
         |    CASE WHEN echo = 2 THEN (pid + 1) % 40 ELSE pid END AS pid
         |  FROM corpus),
         |meta AS (SELECT doc_id, text, pid, echo,
         |    'site' || (pid % 10) ||
         |      (CASE CAST(pid % 4 AS INT) WHEN 0 THEN '.com'
         |            WHEN 1 THEN '.co.uk' WHEN 2 THEN '.org'
         |            ELSE '.example.net' END) AS host
         |  FROM meta0),
         |pg AS (SELECT doc_id, pid, echo, host,
         |    host || (CASE WHEN echo = 1 THEN '/alt'
         |                  WHEN echo = 2 THEN '/syn' ELSE '/p' END) ||
         |      (pid % 7) || '?a=' || (pid % 3) || '&b=' || (pid % 9) AS canon,
         |    CASE WHEN pid % 4 = 3 THEN 'example.net' ELSE host END AS domain,
         |    list_concat(['portal', 'portal', 'site' || (pid % 10),
         |                 'home', 'login'], $toksSql) AS ts
         |  FROM meta),
         |s1 AS (SELECT *, min(doc_id) OVER (PARTITION BY canon) AS keep FROM pg),
         |surv AS (SELECT * FROM s1 WHERE doc_id = keep),
         |l AS (SELECT doc_id, domain, j AS pi,
         |        array_to_string(ts[j*3+1:least(j*3+3, len(ts))], ' ') AS line
         |      FROM surv, LATERAL (SELECT unnest(generate_series(0,
         |        CAST(ceil(len(ts) / 3.0) AS BIGINT) - 1)) AS j)),
         |nd AS (SELECT domain, count(DISTINCT doc_id) AS n_docs
         |       FROM surv GROUP BY 1),
         |dfq AS (SELECT domain, line, count(DISTINCT doc_id) AS df
         |        FROM l GROUP BY 1, 2),
         |bp AS (SELECT dfq.domain, dfq.line FROM dfq JOIN nd USING (domain)
         |       WHERE dfq.df * 1000000 >= 500000 * nd.n_docs),
         |k AS (SELECT l.doc_id, l.pi, l.line,
         |        CASE WHEN bp.line IS NULL THEN 1 ELSE 0 END AS kp
         |      FROM l LEFT JOIN bp ON l.domain = bp.domain AND l.line = bp.line),
         |cl AS (SELECT doc_id,
         |        coalesce(string_agg(CASE WHEN kp = 1 THEN line END,
         |          ' ' ORDER BY pi), '') AS kept_text,
         |        CAST(count(CASE WHEN kp = 1 THEN 1 END) AS BIGINT) AS kept_ct,
         |        CAST(count(CASE WHEN kp = 0 THEN 1 END) AS BIGINT) AS removed_ct
         |      FROM k GROUP BY 1),
         |t2 AS (SELECT doc_id, list_filter(str_split_regex(lower(kept_text),
         |        '[^a-z0-9]+'), t -> t <> '') AS ts FROM cl),
         |g2 AS (SELECT DISTINCT doc_id, array_to_string(ts[i:i+2], ' ') AS g
         |       FROM t2, LATERAL (SELECT unnest(generate_series(1, len(ts)-2)) AS i)
         |       WHERE len(ts) >= 3),
         |sz AS (SELECT doc_id, count(*) AS sz FROM g2 GROUP BY 1),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS n
         |          FROM g2 a JOIN g2 b ON a.g = b.g AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |rm AS (SELECT DISTINCT d2 AS doc_id
         |       FROM inter JOIN sz z1 ON d1 = z1.doc_id
         |       JOIN sz z2 ON d2 = z2.doc_id
         |       JOIN surv m1 ON d1 = m1.doc_id JOIN surv m2 ON d2 = m2.doc_id
         |       WHERE m1.domain = m2.domain
         |         AND n / (z1.sz + z2.sz - n) >= 0.8),
         |rmx AS (SELECT DISTINCT d2 AS doc_id
         |       FROM inter JOIN sz z1 ON d1 = z1.doc_id
         |       JOIN sz z2 ON d2 = z2.doc_id
         |       JOIN surv m1 ON d1 = m1.doc_id JOIN surv m2 ON d2 = m2.doc_id
         |       WHERE m1.domain <> m2.domain
         |         AND n / (z1.sz + z2.sz - n) >= 0.8
         |         AND d1 NOT IN (SELECT doc_id FROM rm)
         |         AND d2 NOT IN (SELECT doc_id FROM rm))
         |SELECT s1.doc_id,
         |  CASE WHEN s1.doc_id <> s1.keep THEN 'url_dup'
         |       WHEN rm.doc_id IS NOT NULL THEN 'near_dup'
         |       WHEN rmx.doc_id IS NOT NULL THEN 'xdomain_dup'
         |       ELSE 'kept' END AS stage,
         |  s1.domain, s1.canon, cl.kept_ct, cl.removed_ct
         |FROM s1 LEFT JOIN cl ON s1.doc_id = cl.doc_id
         |LEFT JOIN rm ON s1.doc_id = rm.doc_id
         |LEFT JOIN rmx ON s1.doc_id = rmx.doc_id
         |ORDER BY s1.doc_id""".stripMargin,
    "x_warc_extract" ->
      """WITH r AS (SELECT doc_id, i
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    doc_id % 3 + 1)) AS i))
        |SELECT doc_id, CAST(i - 1 AS BIGINT) AS rec_idx,
        |  'http://w' || (doc_id % 50) || '.example/r' || i AS uri,
        |  'text/html' AS content_type,
        |  CAST(length('page ' || i || ' of doc ' || doc_id) AS BIGINT)
        |    AS content_len,
        |  'page ' || i || ' of doc ' || doc_id AS content
        |FROM r ORDER BY doc_id, rec_idx""".stripMargin,
    "x_link_extract" ->
      """WITH s AS (SELECT doc_id,
        |    'https://site' || (doc_id % 20) || '.example' AS origin
        |  FROM documents),
        |l AS (
        |  SELECT doc_id, 0 AS link_idx, 'https://other.example/abs' AS href,
        |    'https://other.example/abs' AS url FROM s
        |  UNION ALL SELECT doc_id, 1, '//peer.example/x',
        |    'https://peer.example/x' FROM s
        |  UNION ALL SELECT doc_id, 2, '/root/r' || (doc_id % 5),
        |    origin || '/root/r' || (doc_id % 5) FROM s
        |  UNION ALL SELECT doc_id, 3, 'img' || (doc_id % 4),
        |    origin || '/dir/sub/img' || (doc_id % 4) FROM s
        |  UNION ALL SELECT doc_id, 4, '../up/q', origin || '/dir/up/q' FROM s
        |  UNION ALL SELECT doc_id, 5, './same',
        |    origin || '/dir/sub/same' FROM s
        |  UNION ALL SELECT doc_id, 8, '/bare' || (doc_id % 2),
        |    origin || '/bare' || (doc_id % 2) FROM s)
        |SELECT doc_id, CAST(link_idx AS BIGINT) AS link_idx, href, url
        |FROM l ORDER BY doc_id, link_idx""".stripMargin,
    "x_link_rank" -> linkRankOracleSql,
    // the incremental face drives 3 real batches + compaction + replay
    // over the SAME fixture corpus; summed edge deltas merge to the
    // identical graph, so incremental == batch shares one oracle
    "x_host_rank_incr" -> linkRankOracleSql,
    "x_link_graph" ->
      """WITH d AS (SELECT doc_id,
        |    'site' || (doc_id % 20) || '.example' AS src FROM documents),
        |e AS (
        |  SELECT src, 'other.example' AS dst, 1 AS c FROM d
        |  UNION ALL SELECT src, 'peer.example', 1 FROM d
        |  UNION ALL SELECT src, src, 5 FROM d)
        |SELECT src, dst, CAST(SUM(c) AS BIGINT) AS n_links
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "x_content_extract" ->
      """WITH b AS (
        |  SELECT doc_id, CAST(0 AS BIGINT) AS block_idx,
        |    'Home Login Site ' || (doc_id % 10) AS text,
        |    CAST(length('Home Login Site ' || (doc_id % 10)) AS BIGINT)
        |      AS n_anchor_chars
        |  FROM documents
        |  UNION ALL
        |  SELECT doc_id, 1, 'Main paragraph of doc ' || doc_id ||
        |    ' with plenty of body characters to keep.', 0 FROM documents
        |  UNION ALL
        |  SELECT doc_id, 2, 'See related item ' || (doc_id % 7) ||
        |    ' plus surrounding commentary text.',
        |    length('related item ' || (doc_id % 7)) FROM documents
        |  UNION ALL
        |  SELECT doc_id, 3, 'short', 5 FROM documents
        |  UNION ALL
        |  SELECT doc_id, 4, 'tiny', 0 FROM documents
        |  UNION ALL
        |  SELECT doc_id, 5, 'About Terms', 11 FROM documents)
        |SELECT doc_id, block_idx, text,
        |  CAST(length(text) AS BIGINT) AS n_chars, n_anchor_chars,
        |  length(text) >= 25 AND n_anchor_chars * 100 <= length(text) * 40
        |    AS kept
        |FROM b ORDER BY doc_id, block_idx""".stripMargin,
    "x_robots_status" ->
      """WITH p AS (SELECT doc_id, doc_id % 30 AS site,
        |    'site' || (doc_id % 30) || '.example' AS domain,
        |    '/p' || (doc_id % 3) AS path FROM documents)
        |SELECT doc_id, domain, path,
        |  CASE CAST(site % 3 AS INT)
        |    WHEN 0 THEN doc_id % 3 <> 1
        |    WHEN 1 THEN TRUE
        |    ELSE FALSE END AS allowed,
        |  CASE WHEN site % 3 = 0 AND doc_id % 3 = 1 THEN '/p1'
        |  END AS matched_pattern,
        |  CASE WHEN site % 3 = 0 AND doc_id % 3 = 1 THEN 'disallow'
        |       WHEN site % 3 = 2 THEN 'unreachable'
        |  END AS matched_rule
        |FROM p ORDER BY doc_id""".stripMargin,
    "x_crawl_schedule" ->
      """WITH p AS (SELECT doc_id, doc_id % 30 AS site,
        |    'site' || (doc_id % 30) || '.example' AS domain,
        |    '/p' || (doc_id % 5) AS path,
        |    CAST(doc_id % 10 AS DOUBLE) / 10.0 AS priority
        |  FROM documents),
        |f AS (SELECT *,
        |    CASE WHEN site % 2 = 0 THEN 2000 ELSE 1500 END AS delay_ms
        |  FROM p WHERE NOT (site % 2 = 0 AND doc_id % 5 = 3)),
        |r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY domain
        |        ORDER BY priority DESC, path, doc_id) AS fetch_seq FROM f)
        |SELECT doc_id, domain, path, priority,
        |  CAST(delay_ms AS BIGINT) AS delay_ms,
        |  CAST(fetch_seq AS BIGINT) AS fetch_seq,
        |  CAST((fetch_seq - 1) * delay_ms AS BIGINT) AS fetch_offset_ms
        |FROM r ORDER BY doc_id""".stripMargin,
    "x_fetch_extract" ->
      """SELECT doc_id, CAST(0 AS BIGINT) AS rec_idx,
        |  'http://f' || (doc_id % 50) || '.example/p' || (doc_id % 9) AS uri,
        |  CAST(200 AS INT) AS status,
        |  'text/html' AS mime,
        |  CASE WHEN doc_id % 4 = 0 THEN 'utf-8'
        |       ELSE 'iso-8859-1' END AS charset,
        |  CASE WHEN doc_id % 4 = 0 THEN 'plain body ' || doc_id
        |       ELSE '<meta charset=ISO-8859-1>chunk one of ' || doc_id ||
        |            ' tail' || (doc_id % 7)
        |  END AS text
        |FROM documents WHERE doc_id % 4 IN (0, 2)
        |ORDER BY doc_id""".stripMargin,
    "x_http_response" ->
      """SELECT doc_id,
        |  CAST(CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 200 WHEN 1 THEN 404
        |       WHEN 2 THEN 200 ELSE 301 END AS INT) AS status,
        |  CASE WHEN doc_id % 4 = 1 THEN 'text/plain'
        |       ELSE 'text/html' END AS content_type,
        |  CASE WHEN doc_id % 4 = 0 THEN 'utf-8' END AS charset,
        |  CASE WHEN doc_id % 4 = 3 THEN 'gzip' END AS content_encoding,
        |  doc_id % 4 = 2 AS chunked,
        |  CASE CAST(doc_id % 4 AS INT)
        |    WHEN 0 THEN 'plain body ' || doc_id
        |    WHEN 1 THEN 'missing ' || doc_id
        |    WHEN 2 THEN '<meta charset=ISO-8859-1>chunk one of ' || doc_id ||
        |                ' tail' || (doc_id % 7)
        |    ELSE 'redirect target doc ' || doc_id END AS body
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_crawl_waves" ->
      """WITH seeds AS (SELECT doc_id FROM documents WHERE doc_id % 50 = 0),
        |m AS (SELECT min(doc_id) AS md FROM seeds)
        |SELECT * FROM (
        |  SELECT 'page' AS kind, 's' || doc_id || '.example/seed' AS canon,
        |         CAST(0 AS BIGINT) AS batch_id, doc_id FROM seeds
        |  UNION ALL SELECT 'page', 's' || doc_id || '.example/p1', 1, doc_id
        |    FROM seeds
        |  UNION ALL SELECT 'page', 's' || doc_id || '.example/p2', 1, doc_id
        |    FROM seeds
        |  UNION ALL SELECT 'page', 'hub.example/shared', 1,
        |    (SELECT md FROM m)
        |  UNION ALL SELECT 'frontier', 's' || doc_id || '.example/p1', 0,
        |    NULL FROM seeds
        |  UNION ALL SELECT 'frontier', 's' || doc_id || '.example/p2', 0,
        |    NULL FROM seeds
        |  UNION ALL SELECT 'frontier', 'hub.example/shared', 0, NULL
        |  UNION ALL SELECT 'frontier',
        |    's' || doc_id || '.example/deep' || (doc_id % 3), 1, NULL
        |    FROM seeds
        |  UNION ALL SELECT 'frontier', 'hub.example/next', 1, NULL
        |) ORDER BY kind, canon""".stripMargin,
    "x_pdf_text" ->
      """SELECT doc_id, '1.4' AS version, CAST(2 AS INT) AS n_pages,
        |  CAST(6 AS INT) AS n_objects,
        |  doc_id % 5 = 4 AS encrypted,
        |  CASE WHEN doc_id % 5 = 4 THEN NULL
        |       ELSE 'Doc ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0') ||
        |            chr(10) || 'tail (q) hi-' ||
        |            lpad(CAST(doc_id % 7 AS VARCHAR), 2, '0') ||
        |            chr(10) || 'flate page common' END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_pdf_objstm" ->
      """SELECT doc_id, '1.5' AS version, CAST(1 AS INT) AS n_pages,
        |  CAST(6 AS INT) AS n_objects,
        |  doc_id % 5 = 4 AS encrypted,
        |  CASE WHEN doc_id % 5 = 4 THEN NULL
        |       ELSE 'Objstm doc ' ||
        |            lpad(CAST(doc_id % 1000 AS VARCHAR), 4, '0') ||
        |            ' t' || lpad(CAST(doc_id % 7 AS VARCHAR), 2, '0') ||
        |            chr(10) || 'xref stream page' END AS text
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_warc_gz" ->
      """WITH r AS (SELECT doc_id, i
        |  FROM documents, LATERAL (SELECT unnest(generate_series(1,
        |    doc_id % 3 + 1)) AS i))
        |SELECT doc_id, CAST(i - 1 AS BIGINT) AS rec_idx,
        |  'http://gz' || (doc_id % 50) || '.example/r' || i AS uri,
        |  'text/html' AS content_type,
        |  CAST(length('gz page ' || i || ' of doc ' || doc_id) AS BIGINT)
        |    AS content_len,
        |  'gz page ' || i || ' of doc ' || doc_id AS content
        |FROM r ORDER BY doc_id, rec_idx""".stripMargin,
    "x_av_duration" ->
      """WITH k AS (SELECT doc_id, doc_id // 2 AS k, doc_id % 2 AS sel
        |  FROM documents),
        |m AS (SELECT doc_id, sel, k, k % 4 + 1 AS nf,
        |    [32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256,
        |     320][CAST(k % 14 AS INT) + 1] AS brk,
        |    [44100, 48000, 32000][CAST(k % 3 AS INT) + 1] AS rate,
        |    [96000, 88200, 64000, 48000, 44100, 32000, 24000, 22050,
        |     16000, 12000, 11025, 8000][CAST(k % 12 AS INT) + 1] AS arate,
        |    k % 200 + 7 AS afl
        |  FROM k)
        |SELECT doc_id,
        |  CASE WHEN sel = 0 THEN 'mp3' ELSE 'aac' END AS fmt,
        |  CAST(nf AS BIGINT) AS n_frames,
        |  CAST(CASE WHEN sel = 0 THEN nf * 1152 ELSE nf * 1024 END
        |    AS BIGINT) AS total_samples,
        |  CAST(CASE WHEN sel = 0 THEN (nf * 1152 * 1000) // rate
        |       ELSE (nf * 1024 * 1000) // arate END AS BIGINT) AS duration_ms,
        |  CAST(CASE WHEN sel = 0 THEN nf * ((144 * brk * 1000) // rate)
        |       ELSE nf * afl END AS BIGINT) AS bytes_walked
        |FROM m ORDER BY doc_id""".stripMargin,
    "x_av_meta" ->
      """WITH k AS (SELECT doc_id, doc_id // 3 AS k, doc_id % 3 AS sel
        |  FROM documents)
        |SELECT doc_id,
        |  CASE CAST(sel AS INT) WHEN 0 THEN 'mp3' WHEN 1 THEN 'aac'
        |       ELSE 'mp4' END AS fmt,
        |  CASE CAST(sel AS INT)
        |    WHEN 0 THEN CAST([44100, 48000, 32000][CAST(k % 3 AS INT) + 1]
        |                     AS BIGINT)
        |    WHEN 1 THEN CAST([96000, 88200, 64000, 48000, 44100, 32000,
        |                      24000, 22050, 16000, 12000, 11025,
        |                      8000][CAST(k % 12 AS INT) + 1] AS BIGINT)
        |  END AS sample_rate,
        |  CASE CAST(sel AS INT)
        |    WHEN 0 THEN CAST(CASE WHEN k % 4 = 3 THEN 1 ELSE 2 END AS BIGINT)
        |    WHEN 1 THEN CAST(CASE WHEN k % 7 + 1 = 7 THEN 8
        |                          ELSE k % 7 + 1 END AS BIGINT)
        |  END AS channels,
        |  CASE WHEN sel = 0
        |    THEN CAST([32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
        |               224, 256, 320][CAST(k % 14 AS INT) + 1] AS BIGINT)
        |  END AS bitrate_kbps,
        |  CASE WHEN sel = 0 THEN CAST(10 + k % 100 + 4 AS BIGINT)
        |  END AS id3_bytes,
        |  CASE WHEN sel = 1 THEN CAST(k % 4000 + 7 AS BIGINT) END AS frame_len,
        |  CASE WHEN sel = 1 THEN CAST(k % 4 + 1 AS BIGINT) END AS aac_profile,
        |  CASE WHEN sel = 2 THEN CAST(1000 + k % 9000 AS BIGINT) END AS timescale,
        |  CASE WHEN sel = 2 THEN CAST(k % 100000 + 1000 AS BIGINT) END AS duration,
        |  CASE WHEN sel = 2 THEN CAST(k % 1920 + 1 AS BIGINT) END AS width,
        |  CASE WHEN sel = 2 THEN CAST(k % 1080 + 1 AS BIGINT) END AS height
        |FROM k ORDER BY doc_id""".stripMargin,
    "x_multimodal_meta" ->
      """SELECT doc_id,
        |  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
        |       WHEN 2 THEN 'wav' ELSE 'jpeg' END AS fmt,
        |  CASE WHEN doc_id % 4 IN (0, 1, 3)
        |       THEN CAST(doc_id % 512 + 1 AS INT) END AS width,
        |  CASE WHEN doc_id % 4 IN (0, 1, 3)
        |       THEN CAST(doc_id % 300 + 1 AS INT) END AS height,
        |  CASE WHEN doc_id % 4 = 2
        |       THEN CAST(8000 + (doc_id % 8) * 4000 AS INT) END AS sample_rate,
        |  CASE WHEN doc_id % 4 = 2
        |       THEN CAST(doc_id % 2 + 1 AS INT) END AS channels
        |FROM documents ORDER BY doc_id""".stripMargin,
    "x_chunk_cdc" ->
      s"""WITH toks AS (SELECT doc_id, $toksSql AS ts FROM documents),
         |t AS (SELECT doc_id, ts, len(ts) AS n FROM toks WHERE len(ts) >= 1),
         |g AS (SELECT doc_id, i + 2 AS e
         |      FROM t, LATERAL (SELECT unnest(generate_series(1, n - 2)) AS i)
         |      WHERE n >= 3
         |        AND CAST(CONCAT('0x', substr(md5(array_to_string(ts[i:i+2], ' ')), 1, 8)) AS BIGINT) % 8 = 0),
         |ends AS (SELECT doc_id, e FROM g UNION SELECT doc_id, n AS e FROM t),
         |o AS (SELECT doc_id, e,
         |        row_number() OVER (PARTITION BY doc_id ORDER BY e) - 1 AS ci,
         |        lag(e, 1, 0) OVER (PARTITION BY doc_id ORDER BY e) AS pe
         |      FROM ends)
         |SELECT o.doc_id, CAST(o.ci AS BIGINT) AS chunk_idx,
         |  CAST(o.pe + 1 AS BIGINT) AS start_pos,
         |  CAST(o.e - o.pe AS BIGINT) AS n_tokens,
         |  array_to_string(t.ts[o.pe+1:o.e], ' ') AS chunk_text,
         |  CAST(CONCAT('0x', substr(md5(array_to_string(t.ts[o.pe+1:o.e], ' ')), 1, 8)) AS BIGINT) AS chunk_hash
         |FROM o JOIN t USING (doc_id)
         |ORDER BY doc_id, chunk_idx""".stripMargin,
    "x_coreset_kcenter" -> kcenterOracleSql,
    "x_boilerplate" ->
      s"""WITH d2 AS (SELECT doc_id, source,
         |              source || ' bulletin notice ' || text AS text
         |            FROM documents),
         |t AS (SELECT doc_id, source, $toksSql AS ts FROM d2 WHERE len($toksSql) >= 1),
         |l AS (SELECT doc_id, source, j AS pi,
         |        array_to_string(ts[j*3+1:least(j*3+3, len(ts))], ' ') AS line
         |      FROM t, LATERAL (SELECT unnest(generate_series(0,
         |        CAST(ceil(len(ts) / 3.0) AS BIGINT) - 1)) AS j)),
         |nd AS (SELECT source, count(DISTINCT doc_id) AS n_docs FROM d2 GROUP BY 1),
         |df AS (SELECT source, line, count(DISTINCT doc_id) AS df FROM l GROUP BY 1, 2),
         |bp AS (SELECT df.source, df.line FROM df JOIN nd USING (source)
         |       WHERE df.df * 1000000 >= 500000 * nd.n_docs),
         |k AS (SELECT l.doc_id, l.pi, l.line,
         |        CASE WHEN bp.line IS NULL THEN 1 ELSE 0 END AS keep
         |      FROM l LEFT JOIN bp ON l.source = bp.source AND l.line = bp.line)
         |SELECT doc_id,
         |  coalesce(string_agg(CASE WHEN keep = 1 THEN line END, ' ' ORDER BY pi), '') AS kept_text,
         |  CAST(count(CASE WHEN keep = 1 THEN 1 END) AS BIGINT) AS kept_ct,
         |  CAST(count(CASE WHEN keep = 0 THEN 1 END) AS BIGINT) AS removed_ct
         |FROM k GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_source_overlap" ->
      s"""WITH t AS (SELECT source, $toksSql AS ts FROM documents),
         |g AS (SELECT DISTINCT source AS src, array_to_string(ts[i:i+2], ' ') AS gram
         |      FROM t, LATERAL (SELECT unnest(generate_series(1, len(ts) - 2)) AS i)
         |      WHERE len(ts) >= 3),
         |ps AS (SELECT src, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1)
         |SELECT a.src AS src_a, b.src AS src_b, pa.n AS n_a, pb.n AS n_b,
         |  CAST(count(*) AS BIGINT) AS shared,
         |  CAST(count(*) AS BIGINT) * 1000000 // pa.n AS contain_a_ppm,
         |  CAST(count(*) AS BIGINT) * 1000000 // pb.n AS contain_b_ppm
         |FROM g a JOIN g b ON a.gram = b.gram AND a.src < b.src
         |JOIN ps pa ON pa.src = a.src JOIN ps pb ON pb.src = b.src
         |GROUP BY a.src, b.src, pa.n, pb.n
         |ORDER BY src_a, src_b""".stripMargin,
    "x_coreset_mmr" -> mmrOracleSql,
    "x_rank_rbo" ->
      s"""WITH $bm25ScoredCte,
         |ttop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS rank_text
         |  FROM scored ORDER BY score DESC, doc_id LIMIT 25),
         |q AS (SELECT CAST(embedding AS DOUBLE[]) AS qe FROM embeddings WHERE vec_id = 0),
         |vsc AS (SELECT c.vec_id AS doc_id,
         |    round(list_cosine_similarity(CAST(c.embedding AS DOUBLE[]), q.qe), 6) AS cs
         |  FROM embeddings c CROSS JOIN q WHERE c.vec_id <> 0),
         |vtop AS (SELECT doc_id,
         |    CAST(row_number() OVER (ORDER BY cs DESC, doc_id) AS BIGINT) AS rank_vec
         |  FROM vsc ORDER BY cs DESC, doc_id LIMIT 25),
         |b AS (SELECT tt.doc_id, greatest(tt.rank_text, vt.rank_vec) AS m
         |      FROM ttop tt JOIN vtop vt ON tt.doc_id = vt.doc_id),
         |dep AS (SELECT unnest(generate_series(1, 25)) AS depth),
         |ov AS (SELECT depth, count(b.m) AS overlap
         |       FROM dep LEFT JOIN b ON b.m <= dep.depth GROUP BY 1)
         |SELECT CAST(depth AS BIGINT) AS depth, CAST(overlap AS BIGINT) AS overlap,
         |  CAST(overlap AS BIGINT) * 1000000 // depth AS agree_ppm,
         |  round(sum(overlap / depth * power(0.5, depth))
         |    OVER (ORDER BY depth ROWS UNBOUNDED PRECEDING), 6) AS rbo_trunc
         |FROM ov ORDER BY depth""".stripMargin,
    "x_ann_assign_new" ->
      s"""WITH $ivfAssignCte,
         |delta AS (SELECT vec_id + 10000000 AS vec_id, list_reverse(e) AS e FROM c),
         |dassign AS (
         |  SELECT vec_id, cluster FROM (
         |    SELECT dl.vec_id, s.cluster,
         |           row_number() OVER (PARTITION BY dl.vec_id
         |             ORDER BY round(list_cosine_similarity(dl.e, s.se), 6) DESC, s.cluster) AS rn
         |    FROM delta dl CROSS JOIN seeds s) WHERE rn = 1),
         |base AS (SELECT cluster, CAST(count(*) AS BIGINT) AS base_ct FROM assign GROUP BY 1),
         |growth AS (SELECT cluster, CAST(count(*) AS BIGINT) AS delta_ct FROM dassign GROUP BY 1)
         |SELECT da.vec_id, CAST(da.cluster AS BIGINT) AS cluster,
         |       COALESCE(b.base_ct, 0) AS base_ct, g.delta_ct
         |FROM dassign da LEFT JOIN base b ON da.cluster = b.cluster
         |LEFT JOIN growth g ON da.cluster = g.cluster
         |ORDER BY da.vec_id""".stripMargin,
    "x_search_phrase" ->
      s"""WITH p AS (SELECT doc_id, unnest($toksSql) AS term,
         |                  unnest(range(0, len($toksSql))) AS pos FROM documents),
         |t0 AS (SELECT doc_id, pos FROM p WHERE term = 'key'),
         |t1 AS (SELECT doc_id, pos - 1 AS pos FROM p WHERE term = 'scan'),
         |m AS (SELECT t0.doc_id, t0.pos FROM t0
         |      JOIN t1 ON t0.doc_id = t1.doc_id AND t0.pos = t1.pos)
         |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_hits,
         |       CAST(MIN(pos) AS BIGINT) AS first_pos
         |FROM m GROUP BY 1 ORDER BY 1""".stripMargin,
    "x_dedup_snm" ->
      s"""WITH k AS (SELECT doc_id, list_distinct($toksSql) AS ts,
         |                  array_to_string($toksSql, ' ') AS key FROM documents),
         |r AS (SELECT doc_id, ts, substr(key, 1, 4) AS block,
         |        row_number() OVER (PARTITION BY substr(key, 1, 4)
         |                           ORDER BY key, doc_id) AS rank
         |      FROM k),
         |pr AS (SELECT a.doc_id AS da, b.doc_id AS db, a.ts AS tsa, b.ts AS tsb
         |       FROM r a JOIN r b ON a.block = b.block
         |         AND b.rank > a.rank AND b.rank <= a.rank + 4),
         |j AS (SELECT da, db, len(list_intersect(tsa, tsb)) AS i,
         |             len(tsa) AS sa, len(tsb) AS sb FROM pr)
         |SELECT LEAST(da, db) AS d1, GREATEST(da, db) AS d2,
         |       i / (sa + sb - i) AS jaccard
         |FROM j WHERE i / (sa + sb - i) >= 0.7 ORDER BY d1, d2""".stripMargin)

  /** Unrolled MMR oracle (k=8, λ=1/2 so the objective is the integer
    * rel − max_sim): same MATERIALIZED-CTE discipline as the k-center
    * oracle (plain CTEs inline exponentially across the round chain).
    * `rels` carries each candidate's integer relevance to the lowest-id
    * query vector once; each round takes max similarity to the selected
    * codes and the (score desc, vec_id) argmax. */
  private lazy val mmrOracleSql: String = {
    val k = 8
    val qz =
      """c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, list_max(list_transform(e, v -> abs(v))) AS amax FROM c),
        |qz AS MATERIALIZED (SELECT vec_id,
        |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS BIGINT))
        |       ELSE list_transform(e, v -> CAST(0 AS BIGINT)) END AS q8
        |  FROM m),
        |qc AS MATERIALIZED (SELECT q8 AS qcode FROM qz ORDER BY vec_id LIMIT 1),
        |rels AS MATERIALIZED (SELECT vec_id, q8,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(generate_series(1, len(q8)), i -> q8[i] * qcode[i])),
        |    (x, y) -> x + y) AS rel
        |  FROM qz CROSS JOIN qc)""".stripMargin
    val sim =
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, len(q8)), i -> q8[i] * sq8[i])), " +
        "(x, y) -> x + y)"
    val s0 = "s0 AS MATERIALIZED (SELECT vec_id, rel, CAST(0 AS BIGINT) AS ms " +
      "FROM rels ORDER BY rel DESC, vec_id LIMIT 1)"
    val steps = (1 until k).map { r =>
      val selUnion = (0 until r).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
      s"""sel$r AS MATERIALIZED ($selUnion),
         |d$r AS (SELECT a.vec_id, a.rel, max($sim) AS ms
         |  FROM rels a CROSS JOIN (SELECT q8 AS sq8 FROM qz JOIN sel$r USING (vec_id)) b
         |  WHERE a.vec_id NOT IN (SELECT vec_id FROM sel$r)
         |  GROUP BY a.vec_id, a.rel),
         |s$r AS MATERIALIZED (SELECT vec_id, rel, ms FROM d$r
         |  ORDER BY rel - ms DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (0 until k)
      .map(r => s"SELECT CAST($r AS BIGINT) AS round, vec_id, rel, ms AS max_sim, " +
        s"rel - ms AS score FROM s$r")
      .mkString(" UNION ALL ")
    s"WITH $qz,\n$s0,\n$steps\nSELECT round, vec_id, rel, max_sim, score FROM ($out) ORDER BY round"
  }

  /** Unrolled k-center greedy oracle (k=8): s0 is the lowest-id vector;
    * each round r joins the candidates against the union of the previous
    * single-row picks, takes min integer squared-L2 over the selected
    * q8 codes, and picks the (max md, min vec_id) argmax — exactly
    * `Similarity.kCenterSelect`'s trace. Quantization CTE shared with
    * the x_kmeans_* oracles. */
  private lazy val kcenterOracleSql: String = {
    val k = 8
    val qz =
      """c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
        |m AS (SELECT vec_id, e, list_max(list_transform(e, v -> abs(v))) AS amax FROM c),
        |qz AS MATERIALIZED (SELECT vec_id,
        |  CASE WHEN amax > 0 THEN list_transform(e, v -> CAST(round(v / amax * 127) AS BIGINT))
        |       ELSE list_transform(e, v -> CAST(0 AS BIGINT)) END AS q8
        |  FROM m)""".stripMargin
    val dist =
      "list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        "list_transform(generate_series(1, len(q8)), i -> (q8[i] - sq8[i]) * (q8[i] - sq8[i]))), " +
        "(x, y) -> x + y)"
    // every per-round CTE is MATERIALIZED: DuckDB inlines plain CTEs, and
    // s_r references the whole s_0..s_{r-1} chain — un-materialized, the
    // expansion is exponential in k (measured: minutes at k=8, ms with
    // materialization)
    val s0 = "s0 AS MATERIALIZED (SELECT vec_id, CAST(0 AS BIGINT) AS md FROM qz ORDER BY vec_id LIMIT 1)"
    val steps = (1 until k).map { r =>
      val selUnion = (0 until r).map(j => s"SELECT vec_id FROM s$j").mkString(" UNION ALL ")
      s"""sel$r AS MATERIALIZED ($selUnion),
         |d$r AS (SELECT a.vec_id, min($dist) AS md
         |  FROM qz a CROSS JOIN (SELECT q8 AS sq8 FROM qz JOIN sel$r USING (vec_id)) b
         |  WHERE a.vec_id NOT IN (SELECT vec_id FROM sel$r)
         |  GROUP BY a.vec_id),
         |s$r AS MATERIALIZED (SELECT vec_id, md FROM d$r ORDER BY md DESC, vec_id LIMIT 1)""".stripMargin
    }.mkString(",\n")
    val out = (0 until k)
      .map(r => s"SELECT CAST($r AS BIGINT) AS round, vec_id, md AS dist2 FROM s$r")
      .mkString(" UNION ALL ")
    s"WITH $qz,\n$s0,\n$steps\nSELECT round, vec_id, dist2 FROM ($out) ORDER BY round"
  }
}
