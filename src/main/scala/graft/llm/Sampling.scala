package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines:
  * stratified downsampling, train/val/test splits, exact-count per-stratum
  * samples, and temperature-flattened source mixing.
  *
  * Everything is keyed on a content-stable hash of the id — NO RNG, no
  * `rand()`: the same document gets the same fate on every run, on every
  * cluster layout, in streaming and batch alike (a rerun or a late
  * partition cannot change the corpus), and the whole pipeline stays
  * exactly reproducible in SQL, which is what lets each operator carry a
  * full DuckDB oracle. Sampling decisions are per-row map-side work —
  * no shuffle is introduced by any `u < rate` filter.
  */
object Sampling {

  /** Deterministic uniform-[0,1): the top 32 bits of md5(id) over 2^32.
    * An integer divided by 2^32 is exact in a double, and md5 is the one
    * hash both engines compute identically (Dedup.h32 — the single
    * definition every hash-keyed operator shares), so `u` is
    * bit-identical cross-engine. */
  def hashUniform(id: Column): Column =
    Dedup.h32(id.cast("string")) / lit(4294967296.0)

  /** Per-stratum deterministic Bernoulli sampling: keep a row of stratum
    * `s` iff u(id) < rates(s) (default rate for unlisted strata), with
    * `sample_weight` = 1/rate for unbiased reweighting downstream.
    * The canonical "downsample the dominant language / source" step. */
  def stratifiedSample(docs: DataFrame, idCol: String, stratumCol: String,
                       rates: Map[String, Double],
                       defaultRate: Double = 1.0): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultRate): Column) {
      case (acc, (k, v)) => when(col(stratumCol) === k, lit(v)).otherwise(acc)
    }
    docs.withColumn("sample_rate", rate)
      .filter(hashUniform(col(idCol)) < col("sample_rate"))
      .withColumn("sample_weight", lit(1.0) / col("sample_rate"))
  }

  /** Deterministic train/val/test split: `splits` = (label, fraction)
    * with fractions summing to 1; a row lands in the split whose
    * cumulative-[0,1) interval contains u(id). Fractions that are exact
    * binary (0.75/0.125/...) make the cut points literal-identical in
    * any engine. */
  def deterministicSplit(docs: DataFrame, idCol: String,
                         splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty, "deterministicSplit: no splits given")
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      s"split fractions must sum to 1, got ${splits.map(_._2).sum}")
    val u = hashUniform(col(idCol))
    val cums = splits.map(_._2).scanLeft(0.0)(_ + _).tail
    val label =
      if (splits.size == 1) lit(splits.head._1)
      else {
        val init = when(u < lit(cums.head), lit(splits.head._1))
        splits.zip(cums).drop(1).dropRight(1)
          .foldLeft(init) { case (acc, ((name, _), c)) =>
            acc.when(u < lit(c), lit(name))
          }
          .otherwise(lit(splits.last._1))
      }
    docs.withColumn("split", label)
  }

  /** Exact-count uniform sample WITHOUT replacement per stratum: the `n`
    * rows with the smallest md5(id) in each stratum — the deterministic
    * equivalent of per-stratum reservoir sampling. The rank-<=n filter
    * over the window is recognized by Spark as a group top-n
    * (WindowGroupLimit): each partition keeps only its local n rows
    * before the shuffle, so the exchange carries O(partitions * n), not
    * the corpus. */
  def stratifiedTakeN(docs: DataFrame, idCol: String, stratumCol: String,
                      n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("sample_rank", row_number().over(w).cast("long"))
      .filter(col("sample_rank") <= n)
  }

  /** Deterministic corpus sharding — the "global shuffle" step before
    * training-order assembly, without a global sort: shard =
    * hash32(id) mod numShards (uniform, content-stable), position within
    * a shard = rank by (md5(id), id). Each shard orders only its own
    * 1/numShards slice — at 100 TB that is numShards independent
    * partition-local sorts after one hash exchange, and a reader
    * streaming shard s in shard_pos order sees a reproducible uniform
    * permutation of the corpus. No RNG: adding documents never reorders
    * the survivors of a shard prefix already consumed. */
  def deterministicShard(docs: DataFrame, idCol: String,
                         numShards: Int): DataFrame = {
    val h = Dedup.h32(col(idCol).cast("string"))
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("shard", (h % numShards).cast("int"))
      .withColumn("shard_pos", row_number().over(w).cast("long"))
  }

  /** CURRICULUM BINNING — order the corpus into difficulty stages by an
    * integer signal (token count is the classic length curriculum):
    * `numBins` equal-population bins cut at the exact percentiles
    * i/numBins, bin = number of cuts <= the row's signal. A power-of-two
    * numBins keeps the percentile fractions dyadic, and type-7
    * interpolation over INTEGRAL values is exact in doubles, so the cut
    * points — and therefore every bin decision — are bit-identical
    * cross-engine.
    *
    * Plan: one exact-percentile aggregate (a broadcast scalar row — the
    * 100 TB swap is approx_percentile, same shape) + a map-side
    * compare per row. NOT ntile: a global-ORDER ntile window runs on a
    * single partition — the one-executor bottleneck this formulation
    * exists to avoid. */
  def curriculumBins(docs: DataFrame, signalCol: String,
                     numBins: Int): DataFrame = {
    require(numBins >= 2, "curriculumBins: need at least two bins")
    val fracs = (1 until numBins).map(i => i.toDouble / numBins)
    val cuts = docs.agg(
      expr(s"percentile($signalCol, array(${fracs.mkString(", ")}))").as("__cuts"))
    val bin = (0 until numBins - 1)
      .map(i => when(col(signalCol) >= col("__cuts")(i), 1).otherwise(0))
      .reduce(_ + _)
    docs.crossJoin(broadcast(cuts))
      .withColumn("bin", bin.cast("int")).drop("__cuts")
  }

  /** Per-row WEIGHTED Bernoulli sampling — importance downsampling by a
    * per-document weight in [0,1] (keep probability = the weight; the
    * canonical "sample proportionally to quality score" curation step),
    * with Horvitz-Thompson `sample_weight` = 1/p for unbiased
    * reweighting downstream.
    *
    * The inclusion test is INTEGER-exact: the weight is quantized to
    * thousandths (wm = decimal(18,3)-cast cents of w — the cross-engine-stable
    * rounding, same idiom as every money gate) and the test `u < p` becomes
    * `h32(id) * 1000 < wm * 2^32` — both products stay far inside
    * int64, so the decision is bit-identical on any engine and immune
    * to double-comparison edge cases at the threshold. No RNG, map-side
    * only, same determinism contract as every sampler here. */
  def weightedSample(docs: DataFrame, idCol: String,
                     weight: Column): DataFrame = {
    val wm = (weight.cast("decimal(18,3)") * 1000).cast("long")
    docs.withColumn("__wm", wm)
      .filter(Dedup.h32(col(idCol).cast("string")) * 1000L < col("__wm") * 4294967296L)
      .withColumn("sample_weight", lit(1000.0) / col("__wm"))
      .drop("__wm")
  }

  /** SEQUENCE PACKING — the last step before a training run: lay the
    * corpus out as fixed token-budget sequences. Documents are placed
    * contiguously in the deterministic shard order (`deterministicShard`'s
    * hash permutation), each starting at the running token offset of its
    * shard; `seq_id` is the sequence its FIRST token lands in and
    * `seq_off` the offset inside it — GPT-style packing where documents
    * spill across sequence boundaries, so no token is padded or dropped
    * and the layout is a pure function of (id, token count).
    *
    * Scale shape: packing is per-shard, so one hash exchange then
    * `numShards` independent partition-local sorts with a running-sum
    * window — embarrassingly parallel, no global prefix sum. The shard
    * count is the parallelism knob; a reader reconstructs sequence s of
    * shard k from (shard, seq_id, seq_off) alone. */
  def packSequences(docs: DataFrame, idCol: String, tokenCol: String,
                    budget: Long, numShards: Int): DataFrame = {
    require(budget > 0, "packSequences: budget must be positive")
    val w = Window.partitionBy(col("shard"))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    deterministicShard(docs, idCol, numShards)
      .withColumn("start_off", coalesce(sum(col(tokenCol)).over(w), lit(0L)))
      .withColumn("seq_id",
        ((col("start_off") - pmod(col("start_off"), lit(budget))) / budget)
          .cast("long"))
      .withColumn("seq_off", pmod(col("start_off"), lit(budget)))
  }

  /** Temperature-flattened source mixing — the data-mixture step of
    * corpus assembly. With per-source sizes n_s (sum of `sizeCol`),
    * draw probability p_s ∝ sqrt(n_s) (temperature-flattened so small
    * sources are upweighted relative to their share), and a total size
    * budget B, the per-row sampling rate is
    *
    *   r_s = min(1, B * p_s / n_s) = min(1, B / (S * sqrt(n_s))),
    *   S = Σ_t sqrt(n_t)
    *
    * so the expected sampled size from source s is B * p_s (capped at
    * n_s). The exponent is fixed at 1/2 because sqrt is the one power
    * IEEE 754 guarantees correctly rounded — with the normalizer S
    * computed as a sequential ascending-by-source fold, every float op
    * here is bit-reproducible cross-engine, oracle included. Source
    * stats are one hash-aggregate; rates broadcast back (a handful of
    * rows), so the corpus itself never shuffles.
    *
    * A source whose sizes sum to <= 0 (all-empty docs) has no defined
    * rate (B·√0/S/0); its rate is pinned to 0, so its rows are dropped
    * deterministically rather than riding a NaN through the filter. */
  def temperatureMixture(docs: DataFrame, idCol: String, sourceCol: String,
                         sizeCol: String, budget: Long): DataFrame = {
    val bySrc = docs.groupBy(col(sourceCol)).agg(sum(col(sizeCol)).as("tot"))
    val norm = bySrc
      .agg(sort_array(collect_list(struct(col(sourceCol).as("s"), col("tot"))))
        .as("arr"))
      .select(aggregate(col("arr"), lit(0.0),
        (acc, x) => acc + sqrt(x.getField("tot").cast("double"))).as("norm"))
    val rates = bySrc.crossJoin(broadcast(norm))
      .select(col(sourceCol),
        when(col("tot") > 0,
          least(lit(1.0),
            lit(budget.toDouble) * sqrt(col("tot").cast("double")) /
              col("norm") / col("tot").cast("double")))
          .otherwise(lit(0.0)).as("sample_rate"))
    docs.join(broadcast(rates), Seq(sourceCol))
      .filter(hashUniform(col(idCol)) < col("sample_rate"))
      .withColumn("sample_weight", lit(1.0) / col("sample_rate"))
  }

  /** DETERMINISTIC NEGATIVE SAMPLING — the contrastive-training prep
    * step: each anchor draws `k` pseudo-random negatives from the
    * candidate set, reproducibly (same anchor ⇒ same negatives on any
    * run, cluster layout, or engine — the property that makes training
    * order auditable and the gate oracle-able; no RNG anywhere, per
    * this file's charter).
    *
    * The draw must NOT be a per-anchor scan of the candidates (that is
    * the all-pairs trap). Hash-bucketed rendering: candidates land in
    * `buckets` hash buckets and get a bucket-local rank by a SECOND,
    * independent hash (rank order uncorrelated with bucket
    * assignment); each anchor derives k (bucket, slot) probes from
    * md5(anchor, i) and picks the candidate at slot = h mod
    * bucket-size. Cost: candidates shuffle once (bucket window +
    * sizes), anchors explode ×k and equi-join on (bucket, rank) — at
    * 100 TB both sides are one keyed shuffle, the bucket-size table is
    * `buckets` rows broadcast.
    *
    * Edge semantics (documented, all deterministic): a probe landing on
    * the anchor itself is dropped (self is never a negative) and two
    * probes of one anchor may collide on the same candidate — callers
    * needing exactly-k distinct re-probe with a larger k and dedupe;
    * probes into an EMPTY bucket drop (use `buckets` ≪ |candidates| so
    * none is empty). Output: (anchor, probe_idx, negative id). */
  def negativeSample(anchors: DataFrame, anchorIdCol: String,
                     candidates: DataFrame, candIdCol: String,
                     k: Int, buckets: Int = 1024): DataFrame = {
    require(k >= 1 && buckets >= 1, "negativeSample: need k >= 1, buckets >= 1")
    val b = lit(buckets.toLong)
    val ranked = candidates.select(col(candIdCol))
      .withColumn("__b", pmod(Dedup.h32(col(candIdCol).cast("string")), b))
      .withColumn("__rank", row_number().over(
        Window.partitionBy(col("__b")).orderBy(
          Dedup.h32(concat(lit("r:"), col(candIdCol).cast("string"))),
          col(candIdCol))).cast("long") - 1)
    val sizes = ranked.groupBy(col("__b")).agg(count(lit(1)).as("__bs"))
    val probes = anchors.select(col(anchorIdCol).as("__anchor"))
      .withColumn("__i0", explode(sequence(lit(0), lit(k - 1))))
      .withColumn("__i", col("__i0").cast("long")).drop("__i0")
      .withColumn("__b", pmod(Dedup.h32(
        concat(col("__anchor").cast("string"), lit(":"), col("__i"))), b))
      .join(broadcast(sizes), Seq("__b"))
      .withColumn("__rank", pmod(Dedup.h32(
        concat(col("__anchor").cast("string"), lit("~"), col("__i"))),
        col("__bs")))
    probes.join(ranked, Seq("__b", "__rank"))
      .filter(col(candIdCol) =!= col("__anchor"))
      .select(col("__anchor").as("anchor_id"),
        col("__i").as("probe_idx"), col(candIdCol).as("neg_id"))
  }

  /** DSIR-STYLE IMPORTANCE WEIGHTS — Xie et al., "Data Selection for
    * Language Models via Importance Resampling" (2023): score every
    * source document by how target-like its hashed-token distribution
    * is, against add-1-smoothed bag-of-hashed-ngram models of a trusted
    * `target` subset vs the whole source. The paper scores
    * log p̂(doc)−log q̂(doc) = Σ_tokens (log p̂_b − log q̂_b); this
    * engine's RATIONAL variant (same move as BM25's rational idf)
    * replaces each token's log-ratio with the integer scaled ratio
    *
    *   ratio(b) = ((t_b+1)·scale div (T+B)) · (S+B) div (s_b+1)
    *
    * and sums those — an arithmetic-mean-of-ratios surrogate that
    * preserves "more target-like buckets ⇒ bigger score", is exact in
    * int64, and therefore gate-hashable bit-for-bit; the float log-sum
    * is the documented swap where the paper's exact resampling
    * semantics are required. Int64 bounds: (t_b+1)·scale and
    * (S+B)·scale must stay under 2⁶³ — holds through ~9·10¹² source
    * tokens at the default scale (≈50 TB of text); shard the model or
    * take the float swap beyond.
    *
    * Plan: ONE token explode serves both models (the target's counts
    * are a conditional sum in the same hash aggregate — `target` is a
    * boolean predicate column over source rows, so no second scan and
    * no join to mark membership); the ratio table is ≤`buckets` rows —
    * broadcast-sized BY CONSTRUCTION, the one legitimate forced
    * broadcast — and the doc score is a map-side join + one doc_id
    * aggregate. Row-preserving: token-less documents come back with
    * n_tokens=0, dsir_score=0. */
  def dsirWeights(source: DataFrame, idCol: String, target: Column,
                  buckets: Int = 4096, scale: Long = 1000000L,
                  text: Column = col("text")): DataFrame = {
    require(buckets >= 2, "dsirWeights: need >= 2 hash buckets")
    val tb = source
      .select(col(idCol), target.as("__tgt"),
        explode(TextAnalysis.tokens(text)).as("__tok"))
      .select(col(idCol), col("__tgt"),
        pmod(Dedup.h60(col("__tok")), lit(buckets.toLong)).as("__b"))
    val stats = tb.groupBy(col("__b"))
      .agg(count(lit(1)).as("__sc"),
        sum(when(col("__tgt"), 1L).otherwise(0L)).as("__tc"))
    val tot = tb.agg(count(lit(1)).as("__S"),
      sum(when(col("__tgt"), 1L).otherwise(0L)).as("__T"))
    val ratio = stats.crossJoin(broadcast(tot))
      .select(col("__b"),
        expr(s"((__tc + 1L) * ${scale}L div (__T + $buckets)) " +
          s"* (__S + $buckets) div (__sc + 1L)").as("__ratio"))
    val scores = tb.join(broadcast(ratio), Seq("__b"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), sum(col("__ratio")).as("dsir_score"))
    source.select(col(idCol)).join(scores, Seq(idCol), "left_outer")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("dsir_score"), lit(0L)).as("dsir_score"))
  }

  /** TOKEN-BUDGET SELECTION: keep the highest-quality documents until a
    * token budget is spent — the final corpus-assembly decision ("the
    * best N-token corpus this pool can yield", the data-constrained
    * regime's selection rule). `budgetPpm` is the budget as a ppm
    * fraction of the pool's total tokens; quality must be an INTEGER
    * column (ties inside a quality value spend in ascending-id order
    * until the budget closes, so the cut is total-order deterministic).
    *
    * The 100 TB plan — a global quality sort is never run. Selection by
    * threshold instead (the `globalPercentRank` trick): (1) ONE hash
    * aggregate builds the per-VALUE token-sum table, bounded by the
    * signal's resolution (≤ ~10⁶ rows for a ppm signal), (2) a running
    * sum over that bounded table — the only single-partition step —
    * annotates each value with its prefix total, (3) the annotated
    * table broadcasts back and every document classifies MAP-SIDE:
    * whole prefix fits → selected; group starts past the budget → not;
    * only THE boundary value's documents (one value's worth of rows)
    * pay an id-ordered window to spend the remainder. A pathologically
    * hot boundary value (half the corpus sharing one quality score)
    * would bound that window poorly — refine the signal's resolution,
    * not this operator, if that arises. */
  def tokenBudgetSelect(docs: DataFrame, idCol: String, qualityCol: String,
                        tokensCol: String, budgetPpm: Long): DataFrame = {
    require(budgetPpm >= 0 && budgetPpm <= 1000000L,
      "tokenBudgetSelect: budgetPpm must be in [0, 1e6]")
    val byVal = docs.groupBy(col(qualityCol).as("__v"))
      .agg(sum(col(tokensCol).cast("long")).as("__vtok"))
    val wv = Window.orderBy(col("__v").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val total = byVal.agg(sum(col("__vtok")).as("__total"))
    val ann = byVal.withColumn("__cum", sum(col("__vtok")).over(wv))
      .withColumn("__prev", col("__cum") - col("__vtok"))
      .crossJoin(broadcast(total))
      .withColumn("__budget", expr(s"__total * ${budgetPpm}L div 1000000"))
      .select(col("__v"), col("__cum"), col("__prev"), col("__budget"))
    val joined = docs.join(broadcast(ann), col(qualityCol) === col("__v"))
    val base = Seq(col(idCol), col(qualityCol), col(tokensCol))
    val fullIn = joined.filter(col("__cum") <= col("__budget"))
      .select(base :+ lit(1).as("selected"): _*)
    val fullOut = joined.filter(col("__prev") >= col("__budget"))
      .select(base :+ lit(0).as("selected"): _*)
    val wb = Window.partitionBy(col("__v")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val boundary = joined
      .filter(col("__prev") < col("__budget") && col("__cum") > col("__budget"))
      .withColumn("__run", sum(col(tokensCol).cast("long")).over(wb))
      .select(base :+ (col("__prev") + col("__run") <= col("__budget"))
        .cast("int").as("selected"): _*)
    fullIn.unionByName(fullOut).unionByName(boundary)
  }

  /** Systematic probability-proportional-to-size (PPS) sampling — the
    * survey-sampling classic (Madow 1949) for "draw k documents with
    * inclusion probability ∝ weight" (tokens, bytes, engagement):
    * place k evenly-spaced selection points p_j = (T·(2j+1)) div (2k)
    * on the cumulative weight line [0, T) and take the item whose
    * weight interval (c_lo, c_hi] contains each point. Fully
    * DETERMINISTIC (no RNG — the deterministic-offset variant) and
    * integer-exact end to end, so the gate hash-matches; an item
    * heavier than the stride is drawn with multiplicity > 1, the
    * standard PPS accounting, and Σ multiplicity = k always. Each
    * item's multiplicity sits within 1 of its expectation k·w/T — the
    * property the spec pins.
    *
    * Scale shape: the cumulative line is a GLOBAL prefix sum over the
    * id order — data-sized, so it rides the same range-partitioned
    * two-level rendering as `TableStats.globalPercentRankUnbounded`
    * (per-bucket running sum + P collected offsets, no
    * single-partition window); the k points broadcast. Bounds: weights
    * must be positive longs, T ≥ 2k (so every point is ≥ 1), and
    * T < 2⁶³/(2k) keeps the point arithmetic in int64 — all
    * require()d. `idCol` must be a UNIQUE total order for the result to
    * be deterministic: Σ multiplicity = k holds even with duplicate ids
    * (the cumulative window uses a ROWS frame, so intervals tile the
    * weight line exactly), but which duplicate receives a point is then
    * tie-order-dependent and the hash contract breaks. */
  def systematicPps(df: DataFrame, idCol: String, weightCol: String,
                    k: Int, parts: Int = 0): DataFrame = {
    require(k >= 1, "systematicPps: k >= 1")
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val base = df.select(col(idCol), col(weightCol).cast("long").as("__w"))
    val ranged = base
      .repartitionByRange(p, col(idCol))
      .sortWithinPartitions(col(idCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = ranged.groupBy(col("__pid")).agg(sum(col("__w")).as("__pt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, pid) => acc + totals(pid)))
      .toMap
    val total = totals.values.sum
    require(total >= 2L * k,
      s"systematicPps: total weight $total must be >= 2k = ${2L * k}")
    require(total < Long.MaxValue / (2L * k),
      s"systematicPps: total weight $total overflows point arithmetic at k=$k")
    // positivity enforced, not silently filtered: a zero/negative
    // weight is a caller bug that would skew every inclusion
    // probability after it
    val minW = ranged.agg(min(col("__w"))).collect()(0)
    require(!minW.isNullAt(0) && minW.getLong(0) > 0,
      "systematicPps: weights must be positive and non-null")
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    // ROWS frame, not the orderBy default RANGE frame: under RANGE,
    // duplicate idCol values share one cumulative value, producing
    // OVERLAPPING (c_lo, c_hi] intervals — a selection point could then
    // match several rows and Σ multiplicity silently exceed k. Under
    // ROWS the intervals tile the weight line exactly even with
    // duplicate ids (Σ multiplicity = k always); only WHICH duplicate
    // receives a point is then tie-order-dependent, so for the
    // deterministic-hash contract idCol must be a unique total order —
    // see the scaladoc.
    val w = Window.partitionBy(col("__pid")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val intervals = ranged
      .withColumn("__local", sum(col("__w")).over(w))
      .join(broadcast(offDf), "__pid")
      .withColumn("c_hi", col("__local") + col("__off"))
      .withColumn("c_lo", col("c_hi") - col("__w"))
    val points = spark.range(k)
      .select(expr(s"(${total}L * (id * 2 + 1)) div ${2L * k}L").as("__p"))
    intervals.join(broadcast(points),
        col("__p") > col("c_lo") && col("__p") <= col("c_hi"))
      .groupBy(col(idCol), col("__w").as("weight"),
        col("c_lo"), col("c_hi"))
      .agg(count(lit(1)).as("multiplicity"))
      .select(col(idCol), col("weight"), col("c_lo"), col("c_hi"),
        col("multiplicity"))
  }

  /** Deterministic k examples per group — the "show me 8 docs from each
    * source/cluster/language" sampler every curation review runs. The
    * draw is uniform-ish and SEEDLESSLY reproducible: rank by the
    * Knuth multiplicative hash h(id) = (id mod 2³¹)·2654435761 mod 2³¹
    * (engine-portable integer arithmetic — products stay < 2⁶³, so the
    * identical h computes anywhere), tie to id. Rendering is ONE hash
    * aggregate with `functions.TopKAgg` partials (O(k) buffer per
    * group, map-side combine) — no Window, no per-group sort, no
    * full-table rank exchange; the 100 TB cost is a scan plus a
    * |groups|·k-row shuffle. Output: (group, rank 0..k-1, id). */
  def examplesPerGroup(df: DataFrame, groupCol: String, idCol: String,
                       k: Int): DataFrame = {
    require(k >= 1, "examplesPerGroup: k >= 1")
    import graft.functions.TopKAgg.topK
    val h = pmod(pmod(col(idCol), lit(2147483648L)) * 2654435761L,
      lit(2147483648L))
    // TopKAgg keeps the k LARGEST values: negate so min-hash wins;
    // h < 2^31 is exactly representable in double, so no tie drift
    df.select(col(groupCol), col(idCol), (-h.cast("double")).as("__negh"))
      .groupBy(col(groupCol))
      .agg(topK(col("__negh"), col(idCol), k).as("__top"))
      .select(col(groupCol), posexplode(col("__top")).as(Seq("rank", "__t")))
      .select(col(groupCol), col("rank").cast("long").as("rank"),
        col("__t.id").as(idCol))
  }
}
