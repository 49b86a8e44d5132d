package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** One-pass table profiling — the ANALYZE-shaped statistics a pipeline
  * consults before planning itself (which keys to salt, which columns
  * to z-order, whether a dim still broadcasts).
  *
  * All columns' statistics compute in a SINGLE aggregate over ONE scan
  * — at 100 TB the scan IS the cost, so per-column profiling loops
  * (one job per column) are the anti-pattern this exists to replace.
  * Distinct counts are HLL sketches (fixed KBs of state per column, the
  * only option when every column may be high-cardinality); the exact
  * count rides in the gate query's oracle-pinned tolerance boolean
  * instead of the operator (X45 pattern).
  */
object TableStats {

  /** Long-format numeric profile: one row per requested column with
    * null/non-null counts, min/max (as double), and the HLL distinct
    * estimate. One scan, one aggregate, then a constant-width unpivot. */
  def profileNumeric(df: DataFrame, cols: Seq[String], rsd: Double = 0.02): DataFrame = {
    require(cols.nonEmpty, "profileNumeric needs at least one column")
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__nn_$c"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__null_$c"),
        min(col(c).cast("double")).as(s"__min_$c"),
        max(col(c).cast("double")).as(s"__max_$c"),
        approx_count_distinct(col(c), rsd).as(s"__dist_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // unpivot via stack: constant-width, no shuffle (the agg output is one row)
    val stackArgs = cols.map { c =>
      s"'$c', __nn_$c, __null_$c, __min_$c, __max_$c, __dist_$c"
    }.mkString(", ")
    one.select(expr(
      s"stack(${cols.size}, $stackArgs) AS " +
        "(col_name, non_null_ct, null_ct, min_val, max_val, approx_distinct)"))
  }

  /** EXACT fixed-bin histogram per group — the distribution profile
    * behind quality cuts (doc-length curves, score bands). Integer bin
    * index `floor((v - lo) / width)` clamped to [0, nBins-1] (underflow
    * into bin 0, overflow into the top bin), computed MAP-SIDE; the only
    * shuffle is the hash-agg on the bounded (groups × nBins) grain.
    * Spark's `histogram_numeric` is approximate with data-dependent bin
    * centers — useless as a stable contract; fixed edges are exact,
    * mergeable, and comparable across runs/partitions/datasets.
    * Bin edges ride along as columns (`bin_lo` inclusive, `bin_hi`
    * exclusive except the clamp bins, which absorb their overflow). */
  def histogram(df: DataFrame, valueCol: String, lo: Double, width: Double,
                nBins: Int, groupCols: Seq[String]): DataFrame = {
    require(width > 0 && nBins > 0, "histogram needs width > 0 and nBins > 0")
    val bin = least(greatest(
      floor((col(valueCol) - lit(lo)) / lit(width)), lit(0L)), lit(nBins - 1L))
      .cast("long")
    df.filter(col(valueCol).isNotNull)
      .groupBy(groupCols.map(col) :+ bin.as("bin"): _*)
      .agg(count(lit(1)).as("ct"))
      .withColumn("bin_lo", lit(lo) + col("bin") * lit(width))
      .withColumn("bin_hi", lit(lo) + (col("bin") + 1) * lit(width))
  }

  /** GLOBAL EXACT PERCENT-RANK without the global sort: ranking a whole
    * corpus by one score ("keep the top 30% by quality") is the classic
    * single-partition-Window trap — `percent_rank().over(Window.orderBy
    * (...))` drags every row through one task. This is the distributed
    * two-pass rendering: (1) a hash aggregate counts rows per DISTINCT
    * value; (2) a cumulative sum over that value-bounded table turns
    * counts into "rows strictly below"; (3) the rank table joins back
    * broadcast, map-side. `rank_below` = SQL `rank() - 1` (ties share a
    * rank) and `pct_ppm` = rank_below·10⁶ div (N−1) — integer-exact, so
    * the gate hashes. N reaches the plan as a one-row broadcast.
    *
    * The cumulative pass IS a single-partition window — over the
    * DISTINCT-VALUE table, not the data (same bound as e3's |types|²
    * matrix). The contract is therefore: quantize continuous scores
    * first (the gate uses ppm — ≤10⁶+1 distinct), keeping the rank
    * table bounded and its broadcast justified by construction. */
  def globalPercentRank(df: DataFrame, valueCol: String): DataFrame = {
    // NULL contract: rows with a NULL value have no rank — they are
    // excluded from the output AND from the N−1 denominator (previously
    // the null-unsafe join dropped them from the output while the
    // unfiltered count(*) still inflated pct_ppm).
    val nn = df.filter(col(valueCol).isNotNull)
    val counts = nn.groupBy(col(valueCol)).agg(count(lit(1)).as("__ct"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranks = counts
      .withColumn("__below", coalesce(sum(col("__ct")).over(w), lit(0L)))
      .select(col(valueCol), col("__below"))
    // N from the value-count table, NOT a second pass over the input —
    // the input may be an expensive upstream (x_ccnet_refine's LM score),
    // and this keeps globalPercentRank at two input traversals (counts +
    // the join-back) instead of three
    val tot = counts.agg(sum(col("__ct")).as("__n"))
    nn.join(broadcast(ranks), Seq(valueCol))
      .crossJoin(broadcast(tot))
      .withColumn("rank_below", col("__below"))
      .withColumn("pct_ppm", when(col("__n") > 1,
        expr("__below * 1000000L div (__n - 1)")).otherwise(lit(0L)))
      .drop("__below", "__n")
  }

  /** [[globalPercentRank]] for UNBOUNDED value domains — the
    * distributed prefix-sum face. The window form's cumulative rides
    * ONE partition of the distinct-value table: fine when scores are
    * quantized (the documented contract), a scale killer when the
    * domain grows with the corpus (measured: the x_quality_rank probe
    * ramps 3.1× at 10× because continuous scores make |distinct| ∝
    * |corpus|). Here the value table is RANGE-partitioned and the
    * cumulative splits into the classic two levels: a per-partition
    * running sum (distributed window, partitioned by range bucket) plus
    * per-partition offsets — P totals collected to the driver (bounded
    * MODEL state, like IVF centroids: P = shuffle partitions, never
    * data-sized) and broadcast back. `localCheckpoint` freezes the
    * sampled range boundaries so the offsets and the scan see the same
    * assignment. Result is row-identical to the window form (spec). */
  def globalPercentRankUnbounded(df: DataFrame, valueCol: String,
                                 parts: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val nn = df.filter(col(valueCol).isNotNull)
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val ranged = nn.groupBy(col(valueCol)).agg(count(lit(1)).as("__ct"))
      .repartitionByRange(p, col(valueCol))
      .sortWithinPartitions(col(valueCol))
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(true)
    val totals = ranged.groupBy(col("__pid")).agg(sum(col("__ct")).as("__pt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, pid) => acc + totals(pid)))
      .toMap // pid -> sum of totals of all smaller pids
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranks = ranged
      .withColumn("__local", coalesce(sum(col("__ct")).over(w), lit(0L)))
      .join(broadcast(offDf), "__pid")
      .select(col(valueCol), (col("__local") + col("__off")).as("__below"))
    val n = totals.values.sum
    nn.join(ranks, Seq(valueCol))
      .withColumn("rank_below", col("__below"))
      .withColumn("pct_ppm",
        if (n > 1) expr(s"__below * 1000000L div (${n}L - 1)")
        else lit(0L))
      .drop("__below")
  }

  /** GLOBAL EXACT NTILE without the global sort — the distributed face
    * of `ntile(b).over(Window.orderBy(...))`, which otherwise drags the
    * whole table through one task (the a17_rfm scale seam). Same
    * two-level prefix-sum shape as [[globalPercentRankUnbounded]], on
    * ROW positions instead of distinct-value counts (quartile cuts need
    * the global row_number, and RFM's orderings are made unique by a
    * key tie-break, so there is no value-grain to collapse to):
    * range-partition on the order columns, per-partition `row_number`
    * (distributed window keyed by partition id), plus per-partition
    * offsets — P counts collected to the driver (bounded MODEL state:
    * P = shuffle partitions, never data-sized) and broadcast back.
    * `localCheckpoint` freezes the sampled range boundaries so the
    * count pass and the rank pass see the same assignment; global
    * position is boundary-independent by construction (offsets absorb
    * whatever split the sampler picked).
    *
    * The bucket comes from the SQL-standard NTILE closed form over the
    * global position p ∈ [1, n]: with n = b·q + r, the first r buckets
    * take q+1 rows — bucket = ⌈p/(q+1)⌉ while p ≤ r·(q+1), else
    * r + ⌈(p − r·(q+1))/q⌉. Integer arithmetic throughout (exact to
    * n = 2⁶³, matches DuckDB/Spark NTILE bit-for-bit — spec'd).
    * Ties across range boundaries get an arbitrary-but-consistent
    * order, same caveat as NTILE itself; pass a unique tie-break
    * column for determinism. */
  def globalNtile(df: DataFrame, buckets: Int, order: Seq[Column],
                  out: String, parts: Int = 0): DataFrame = {
    require(buckets > 0, "globalNtile needs buckets > 0")
    val spark = df.sparkSession
    val p = if (parts > 0) parts
      else spark.conf.get("spark.sql.shuffle.partitions").toInt
    // LAZY checkpoint: the totals job below is the first action, so it
    // both materializes the ranged intermediate and collects the
    // per-partition counts — one job, not an eager-checkpoint job plus
    // a counting job (§5: a17's three nested cuts save three jobs)
    val ranged = df.repartitionByRange(p, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val totals = ranged.groupBy(col("__pid")).agg(count(lit(1)).as("__pt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val pids = totals.keys.toSeq.sorted
    val offsets = pids.zip(pids.scanLeft(0L)((acc, pid) => acc + totals(pid)))
      .toMap // pid -> rows in all smaller pids
    val n = totals.values.sum
    import spark.implicits._
    val offDf = offsets.toSeq.toDF("__pid", "__off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__pid")).orderBy(order: _*)
    val q = n / buckets
    val r = n % buckets
    val cut = r * (q + 1) // last position inside the (q+1)-sized buckets
    val qs = math.max(q, 1L) // q = 0 ⇒ else-branch unreachable; avoid div 0
    ranged
      .withColumn("__local", row_number().over(w).cast("long"))
      .join(broadcast(offDf), "__pid")
      .withColumn("__p", col("__local") + col("__off"))
      .withColumn(out,
        when(col("__p") <= lit(cut), expr(s"(__p + ${q}L) div ${q + 1}L"))
          .otherwise(lit(r) + expr(s"(__p - ${cut}L + ${qs - 1}L) div ${qs}L"))
          .cast("int"))
      .drop("__pid", "__local", "__off", "__p")
  }

  /** GROUPED exact percent-rank — `globalPercentRank` per group, the
    * cross-population score CALIBRATION step ("is this document good
    * *for its source*?"): a raw score threshold keeps different
    * fractions of differently-distributed sources, so curation
    * pipelines rank within each source before mixing. Same bounded
    * two-pass rendering: per-(group, value) counts, a cumulative sum
    * over the value table PARTITIONED BY GROUP (rows bounded by
    * |groups| × distinct values — still value-table-sized, never the
    * data; partitioning by group also removes globalPercentRank's
    * single-partition constraint), per-group totals, broadcast join
    * back. `pct_ppm` = rank_below·10⁶ div (N_g −1), integer-exact per
    * group. Quantize continuous scores first, as with the global
    * form. */
  def groupedPercentRank(df: DataFrame, groupCol: String,
                         valueCol: String): DataFrame = {
    val nn = df.filter(col(valueCol).isNotNull)
    val counts = nn.groupBy(col(groupCol), col(valueCol))
      .agg(count(lit(1)).as("__ct"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col(valueCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val ranks = counts
      .withColumn("__below", coalesce(sum(col("__ct")).over(w), lit(0L)))
      .select(col(groupCol), col(valueCol), col("__below"))
    val tot = counts.groupBy(col(groupCol)).agg(sum(col("__ct")).as("__ng"))
    nn.join(broadcast(ranks), Seq(groupCol, valueCol))
      .join(broadcast(tot), Seq(groupCol))
      .withColumn("rank_below", col("__below"))
      .withColumn("pct_ppm", when(col("__ng") > 1,
        expr("__below * 1000000L div (__ng - 1)")).otherwise(lit(0L)))
      .drop("__below", "__ng")
  }

  /** Referential-integrity audit for one declared FK relationship —
    * the data-quality pass a warehouse runs before trusting joins:
    * how many fact rows (and distinct keys) point at a dimension row
    * that does not exist. ONE left join against the DISTINCT dim keys
    * + ONE aggregate — orphan detection never runs as a separate
    * anti-join job per relation, and the dim side reduces to its key
    * set before the join (AQE broadcasts it when it fits). NULL fact
    * keys count as orphans (they join nothing), the conservative
    * reading an integrity report wants. Output: one row — relation,
    * fact_rows, orphan_rows, distinct_keys, orphan_keys,
    * coverage_ppm. */
  def fkAudit(fact: DataFrame, factKey: String, dim: DataFrame,
              dimKey: String, relation: String): DataFrame = {
    val f = fact.select(col(factKey).as("__k"))
    val dk = dim.select(col(dimKey).as("__k")).distinct()
      .withColumn("__hit", lit(1))
    f.join(dk, Seq("__k"), "left_outer")
      .agg(count(lit(1)).as("fact_rows"),
        count(when(col("__hit").isNull, 1)).as("orphan_rows"),
        countDistinct(col("__k")).as("distinct_keys"),
        countDistinct(when(col("__hit").isNull, col("__k")))
          .as("orphan_keys"))
      .select(lit(relation).as("relation"), col("fact_rows"),
        col("orphan_rows"), col("distinct_keys"), col("orphan_keys"),
        // empty fact = vacuously covered (and ANSI mode would throw on
        // the div-by-zero, aborting the whole audit union)
        when(col("fact_rows") > 0,
          expr("(fact_rows - orphan_rows) * 1000000L div fact_rows"))
          .otherwise(lit(1000000L)).as("coverage_ppm"))
  }

  private val canonAlias = "__canon"

  /** Order-independent table fingerprint — the migration-validation
    * digest: after moving/rewriting/repartitioning a 100 TB table, a
    * constant-size per-group summary that equals the source's iff the
    * CONTENT (as the canonical rendering of `cols`) is identical,
    * regardless of row order, file layout, or partitioning.
    *
    * Per row: canonical text = the chosen columns rendered to string
    * (caller casts to pin formats) each field LENGTH-PREFIXED
    * ("<len>:<text>") and joined by '|', with NULL as the bare marker
    * "N" — unambiguous: a raw join would make ('a\|b','c') equal
    * ('a','b\|c') and NULL equal a sentinel-valued string, i.e.
    * deterministic false-equal fingerprints. Row hash = the top 60
    * bits of md5. Per group, three ORDER-INDEPENDENT aggregates
    * over one scan + one tiny keyed exchange:
    *   - `xor_fp`: bit_xor of the 60-bit hashes — overflow-free at any
    *     cardinality, but an even number of identical rows cancels;
    *   - `sum_fp`: sum of hash mod 1e9+7 — catches duplicate-count
    *     changes XOR misses; exact while n < ~9.2e9 rows per group
    *     (int64 headroom), the documented bound;
    *   - `ct`: row count.
    * A pair differing in any of the three differs in content; all
    * three equal is a collision-probability statement (~2⁻⁶⁰ per
    * changed row), the standard fingerprint contract. */
  def tableFingerprint(df: DataFrame, groupCol: String,
                       cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "tableFingerprint needs at least one column")
    // UNAMBIGUOUS canonical rendering: each field is length-prefixed
    // ("<len>:<text>"), NULL is the bare marker "N" (no real field
    // starts without digits + ':'). A raw '|' join would equate
    // ('a|b','c') with ('a','b|c') and NULL with a sentinel-valued
    // string — deterministic false-equal fingerprints, not 2^-60 ones.
    val canon = concat_ws("|",
      cols.map { c =>
        val s = col(c).cast("string")
        coalesce(concat(length(s).cast("string"), lit(":"), s), lit("N"))
      }: _*)
    val h = expr(s"conv(substr(md5(${canonAlias}), 1, 15), 16, 10)")
    df.withColumn(canonAlias, canon)
      .withColumn("__h", h.cast("long"))
      .groupBy(col(groupCol))
      .agg(expr("bit_xor(__h)").as("xor_fp"),
        sum(pmod(col("__h"), lit(1000000007L))).as("sum_fp"),
        count(lit(1)).as("ct"))
  }
}
