package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * grid per key and forward-fill the gaps — the step between raw events
  * and anything that assumes one row per (entity, period): feature
  * windows, dashboards, trend models.
  */
object TimeSeries {

  /** Per-key fixed-step resample with gap rows and forward fill.
    *
    * 1. bucket events to `date_trunc(step)` and apply `aggs`;
    * 2. build each key's complete bucket SPINE (min..max, `sequence` +
    *    explode — rows per key = its own span, nothing global);
    * 3. left-join the aggregates onto the spine (empty buckets stay
    *    null);
    * 4. forward-fill the columns named in `fill` with a running
    *    `last(ignoreNulls)` per key.
    *
    * Cost: one keyed aggregate, one (key, bucket) join, one keyed
    * window — all partition on the entity key, so tasks stay
    * entity-sized at any corpus size; the spine explode is bounded by
    * span/step per key. `step` is a `date_trunc` unit ("day", "hour").
    * Count-like columns come back null on gap rows — coalesce at the
    * call site if zeros are wanted (the fill is only applied to
    * `fill`). */
  def gapFillFfill(df: DataFrame, key: String, time: String, step: String,
                   aggs: Seq[(String, Column)],
                   fill: Seq[String]): DataFrame = {
    require(aggs.nonEmpty, "gapFillFfill needs at least one aggregate")
    require(fill.forall(aggs.map(_._1).contains), "fill names must be agg outputs")
    val bucketed = df
      .groupBy(col(key), date_trunc(step, col(time)).as("bucket"))
      .agg(aggs.head._2.as(aggs.head._1),
        aggs.tail.map { case (n, c) => c.as(n) }: _*)
    val spine = bucketed.groupBy(col(key))
      .agg(min(col("bucket")).as("__lo"), max(col("bucket")).as("__hi"))
      .select(col(key), explode(
        sequence(col("__lo"), col("__hi"), expr(s"INTERVAL 1 $step"))).as("bucket"))
    val joined = spine.join(bucketed, Seq(key, "bucket"), "left_outer")
    val w = Window.partitionBy(col(key)).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fill.foldLeft(joined) { (d, c) =>
      d.withColumn(s"${c}_filled", last(col(c), ignoreNulls = true).over(w))
    }
  }

  /** OHLC downsampling: per (key, `date_trunc(step)` bucket) the
    * classic open/high/low/close bar plus row count — raw ticks to
    * fixed-period bars in ONE hash aggregate (map-side partials; no
    * window, no sort, no shuffle beyond the one on the bounded
    * (key, bucket) grain).
    *
    * Open/close are selected by lexicographic `min`/`max` over a
    * `struct(time, tie, value)` — first/last row by (time, tie) with
    * the tie column making equal-timestamp buckets deterministic. The
    * struct min/max is itself a plain aggregate, so partial aggregation
    * applies; the `first_value OVER (...)` window rendering would sort
    * every bucket instead. */
  /** TWAP — TIME-weighted average per (key, bucket): each observation's
    * value holds from its timestamp until the next observation in the
    * bucket (the last one holds to the bucket edge), so irregular
    * sampling doesn't bias the mean toward chatty periods — the
    * standard fix OHLC's plain `avg` can't give. twap =
    * Σ value·dur_us / Σ dur_us with the value exact-decimal and the
    * duration integral, so the only float op is ONE final division —
    * deterministic cross-engine.
    *
    * Plan: a lead() window and the closing aggregate share the same
    * (key, bucket-grain) partitioning — one shuffle carries both. A
    * zero-duration observation (superseded same-microsecond tick)
    * contributes nothing, by construction. Weighted by a volume column
    * instead of time, the same aggregate is VWAP; that face is
    * `vwap`. */
  def twap(df: DataFrame, key: String, time: String, tie: String,
           value: String, step: String): DataFrame = {
    val bucket = date_trunc(step, col(time))
    val w = Window.partitionBy(col(key), bucket)
      .orderBy(col(time), col(tie))
    val bucketEndUs = unix_micros(bucket + expr(s"INTERVAL 1 $step"))
    val durUs = coalesce(lead(unix_micros(col(time)), 1).over(w), bucketEndUs) -
      unix_micros(col(time))
    df.withColumn("__dur", durUs)
      .groupBy(col(key), bucket.as("bucket"))
      .agg(
        (sum(col(value).cast("decimal(18,2)") * col("__dur"))
          .cast("double") / sum(col("__dur")).cast("double")).as("twap"),
        count(lit(1)).as("ct"))
  }

  /** VWAP — the same weighted mean with an explicit weight column
    * (volume): one hash aggregate, exact decimal sums, one division. */
  def vwap(df: DataFrame, key: String, time: String, value: String,
           volume: String, step: String): DataFrame =
    df.groupBy(col(key), date_trunc(step, col(time)).as("bucket"))
      .agg(
        (sum(col(value).cast("decimal(18,2)") * col(volume).cast("decimal(18,2)"))
          .cast("double") /
         sum(col(volume).cast("decimal(18,2)")).cast("double")).as("vwap"),
        sum(col(volume).cast("decimal(18,2)")).cast("double").as("volume"),
        count(lit(1)).as("ct"))

  def ohlcBars(df: DataFrame, key: String, time: String, tie: String,
               value: String, step: String): DataFrame = {
    val o = struct(col(time), col(tie), col(value).as("v"))
    df.groupBy(col(key), date_trunc(step, col(time)).as("bucket"))
      .agg(
        min(o).getField("v").as("open"),
        max(col(value)).as("high"),
        min(col(value)).as("low"),
        max(o).getField("v").as("close"),
        count(lit(1)).as("ct"))
  }

  /** The exact dyadic half-life weights 2⁻ᵈ for d = 0..cap, as literal
    * decimal strings — 1/2ᵈ terminates in exactly d decimal digits, so
    * scale `cap` represents every weight EXACTLY, and both engines can
    * embed the identical constants (no pow(), no float). */
  def dyadicWeights(cap: Int): IndexedSeq[java.math.BigDecimal] = {
    require(cap >= 0 && cap <= 30, "dyadic weights: cap must be in [0, 30]")
    (0 to cap).map(d => java.math.BigDecimal.ONE
      .divide(new java.math.BigDecimal(2).pow(d)).setScale(cap))
  }

  /** Time-decayed engagement score — the recency-weighted popularity
    * every feed/trending surface runs: each event contributes
    * 2^(−age/halfLife), so yesterday counts half of today and last
    * month barely registers. Exponential decay is the one weighting
    * that can later be maintained INCREMENTALLY (score(t+Δ) =
    * score(t)·2^(−Δ/h) + new events) — why it, and not a sliding
    * window, is the standard at feed scale.
    *
    * Kept hash-exact cross-engine by construction: age quantizes to
    * whole half-lives (integer division on epoch micros), the weight
    * table 2⁻ᵈ for d ≤ `capHalfLives` is dyadic — exact in
    * decimal(36,30) — and events older than the cap contribute 0
    * (beyond 30 half-lives a contribution is < 2⁻³⁰ ≈ 1e-9 of one
    * fresh event — below any ranking's resolution, and dropping it is
    * what bounds the decimal scale). Plan: one scalar max (broadcast
    * one-row
    * cross join), one map-side weight lookup, ONE keyed hash
    * aggregate — no window, no per-key sort, partials combine
    * map-side; the 100 TB cost is a scan plus a |keys|-sized shuffle.
    *
    * Returns (key, n_events, n_live, decayed_score): `n_live` counts
    * the in-horizon events actually contributing. */
  def decayedScore(df: DataFrame, key: String, time: String,
                   halfLife: String = "1 day",
                   capHalfLives: Int = 30): DataFrame =
    decayedPipeline(df, key, time, halfLife, capHalfLives,
      array(dyadicWeights(capHalfLives)
        .map(w => lit(w).cast("decimal(36,30)")): _*),
      "decayed_score")

  /** The one shared decay pipeline — both renderings differ ONLY in
    * the literal weight array and the score column name, so the
    * half-life table, anchor broadcast, age bucketing and aggregate
    * can never drift apart. */
  private def decayedPipeline(df: DataFrame, key: String, time: String,
                              halfLife: String, capHalfLives: Int,
                              warr: org.apache.spark.sql.Column,
                              scoreCol: String): DataFrame = {
    require(capHalfLives >= 0 && capHalfLives <= 30,
      "decayedScore: cap must be in [0, 30]")
    val stepUs: Long = halfLife match {
      case "1 day"  => 86400000000L
      case "1 hour" => 3600000000L
      case "1 week" => 7L * 86400000000L
      case other => throw new IllegalArgumentException(
        s"decayedScore: unsupported half-life '$other'")
    }
    val e = df.withColumn("__us", unix_micros(col(time)))
    val anchor = e.agg(max(col("__us")).as("__anchor_us"))
    e.crossJoin(broadcast(anchor))
      .withColumn("__age", expr(s"(__anchor_us - __us) div $stepUs"))
      .withColumn("__w",
        when(col("__age") <= capHalfLives,
          element_at(warr, (col("__age") + 1).cast("int")))
          .otherwise(lit(null)))
      .groupBy(col(key))
      .agg(count(lit(1)).as("n_events"),
        count(col("__w")).as("n_live"),
        sum(col("__w")).as(scoreCol))
  }

  /** Fixed-point rendering of [[decayedScore]]: the identical plan and
    * semantics, but each weight 2⁻ᵈ is emitted pre-scaled by 2^cap —
    * i.e. as the exact int64 2^(cap−d) — and the score column is
    * `score_2p30` = decayed_score · 2^cap, a plain BIGINT sum. Why it
    * exists: a decimal(38,30) sum is value-exact but REPRESENTATION-
    * fragile across engines (arrow vs duckdb decimal→float renderings
    * hash differently even when equal); an int64 has exactly one
    * representation everywhere. Overflow headroom: max weight 2³⁰ ≈
    * 1.07e9, so int64 holds ~8.6e9 fresh events per key before the sum
    * could wrap — far beyond any per-key event count this score is run
    * at (and the decimal variant remains for callers who want the
    * unscaled value). */
  def decayedScoreFixedPoint(df: DataFrame, key: String, time: String,
                             halfLife: String = "1 day",
                             capHalfLives: Int = 30): DataFrame =
    decayedPipeline(df, key, time, halfLife, capHalfLives,
      array((0 to capHalfLives)
        .map(d => lit(1L << (capHalfLives - d))): _*),
      "score_2p30")

  /** Exact sliding-window median over a fixed ODD frame: two lazy-
    * deletion heaps (max-heap lower half, min-heap upper half) so each
    * slide is O(log w) amortized instead of the O(w log w) a re-sorted
    * frame costs. The window's live contents are always known to the
    * caller (its ring buffer), so heap garbage is bounded by periodic
    * full rebuilds from that buffer — memory stays O(w) per key no
    * matter how long the stream, the property that matters at
    * production frame sizes. Median = top of `lo` (odd frame keeps the
    * extra element on the lower side). */
  final class SlidingMedian(frame: Int) {
    require(frame >= 1 && frame % 2 == 1, "SlidingMedian: odd frame only")
    private val lo = new java.util.PriorityQueue[java.lang.Long](
      frame, java.util.Collections.reverseOrder[java.lang.Long]())
    private val hi = new java.util.PriorityQueue[java.lang.Long](frame)
    private val delayed = new java.util.HashMap[Long, Int]()
    private var loValid = 0
    private var hiValid = 0

    private def prune(h: java.util.PriorityQueue[java.lang.Long]): Unit = {
      while (!h.isEmpty && delayed.getOrDefault(h.peek.longValue, 0) > 0) {
        val v = h.poll().longValue
        val c = delayed.get(v) - 1
        if (c == 0) delayed.remove(v) else delayed.put(v, c)
      }
    }
    private def rebalance(): Unit = {
      if (loValid > hiValid + 1) {
        prune(lo); hi.offer(lo.poll()); loValid -= 1; hiValid += 1; prune(lo)
      } else if (loValid < hiValid) {
        prune(hi); lo.offer(hi.poll()); hiValid -= 1; loValid += 1; prune(hi)
      }
    }
    def add(x: Long): Unit = {
      prune(lo)
      if (loValid == 0 || x <= lo.peek.longValue) { lo.offer(x); loValid += 1 }
      else { hi.offer(x); hiValid += 1 }
      rebalance()
    }
    /** Logical removal (the departing element may sit anywhere in a
      * heap): valid elements keep the partition max(lo) ≤ min(hi), so
      * x ≤ lo.top locates its half; equal values are interchangeable. */
    def remove(x: Long): Unit = {
      prune(lo)
      if (loValid > 0 && x <= lo.peek.longValue) loValid -= 1 else hiValid -= 1
      delayed.put(x, delayed.getOrDefault(x, 0) + 1)
      prune(lo); prune(hi)
      rebalance()
    }
    def median: Long = { prune(lo); lo.peek.longValue }
    /** Physical size incl. lazy-deleted garbage — the rebuild trigger. */
    def physicalSize: Int = lo.size + hi.size
    def reset(): Unit = {
      lo.clear(); hi.clear(); delayed.clear(); loValid = 0; hiValid = 0
    }
    /** O(w log w) rebuild from the window's live contents — called by
      * the owner when garbage passes a multiple of the frame, bounding
      * memory at O(w) with O(log w) amortized slide cost. */
    def rebuild(window: Iterable[Long]): Unit = {
      reset()
      val sorted = window.toArray.sorted
      val cut = (sorted.length + 1) / 2
      var i = 0
      while (i < cut) { lo.offer(sorted(i)); i += 1 }
      while (i < sorted.length) { hi.offer(sorted(i)); i += 1 }
      loValid = cut; hiValid = sorted.length - cut
    }
  }

  /** Rolling exact median at PRODUCTION frame sizes — the constant-
    * factor swap documented on `queries/Windows.w19RollingMedian`: the
    * collect_list+array_sort window carries the whole frame per row
    * (O(w log w) per slide — fine at w=21, fatal at w in the
    * thousands); this path rides the IDENTICAL plan skeleton — one
    * hash exchange on the key, one per-partition sort on (key, order)
    * — but slides a two-heap order-statistic structure at O(log w)
    * amortized per row with O(w) state per key.
    *
    * Why mapPartitions and not an Aggregator/window function: Spark
    * evaluates imperative aggregates over ROWS BETWEEN frames by
    * re-accumulating the full frame per row — there is no retractable
    * (`remove`) contract in the window-function API — so a UDAF cannot
    * beat O(w) per slide; the secondary-sort mapPartitions is the one
    * shape that can retract. This is the documented last-resort tier
    * of the custom-operator preference order, taken knowingly.
    *
    * Contract identical to the array form: rows sorted by `order`
    * within `key`, each row scored against the trailing `frame`-row
    * window INCLUDING itself, warm-up rows (fewer than `frame`
    * predecessors) excluded, NULL values excluded before framing.
    * Appends `medCol` (long) to the input schema. */
  def rollingMedianLarge(df: DataFrame, key: String, order: Seq[String],
                         value: String, frame: Int,
                         medCol: String = "med"): DataFrame = {
    require(frame >= 1 && frame % 2 == 1, "rollingMedianLarge: odd frame")
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField}
    require(df.schema(value).dataType == LongType,
      s"rollingMedianLarge: value column '$value' must be LongType " +
        s"(got ${df.schema(value).dataType}) — cast upstream; failing " +
        "here beats a per-task ClassCastException after the sort")
    val sorted = df.filter(col(value).isNotNull)
      .repartition(col(key))
      .sortWithinPartitions((key +: order).map(col): _*)
    val schema = sorted.schema
    val outSchema = schema.add(StructField(medCol, LongType, nullable = false))
    val keyIdx = schema.fieldIndex(key)
    val vIdx = schema.fieldIndex(value)
    sorted.mapPartitions { iter =>
      val med = new SlidingMedian(frame)
      val window = new scala.collection.mutable.Queue[Long]()
      var curKey: Any = null
      var started = false
      iter.flatMap { r =>
        val k = r.get(keyIdx)
        if (!started || k != curKey) {
          med.reset(); window.clear(); curKey = k; started = true
        }
        val x = r.getLong(vIdx)
        if (window.size == frame) med.remove(window.dequeue())
        window.enqueue(x); med.add(x)
        if (med.physicalSize > 4 * frame) med.rebuild(window)
        if (window.size == frame)
          Some(Row.fromSeq(r.toSeq :+ med.median))
        else None
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }
}
