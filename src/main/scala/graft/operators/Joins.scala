package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.IntegralDivide
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SparkInternals

/** Join operators Spark lacks as built-ins, composed from existing ops
  * so Catalyst/AQE still own the physical planning (SURVEY §7.3: custom
  * plans only where composition genuinely cannot express the
  * semantics — both of these can).
  */
object Joins {

  /** AS-OF JOIN: for each left row, attach the single most recent right
    * row with the same `key` and `right.time <= left.time` (inclusive).
    * The canonical "what was in effect at this moment" lookup — last
    * click before a purchase, latest config before an event, the
    * reference's dim-at-event-time enrichment generalized to a
    * time-versioned right side.
    *
    * Implementation is the union trick, NOT a join: both sides union
    * into one stream tagged by side, one shuffle on `key`, one
    * within-partition sort by (time, side), and `last(_, ignoreNulls)`
    * over the running window fills each left row with the right row in
    * effect. Cost = exactly a sort-merge join's shuffle+sort WITHOUT
    * the range-explosion a theta-join `r.time <= l.time` would produce
    * (Spark plans that as BroadcastNestedLoop or a per-key cross
    * product — quadratic per key; this is linear). At equal timestamps
    * the right row sorts first, making the match inclusive; among
    * right-side timestamp ties `tieBreak` (ascending, last wins) keeps
    * the result deterministic.
    *
    * 100 TB: one shuffle of |L|+|R| rows keyed by `key`; skew follows
    * key popularity exactly as any keyed join (salt upstream if one key
    * dominates). No state, no driver work.
    *
    * Output: every left column, plus each non-key right column as
    * `<rightPrefix><col>` (null when no right row precedes).
    *
    * `direction = "forward"` attaches the nearest FOLLOWING right row
    * instead (`right.time >= left.time`, still inclusive); `tolerance`
    * bounds the matched gap pandas-merge_asof-style — a match farther
    * than the bound comes back as all-null, atomically. Both compose
    * with the same single-shuffle plan. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               rightPrefix: String = "r_", tieBreak: Option[String] = None,
               direction: String = "backward",
               tolerance: Option[Column] = None): DataFrame = {
    require(Set("backward", "forward")(direction),
      s"asofJoin direction must be backward|forward, got $direction")
    val forward = direction == "forward"
    val lExtra = left.columns.toSeq.filterNot(c => c == key || c == time)
    val rExtra = right.columns.toSeq.filterNot(_ == key)
    // ALL right payload columns travel as ONE struct: a per-column
    // last(ignoreNulls) fill would mix values from different right rows
    // whenever a right column holds NULL (and would resurrect a stale
    // value over a genuine NULL in the newest match) — packing makes the
    // attached row atomic and preserves its NULLs.
    val rStruct = org.apache.spark.sql.types.StructType(rExtra.map(right.schema(_)))
    val lU = left.select(
      Seq(col(key), col(time)) ++ lExtra.map(col) :+
        lit(null).cast(rStruct).as("__r") :+ lit(1).as("__side"): _*)
    val rU = right.select(
      Seq(col(key), col(time)) ++
        lExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rExtra.map(col): _*).as("__r") :+ lit(0).as("__side"): _*)
    // forward flips the time ordering, so the running last() sees rows
    // with LARGER times first and each left row picks the nearest
    // following right; __side asc keeps the right row first at time
    // ties in both directions (inclusive match)
    val timeOrd = if (forward) col(time).desc else col(time).asc
    val order = Seq(timeOrd, col("__side")) ++
      tieBreak.map(c => col("__r").getField(c).asc_nulls_first)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = lU.unionByName(rU)
      .withColumn("__r", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    // tolerance bounds the matched gap (pandas merge_asof semantics):
    // a match farther than `tolerance` nulls the WHOLE attached row —
    // post-filtering the struct keeps it atomic
    val bounded = tolerance match {
      case Some(tol) =>
        val gap =
          if (forward) col("__r").getField(time) - col(time)
          else col(time) - col("__r").getField(time)
        filled.withColumn("__r", when(col("__r").isNotNull && gap <= tol, col("__r")))
      case None => filled
    }
    bounded.select(Seq(col(key), col(time)) ++ lExtra.map(col) ++
      rExtra.map(c => col("__r").getField(c).as(rightPrefix + c)): _*)
  }

  /** AS-OF NEAREST (pandas merge_asof `direction='nearest'`): attach
    * whichever of the most-recent-preceding and nearest-following right
    * rows sits closer in time; equal distance prefers the backward
    * match (pandas convention). `leftId` must uniquely identify left
    * rows — the two directional passes (each the one-shuffle plan
    * above) re-join on it to pick per row, so the total cost is two
    * keyed shuffles plus an id-keyed join. `tolerance` applies to each
    * direction before the pick. */
  def asofJoinNearest(left: DataFrame, right: DataFrame, key: String,
                      time: String, leftId: String,
                      rightPrefix: String = "r_",
                      tieBreak: Option[String] = None,
                      tolerance: Option[Column] = None): DataFrame = {
    val rExtra = right.columns.toSeq.filterNot(_ == key)
    def packed(direction: String, tag: String): DataFrame = {
      val joined = asofJoin(left, right, key, time, rightPrefix = "__x_",
        tieBreak = tieBreak, direction = direction, tolerance = tolerance)
      joined.select(col(leftId),
        when(col(s"__x_$time").isNotNull,
          struct(rExtra.map(c => col(s"__x_$c").as(c)): _*)).as(tag))
    }
    val b = packed("backward", "__b")
    val f = packed("forward", "__f")
    val bGap = col(time) - col("__b").getField(time)
    val fGap = col("__f").getField(time) - col(time)
    val pick = when(col("__f").isNull, col("__b"))
      .when(col("__b").isNull, col("__f"))
      .when(bGap <= fGap, col("__b")) // tie -> backward, pandas convention
      .otherwise(col("__f"))
    left.join(b, leftId).join(f, leftId)
      .withColumn("__r", pick)
      .select(left.columns.map(col) ++
        rExtra.map(c => col("__r").getField(c).as(rightPrefix + c)): _*)
  }

  /** BIN-ACCELERATED RANGE JOIN: `facts` joined to `ranges` on
    * `lo <= value < hi` — the price-band / IP-block / score-bucket
    * lookup, where ranges may overlap (each fact can match several).
    *
    * The naive plan for a non-equi join is a nested loop: fine when
    * `ranges` broadcasts, quadratic disaster when it does not. This
    * operator maps the inequality onto an EQUI-join both Catalyst and
    * a 1000-executor shuffle can handle: each range explodes to the
    * integer bins it covers (`ceil(span/binWidth)+1` rows), each fact
    * computes its single bin, the two sides hash-join on bin, and the
    * exact predicate re-filters the candidates. Work = |facts| +
    * Σ spans/binWidth, shuffled on uniformly-distributed bin keys —
    * linear, broadcast-free, and AQE still picks broadcast when the
    * exploded range side happens to be small.
    *
    * `value`, `lo`, `hi` must be integral (LongType semantics) — scale
    * fractional inputs to integers first (e.g. cents), which is also
    * what keeps the predicate bit-exact cross-engine. `binWidth` trades
    * exploded-range size against candidate precision; a width near the
    * median span is a good default. */
  def rangeJoinBinned(facts: DataFrame, ranges: DataFrame,
                      value: String, lo: String, hi: String,
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // exact integer floor-div: (l - pmod(l,w)) is an exact multiple of w,
    // and the divide is SQL `div` (IntegralDivide — int64 end to end).
    // Column./ would be DOUBLE division: above 2^53 the operands round,
    // a fact lands in the wrong bin, and because the exact re-filter only
    // removes false positives the join would silently MISS matches.
    def fdiv(c: Column) = {
      val l = c.cast("long")
      SparkInternals.column(IntegralDivide(
        SparkInternals.expression(l - pmod(l, lit(binWidth))),
        SparkInternals.expression(lit(binWidth))))
    }
    val f = facts.withColumn("__bin", fdiv(col(value)))
    val r = ranges.select(col("*"),
      explode(sequence(fdiv(col(lo)),
        // hi is exclusive: a range ending exactly on a bin edge does
        // not reach into that bin
        fdiv(col(hi).cast("long") - 1))).as("__bin"))
    f.join(r, Seq("__bin"))
      .filter(col(value) >= col(lo) && col(value) < col(hi))
      .drop("__bin")
  }

  /** RANGE-OVERLAP JOIN: pairs of intervals that overlap —
    * `a.lo < b.hi AND b.lo < a.hi` (half-open) — the sessions-overlap /
    * genomics / booking-conflict shape, where BOTH sides are ranges
    * (`rangeJoinBinned` above is the point-in-range case).
    *
    * Same bin mapping: both sides explode to the integer bins they
    * cover and equi-join on bin. Overlapping intervals share at least
    * one bin, but usually SEVERAL — instead of a `distinct` shuffle to
    * dedupe multi-bin pairs, each pair is emitted exactly once by
    * keeping only the FIRST shared bin: for contiguous bin ranges
    * that is `max(bin(a.lo), bin(b.lo))`, a map-side predicate. Work =
    * Σ spans/binWidth on each side, shuffled on uniform bin keys; the
    * exact predicate re-filters false bin-mates. Bounds must be
    * integral (same contract as rangeJoinBinned) and intervals
    * NON-EMPTY (`lo < hi`): the standard overlap predicate cannot
    * exclude an empty `[x, x)` straddled by the other side, and an
    * empty interval's bin range would explode descending. */
  def rangeOverlapJoin(a: DataFrame, b: DataFrame,
                       aLo: String, aHi: String, bLo: String, bHi: String,
                       binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def fdiv(c: Column) = {
      val l = c.cast("long")
      SparkInternals.column(IntegralDivide(
        SparkInternals.expression(l - pmod(l, lit(binWidth))),
        SparkInternals.expression(lit(binWidth))))
    }
    val aB = a.select(col("*"),
      explode(sequence(fdiv(col(aLo)), fdiv(col(aHi).cast("long") - 1))).as("__bin"))
    val bB = b.select(col("*"),
      explode(sequence(fdiv(col(bLo)), fdiv(col(bHi).cast("long") - 1))).as("__bin"))
    aB.join(bB, Seq("__bin"))
      .filter(col(aLo) < col(bHi) && col(bLo) < col(aHi))
      // first-shared-bin: emit each overlapping pair exactly once
      .filter(col("__bin") === greatest(fdiv(col(aLo)), fdiv(col(bLo))))
      .drop("__bin")
  }

  /** SKEW-SALTED JOIN: equi-join where a handful of hot keys would
    * otherwise send most of the probe side through a handful of reducer
    * tasks (the classic "5 event types, 100 TB of events" shape — AQE's
    * skew-join split helps sort-merge plans after the fact, but a
    * 5-distinct-key join cannot parallelize beyond 5 tasks at all
    * without changing the key).
    *
    * `probe`'s key is widened to (key, salt) with a per-row salt in
    * [0, buckets); `build` replicates each row `buckets` times, once per
    * salt value. The join then shuffles on (key, salt) — `buckets`×
    * more, uniformly loaded, partitions per hot key — and produces
    * EXACTLY the rows of the plain join (each probe row still meets each
    * matching build row exactly once, against its own salt replica).
    * Salt assignment hashes the probe row's non-key columns MIXED with
    * `spark_partition_id()`: a value-only hash would send byte-identical
    * duplicate rows (the common real skew) all to one bucket, defeating
    * the spread, while the source partition id separates them and stays
    * replay-deterministic (a task retry re-reads the same input split).
    * Which bucket a row lands in never affects the result set, only the
    * load balance.
    *
    * Cost: build side ×`buckets` (keep `buckets` small — 8-32 — and the
    * build side the SMALL side; at that size AQE usually broadcasts the
    * replicated build anyway, collapsing the whole thing back to a
    * broadcast join, which is strictly fine). Supports inner and
    * left-outer (probe = left): every probe row keeps exactly its plain
    * join multiplicity.
    *
    * 100 TB: the probe side never replicates and shuffles once on the
    * salted key; no driver work, no state. */
  def saltedJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                 buckets: Int, joinType: String = "inner"): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(Set("inner", "left", "left_outer")(joinType),
      s"saltedJoin supports inner/left joins (probe side preserved), got $joinType")
    val nonKey = probe.columns.toSeq.filterNot(keys.contains)
    val salted = probe.withColumn("__salt",
      pmod(hash(nonKey.map(col) :+ spark_partition_id(): _*), lit(buckets)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(replicated, keys :+ "__salt", joinType).drop("__salt")
  }

  /** The NATIVE as-of join — same backward-inclusive semantics and
    * output contract as [[asofJoin]] (left columns + `<rightPrefix>`ed
    * right non-key columns; greatest `tieBreak` wins time ties), but
    * planned as the custom whole-operator physical plan
    * (`plans/AsofJoinExec`): co-clustered sorted children + a
    * two-pointer streaming merge with ONE buffered right row of state —
    * no union materialization, no window buffers, and zero exchanges
    * when the inputs are already bucketed/partitioned on the key.
    * Requires `graft.GraftExtensions` on the session (the planner
    * strategy is injected there). */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
                     time: String, rightPrefix: String = "r_",
                     tieBreak: Option[String] = None): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, NamedExpression}
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val spark = left.sparkSession
    // self-arming: sessions built without spark.sql.extensions=
    // graft.GraftExtensions still get the strategy (public API)
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    val lPlan = SparkInternals.analyzedPlan(left)
    val rPlan0 = SparkInternals.analyzedPlan(right)
    // self-join shape: both sides built from the same source share
    // exprIds — the analyzer's DeduplicateRelations never sees a
    // post-analysis custom node, so re-alias the right side ourselves
    // (otherwise column pruning resolves "right" attrs to the left
    // child and empties the right scan)
    val rPlan =
      if (lPlan.outputSet.intersect(rPlan0.outputSet).isEmpty) rPlan0
      else Project(rPlan0.output.map(a => Alias(a, a.name)()), rPlan0)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
             n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"asofJoinNative: no column '$n'"))
    // the merge compares key-to-key and time-to-time across sides with
    // ONE comparator each — mismatched types would CCE at runtime in
    // the interpreted path (and silently widen in the primitive one)
    require(attr(lPlan, key).dataType == attr(rPlan, key).dataType,
      s"asofJoinNative: key type mismatch: " +
        s"${attr(lPlan, key).dataType} vs ${attr(rPlan, key).dataType}")
    require(attr(lPlan, time).dataType == attr(rPlan, time).dataType,
      s"asofJoinNative: time type mismatch: " +
        s"${attr(lPlan, time).dataType} vs ${attr(rPlan, time).dataType}")
    val node = AsofJoinNodeShim.build(lPlan, rPlan,
      attr(lPlan, key), attr(lPlan, time),
      attr(rPlan, key), attr(rPlan, time), tieBreak.map(attr(rPlan, _)))
    // project to the asofJoin output contract by ATTRIBUTE (names
    // collide across sides; exprIds don't)
    // column ORDER mirrors asofJoin exactly — (key, time, left extras,
    // prefixed right extras) — so the native tier is a positional
    // drop-in, not just a by-name one
    val lExtras = left.columns.toSeq.filterNot(c => c == key || c == time)
    val rightExtras = right.columns.toSeq.filterNot(_ == key)
    val outCols: Seq[NamedExpression] =
      (Seq(key, time).map(n => attr(lPlan, n): NamedExpression)) ++
        lExtras.map(n => attr(lPlan, n): NamedExpression) ++
        rightExtras.map(n =>
          Alias(attr(rPlan, n).withNullability(true), rightPrefix + n)())
    SparkInternals.ofRows(spark, Project(outCols, node))
  }
}

/** Indirection keeping `operators` free of a hard reference to the
  * plans package at definition site (and a single seam for tests). */
private object AsofJoinNodeShim {
  def build(l: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
            r: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
            lk: org.apache.spark.sql.catalyst.expressions.Attribute,
            lt: org.apache.spark.sql.catalyst.expressions.Attribute,
            rk: org.apache.spark.sql.catalyst.expressions.Attribute,
            rt: org.apache.spark.sql.catalyst.expressions.Attribute,
            tie: Option[org.apache.spark.sql.catalyst.expressions.Attribute])
    : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    graft.plans.AsofJoinNode(l, r, lk, lt, rk, rt, tie)
}
