package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
    * `<rightPrefix><col>` (null when no right row precedes). */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, time: String,
               rightPrefix: String = "r_", tieBreak: Option[String] = None)
              : DataFrame = {
    val lExtra = left.columns.toSeq.filterNot(c => c == key || c == time)
    val rExtra = right.columns.toSeq.filterNot(_ == key)
    val lU = left.select(
      Seq(col(key), col(time)) ++ lExtra.map(col) ++
        rExtra.map(c => lit(null).cast(right.schema(c).dataType)
          .as(rightPrefix + c)) :+ lit(1).as("__side"): _*)
    val rU = right.select(
      Seq(col(key), col(time)) ++
        lExtra.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rExtra.map(c => col(c).as(rightPrefix + c)) :+ lit(0).as("__side"): _*)
    val order = Seq(col(time), col("__side")) ++
      tieBreak.map(c => col(rightPrefix + c).asc_nulls_first)
    val w = Window.partitionBy(col(key)).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = rExtra.foldLeft(lU.unionByName(rU)) { (d, c) =>
      d.withColumn(rightPrefix + c,
        last(col(rightPrefix + c), ignoreNulls = true).over(w))
    }
    filled.filter(col("__side") === 1).drop("__side")
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
    // exact integer floor-div (inputs are non-negative integral by
    // contract; (c - c%w)/w keeps every step exact in int64)
    def fdiv(c: org.apache.spark.sql.Column) = {
      val l = c.cast("long")
      ((l - pmod(l, lit(binWidth))) / binWidth).cast("long")
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
}
