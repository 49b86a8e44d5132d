package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.NetOps

/** Network-address analytics: the longest-prefix-match (LPM) join —
  * enrich fact rows carrying an IPv4 address with attributes of the
  * most specific CIDR block containing it (routing tables, GeoIP/ASN
  * feeds, allow/deny lists).
  *
  * Plan shape: LPM is not an equi-join (containment is a range
  * predicate), but it decomposes into ONE equi-join per distinct
  * prefix length: a /16 block contains an address iff the address's
  * top 16 bits equal the block's network bits. The distinct lengths
  * present in the dim table are collected (driver-bounded: at most 33
  * values, a one-column aggregate over the dim side) and the fact
  * side takes one BROADCAST left join per length, most-specific
  * first, resolved with `coalesce`. A real routing/GeoIP table is
  * MBs — broadcast is the right plan at any fact scale, and the whole
  * enrichment is then map-side: zero shuffles, zero fact-row
  * duplication (the alternative — exploding every fact row by all K
  * lengths and re-grouping to pick the longest — shuffles K×N rows
  * for nothing when the dim fits in memory).
  *
  * Requirements: dim rows unique per normalized (net, len) — enforced
  * here with a dedup (first row per block wins, deterministic by the
  * attr ordering) so a dirty feed cannot silently duplicate fact
  * rows. Malformed CIDRs are dropped; facts with malformed addresses
  * pass through unmatched (null attrs), the total-parser contract.
  *
  * Reference scope: beyond-reference (SURVEY §2.10) — the reference
  * enriches by key equality only (dim lookups, SURVEY §2.3 J3).
  */
object Net {

  /** Network key of `ip` at prefix length `len` (top `len` bits). Null
    * ip must yield null (NOT a constant) so an unparseable address
    * cannot match even a /0 catch-all block. */
  private def netAt(ip: Column, len: Int): Column =
    if (len == 0) when(ip.isNotNull, lit(0L))
    else shiftleft(shiftright(ip, 32 - len), 32 - len)

  /** Left-enriches `facts` with `attrs` columns of the longest matching
    * CIDR block from `dims`, plus `prefix_len` (null when unmatched).
    * `ipStr` is a dotted-quad string column on the fact side; `cidrStr`
    * a "a.b.c.d/len" string column on the dim side.
    */
  def lpmJoin(facts: DataFrame, ipStr: Column, dims: DataFrame,
              cidrStr: Column, attrs: Seq[String]): DataFrame = {
    val parsed = dims
      .withColumn("__c", NetOps.cidrCol(cidrStr))
      .filter(col("__c").isNotNull)
      .select(col("__c.net").as("__net") +: col("__c.len").as("__len") +:
        attrs.map(col): _*)
      // one row per normalized block: deterministic keep-first by attrs
      .groupBy(col("__net"), col("__len"))
      .agg(min(struct(attrs.map(col): _*)).as("__a"))
      .select(col("__net") +: col("__len") +:
        attrs.map(a => col(s"__a.$a").as(a)): _*)

    // ≤33 distinct lengths; tiny driver-side collect by design
    val lens = parsed.select("__len").distinct()
      .collect().map(_.getInt(0)).sorted.reverse

    if (lens.isEmpty) {
      // no valid blocks: everything passes through unmatched
      return facts.withColumn("prefix_len", lit(null).cast("int"))
        .select(facts.columns.map(col) ++ Seq(col("prefix_len")) ++
          attrs.map(a => lit(null).cast("string").as(a)): _*)
    }

    val withIp = facts.withColumn("__ip", NetOps.ip4Col(ipStr))
    val joined = lens.zipWithIndex.foldLeft(withIp) { case (cur, (l, i)) =>
      val d = parsed.filter(col("__len") === l)
        .select(col("__net").as(s"__net_$i") +:
          attrs.map(a => col(a).as(s"__${a}_$i")): _*)
      cur.join(broadcast(d), netAt(col("__ip"), l) === col(s"__net_$i"), "left")
    }

    // Resolve per LEVEL, not per attr: each level contributes one
    // struct (its prefix length + its attrs), gated on that level's
    // match, and a single coalesce picks the most specific matched
    // level wholesale. Coalescing each attr independently would let a
    // NULL attr on the most specific block fall through to a LESS
    // specific block's value, mixing prefix_len and attrs across blocks.
    val lvl = lens.indices.map { i =>
      when(col(s"__net_$i").isNotNull,
        struct(lit(lens(i)).as("__pl") +:
          attrs.map(a => col(s"__${a}_$i").as(a)): _*))
    }
    val withBest = joined.withColumn("__best", coalesce(lvl: _*))
    val keep = facts.columns.map(joined(_))
    withBest.select(keep ++ Seq(col("__best.__pl").as("prefix_len")) ++
      attrs.map(a => col(s"__best.$a").as(a)): _*)
  }
}
