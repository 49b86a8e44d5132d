package graft.operators

import graft.SparkSpec
import graft.functions.NetOps
import org.apache.spark.sql.functions._

class NetSpec extends SparkSpec {
  import spark.implicits._

  test("ip4 parse: valid forms") {
    val cases = Seq(
      "0.0.0.0" -> 0L,
      "255.255.255.255" -> 4294967295L,
      "10.1.2.3" -> ((10L << 24) + (1 << 16) + (2 << 8) + 3),
      "192.168.0.1" -> ((192L << 24) + (168 << 16) + 1),
      "1.2.3.04" -> ((1L << 24) + (2 << 16) + (3 << 8) + 4)) // leading zero = decimal
    cases.foreach { case (s, want) =>
      assert(NetOps.ip4(s) === want, s)
    }
  }

  test("ip4 parse: malformed declines") {
    Seq("256.1.1.1", "1.2.3", "1.2.3.4.5", "a.b.c.d", "", "1.2.3.4 ",
      " 1.2.3.4", "1111.2.3.4", "1..2.3", "1.2.3.", ".1.2.3.4", "1,2,3,4",
      "10.1.2.3/8", null).foreach { s =>
      assert(NetOps.ip4(s) === -1L, String.valueOf(s))
    }
  }

  test("cidr parse: normalizes host bits; bounds enforced") {
    val p = NetOps.cidrPacked("10.1.2.3/16")
    assert((p & 0xff) === 16)
    assert((p >>> 8) === (10L << 24) + (1 << 16)) // .2.3 masked off
    assert((NetOps.cidrPacked("10.0.0.0/0") >>> 8) === 0L)
    assert((NetOps.cidrPacked("10.0.0.0/0") & 0xff) === 0)
    assert((NetOps.cidrPacked("255.255.255.255/32") >>> 8) === 4294967295L)
    Seq("10.0.0.0/33", "10.0.0.0/", "10.0.0.0", "/16", "10.0.0.0/1 6",
      "10.0.0.0/123", "bad/8", null).foreach { s =>
      assert(NetOps.cidrPacked(s) === -1L, String.valueOf(s))
    }
  }

  test("lpmJoin == brute force, longest wins, total on dirty input") {
    val dims = Seq(
      ("10.0.0.0/8", "A8"),
      ("10.20.0.0/16", "B16"),
      ("10.20.30.0/24", "C24"),
      ("10.20.30.40/32", "D32"),
      ("0.0.0.0/0", "ALL"),
      ("garbage", "junk"),
      ("10.20.99.7/24", "E24") // host bits → normalizes to 10.20.99.0/24
    ).toDF("cidr", "label")
    val facts = Seq("10.20.30.40", "10.20.30.41", "10.20.99.200", "10.9.9.9",
      "11.0.0.1", "256.1.1.1", "nope").zipWithIndex
      .map { case (ip, i) => (i, ip) }.toDF("id", "ip")

    val got = Net.lpmJoin(facts, col("ip"), dims, col("cidr"), Seq("label"))
      .select("id", "ip", "prefix_len", "label")
      .collect().map(r => (r.getInt(0),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) null else r.getString(3))).sortBy(_._1)

    assert(got === Array(
      (0, 32, "D32"),
      (1, 24, "C24"),
      (2, 24, "E24"),
      (3, 8, "A8"),
      (4, 0, "ALL"),
      (5, -1, null), // unparseable address: matches nothing, not even /0
      (6, -1, null)))
  }

  test("duplicate blocks dedup deterministically; no shuffle in the plan") {
    val dims = Seq(("10.0.0.0/8", "zz"), ("10.1.2.3/8", "aa")) // same block
      .toDF("cidr", "label")
    val facts = Seq((1, "10.5.5.5")).toDF("id", "ip")
    val out = Net.lpmJoin(facts, col("ip"), dims, col("cidr"), Seq("label"))
    assert(out.count() === 1)
    assert(out.select("label").as[String].head() === "aa") // min(struct) keep-first
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ShuffleExchange"),
      "LPM enrichment must be shuffle-free (broadcast per length)")
  }

  test("null attr on the most specific block does NOT fall through") {
    // the /24 block matches most specifically but carries a NULL label;
    // per-attr coalesce would leak the /8 block's label while
    // prefix_len said 24 — attrs and prefix_len must come from the
    // SAME block
    val dims = Seq(
      ("10.0.0.0/8", Some("A8"), Some("a8x")),
      ("10.20.30.0/24", None, Some("c24x"))).toDF("cidr", "label", "extra")
    val facts = Seq((1, "10.20.30.5"), (2, "10.9.9.9")).toDF("id", "ip")
    val got = Net.lpmJoin(facts, col("ip"), dims, col("cidr"),
      Seq("label", "extra"))
      .select("id", "prefix_len", "label", "extra")
      .collect().map(r => (r.getInt(0), r.getInt(1),
        if (r.isNullAt(2)) null else r.getString(2), r.getString(3)))
      .sortBy(_._1)
    assert(got === Array(
      (1, 24, null, "c24x"), // most specific block wins wholesale
      (2, 8, "A8", "a8x")))
  }

  test("empty/invalid dim table passes facts through") {
    val dims = Seq(("junk", "x")).toDF("cidr", "label")
    val facts = Seq((1, "10.0.0.1")).toDF("id", "ip")
    val out = Net.lpmJoin(facts, col("ip"), dims, col("cidr"), Seq("label"))
      .collect().head
    assert(out.isNullAt(out.fieldIndex("prefix_len")))
    assert(out.isNullAt(out.fieldIndex("label")))
  }
}
