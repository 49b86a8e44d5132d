package graft.plans

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.operators.Joins

/** The native whole-operator as-of join: semantics parity with the
  * composed union+window form, the planner contract (strategy plants
  * AsofJoin; pre-partitioned inputs run with no ENSURE_REQUIREMENTS
  * exchange), and the null contracts. */
class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def randomSides(seed: Int, n: Int) = {
    val rnd = new scala.util.Random(seed)
    val l = (1 to n).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, 100L + i))
      .toDF("k", "t", "lid")
    val r = (1 to n).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, 500L + i, i * 11L))
      .toDF("k", "t", "rid", "payload")
    (l, r)
  }

  test("parity with the union+window asofJoin on random data with " +
       "duplicate times (tieBreak decides identically)") {
    for (seed <- Seq(1, 7, 42)) {
      val (l, r) = randomSides(seed, 120)
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.select("lid", "c_rid", "c_payload")
          .collect().map(row => (row.getLong(0),
            if (row.isNullAt(1)) -1L else row.getLong(1),
            if (row.isNullAt(2)) -1L else row.getLong(2))).toSet
      val native = canon(Joins.asofJoinNative(l, r, "k", "t",
        rightPrefix = "c_", tieBreak = Some("rid")))
      val window = canon(Joins.asofJoin(l, r, "k", "t",
        rightPrefix = "c_", tieBreak = Some("rid")))
      assert(native == window, s"seed $seed: ${native.size}/${window.size}")
      assert(native.nonEmpty && native.exists(_._2 != -1L))
    }
  }

  test("planner contract: AsofJoin node in the plan; pre-partitioned " +
       "sorted inputs need no ENSURE_REQUIREMENTS exchange") {
    val (l0, r0) = randomSides(3, 60)
    val l = l0.repartition(4, col("k")).sortWithinPartitions("k", "t")
    val r = r0.repartition(4, col("k")).sortWithinPartitions("k", "t", "rid")
    val j = Joins.asofJoinNative(l, r, "k", "t", tieBreak = Some("rid"))
    j.collect() // must execute cleanly
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"strategy did not plant the exec:\n$plan")
    assert(!plan.contains("ENSURE_REQUIREMENTS"),
      s"co-partitioned inputs must pass through exchange-free:\n$plan")
  }

  test("interpreted fallback (string keys): parity with the window form " +
       "— the non-primitive path the long fast path shadows everywhere else") {
    val rnd = new scala.util.Random(23)
    val l = (1 to 100).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(40).toLong, 100L + i))
      .toDF("k", "t", "lid")
    val r = (1 to 100).map(i =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(40).toLong, 500L + i))
      .toDF("k", "t", "rid")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "c_rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    val native = Joins.asofJoinNative(l, r, "k", "t",
      rightPrefix = "c_", tieBreak = Some("rid"))
    assert(canon(native) == canon(Joins.asofJoin(l, r, "k", "t",
      rightPrefix = "c_", tieBreak = Some("rid"))))
    assert(native.queryExecution.executedPlan.toString.contains("AsofJoin"))
  }

  test("bucketed tables end-to-end: the native as-of join runs with NO " +
       "Exchange anywhere in the plan — the production claim the " +
       "union+window form can never make") {
    val (l0, r0) = randomSides(11, 80)
    val wh = "/tmp/graft_warehouse"
    spark.sql("DROP TABLE IF EXISTS asof_l_bkt")
    spark.sql("DROP TABLE IF EXISTS asof_r_bkt")
    // a dropped-in-another-session table leaves its directory behind
    for (t <- Seq("asof_l_bkt", "asof_r_bkt")) {
      val dir = new java.io.File(s"$wh/$t")
      if (dir.exists()) {
        dir.listFiles().foreach(_.delete()); dir.delete()
      }
    }
    l0.write.bucketBy(4, "k").sortBy("k", "t")
      .option("path", s"$wh/asof_l_bkt").saveAsTable("asof_l_bkt")
    r0.write.bucketBy(4, "k").sortBy("k", "t", "rid")
      .option("path", s"$wh/asof_r_bkt").saveAsTable("asof_r_bkt")
    val l = spark.table("asof_l_bkt")
    val r = spark.table("asof_r_bkt")
    val j = Joins.asofJoinNative(l, r, "k", "t", tieBreak = Some("rid"))
    val rows = j.collect()
    assert(rows.nonEmpty)
    val plan = j.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Exchange"),
      s"bucketed inputs must run with zero exchanges:\n$plan")
    // and the result still matches the composed rendering
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select("lid", "c_rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) -1L else x.getLong(1))).toSet
    assert(canon(Joins.asofJoinNative(l, r, "k", "t",
        rightPrefix = "c_", tieBreak = Some("rid"))) ==
      canon(Joins.asofJoin(l, r, "k", "t",
        rightPrefix = "c_", tieBreak = Some("rid"))))
  }

  test("production composition: the j12_dim_asof gate plans through " +
       "AsofJoinExec (round-10 swap off the union+window rendering)") {
    val j12 = graft.SparkEntry.queries("j12_dim_asof")(spark, sf("sf0.001"))
    val plan = j12.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"),
      s"j12 must ride the native as-of exec:\n$plan")
    assert(j12.limit(1).count() == 1)
  }

  test("whole-stage codegen: the exec fuses into a WholeStageCodegen " +
       "stage, results identical with fallback DISABLED (a Janino error " +
       "would throw, not silently revert to the iterator path)") {
    val (l, r) = randomSides(17, 150)
    def run() = Joins.asofJoinNative(l, r, "k", "t",
      rightPrefix = "c_", tieBreak = Some("rid"))
    val withCg = spark.conf.get("spark.sql.codegen.fallback")
    try {
      spark.conf.set("spark.sql.codegen.fallback", "false")
      val j = run()
      val rows = j.collect()
      val plan = j.queryExecution.executedPlan.toString
      // the exec must sit INSIDE a codegen stage (marked by the *(n)
      // prefix in the tree), not behind an InputAdapter boundary
      assert(plan.linesIterator.exists(ln =>
        ln.contains("AsofJoin") && ln.contains("*")),
        s"AsofJoinExec not fused into WholeStageCodegen:\n$plan")
      // and the fused result equals the iterator rendering
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      val iter = run().collect()
      def canon(rs: Array[org.apache.spark.sql.Row]) =
        rs.map(_.toSeq.map(v => if (v == null) -1L else v)).toSet
      assert(canon(rows) == canon(iter))
      // interpreted-key shape still plans (fallback path not broken by
      // the trait): string keys must not attempt codegen
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      import spark.implicits._
      val ls = Seq(("a", 1L, 1L)).toDF("k", "t", "lid")
      val rs = Seq(("a", 0L, 9L)).toDF("k", "t", "rid")
      assert(Joins.asofJoinNative(ls, rs, "k", "t").collect().length == 1)
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", withCg)
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
  }

  test("null contract: NULL left key/time never matches (SQL equality " +
       "semantics — unlike the window form's null partition); NULL-key " +
       "right rows are skipped") {
    val l = Seq((Some(1L), Some(10L), 1L), (None, Some(10L), 2L),
        (Some(1L), None, 3L))
      .toDF("k", "t", "lid")
    val r = Seq((Some(1L), Some(5L), 9L), (None, Some(1L), 8L))
      .toDF("k", "t", "rid")
    val got = Joins.asofJoinNative(l, r, "k", "t")
      .select("lid", "r_rid")
      .collect().map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
    assert(got == Map(1L -> 9L, 2L -> -1L, 3L -> -1L), s"got $got")
  }

  test("self-join shape: both sides from the same source deduplicate " +
       "(the DeduplicateRelations gap a post-analysis node must fill)") {
    val base = Seq((1L, 10L, 1L, "a"), (1L, 5L, 2L, "b"), (1L, 20L, 3L, "a"))
      .toDF("k", "t", "id", "tag")
    val l = base.filter(col("tag") === "a").select("k", "t", "id")
    val r = base.filter(col("tag") === "b").select("k", "t", "id")
    val got = Joins.asofJoinNative(l, r, "k", "t")
      .select("id", "r_id").collect()
      .map(row => row.getLong(0) ->
        (if (row.isNullAt(1)) -1L else row.getLong(1))).toMap
    // both 'a' rows (t=10, t=20) see the t=5 'b' row
    assert(got == Map(1L -> 2L, 3L -> 2L), s"got $got")
  }
}
