package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DimensionsSpec extends SparkSpec {

  test("scd2: runs collapse, re-emits don't fork, NULL is a version, one shuffle total") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val log = Seq(
      // user 1: a, a (re-emit), b, b, a — three versions
      (1L, 10L, 1L, Some("a")), (1L, 20L, 2L, Some("a")),
      (1L, 30L, 3L, Some("b")), (1L, 40L, 4L, Some("b")),
      (1L, 50L, 5L, Some("a")),
      // user 2: NULL then a — NULL must be version 1, not a wildcard
      (2L, 10L, 6L, None), (2L, 20L, 7L, Some("a")))
      .map { case (u, t, e, v) => (u, ts(t), e, v.orNull) }
      .toDF("user_id", "ts", "event_id", "event_type")
    val df = Dimensions.scd2FromChangelog(log, "user_id", "ts", "event_id", "event_type")
    val got = df.collect().map(r => (r.getLong(0), Option(r.getString(1)),
      r.getTimestamp(2).getTime / 1000, Option(r.getTimestamp(3)).map(_.getTime / 1000),
      r.getBoolean(4), r.getLong(5))).toSet
    assert(got == Set(
      (1L, Some("a"), 10L, Some(30L), false, 1L),
      (1L, Some("b"), 30L, Some(50L), false, 2L),
      (1L, Some("a"), 50L, None, true, 3L),
      (2L, None, 10L, Some(20L), false, 1L),
      (2L, Some("a"), 20L, None, true, 2L)), s"got $got")
    // plan contract: the three Windows stack on ONE key exchange
    // (AQE's toString appends the Initial Plan — count only the final)
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    val ex = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).size
    assert(ex == 1, s"expected one shuffle:\n$plan")
  }

  test("point-in-time law: the version valid at an event's ts carries that event's value") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("user_id"), col("ts"), col("event_type"))
    val dim = Dimensions.scd2FromChangelog(ev, "user_id", "ts", "event_id", "event_type")
      .select(col("user_id"), col("valid_from").as("ts"),
        col("event_type").as("dim_value"), col("version"))
    val joined = Joins.asofJoin(
      ev.select("event_id", "user_id", "ts", "event_type"), dim,
      "user_id", "ts", rightPrefix = "d_", tieBreak = Some("version"))
    val bad = joined.filter(col("d_dim_value").isNull ||
      col("d_dim_value") =!= col("event_type")).count()
    assert(bad == 0, "every event must see its own value in the PIT dimension")
  }

  test("scd2 on real events: intervals tile each user's timeline exactly") {
    val ev = graft.Tables.events(spark, sf("sf0.001"))
    val df = Dimensions.scd2FromChangelog(ev, "user_id", "ts", "event_id", "event_type")
    // exactly one current version per user
    val users = ev.select("user_id").distinct().count()
    assert(df.filter(col("is_current")).count() == users)
    // every non-current valid_to equals the next version's valid_from
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id")).orderBy(col("version"))
    val bad = df.withColumn("__nf", lead(col("valid_from"), 1).over(w))
      .filter(col("__nf").isNotNull && col("valid_to") =!= col("__nf")).count()
    assert(bad == 0, "intervals must tile with no gaps or overlaps")
  }
}
