package graft.queries

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Capped ordered LISTAGG (`Stats.listaggCapped`) vs the uncapped a16
  * rendering: deterministic prefix truncation with bounded agg state. */
class ListaggSpec extends SparkSpec {

  private def uncapped() = Stats.a16Listagg(spark, sf("sf0.001"))
    .collect().map(r => r.get(0).toString -> (r.getString(1), r.getLong(2))).toMap

  test("cap above every group: identical to uncapped, nothing truncated") {
    val events = graft.Tables.events(spark, sf("sf0.001"))
    val got = Stats.listaggCapped(events, "user_id", "ts", "event_id",
        "event_type", cap = 100000)
      .collect()
      .map(r => r.get(0).toString -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val want = uncapped()
    assert(got.size == want.size)
    want.foreach { case (u, (path, len)) =>
      assert(got(u) == ((path, len, false)), s"user $u: ${got(u)} vs ($path, $len)")
    }
  }

  test("small cap: path is the exact earliest-k prefix, path_len stays full") {
    val events = graft.Tables.events(spark, sf("sf0.001"))
    val cap = 3
    val got = Stats.listaggCapped(events, "user_id", "ts", "event_id",
        "event_type", cap)
      .collect()
      .map(r => r.get(0).toString -> (r.getString(1), r.getLong(2), r.getBoolean(3)))
      .toMap
    val want = uncapped()
    assert(got.size == want.size)
    want.foreach { case (u, (path, len)) =>
      val prefix = path.split(",", -1).take(cap).mkString(",")
      assert(got(u) == ((prefix, len, len > cap)),
        s"user $u: ${got(u)} vs ($prefix, $len, ${len > cap})")
    }
    assert(got.values.exists(_._3), "fixture should have at least one capped group")
  }

  test("sub-second ordering survives the capped path (micros, not seconds)") {
    import spark.implicits._
    // same wall second, ordering decided by the fractional part — a
    // seconds-floored coercion would fall back to the event_id tie and
    // emit b,a,c instead
    val df = Seq(
      ("u", Timestamp.valueOf("2024-01-01 00:00:00.300"), 1L, "c"),
      ("u", Timestamp.valueOf("2024-01-01 00:00:00.100"), 3L, "a"),
      ("u", Timestamp.valueOf("2024-01-01 00:00:00.200"), 2L, "b"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = Stats.listaggCapped(df, "user_id", "ts", "event_id", "event_type", 2)
      .collect().map(r => (r.getString(1), r.getLong(2), r.getBoolean(3)))
    assert(got.toSeq == Seq(("a,b", 3L, true)), s"got ${got.toSeq}")
  }

  test("capped plan: one exchange, object hash aggregate, no sort") {
    val events = graft.Tables.events(spark, sf("sf0.001"))
    val plan = Stats.listaggCapped(events, "user_id", "ts", "event_id",
        "event_type", 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("first_k_agg"), s"expected the bounded aggregate:\n$plan")
    assert(!plan.contains("Sort "), s"no per-group sort may appear:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges == 1, s"expected ONE key exchange, got $exchanges:\n$plan")
  }
}
