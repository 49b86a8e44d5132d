package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import graft.streaming.StateOps._

/** Property tests for the keyed-state trio (SURVEY.md §5 plan:
  * "property = dedup output ≡ groupBy-first over the batch equivalent").
  * The bounce state machine is tested as the extracted pure function —
  * thousands of random streams, no Spark jobs per case.
  */
class StatePropertySpec extends SparkSpec {

  private def check(prop: Prop, cases: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private val gapMs = 10000L

  private val visitsGen: Gen[List[Visit]] = for {
    n <- Gen.choose(0, 40)
    visits <- Gen.listOfN(n, for {
      ts <- Gen.choose(0L, 100000L)
      isStart <- Gen.oneOf(true, false)
    } yield (ts, isStart))
  } yield visits.zipWithIndex.map { case ((ts, isStart), i) =>
    Visit("m", ts, "1", if (isStart) None else Some("p"), i.toLong)
  }

  /** Oracle, full CEP semantics (UserJumpDetailApp pattern): a session
    * entry bounces iff its next event is >= gap later OR is itself a
    * session entry (the match branch: start->start within the window
    * emits the first); an entry with no next event is the trailing
    * pending resolved by the timeout timer. The declarative st3Bounce
    * query omits the start->start case because gap-derived session
    * entries can never be < 30 min apart — random streams can. */
  private def oracleBounces(visits: Seq[Visit]): (Set[Long], Option[Long]) = {
    val sorted = visits.sortBy(v => (v.ts, v.eventId))
    val starts = sorted.zip(sorted.drop(1).map(Some(_)) :+ None)
      .filter(_._1.lastPageId.isEmpty)
    val closed = starts.collect {
      case (v, Some(nx)) if nx.ts - v.ts >= gapMs || nx.lastPageId.isEmpty => v.eventId
    }
    val trailing = starts.collectFirst { case (v, None) => v.eventId }
    (closed.toSet, trailing)
  }

  test("ST3 state machine ≡ declarative next-gap oracle on random streams") {
    check(Prop.forAll(visitsGen) { visits =>
      val sorted = visits.sortBy(v => (v.ts, v.eventId))
      val (emitted, pending) = bounceStep("m", sorted, None, gapMs)
      val (oracleClosed, oracleTrailing) = oracleBounces(visits)
      // in-stream emissions must match the oracle's decided entries, and
      // the trailing undecided entry (if any) must be exactly the pending
      // one left for the timeout timer
      emitted.map(_.eventId).toSet == oracleClosed &&
        pending.map(_.pendingEventId) == oracleTrailing
    })
  }

  test("ST3 state machine is micro-batch-split invariant (any cut, same bounces)") {
    val gen = for {
      visits <- visitsGen
      cut <- Gen.choose(0, math.max(0, visits.length))
    } yield (visits, cut)
    check(Prop.forAll(gen) { case (visits, cut) =>
      val sorted = visits.sortBy(v => (v.ts, v.eventId))
      val whole = bounceStep("m", sorted, None, gapMs)
      val (b1, b2) = sorted.splitAt(math.min(cut, sorted.length))
      val (out1, mid) = bounceStep("m", b1, None, gapMs)
      val (out2, fin) = bounceStep("m", b2, mid, gapMs)
      (out1 ++ out2) == whole._1 && fin == whole._2
    })
  }

  test("ST2 uv dedup ≡ first-visit-per-day (batch execution, random streams)") {
    import spark.implicits._
    val cases = Gen.listOfN(12, visitsGen).sample.get
    cases.filter(_.nonEmpty).foreach { visits =>
      // spread ts over > 1 day to exercise the date boundary
      val scaled = visits.map(v => v.copy(ts = v.ts * 2000L))
      val got = uvDedup(scaled.toDS()).collect().map(_.eventId).toSet
      val expected = scaled.sortBy(v => (v.ts, v.eventId))
        .groupBy(v => v.ts / 86400000L)
        .values.map(_.head.eventId).toSet
      assert(got == expected, s"case: $scaled")
    }
  }
}
