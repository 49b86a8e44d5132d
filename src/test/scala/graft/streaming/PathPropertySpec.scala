package graft.streaming

import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.SparkSpec
import graft.streaming.PathStream._

/** Property tests for the path-transition fold: the pure `pathStep`
  * function over random in-order micro-batch splits must equal the
  * one-shot batch semantics (lag over the (ts, tie)-sorted sequence
  * with gap reset) — thousands of random streams, no Spark jobs per
  * case. Micro-batch SPLIT POINTS must never affect the output.
  */
class PathPropertySpec extends SparkSpec {

  private def check(prop: Prop, cases: Int = 300): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(cases), prop)
    assert(res.passed, res.status.toString)
  }

  private val caseGen: Gen[(List[PathEvent], Option[Long], List[Int])] = for {
    n <- Gen.choose(0, 40)
    evs <- Gen.listOfN(n, for {
      ts <- Gen.choose(0L, 2000L) // tight range -> frequent ts collisions
      tpe <- Gen.oneOf("a", "b", "c")
    } yield (ts, tpe))
    gap <- Gen.option(Gen.choose(1L, 500L))
    cuts <- Gen.listOf(Gen.choose(0, math.max(n, 1)))
  } yield (
    evs.zipWithIndex.map { case ((ts, t), i) => PathEvent(1L, ts, i.toLong, t) },
    gap, cuts)

  /** One-shot oracle: transitions of the fully sorted sequence. */
  private def oracle(evs: Seq[PathEvent], gap: Option[Long]): Seq[(String, String)] = {
    val sorted = evs.sortBy(e => (e.ts, e.tie))
    sorted.zip(None +: sorted.map(Some(_))).map { case (e, prev) =>
      val p = prev match {
        case Some(pe) if gap.forall(g => e.ts - pe.ts <= g) => pe.eventType
        case _ => "_start"
      }
      (p, e.eventType)
    }
  }

  test("chunked pathStep fold ≡ one-shot transitions, any split points, with and without gap") {
    check(Prop.forAll(caseGen) { case (evs, gap, cuts) =>
      val sorted = evs.sortBy(e => (e.ts, e.tie))
      // split the in-order stream at the random cut points
      val bounds = (cuts.map(math.min(_, sorted.length)) :+ 0 :+ sorted.length)
        .distinct.sorted
      val chunks = bounds.zip(bounds.drop(1)).map { case (a, b) => sorted.slice(a, b) }
      val step = pathStep("_start", gap) _
      val (_, out) = chunks.foldLeft(
        (Option.empty[PathState], Seq.empty[Transition])) {
        case ((st, acc), chunk) =>
          val (next, emitted) = step(1L, st, chunk.sortBy(e => (e.ts, e.tie)))
          (next, acc ++ emitted)
      }
      out.map(t => (t.prevType, t.nextType)) == oracle(evs, gap)
    })
  }
}
