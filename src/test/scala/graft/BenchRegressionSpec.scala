package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench regression gate's pure logic (Bench.parseQueryMap /
  * Bench.regressions) — no Spark session needed. */
class BenchRegressionSpec extends AnyFunSuite {

  val prior =
    """{"metric":"total","value":100.0,"unit":"sec",
      |"queries":{"q1":1.0,"q2":0.1,"q3":2.0,"q4":0.9},
      |"queries_warm":{"q1":0.8,"q2":0.05,"q3":1.5,"q4":0.7},
      |"artifacts":{"lsh_pairs":5.0},"sf":"/x"}""".stripMargin.replace("\n", "")

  test("parseQueryMap extracts the named map and nothing else") {
    assert(Bench.parseQueryMap(prior, "queries") ==
      Map("q1" -> 1.0, "q2" -> 0.1, "q3" -> 2.0, "q4" -> 0.9))
    assert(Bench.parseQueryMap(prior, "queries_warm")("q3") == 1.5)
    assert(Bench.parseQueryMap(prior, "artifacts") == Map("lsh_pairs" -> 5.0))
    assert(Bench.parseQueryMap(prior, "absent").isEmpty)
    assert(Bench.parseQueryMap("not json at all", "queries").isEmpty)
  }

  test("regressions: flags only cold-AND-warm >1.5x over the floor; " +
       "new queries and noise-only cold moves are skipped") {
    val bc = Bench.parseQueryMap(prior, "queries")
    val bw = Bench.parseQueryMap(prior, "queries_warm")
    val results = Seq(
      ("q1", 2.0, 1.6),   // both >1.5x, over floor -> flagged
      ("q2", 0.3, 0.2),   // 3x but cold under the 0.5s floor -> skipped
      ("q3", 4.0, 1.6),   // cold 2x but warm only 1.07x (JIT noise) -> skipped
      ("q4", 1.0, 0.75),  // cold 1.11x -> fine
      ("q_new", 9.0, 9.0) // no baseline -> skipped
    )
    assert(Bench.regressions(bc, bw, results) == Seq("q1"))
  }

  test("regressions: warm map absent (older baseline format) falls back " +
       "to cold-only comparison") {
    val bc = Map("q1" -> 1.0)
    assert(Bench.regressions(bc, Map.empty, Seq(("q1", 2.0, 0.1))) == Seq("q1"))
    assert(Bench.regressions(bc, Map.empty, Seq(("q1", 1.2, 9.0))).isEmpty)
  }
}
