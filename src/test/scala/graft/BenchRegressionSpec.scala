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

  test("regressions: flags a query that moved relative to its peers; " +
       "floor, warm-confirmation, and new queries honored") {
    val bc = Map("q1" -> 1.0, "q2" -> 0.1, "q3" -> 2.0, "q4" -> 0.9,
      "q5" -> 1.1, "q6" -> 0.7, "q7" -> 1.0, "q8" -> 0.8, "q9" -> 1.2)
    val bw = Map("q1" -> 0.8, "q2" -> 0.05, "q3" -> 1.5, "q4" -> 0.7,
      "q5" -> 0.9, "q6" -> 0.5, "q7" -> 0.8, "q8" -> 0.6, "q9" -> 1.0)
    val results = Seq(
      ("q1", 3.0, 2.4),   // 3x cold AND warm vs peers at ~1x -> flagged
      ("q2", 0.3, 0.15),  // 3x but cold under the 0.5s floor -> skipped
      ("q3", 2.1, 1.6),   // ~1.05x -> fine (pins the median near 1)
      ("q4", 0.95, 0.74), // ~1.05x -> fine
      ("q5", 1.15, 0.95), // ~1.05x -> fine
      ("q6", 2.1, 0.55),  // cold 3x but warm only 1.1x (JIT noise) -> skipped
      ("q7", 1.0, 0.8), ("q8", 0.82, 0.6), ("q9", 1.2, 1.02), // steady
      ("q_new", 9.0, 9.0) // no baseline -> skipped
    )
    assert(Bench.regressions(bc, bw, results) == Seq("q1"))
  }

  test("regressions: a uniform box slowdown flags NOTHING — ratios are " +
       "normalized by the fleet median") {
    val bc = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 0.8, "q4" -> 1.5)
    val bw = Map("q1" -> 0.8, "q2" -> 1.6, "q3" -> 0.6, "q4" -> 1.2)
    // everything exactly 2x slower: a different machine, not a plan bug
    val results = bc.toSeq.map { case (n, c) => (n, c * 2, bw(n) * 2) }
    assert(Bench.regressions(bc, bw, results).isEmpty)
    // ...but a single query at 4x against the 2x fleet still stands out
    val one = results.map { case (n, c, w) =>
      if (n == "q2") (n, c * 2, w * 2) else (n, c, w) }
    assert(Bench.regressions(bc, bw, one) == Seq("q2"))
  }

  test("regressions: a query missing ONLY from the warm baseline is not " +
       "flagged on its cold ratio alone") {
    // warm map is present for peers, so warm confirmation is required;
    // q1 has no warm baseline entry -> cannot confirm -> not flagged
    val bc = Map("q1" -> 1.0, "q2" -> 1.0, "q3" -> 1.0, "q4" -> 1.0)
    val bw = Map("q2" -> 0.8, "q3" -> 0.8, "q4" -> 0.8)
    val r = Seq(("q1", 4.0, 0.1), ("q2", 1.0, 0.8),
      ("q3", 1.1, 0.85), ("q4", 0.9, 0.78))
    assert(Bench.regressions(bc, bw, r).isEmpty)
    // the same cold spike WITH a confirming warm entry still flags
    val bw2 = bw + ("q1" -> 0.8)
    val r2 = r.map { case ("q1", c, _) => ("q1", c, 3.2); case x => x }
    assert(Bench.regressions(bc, bw2, r2) == Seq("q1"))
  }

  test("regressions: warm map absent (older baseline format) falls back " +
       "to cold-only comparison") {
    val bc = Map("q1" -> 1.0, "q2" -> 1.0, "q3" -> 1.0)
    val r = Seq(("q1", 4.0, 0.1), ("q2", 1.0, 9.9), ("q3", 1.1, 0.2))
    assert(Bench.regressions(bc, Map.empty, r) == Seq("q1"))
  }

  test("regressions: a baseline WITH warm numbers that share nothing " +
       "with this run's result set never falls back to cold-only — " +
       "unconfirmable means no flag (round-11 ADVICE fix)") {
    val bc = Map("q1" -> 1.0, "q2" -> 1.0, "q3" -> 1.0)
    // warm baseline exists but covers only retired queries: warmR is
    // empty for this run, yet the cold-only fallback must NOT fire
    val bw = Map("old1" -> 0.8, "old2" -> 0.8)
    val r = Seq(("q1", 4.0, 0.1), ("q2", 1.0, 0.2), ("q3", 1.1, 0.2))
    assert(Bench.regressions(bc, bw, r).isEmpty)
  }

  test("regressions: the confirm re-run clears interference flags and " +
       "keeps reproducing ones") {
    val names = (1 to 8).map(i => s"q$i")
    val bc = names.map(_ -> 1.0).toMap
    val bw = names.map(_ -> 0.8).toMap
    // q1 and q2 both flag on their in-run numbers (3x cold AND warm);
    // six steady peers pin the fleet median near 1
    val r = Seq(("q1", 3.0, 2.4), ("q2", 3.0, 2.4)) ++
      names.drop(2).map(n => (n, 1.02, 0.81))
    assert(Bench.regressions(bc, bw, r) == Seq("q1", "q2"))
    // confirm: q1 reproduces (still 3x on the fresh run), q2 was
    // interference (fresh run back at baseline) -> only q1 survives
    val rerun = Map("q1" -> 2.4, "q2" -> 0.8)
    val confirmed = Bench.regressions(bc, bw, r, confirm = Some(rerun))
    assert(confirmed == Seq("q1"))
    // with no warm baseline at all the confirm hook is not consulted
    assert(Bench.regressions(bc, Map.empty, r,
      confirm = Some((_: String) => 0.0)) == Seq("q1", "q2"))
    // a confirm re-run that FAILS reports Double.MaxValue (Bench.main's
    // contract) and must KEEP the flag, never clear it
    assert(Bench.regressions(bc, bw, r,
      confirm = Some((_: String) => Double.MaxValue)) == Seq("q1", "q2"))
  }
}
