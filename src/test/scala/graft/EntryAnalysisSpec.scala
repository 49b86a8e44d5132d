package graft

/** The "w19 gate": every registered batch query must ANALYZE against the
  * sf0.001 fixtures inside `sbt test`. Round 8 shipped a gate
  * (`w19_rolling_median`) that threw UNRESOLVED_COLUMN at analysis time
  * because its only check was the driver's post-commit oracle run — this
  * spec closes that class of breakage for every current and FUTURE
  * `SparkEntry.queries` entry, at analysis cost only (no execution).
  *
  * `_stream` gates are excluded: their construction EXECUTES a full
  * Structured Streaming run (AvailableNow → parquet → read back), so any
  * analysis break in them fails loudly at construction anyway, and
  * running ~10 micro-batch engines here would dominate the suite's
  * wall-clock for no added coverage.
  *
  * "Analysis cost only" holds for all but the distributed-prefix-sum
  * gates (`x_sample_pps`, `x_quality_rank_scale`): those operators
  * compute per-partition offsets at CONSTRUCTION time (localCheckpoint +
  * a bounded P-row collect), so building their plan runs real Spark
  * jobs. Accepted: the work is bounded model state (P partition totals),
  * a few hundred ms each at sf0.001, and deferring it would force the
  * offsets behind a lazily-materialized plan for no gate benefit.
  */
class EntryAnalysisSpec extends SparkSpec {

  test("every registered batch query analyzes against sf0.001") {
    val d = sf("sf0.001")
    val batch = SparkEntry.queries.filterNot(_._1.endsWith("_stream"))
    assert(batch.nonEmpty)
    val broken = batch.toSeq.sortBy(_._1).flatMap { case (name, q) =>
      try { q(spark, d).queryExecution.analyzed; None }
      catch { case e: Exception => Some(s"$name: ${e.getMessage.linesIterator.next()}") }
    }
    assert(broken.isEmpty, s"queries failing analysis:\n${broken.mkString("\n")}")
  }

  test("every query key has either an oracle or a documented rows-only gate") {
    // an oracle-less key silently downgrades to the driver's weaker
    // rows>0 check — keep the set deliberate, not accidental
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle.isEmpty,
      s"queries without oracle SQL: ${noOracle.toSeq.sorted.mkString(", ")}")
    val orphanOracles = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphanOracles.isEmpty,
      s"oracles without queries: ${orphanOracles.toSeq.sorted.mkString(", ")}")
  }
}
