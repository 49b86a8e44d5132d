package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` holds one entry per implemented operator from SURVEY.md §2
  * (plus the LLM-pipeline extensions); `oracleSql` holds the DuckDB
  * equivalent for every SQL-expressible query. Column names and row order
  * are made to match exactly (see graft.util.Det).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    graft.queries.Relational.j3DimEnrich(spark, "/root/testdata/sf0.001")

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Relational.queries ++
      graft.queries.Stats.queries ++
      graft.queries.Stateful.queries ++
      graft.queries.Plumbing.queries ++
      graft.queries.Windows.queries ++
      graft.queries.TpchSuite.queries ++
      graft.queries.LlmOps.queries

  def oracleSql: Map[String, String] =
    graft.queries.Relational.oracle ++
      graft.queries.Stats.oracle ++
      graft.queries.Stateful.oracle ++
      graft.queries.Plumbing.oracle ++
      graft.queries.Windows.oracle ++
      graft.queries.TpchSuite.oracle ++
      graft.queries.LlmOps.oracle
}
