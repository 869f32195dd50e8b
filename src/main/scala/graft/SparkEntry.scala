package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every implemented operator's query entry; each key
  * that also appears in `oracleSql` is hash-checked against DuckDB running
  * the SQL over the same parquet tables (driver's Verify/correctness gate).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.Tpch.queries ++
      graft.queries.Analytics.queries ++
      graft.queries.LakeQueries.queries ++
      graft.queries.OpsQueries.queries ++
      graft.queries.FuncQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.CbQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.Tpch.oracle ++
      graft.queries.Analytics.oracle ++
      graft.queries.LakeQueries.oracle ++
      graft.queries.OpsQueries.oracle ++
      graft.queries.FuncQueries.oracle ++
      graft.queries.PipelineQueries.oracle ++
      graft.queries.CbQueries.oracle
}
