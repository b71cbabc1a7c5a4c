package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the full operator inventory (one entry per implemented
  * operator from SURVEY.md §2 plus the LLM-pipeline extensions);
  * `oracleSql` carries the DuckDB-equivalent ANSI SQL for every query
  * whose semantics are SQL-expressible — those are hash-compared, the
  * rest get a rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Relational.q01PricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational.queries ++ ops.Relational2.queries ++ ops.Relational3.queries ++ ops.Relational4.queries ++
      ops.Relational5.queries ++ ops.Relational6.queries ++ ops.Relational7.queries ++
      ops.Relational8.queries ++ ops.AsOf.queries ++
      llm.Dedup.queries ++ llm.DupClusters.queries ++ llm.Similarity.queries ++
      llm.IndexDelete.queries ++
      llm.TextStats.queries ++ llm.TextClean.queries ++ llm.Tokenizer.queries ++
      llm.Multimodal.queries ++
      llm.Pipeline.queries ++ llm.Authority.queries ++ llm.Retrieval.queries ++
      stream.EventWindows.queries

  /** Verify-shape overlays: queries whose oracle-compared form carries
    * extra verification columns the production (benched) form must not
    * pay for. Applied by [[Verify]] only. */
  def verifyOverrides: Map[String, (SparkSession, String) => DataFrame] =
    ops.Relational2.verifyOverrides ++ ops.Relational6.verifyOverrides ++
      ops.Relational8.verifyOverrides

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    ops.Relational.oracle ++ ops.Relational2.oracle ++ ops.Relational3.oracle ++ ops.Relational4.oracle ++
      ops.Relational5.oracle ++ ops.Relational6.oracle ++ ops.Relational7.oracle ++
      ops.Relational8.oracle ++ ops.AsOf.oracle ++
      llm.Dedup.oracle ++ llm.DupClusters.oracle ++ llm.Similarity.oracle ++
      llm.IndexDelete.oracle ++
      llm.TextStats.oracle ++ llm.TextClean.oracle ++ llm.Tokenizer.oracle ++
      llm.Multimodal.oracle ++
      llm.Pipeline.oracle ++ llm.Authority.oracle ++ llm.Retrieval.oracle ++
      stream.EventWindows.oracle
}
