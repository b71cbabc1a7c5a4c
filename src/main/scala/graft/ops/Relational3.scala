package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Third wave: reshaping (unpivot, explode), distribution window
  * functions, ordered collection aggregates, statistical moments. */
object Relational3 {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    Tables(spark, dir, name)

  /** Unpivot (melt): the lineitem charge components as (metric, value)
    * rows. */
  def q36Unpivot(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .filter(col("l_orderkey") <= 100)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_orderkey"), col("l_linenumber")),
        Array(col("l_extendedprice"), col("l_discount"), col("l_tax")),
        "metric", "value")
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("metric"))

  val q36Sql: String =
    """SELECT l_orderkey, l_linenumber, metric, value FROM (
      | SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount, l_tax
      | FROM lineitem WHERE l_orderkey <= 100)
      |UNPIVOT (value FOR metric IN (l_extendedprice, l_discount, l_tax))
      |ORDER BY l_orderkey, l_linenumber, metric""".stripMargin

  /** Lateral explode with position over a real array column. Raw float
    * elements pass through untouched (bit-exact in any engine). */
  def q37Explode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "embeddings")
      .filter(col("vec_id") < 10)
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("pos", "component")))
      .filter(col("pos") < 8)
      .orderBy(col("vec_id"), col("pos"))

  val q37Sql: String =
    """SELECT vec_id, CAST(i - 1 AS INT) AS pos, embedding[i] AS component
      |FROM embeddings, range(1, 9) t(i)
      |WHERE vec_id < 10
      |ORDER BY vec_id, pos""".stripMargin

  /** Distribution window functions — all rank-arithmetic (rational), so
    * engine-exact: percent_rank, cume_dist, ntile. */
  def q38WindowDist(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(spark, dir, "customer")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("c_mktsegment"), col("c_custkey"))
  }

  val q38Sql: String =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      | PERCENT_RANK() OVER w AS pr,
      | CUME_DIST() OVER w AS cd,
      | CAST(NTILE(4) OVER w AS INT) AS quartile
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  /** Ordered collection aggregate: deterministic via an explicit sort of
    * the collected set (collect_list order is partition-dependent;
    * sort_array fixes it — same contract as DuckDB's ORDER BY inside
    * string_agg). */
  def q39CollectAgg(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "nation")
      .groupBy(col("n_regionkey"))
      .agg(
        array_join(sort_array(collect_list(col("n_name"))), ",")
          .as("nations"),
        count(lit(1)).as("n"))
      .orderBy(col("n_regionkey"))

  val q39Sql: String =
    """SELECT n_regionkey, STRING_AGG(n_name, ',' ORDER BY n_name) AS nations,
      | COUNT(*) AS n
      |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin

  /** Statistical moments per segment. Variance/stddev accumulate floats
    * in engine-specific orders → rows-only; LlmOpsSpec bounds them
    * against a driver-side two-pass computation. */
  def q40Stats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "customer")
      .groupBy(col("c_mktsegment"))
      .agg(
        avg(col("c_acctbal")).as("mean_bal"),
        stddev_samp(col("c_acctbal")).as("sd_bal"),
        var_samp(col("c_acctbal")).as("var_bal"),
        corr(col("c_acctbal"), col("c_custkey").cast(DoubleType))
          .as("corr_bal_key"),
        skewness(col("c_acctbal")).as("skew_bal"))
      .orderBy(col("c_mktsegment"))

  /** F7 parity, typed form: `from_json` with an explicit schema turning
    * the events `props` string into a struct column (the pipeline-grade
    * path — get_json_object re-parses per field; from_json parses once). */
  def q41FromJson(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "events")
      .withColumn("p", from_json(col("props"), StructType(Seq(
        StructField("k", LongType)))))
      .groupBy(col("event_type"))
      .agg(
        count(when(col("p.k") > 50, 1)).as("n_high_k"),
        max(col("p.k")).as("max_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))

  val q41Sql: String =
    """SELECT event_type,
      | COUNT(CASE WHEN CAST(regexp_extract(props, '"k": ([0-9]+)', 1)
      |   AS BIGINT) > 50 THEN 1 END) AS n_high_k,
      | MAX(CAST(regexp_extract(props, '"k": ([0-9]+)', 1) AS BIGINT))
      |   AS max_k,
      | COUNT(*) AS n
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q36_unpivot" -> (q36Unpivot _),
    "q37_explode" -> (q37Explode _),
    "q38_window_dist" -> (q38WindowDist _),
    "q39_collect_agg" -> (q39CollectAgg _),
    "q40_stats" -> (q40Stats _),
    "q41_from_json" -> (q41FromJson _),
  )

  val oracle: Map[String, String] = Map(
    "q36_unpivot" -> q36Sql,
    "q37_explode" -> q37Sql,
    "q38_window_dist" -> q38Sql,
    "q39_collect_agg" -> q39Sql,
    // q40: float accumulation order is engine-specific — rows-only.
    "q41_from_json" -> q41Sql,
  )
}
