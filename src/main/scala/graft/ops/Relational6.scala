package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

/** Sixth wave: classic TPC-H-shaped composites over the fixture schema —
  * the workloads a reference user would bring along. Each runs the
  * identical SQL text through Catalyst and DuckDB (correlated EXISTS,
  * outer-join histograms, and a multi-predicate anti-join + scalar
  * subquery composite). */
object Relational6 {

  private def sql(spark: SparkSession, dir: String, text: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(text)
  }

  /** TPC-H Q4 shape: orders of 1995H1 having at least one lineitem
    * shipped after the order date ("late line" over the fixture's
    * columns), counted per priority. The correlated EXISTS decorrelates
    * to a left-semi join; the date filter prunes the orders scan. */
  def q50PriorityCheck(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, q50Sql)

  val q50Sql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= DATE '1995-01-01'
      |  AND o_orderdate < DATE '1995-07-01'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q13 shape: distribution of customers by order count,
    * including zero-order customers (left outer join feeding a second
    * aggregation — the classic two-level group-by). */
  def q51CustomerDistribution(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, q51Sql)

  val q51Sql: String =
    """SELECT c_count, COUNT(*) AS custdist FROM (
      |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
      |  FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |  GROUP BY c_custkey
      |)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** TPC-H Q22 shape: high-balance customers from three market segments
    * with no orders at all, where "high" is above the average positive
    * balance (scalar subquery in exact cents) — anti join + scalar
    * subquery + aggregate in one composite. */
  def q52GlobalSales(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, q52Sql)

  val q52Sql: String =
    """SELECT c_mktsegment, COUNT(*) AS numcust,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'FURNITURE')
      |  AND c_acctbal > (
      |    SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE)
      |           / COUNT(*)
      |    FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin

  /** Multi-match regex extraction (regexp_extract_all) over document
    * text: long-word matches per document as an exact array-derived
    * projection — the extraction primitive of any rule-based text
    * cleaner. Array stays internal; outputs are scalars. */
  def q53RegexpExtractAll(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir,
      """SELECT doc_id,
        |  size(regexp_extract_all(text, '[a-z]{7,}', 0)) AS n_long,
        |  try_element_at(regexp_extract_all(text, '[a-z]{7,}', 0), 1)
        |    AS first_long
        |FROM documents ORDER BY doc_id""".stripMargin)

  val q53Sql: String =
    """SELECT doc_id,
      |  CAST(len(regexp_extract_all(text, '[a-z]{7,}')) AS INT) AS n_long,
      |  regexp_extract_all(text, '[a-z]{7,}')[1] AS first_long
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Correlated LATERAL join: each machinery customer's two priciest
    * orders via a correlated, limited lateral subquery — the per-row
    * dependent-join SQL form (Catalyst decorrelates it into a ranked
    * join; no per-row execution survives in the plan). */
  def q54Lateral(spark: SparkSession, dir: String): DataFrame =
    sql(spark, dir, q54Sql)

  val q54Sql: String =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer, LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey
      |  LIMIT 2) t
      |WHERE c_mktsegment = 'MACHINERY'
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_lateral" -> (q54Lateral _),
    "q50_priority_check" -> (q50PriorityCheck _),
    "q51_customer_distribution" -> (q51CustomerDistribution _),
    "q52_global_sales" -> (q52GlobalSales _),
    "q53_regexp_extract_all" -> (q53RegexpExtractAll _),
  )
  val oracle: Map[String, String] = Map(
    "q54_lateral" -> q54Sql,
    "q50_priority_check" -> q50Sql,
    "q51_customer_distribution" -> q51Sql,
    "q52_global_sales" -> q52Sql,
    "q53_regexp_extract_all" -> q53Sql,
  )
}
