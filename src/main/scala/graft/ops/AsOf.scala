package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** As-of (point-in-time) join — an operator Spark's built-in join set
  * lacks. Semantics: for every event, attach the user's most recent
  * order with `o_orderdate <= ts`.
  *
  * Implementation is the scalable union-merge form, not a range cross
  * join: tag both inputs, union them, and sweep one partitioned window
  * ordered by time carrying the last seen order forward
  * (`last_value(..., ignoreNulls)`). Cost is ONE shuffle on the join key
  * + a per-key sort — at 100 TB this behaves like any windowed agg,
  * whereas the naive `e.ts >= o.date` theta-join is quadratic per key.
  * Orders are first deduped to one row per (user, instant) so the match
  * is well-defined in any engine.
  */
object AsOf {

  def q30AsOfJoin(spark: SparkSession, dir: String): DataFrame = {
    // one order per (custkey, orderdate): keep the max orderkey
    val repW = Window.partitionBy(col("o_custkey"), col("o_orderdate"))
      .orderBy(col("o_orderkey").desc)
    val orders = Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(repW))
      .filter(col("rn") === 1)
      .select(col("o_custkey").as("user_id"), col("o_orderdate").as("t"),
        col("o_orderkey"), col("o_totalprice"))

    val events = Tables(spark, dir, "events")
      .select(col("user_id"), col("ts").as("t"), col("event_id"))

    // tag: orders sort before events at the same instant (asof is <=)
    val tagged = orders
      .withColumn("kind", lit(0))
      .withColumn("event_id", lit(null).cast("bigint"))
      .select(col("user_id"), col("t"), col("kind"), col("event_id"),
        col("o_orderkey"), col("o_totalprice"))
      .unionByName(events
        .withColumn("kind", lit(1))
        .withColumn("o_orderkey", lit(null).cast("bigint"))
        .withColumn("o_totalprice", lit(null).cast("double"))
        .select(col("user_id"), col("t"), col("kind"), col("event_id"),
          col("o_orderkey"), col("o_totalprice")))

    val sweep = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("kind"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    tagged
      .withColumn("asof_orderkey",
        last(col("o_orderkey"), ignoreNulls = true).over(sweep))
      .withColumn("asof_totalprice",
        last(col("o_totalprice"), ignoreNulls = true).over(sweep))
      .filter(col("kind") === 1)
      .select(col("event_id"), col("user_id"), col("t").as("ts"),
        col("asof_orderkey"), col("asof_totalprice"))
      .orderBy(col("event_id"))
  }

  /** DuckDB's native ASOF LEFT JOIN over the same deduped orders. */
  val q30Sql: String =
    """WITH ord AS (
      |  SELECT user_id, t, o_orderkey, o_totalprice FROM (
      |    SELECT o_custkey AS user_id, o_orderdate AS t, o_orderkey,
      |      o_totalprice,
      |      ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
      |        ORDER BY o_orderkey DESC) AS rn
      |    FROM orders) WHERE rn = 1
      |)
      |SELECT e.event_id, e.user_id, e.ts,
      |  d.o_orderkey AS asof_orderkey, d.o_totalprice AS asof_totalprice
      |FROM events e ASOF LEFT JOIN ord d
      |  ON e.user_id = d.user_id AND e.ts >= d.t
      |ORDER BY e.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q30_asof_join" -> (q30AsOfJoin _),
  )
  val oracle: Map[String, String] = Map(
    "q30_asof_join" -> q30Sql,
  )
}
