package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fixture-table catalog: named access to the driver-generated parquet
  * tables (TESTDATA.md) plus temp-view registration so every table is
  * SQL-addressable.
  *
  * This is the Spark-native form of the reference's catalog contract — a
  * named list `table name -> DataFrame` handed to user scripts
  * (`/root/reference/R/DataFrameOperationR.R:84,89,164,189,200`). Where
  * the reference eagerly materializes each table in driver RAM via serial
  * per-file HTTP reads (`R/DataFrameOperationR.R:37-49`), every entry here
  * is a lazy distributed scan: at 100 TB nothing is read until an action,
  * and then only the columns/row-groups the plan needs (vectorized parquet
  * reader + pushdown).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Lazy scan of one fixture table.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects outright; we read it as nano-longs
    * (`spark.sql.legacy.parquet.nanosAsLong`) and truncate to microsecond
    * timestamps — the same truncation DuckDB applies, so oracle
    * comparisons stay exact. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Load all tables and register each as a temp view (SQL-addressable
    * catalog, same names DuckDB's oracle uses). Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Map[String, DataFrame] =
    names.map { n =>
      val df = apply(spark, sfDir, n)
      df.createOrReplaceTempView(n)
      n -> df
    }.toMap
}
