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
    * `events.ts` has been written two ways across fixture generations:
    * parquet TIMESTAMP(NANOS) (which Spark's vectorized reader rejects —
    * read as nano-longs via `spark.sql.legacy.parquet.nanosAsLong` and
    * truncate to microseconds, the same truncation DuckDB applies) and
    * plain TIMESTAMP micros (arrives as TIMESTAMP_NTZ — cast to the
    * session-zoned type, identity on wall-clock under the UTC session).
    * [[normalizeEventsTs]] branches on the LOADED type, so either
    * generation yields the same `timestamp` column downstream. */
  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(s"$sfDir/$name.parquet"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Normalize `ts` to session-zoned microsecond TimestampType from
    * whichever physical form the fixture carries (nano-longs via the
    * legacy flag, TIMESTAMP_NTZ, or already-zoned). Works on batch and
    * streaming frames alike — it only inspects the schema. */
  def normalizeEventsTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => df
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
