package graft

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

/** Robustness: every registered query must run (to completion, no
  * throw) against structurally-identical but EMPTY tables. At 100 TB
  * empty inputs are routine — a filter that matches nothing, a new
  * partition, a replay from an empty checkpoint — and an operator that
  * crashes on zero rows is an operator that pages someone at 3am. */
class EmptyInputSpec extends AnyFunSuite {
  import SparkTestSession._

  private lazy val emptyDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_empty").toString
    Tables.names.foreach { t =>
      // mirror the RAW file schema, not the post-load one: events.ts is
      // stored as nanos (read as long via nanosAsLong) and Tables
      // re-applies its truncation on load
      val schema =
        if (t == "events") {
          spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          spark.read.parquet(s"$sf/$t.parquet").schema
        } else Tables(spark, sf, t).schema
      spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  test("every query (and verify shape) tolerates empty inputs") {
    val failures = (SparkEntry.queries ++ SparkEntry.verifyOverrides)
      .toSeq.sortBy(_._1).flatMap { case (name, fn) =>
        try {
          fn(spark, emptyDir).collect()
          None
        } catch {
          case e: Throwable =>
            Some(s"$name: ${e.getClass.getSimpleName} " +
              String.valueOf(e.getMessage).linesIterator
                .take(1).mkString.take(160))
        }
      }
    assert(failures.isEmpty,
      s"${failures.size} queries crash on empty inputs:\n" +
        failures.mkString("\n"))
  }

  test("t18's global prior survives an empty corpus without AQE cover") {
    // With AQE on, empty-relation propagation can discard a failing
    // stage before its DIVIDE_BY_ZERO surfaces, so the sweep above can
    // go green by plan-shape accident. Pin the NULLIF guard directly:
    // the global aggregate must evaluate (to NULL) even when every
    // stage actually executes.
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val rows = SparkEntry.queries("t18_quality_distill")(spark, emptyDir)
        .collect()
      assert(rows.isEmpty)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
