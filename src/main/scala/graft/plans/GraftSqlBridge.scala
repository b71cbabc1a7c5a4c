package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal bridge into Spark's `private[sql]` surface: turning a custom
  * `LogicalPlan` into a `DataFrame` requires `Dataset.ofRows`, which is
  * only reachable from the `org.apache.spark.sql` namespace — the same
  * pattern Spark extension libraries use. Nothing else lives here. */
object GraftSqlBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)
}
