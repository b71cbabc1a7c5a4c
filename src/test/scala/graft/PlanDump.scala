package graft

import org.apache.spark.sql.SparkSession

/** Dev utility: print the optimized logical plan of the declarative
  * window-top-k query (what a rewrite rule must pattern-match). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestSession.spark
    val df = llm.Similarity.s01BruteForceTopK(spark, SparkTestSession.sf)
    // print the plan as the optimizer's user-provided batch would see it
    println("=== OPTIMIZED ===")
    println(df.queryExecution.optimizedPlan.treeString)
    spark.stop()
  }
}
