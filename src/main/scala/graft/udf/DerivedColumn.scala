package graft.udf

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.io.TypeVocabulary

/** P7 parity: the reference's single extension point is a
  * script-as-derived-field — an opaque script applied over selected
  * columns, producing one new column of a declared type, *described* (not
  * executed) as PMML (`/root/reference/R/DataFrameOperationR.R:324-386`).
  *
  * Spark-native: the derived column is a real `Column` expression
  * (preferred — codegen'd, optimizable) or a registered UDF when the
  * logic is genuinely opaque. The PMML description becomes a serializer
  * over this declaration ([[PmmlSerializer]]).
  */
case class DerivedColumn(
    outputName: String,
    outputTypeName: String, // reference vocabulary, e.g. "float"
    inputColumns: Seq[String],
    script: String, // opaque script text, carried into the PMML CDATA
    expression: Option[Seq[Column] => Column] = None) {

  /** Apply to a DataFrame: evaluate the expression if one is attached
    * (the engine-native path), casting to the declared output type. */
  def apply(df: DataFrame): DataFrame = {
    val fn = expression.getOrElse(
      throw new UnsupportedOperationException(
        s"derived column '$outputName' carries only an opaque script; " +
          "attach an expression to evaluate it engine-side"))
    df.withColumn(outputName,
      fn(inputColumns.map(col)).cast(TypeVocabulary(outputTypeName)))
  }
}
