package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Reference-parity loading surface (SURVEY.md §2.1 S1-S8).
  *
  * The reference materializes each table by listing a directory over
  * WebHDFS and `read.csv`-ing every part file serially on one thread
  * (`/root/reference/R/DataFrameOperationR.R:24-49`), applying
  * externally-supplied column names (`:44`). Its part-file union is
  * buggy (loop counter never increments, `:36-45`, so only the last part
  * survives); we implement the *intended* semantics — a row-union of all
  * parts — which the SparkR remnant at `:161` confirms.
  *
  * Spark-native shape: one `spark.read` over the explicit file list —
  * enumeration is one driver-side namenode call, then Spark schedules
  * one task per file split. Nothing is materialized driver-side, so a
  * 100 TB table costs the same driver memory as a 1 MB one.
  */
object Load {

  /** Part-file skip-list from the reference (`R/DataFrameOperationR.R:39`). */
  val SkipNames: Set[String] = Set("_SUCCESS", "pmml", "pmml.xml")

  /** List a table directory, honoring the reference's skip-list (S1+S2).
    * One FileSystem call; no data touched. `cfg` normalizes
    * fully-qualified `hdfs://host:port` locations the way the
    * reference's `gsub(hdfspath,'',path)` does (GraftConfig). */
  def listPartFiles(spark: SparkSession, dir: String,
      cfg: graft.GraftConfig = graft.GraftConfig()): Seq[String] = {
    val path = new Path(cfg.resolvePath(dir))
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(path)
      .filter(_.isFile)
      .map(_.getPath)
      .filter(p => !SkipNames.contains(p.getName) &&
        !p.getName.startsWith(".") && !p.getName.startsWith("_"))
      .map(_.toString)
      .sorted
      .toSeq
  }

  /** S3+S4: headerless CSV table directory with external schema —
    * column names and type names arrive as metadata, never from the
    * files. All parts row-union into one distributed scan. */
  def csvDir(spark: SparkSession, dir: String, columns: Seq[String],
      typeNames: Seq[String],
      cfg: graft.GraftConfig = graft.GraftConfig()): DataFrame = {
    require(columns.length == typeNames.length,
      s"schema metadata mismatch: ${columns.length} columns vs " +
        s"${typeNames.length} types (corrupt sidecar?)")
    val schema = StructType(columns.zip(typeNames).map { case (c, t) =>
      StructField(c, TypeVocabulary(t))
    })
    val parts = listPartFiles(spark, dir, cfg)
    require(parts.nonEmpty, s"no part files under $dir")
    spark.read
      .schema(schema)
      .option("header", "false")
      .csv(parts: _*)
  }

  /** Comma-separated `MetaData` / `MetaDataType` strings → typed reader
    * (the reference's sidecar contract, `R/DataFrameOperationR.R:148-153`). */
  def csvDirWithMeta(spark: SparkSession, dir: String, metaData: String,
      metaDataType: String,
      cfg: graft.GraftConfig = graft.GraftConfig()): DataFrame =
    csvDir(spark, dir,
      metaData.split(",").map(_.trim).toSeq,
      metaDataType.split(",").map(_.trim).toSeq, cfg)
}

/** Canonical mapping from the reference's metadata type vocabulary to
  * Spark types. The vocabulary mixes PMML names (`float`/`continuous`,
  * `R/DataFrameOperationR.R:360-364`), R `typeof` names
  * (`double`/`integer`/`character`, `:241`) and .NET-ish names
  * (`String`, `.Rhistory:3`); one total map keeps load/store symmetric. */
object TypeVocabulary {
  def apply(name: String): DataType = name.trim.toLowerCase match {
    case "string" | "character" | "varchar" | "text" => StringType
    case "float" | "continuous" => FloatType
    case "double" | "numeric" | "real" => DoubleType
    case "int" | "integer" => IntegerType
    case "long" | "bigint" | "int64" => LongType
    case "bool" | "boolean" | "logical" => BooleanType
    case "timestamp" | "datetime" => TimestampType
    case "date" => DateType
    case other =>
      throw new IllegalArgumentException(s"unknown metadata type: $other")
  }

  /** Inverse direction for the store-side sidecar (S10). */
  def nameOf(dt: DataType): String = dt match {
    case StringType => "String"
    case FloatType => "float"
    case DoubleType => "double"
    case IntegerType => "integer"
    case LongType => "long"
    case BooleanType => "boolean"
    case TimestampType => "timestamp"
    case DateType => "date"
    case other => other.simpleString
  }
}
