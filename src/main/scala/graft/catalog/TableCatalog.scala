package graft.catalog

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.io.{Load, Manifest}

/** The engine's central contract, restored from the reference: a named
  * catalog `table name -> DataFrame` handed to user code
  * (`/root/reference/R/DataFrameOperationR.R:84,89,164,189,200` builds
  * exactly this as an R named list). Every registered table is also a
  * Spark temp view, so user "scripts" can be SQL as well as DataFrame
  * code.
  *
  * Unlike the reference — which eagerly downloads every table into
  * driver RAM before the script runs — every entry is a lazy plan;
  * registering a 100 TB table costs nothing until a query touches it.
  */
final class TableCatalog(spark: SparkSession,
    cfg: graft.GraftConfig = graft.GraftConfig()) {

  private val tables = mutable.LinkedHashMap.empty[String, DataFrame]

  def register(name: String, df: DataFrame): this.type = {
    tables(name) = df
    df.createOrReplaceTempView(name)
    this
  }

  def apply(name: String): DataFrame =
    tables.getOrElse(name,
      throw new NoSuchElementException(s"table not in catalog: $name"))

  def get(name: String): Option[DataFrame] = tables.get(name)
  def names: Seq[String] = tables.keys.toSeq
  def asMap: Map[String, DataFrame] = tables.toMap

  /** S5: load every table a manifest names (headerless CSV dirs with
    * external schemas) and register under its TABLE_NAME. */
  def loadManifest(manifestJson: String): this.type = {
    Manifest.parse(manifestJson).foreach { e =>
      register(e.name,
        Load.csvDir(spark, e.dataLocation, e.columns, e.typeNames, cfg))
    }
    this
  }

  /** S7/S8: register an upstream node's output(s) under
    * `<caption>_<n>` keys, the reference's naming scheme
    * (`R/DataFrameOperationR.R:163,188`). */
  def loadUpstream(out: Manifest.UpstreamOutput): this.type = {
    out.locations.zipWithIndex.foreach { case (loc, i) =>
      register(s"${out.nodeCaption}_${i + 1}",
        Load.csvDirWithMeta(spark, loc, out.metaData, out.metaDataType, cfg))
    }
    this
  }
}
