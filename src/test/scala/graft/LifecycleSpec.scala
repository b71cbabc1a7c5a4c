package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.TableCatalog
import graft.io.{Manifest, Store}
import graft.udf.{DerivedColumn, PmmlSerializer}

/** The reference's FULL node lifecycle (`R/DataFrameOperationR.R:53-323`)
  * composed in ONE flow. Every stage is unit-tested in IoParitySpec;
  * this spec runs the call graph a production node actually executes —
  * graph parse, manifest load, upstream discovery, transform with a
  * derived column, CSV+sidecar publish, status report, PMML emission —
  * and then closes the loop the way the CONTROL PLANE does: a
  * downstream node discovers this node's output purely from the
  * reported status record and must reload it row-for-row. */
class LifecycleSpec extends AnyFunSuite {
  import SparkTestSession._

  /** Embed an already-backtick-escaped sidecar into a JSON string
    * literal (the control plane stores `Result` as a string): JSON
    * forbids raw control characters, so the sidecar's newlines must be
    * escaped; `latestOutput` gets them back from the JSON parser. */
  private def embed(escaped: String): String =
    escaped.replace("\\", "\\\\").replace("\"", "\\\"")
      .replace("\n", "\\n")

  test("manifest → graph → upstream → transform → publish → status → PMML → downstream reload") {
    // ---- the experiment graph names the nodes (S6)
    val graph =
      """{"cells": [
        | {"type": "devs.Model", "id": "n1", "NodeCaption": "LoadCsv"},
        | {"type": "devs.Link", "id": "e1"},
        | {"type": "devs.Model", "id": "n2", "NodeCaption": "Score"}
        |]}""".stripMargin
    val nodes = Manifest.parseGraph(graph)
    assert(nodes == Map("n1" -> "LoadCsv", "n2" -> "Score"))

    // ---- n1 (upstream) published a table THROUGH THE ENGINE'S OWN
    // sink (S9/S10), so n2's discovery exercises the real sidecar
    val upBase = Files.createTempDirectory("lifecycle_up").toString
    val upstreamDf = Tables(spark, sf, "customer")
      .select(col("c_custkey").as("id"), col("c_acctbal").as("balance"))
    val upMeta = Store.writeCsvWithMeta(upstreamDf, upBase)
    val upStatus =
      s"""{"JobsStatus": [
         | {"Status": 3, "JobNodeID": "n1", "Result": "failed-attempt"},
         | {"Status": 2, "JobNodeID": "n1",
         |  "Result": "${embed(upMeta.toEscapedJson)}"}
         |]}""".stripMargin
    val up = Manifest.latestOutput(upStatus, "n1", nodes("n1"))
    assert(up.isDefined && up.get.metaData == "id,balance")

    // ---- n2's own manifest input (S5): a headerless-CSV control-plane
    // table, schema external
    val factorsDir = Files.createTempDirectory("lifecycle_factors")
    Files.writeString(factorsDir.resolve("part-00000.csv"),
      "1,0.5\n2,1.5\n3,2.5\n")
    Files.writeString(factorsDir.resolve("part-00001.csv"),
      "4,3.0\n5,4.0\n")
    Files.writeString(factorsDir.resolve("_SUCCESS"), "")
    val manifest =
      s"""{"ResponseData": {"TableList": [{
         |  "TABLE_NAME": "Factors",
         |  "DataLocation": "${factorsDir.toString}",
         |  "ColumnList": [{"MappedAliasName": "id"},
         |                 {"MappedAliasName": "factor"}],
         |  "ColumnTypeList": ["long", "double"]
         |}]}}""".stripMargin
    val cat = new TableCatalog(spark)
      .loadManifest(manifest)
      .loadUpstream(up.get)
    assert(cat.names.toSet == Set("Factors", "LoadCsv_1"))

    // ---- transform: upstream ⋈ manifest table + derived column (P7)
    val dc = DerivedColumn(
      outputName = "risk", outputTypeName = "float",
      inputColumns = Seq("balance", "factor"),
      script = "out = balance * factor",
      expression = Some(cols => cols.head * cols(1)))
    val result = dc(cat("LoadCsv_1").join(cat("Factors"), "id"))
    val expect = result.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getFloat(3))).sortBy(_._1)
    assert(expect.length == 5) // the join hit every factor row

    // ---- publish (S9/S10), PMML (S11), status (S12)
    val outBase = Files.createTempDirectory("lifecycle_out").toString
    val meta = Store.writeCsvWithMeta(result, outBase)
    assert(meta.MetaData == "id,balance,factor,risk")
    val pmml = PmmlSerializer.serialize(dc, Seq("double", "double"),
      timestamp = java.time.Instant.EPOCH)
    Store.writePmml(result, meta.ModelLocation, pmml)
    val pmmlFile = java.nio.file.Paths.get(
      meta.PMMLLocation, "part-00000")
    assert(Files.exists(pmmlFile), s"PMML sink missing at $pmmlFile")
    val xml = scala.xml.XML.loadString(Files.readString(pmmlFile))
    assert((xml \\ "DerivedField").head \@ "name" == "risk")
    val rep = new Store.InMemoryReporter
    rep.report(Store.JobStatus("application_lifecycle", "n2",
      Store.StatusCompleted, meta.DataLocation, meta.toEscapedJson))
    assert(rep.all.map(_.status) == Seq(Store.StatusCompleted))

    // ---- THE CONTRACT: a downstream node discovers n2's output from
    // the reported record alone (S7 again, one hop later) and the
    // reload round-trips row-for-row through CSV + sidecar typing
    val recorded = rep.all.head
    val downStatus =
      s"""{"JobsStatus": [
         | {"Status": ${recorded.status}, "JobNodeID": "${recorded.nodeId}",
         |  "Result": "${embed(recorded.message)}"}
         |]}""".stripMargin
    val next = Manifest.latestOutput(downStatus, "n2", nodes("n2"))
    assert(next.isDefined)
    val reloaded = new TableCatalog(spark).loadUpstream(next.get)("Score_1")
    assert(reloaded.columns.toSeq == Seq("id", "balance", "factor", "risk"))
    val got = reloaded.collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2),
        r.getFloat(3))).sortBy(_._1)
    assert(got.toSeq == expect.toSeq,
      "downstream reload diverges from the published transform")
  }
}
