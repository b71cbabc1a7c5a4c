package graft.io

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The control-plane manifest contract (SURVEY.md §2.1 S5-S8), decoupled
  * from HTTP: the reference POSTs to a REST service and parses the
  * response (`/root/reference/R/DataFrameOperationR.R:55-68`); our engine
  * takes the same JSON from any source (file, string, service) and turns
  * it into catalog load instructions.
  */
object Manifest {

  /** One table the node should load: where it lives and its external
    * schema (`ResponseData.TableList[*]`, `R/DataFrameOperationR.R:70-77`). */
  case class TableEntry(name: String, dataLocation: String,
      columns: Seq[String], typeNames: Seq[String])

  /** Upstream-node output (S7/S8): a completed job's output location(s)
    * plus its `MetaData`/`MetaDataType` sidecar strings
    * (`R/DataFrameOperationR.R:140-168`). */
  case class UpstreamOutput(nodeCaption: String, locations: Seq[String],
      metaData: String, metaDataType: String)

  private implicit val formats: Formats = DefaultFormats

  /** Parse a `GetDataSourceSchema`-shaped response. Column types default
    * to String when the manifest omits them (the reference's manifest
    * carries names only — types were inferred on read, `:43`). */
  def parse(json: String): Seq[TableEntry] = {
    val root = JsonMethods.parse(json)
    (root \ "ResponseData" \ "TableList") match {
      case JArray(tables) => tables.map { t =>
        val cols = (t \ "ColumnList") match {
          case JArray(cs) =>
            cs.map(c => (c \ "MappedAliasName").extract[String])
          case _ => Nil
        }
        val types = (t \ "ColumnTypeList") match {
          case JArray(ts) => ts.map(_.extract[String])
          case _ => cols.map(_ => "String")
        }
        TableEntry(
          name = (t \ "TABLE_NAME").extract[String],
          dataLocation = (t \ "DataLocation").extract[String],
          columns = cols,
          typeNames = types)
      }
      case _ => Nil
    }
  }

  /** S6: experiment-graph source — parse the `GraphJSON` and keep the
    * `devs.Model` nodes as `id -> NodeCaption`
    * (`/root/reference/R/DataFrameOperationR.R:102-123`). The execution
    * DAG itself is Spark lineage; this registry only names upstream
    * outputs for catalog keys. */
  def parseGraph(graphJson: String): Map[String, String] = {
    val root = JsonMethods.parse(graphJson)
    (root \ "cells") match {
      case JArray(cells) =>
        cells.flatMap { c =>
          (c \ "type") match {
            case JString("devs.Model") =>
              Some((c \ "id").extract[String] ->
                (c \ "NodeCaption").extract[String])
            case _ => None
          }
        }.toMap
      case _ => Map.empty
    }
  }

  /** F8 parity: XPath extraction from the node's Action XML — the
    * fields the reference pulls for job-status reporting
    * (`R/DataFrameOperationR.R:206-211`). */
  case class ActionInfo(uuid: String, experimentId: String, nodeId: String,
      serviceUrl: String)

  def parseActionXml(xml: String): ActionInfo = {
    val root = scala.xml.XML.loadString(xml)
    def one(tag: String): String = (root \\ tag).map(_.text.trim)
      .headOption.getOrElse("")
    ActionInfo(one("UUID"), one("ExperimentId"), one("NodeId"),
      one("ServiceUrl"))
  }

  /** The reference stores nested JSON re-quoted inside JSON with `"` →
    * backtick escaping (`R/DataFrameOperationR.R:295`); inverse at
    * `:141,213`. Kept for sidecar parity. */
  def escapeQuotes(s: String): String = s.replace("\"", "`")
  def unescapeQuotes(s: String): String = s.replace("`", "\"")

  /** Parse the upstream-job-status rows (S7): keep rows with Status 2
    * (completed, `R/DataFrameOperationR.R:135`) for the given node,
    * *latest by explicit order column* — the reference trusted frame row
    * order (`:136-140`); distributed semantics require the caller to
    * provide an ordered list, so we take the last entry. Split outputs
    * (`SplitData`, `:144-168`) yield one location per split. */
  def latestOutput(json: String, nodeId: String,
      caption: String): Option[UpstreamOutput] = {
    val root = JsonMethods.parse(json)
    val rows = (root \ "JobsStatus") match {
      case JArray(rs) => rs
      case _ => Nil
    }
    val completed = rows.filter { r =>
      (r \ "Status").extract[Int] == 2 &&
        (r \ "JobNodeID").extract[String] == nodeId && nodeId != "0"
    }
    completed.lastOption.map { r =>
      val resultJson = unescapeQuotes((r \ "Result").extract[String])
      val result = JsonMethods.parse(resultJson)
      val locations = (result \ "SplitData" \ "DataLocation") match {
        case JArray(ls) => ls.map(_.extract[String])
        case JString(single) => Seq(single)
        case _ => Seq((result \ "DataLocation").extract[String])
      }
      UpstreamOutput(caption, locations,
        (result \ "MetaData").extract[String],
        (result \ "MetaDataType").extract[String])
    }
  }
}
