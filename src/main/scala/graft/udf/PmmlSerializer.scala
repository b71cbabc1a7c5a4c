package graft.udf

/** PMML 4.2 serializer for [[DerivedColumn]] declarations — the
  * reference's `GeneratePmml` phase rebuilt as a pure function
  * (`/root/reference/R/DataFrameOperationR.R:324-386,437-576`): a
  * `DataDictionary` for the input schema, a `DefineFunction` describing
  * the external script engine entry point, and a `DerivedField` applying
  * it over the selected columns with the script body in an
  * `Extension/Script` CDATA block.
  *
  * Intentional fix vs the reference: `CreateApplyFunc` returns from
  * inside its first loop iteration (`R/DataFrameOperationR.R:565-572`),
  * so multi-column selections emit only one `FieldRef`; we emit one per
  * selected column, which is the evident intent.
  *
  * Serialization only — like the reference, the engine never *executes*
  * the script through PMML; engine-side evaluation is the attached
  * Column expression ([[DerivedColumn.apply]]).
  */
object PmmlSerializer {

  case class Meta(
      description: String = "graft derived-column transformation",
      applicationName: String = "graft",
      functionName: String = "script.ScriptExecutor.execute",
      copyright: String = "graft",
      // script-engine parameter block (CreateDerivedFunction call site,
      // R/DataFrameOperationR.R:358-366)
      paramName: String = "params",
      paramOptype: String = "continuous",
      paramDataType: String = "float")

  /** CDATA-safe payload: split any embedded "]]>" terminator. */
  private def cdata(s: String): String =
    s.replace("]]>", "]]]]><![CDATA[>")

  private def esc(s: String): String = s
    .replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    .replace("\"", "&quot;")

  /** dataType/optype pair in PMML vocabulary for a metadata type name. */
  private def pmmlType(name: String): (String, String) =
    name.trim.toLowerCase match {
      case "float" | "double" | "continuous" | "numeric" | "real" =>
        ("float", "continuous")
      case "int" | "integer" | "long" | "bigint" => ("integer", "continuous")
      case "bool" | "boolean" | "logical" => ("boolean", "categorical")
      case _ => ("string", "categorical")
    }

  def serialize(dc: DerivedColumn, inputTypeNames: Seq[String],
      timestamp: java.time.Instant = java.time.Instant.now(),
      meta: Meta = Meta()): String = {
    require(dc.inputColumns.length == inputTypeNames.length,
      "one type name per input column")
    val sb = new StringBuilder
    sb ++= """<?xml version="1.0" encoding="UTF-8"?>""" += '\n'
    sb ++= """<PMML xmlns="http://www.dmg.org/PMML-4_2" version="4.2">""" += '\n'

    // Header (CreateHeader, R/DataFrameOperationR.R:457-472)
    sb ++= s"""  <Header copyright="${esc(meta.copyright)}" description="${esc(meta.description)}">""" += '\n'
    sb ++= s"""    <Application name="${esc(meta.applicationName)}"/>""" += '\n'
    sb ++= s"""    <Timestamp>${timestamp}</Timestamp>""" += '\n'
    sb ++= "  </Header>\n"

    // DataDictionary (PmmlTag, :437-455)
    sb ++= s"""  <DataDictionary numberOfFields="${dc.inputColumns.length}">""" += '\n'
    dc.inputColumns.zip(inputTypeNames).foreach { case (c, t) =>
      val (dt, ot) = pmmlType(t)
      sb ++= s"""    <DataField name="${esc(c)}" dataType="$dt" optype="$ot"/>""" += '\n'
    }
    sb ++= "  </DataDictionary>\n"

    // TransformationDictionary (CreateDerivedFunction + SetDerivedField,
    // :474-554)
    val (outDt, outOt) = pmmlType(dc.outputTypeName)
    sb ++= "  <TransformationDictionary>\n"
    sb ++= s"""    <DefineFunction name="${esc(meta.functionName)}" dataType="$outDt" optype="$outOt">""" += '\n'
    // the reference's script calling convention (CreateDerivedFunction,
    // R/DataFrameOperationR.R:474-520): one ParameterField for the packed
    // `params` tuple, plus a Discretize block abusing defaultValue /
    // DiscretizeBin@binValue to carry the argument-passing contract —
    // formal names (args, argTypes, argValues), actual names
    // (df, script, outparam) and their types (string, PythonCode, string).
    // Consumers of the platform's PMML locate the convention by these
    // exact attribute values, so they are emitted verbatim.
    sb ++= s"""      <ParameterField name="${esc(meta.paramName)}" optype="${esc(meta.paramOptype)}" dataType="${esc(meta.paramDataType)}"/>""" += '\n'
    sb ++= s"""      <Discretize field="${esc(meta.paramName)}" defaultValue="args,argTypes,argValues">""" += '\n'
    sb ++= s"""        <DiscretizeBin binValue="df,script,outparam">""" += '\n'
    sb ++= s"""          <Interval closure="openClosed"/>""" += '\n'
    sb ++= "        </DiscretizeBin>\n"
    sb ++= s"""        <DiscretizeBin binValue="string,PythonCode,string">""" += '\n'
    sb ++= s"""          <Interval closure="openClosed"/>""" += '\n'
    sb ++= "        </DiscretizeBin>\n"
    sb ++= "      </Discretize>\n"
    sb ++= "    </DefineFunction>\n"
    sb ++= s"""    <DerivedField name="${esc(dc.outputName)}" dataType="$outDt" optype="$outOt">""" += '\n'
    sb ++= s"""      <Apply function="${esc(meta.functionName)}">""" += '\n'
    sb ++= s"""        <Extension name="Script"><![CDATA[${cdata(dc.script)}]]></Extension>""" += '\n'
    // one FieldRef PER column (reference bug fixed, :565-572)
    dc.inputColumns.foreach { c =>
      sb ++= s"""        <FieldRef field="${esc(c)}"/>""" += '\n'
    }
    sb ++= "      </Apply>\n"
    sb ++= "    </DerivedField>\n"
    sb ++= "  </TransformationDictionary>\n"
    sb ++= "</PMML>\n"
    sb.result()
  }
}
