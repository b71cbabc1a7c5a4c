package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the similarity / fingerprint kernels
  * (SURVEY.md §4 "custom needs"). These are the hot inner loops of the
  * LLM-pipeline operators; a Scala UDF here would box every float of
  * every row, so each gets `doGenCode` and participates in whole-stage
  * codegen. The reference has no equivalent — its only extension point
  * delegates scripts to an external engine
  * (`/root/reference/R/DataFrameOperationR.R:504-515`).
  */
object VectorExpressions {

  /** Registers all graft SQL functions on the session (idempotent), so
    * plans can use them via `expr("vec_dot(a, b)")` etc. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDot(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction(
      "rolling_min_hash",
      exprs => RollingMinHash(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "rolling_hashes",
      exprs => RollingHashes(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "minhash_sig", exprs => MinHashSig(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "simhash64", exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction(
      "word_shingles3", exprs => WordShingles(exprs.head, 3), "built-in")
    reg.createOrReplaceTempFunction(
      "word_shingles2", exprs => WordShingles(exprs.head, 2), "built-in")
    reg.createOrReplaceTempFunction(
      "count_in_set", exprs => VectorExpressions.mkCountInSet(exprs),
      "built-in")
    reg.createOrReplaceTempFunction(
      "cms_estimate", exprs => CmsEstimate(exprs(0), exprs(1)), "built-in")
    // the sketch-merge re-aggregator rides the UDF registry (it is an
    // Aggregator, not an Expression); registration is idempotent
    spark.udf.register("cms_merge",
      org.apache.spark.sql.functions.udaf(
        SketchExpressions.CmsMerge, org.apache.spark.sql.Encoders.BINARY))
  }

  /** `count_in_set(arr, 'a,b,c')` — the member set must be a foldable
    * string literal (it becomes a static of the generated operator). */
  private[graft] def mkCountInSet(
      exprs: Seq[Expression]): CountInSet = exprs(1) match {
    case org.apache.spark.sql.catalyst.expressions.Literal(s: UTF8String, StringType) =>
      CountInSet(exprs.head, s.toString)
    case other => throw new IllegalArgumentException(
      s"count_in_set expects a string literal set, got $other")
  }
}

/** Dot product of two float or double vectors (each side independently
  * typed; floats widen exactly to double), accumulated in double, element
  * order ascending (deterministic). Codegen emits a tight primitive
  * loop — no boxing, stays inside WholeStageCodegen. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def isDoubleSide(e: Expression): Boolean = e.dataType match {
    case ArrayType(DoubleType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_dot expects array<float>/array<double> sides, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (ld, rd) = (isDoubleSide(left), isDoubleSide(right))
    val n = math.min(x.numElements(), y.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      val xv = if (ld) x.getDouble(i) else x.getFloat(i).toDouble
      val yv = if (rd) y.getDouble(i) else y.getFloat(i).toDouble
      s += xv * yv
      i += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      def get(arr: String, dbl: Boolean) =
        if (dbl) s"$arr.getDouble($i)" else s"((double) $arr.getFloat($i))"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $s = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += ${get(a, isDoubleSide(left))} * ${get(b, isDoubleSide(right))};
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

/** Document fingerprint: minimum 64-bit polynomial rolling hash over all
  * 16-byte windows of the UTF-8 text (Karp-Rabin / winnowing-style
  * min-selection, cf. Schleimer et al., SIGMOD'03). One pass over the
  * bytes, O(1) per window via the precomputed `B^k` leading-byte
  * remover; codegen'd. Texts shorter than the window hash whole. */
case class RollingMinHash(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_min_hash expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_min_hash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    TextHash.rollingMin(bytes)
  }

  // the kernel lives in TextHash (a plain object with real static
  // forwarders) — a companion-object method here would inherit the name
  // `eval` clash with Expression.eval, lose its forwarder, and make
  // this generated call fail janino compilation (interpreted fallback)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash.rollingMin($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingMinHash =
    copy(child = newChild)
}

/** `rolling_hashes(s)` → array of ALL full-window Karp-Rabin hashes in
  * position order (the [[RollingMinHash]] recurrence without the min
  * fold) — the primitive content-defined chunking cuts on
  * ([[graft.llm.Multimodal.m12CdcChunks]]). Codegen'd; one pass. */
case class RollingHashes(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"rolling_hashes expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "rolling_hashes"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    TextHash.rollingAll(bytes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash.rollingAll($c.getBytes())")

  override protected def withNewChildInternal(newChild: Expression): RollingHashes =
    copy(child = newChild)
}
