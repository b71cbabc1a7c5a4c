package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.util.sketch.CountMinSketch

/** Count-Min-Sketch plumbing for the mergeable frequency-sketch query
  * (q65): Spark's `count_min_sketch` aggregate builds per-group sketches,
  * [[CmsMerge]] re-aggregates the serialized sketches (the level-2 merge
  * a 100 TB rollup runs over stored sketch bytes), and [[CmsEstimate]]
  * probes the merged sketch.
  *
  * The reference's only aggregation surface is whatever its user scripts
  * compute over raw frames (`/root/reference/R/DataFrameOperationR.R:70-86`);
  * mergeable sketches are the engine-native re-expression that keeps
  * distinct/frequency reporting tractable when the raw data can no
  * longer be re-scanned per question.
  */
object SketchExpressions {

  /** Merge serialized CountMinSketch blobs (binary → binary). The buffer
    * stays serialized so the default BINARY encoder applies; each merge
    * step deserializes two sketches and re-serializes the union. That is
    * O(depth·width) per input row — fine for its intended shape (one
    * sketch per coarse group, e.g. per source or per month), wrong for
    * per-row sketches; build those with `count_min_sketch` first. */
  object CmsMerge extends Aggregator[Array[Byte], Array[Byte], Array[Byte]] {
    override def zero: Array[Byte] = Array.emptyByteArray
    override def reduce(b: Array[Byte], a: Array[Byte]): Array[Byte] = merge(b, a)
    override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] =
      if (b1.isEmpty) b2
      else if (b2.isEmpty) b1
      else {
        val s1 = CountMinSketch.readFrom(b1)
        s1.mergeInPlace(CountMinSketch.readFrom(b2))
        s1.toByteArray
      }
    override def finish(reduction: Array[Byte]): Array[Byte] = reduction
    override def bufferEncoder = org.apache.spark.sql.Encoders.BINARY
    override def outputEncoder = org.apache.spark.sql.Encoders.BINARY
  }
}

/** `cms_estimate(sketch, token)` → the sketch's frequency estimate for
  * the token, hashed through the same UTF-8-bytes path Spark's
  * `count_min_sketch` aggregate used to add it. An empty sketch (the
  * merge identity over zero inputs) estimates 0 for everything.
  *
  * CodegenFallback, and it deserializes the sketch per row — acceptable
  * because the operand frame is probe-sized by construction (a handful
  * of tokens against one merged sketch row); per-token frequency over a
  * corpus is t05/t06's groupBy job, not this. */
case class CmsEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {

  override def prettyName: String = "cms_estimate"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_estimate expects (binary, string), got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")

  override def nullSafeEval(sketch: Any, token: Any): Any = {
    val bytes = sketch.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) 0L
    else CountMinSketch.readFrom(bytes)
      .estimateCount(token.asInstanceOf[UTF8String].getBytes)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsEstimate =
    copy(left = newLeft, right = newRight)
}
