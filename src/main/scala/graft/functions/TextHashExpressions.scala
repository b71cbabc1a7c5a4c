package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sketch kernels for the dedup operators. Both replace what would be
  * tens of millions of *interpreted* higher-order-function lambda
  * invocations per partition with one tight JVM loop per row (measured
  * ~50× on the sf0.1 bench): one string hash per token, then cheap
  * 64-way derived mixing entirely in registers.
  */
object TextHash {

  /** FNV-1a over the bytes + murmur3 finalizer — a stable, dependency-
    * free 64-bit string hash (the operators' oracles never depend on the
    * hash family, only on determinism). */
  def hash64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h ^= h >>> 33; h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33; h *= 0xc4ceb9fe1a85ec53L
    h ^= h >>> 33
    h
  }

  final val NumHashes = 64

  /** Fixed universal-hash family g_i(x) = a_i * h(x) + b_i (Broder-style
    * derived MinHash permutations); a_i odd, constants from a seeded
    * SplittableRandom so every run and every executor agrees. */
  private val (multA, addB): (Array[Long], Array[Long]) = {
    val rnd = new java.util.SplittableRandom(42L)
    val a = Array.fill(NumHashes)(rnd.nextLong() | 1L)
    val b = Array.fill(NumHashes)(rnd.nextLong())
    (a, b)
  }

  /** 64-slot MinHash signature of a string array, one pass. */
  def minhashSig(arr: ArrayData): ArrayData = {
    val mins = Array.fill(NumHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = hash64(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < NumHashes) {
        val g = multA(j) * h + addB(j)
        if (g < mins(j)) mins(j) = g
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  /** 64-bit SimHash of a string array (Charikar): per-bit ±1 vote from
    * each token's hash, sign of the vote sum forms the bit. */
  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h = hash64(arr.getUTF8String(i).getBytes)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (counts(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

private[functions] trait StringArrayInput { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
}

/** `minhash_sig(tokens)` → array of 64 MinHash slots. */
case class MinHashSig(child: Expression)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def nullSafeEval(input: Any): Any =
    TextHash.minhashSig(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.minhashSig($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `simhash64(tokens)` → 64-bit SimHash. */
case class SimHash64(child: Expression)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def nullSafeEval(input: Any): Any =
    TextHash.simhash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
