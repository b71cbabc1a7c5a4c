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

  /** Distinct word n-gram shingles of a text, single pass. */
  def wordShingles(text: UTF8String, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < n) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](words.length * 2)
    val sb = new java.lang.StringBuilder(64)
    var i = 0
    while (i <= words.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append('_')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var k = 0
    while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
    new GenericArrayData(out)
  }

  /** Rolling min-hash fold — the [[RollingMinHash]] expression's kernel
    * lives here because generated code can only call it through a real
    * static forwarder: the case class companion inherits Expression.eval,
    * so scalac suppresses a `RollingMinHash.eval(byte[])` forwarder and
    * codegen referencing it fails janino compilation (observed as a
    * silent per-run fallback to interpreted mode). */
  def rollingMin(bytes: Array[Byte]): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    var h = 0L
    var i = 0
    val w = math.min(RollingMinHashKernel.Window, n)
    while (i < w) { h = h * RollingMinHashKernel.Base + (bytes(i) & 0xff); i += 1 }
    var min = h
    while (i < n) {
      h = h * RollingMinHashKernel.Base + (bytes(i) & 0xff) -
        RollingMinHashKernel.BasePowW * (bytes(i - RollingMinHashKernel.Window) & 0xff)
      if (h < min) min = h
      i += 1
    }
    min
  }

  /** Every full-window rolling hash, in position order — index j holds
    * the hash of bytes [j, j+Window): the [[graft.functions
    * .RollingHashes]] kernel (same Karp-Rabin recurrence as
    * [[rollingMin]], all windows kept instead of min-selected).
    * Content-defined chunking reads cut points off these: a window's
    * hash depends ONLY on its 16 bytes, so cut decisions realign after
    * insertions/deletions — the shift-invariance fixed-size chunking
    * lacks. Empty for texts shorter than the window. */
  def rollingAll(bytes: Array[Byte]): ArrayData = {
    val n = bytes.length
    if (n < RollingMinHashKernel.Window)
      return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - RollingMinHashKernel.Window + 1)
    var h = 0L
    var i = 0
    while (i < RollingMinHashKernel.Window) {
      h = h * RollingMinHashKernel.Base + (bytes(i) & 0xff); i += 1
    }
    out(0) = h
    while (i < n) {
      h = h * RollingMinHashKernel.Base + (bytes(i) & 0xff) -
        RollingMinHashKernel.BasePowW * (bytes(i - RollingMinHashKernel.Window) & 0xff)
      out(i - RollingMinHashKernel.Window + 1) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Membership set for [[graft.functions.CountInSet]] — UTF8String
    * members so probes need no per-token String allocation. (Raw
    * java.util type: generated Java calls this, and janino's generics
    * support is partial.) */
  def buildSet(csv: String): java.util.HashSet[_] = {
    val s = new java.util.HashSet[UTF8String]()
    csv.split(",").foreach(w => s.add(UTF8String.fromString(w)))
    s
  }

  /** Count of array elements (with multiplicity) present in `set`. */
  def countInSet(arr: ArrayData, set: java.util.HashSet[_]): Int = {
    val n = arr.numElements()
    var cnt = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && set.contains(arr.getUTF8String(i))) cnt += 1
      i += 1
    }
    cnt
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

/** `word_shingles(text, n)` → distinct word n-gram shingles (joined with
  * '_'), built in one pass over the string: split, slide, hash-dedup.
  * Replaces a transform+concat_ws+array_distinct HOF chain that costs
  * millions of interpreted lambda calls per partition. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (string, n >= 1), got ${child.dataType.simpleString}, n=$n")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    TextHash.wordShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash.wordShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** `count_in_set(tokens, 'a,b,c')` → how many array elements (with
  * multiplicity) are members of the static comma-separated set. Replaces
  * the `size(filter(ws, w -> array_contains(lit_array, w)))` chain: that
  * form is an interpreted higher-order lambda doing a linear
  * literal-array scan per token; this is one codegen'd loop with a
  * hashed membership probe, the set built once per operator instance. */
case class CountInSet(child: Expression, csv: String)
    extends UnaryExpression with StringArrayInput {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "count_in_set"

  @transient private lazy val set = TextHash.buildSet(csv)

  override def nullSafeEval(input: Any): Any =
    TextHash.countInSet(input.asInstanceOf[ArrayData], set)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the set is a per-operator static: built once at codegen init, a
    // hashed probe per token afterwards
    val escaped = csv.replace("\\", "\\\\").replace("\"", "\\\"")
    val setRef = ctx.addMutableState("java.util.HashSet", "countInSet",
      v => s"""$v = graft.functions.TextHash.buildSet("$escaped");""")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextHash.countInSet($c, $setRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): CountInSet =
    copy(child = newChild)
}

/** Constants of the rolling Karp-Rabin fingerprint (shared between the
  * kernel above and the oracle-SQL generator). */
object RollingMinHashKernel {
  final val Window = 16
  final val Base = 1099511628211L // FNV prime; 64-bit wraparound arithmetic

  /** B^Window for removing the leading byte in O(1). */
  final val BasePowW: Long = {
    var p = 1L
    var i = 0
    while (i < Window) { p *= Base; i += 1 }
    p
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
