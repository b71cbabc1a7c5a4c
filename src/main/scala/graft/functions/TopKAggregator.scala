package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable bounded top-k buffer: parallel arrays kept sorted by
  * (score desc, id asc), insertion by binary search + arraycopy. A
  * List-based buffer costs an O(k) allocation walk per candidate — at
  * millions of reduce calls the garbage dominates; these arrays mutate
  * in place (Spark's ObjectHashAggregate explicitly permits mutable
  * aggregation buffers) and serialize compactly. */
final class TopKBuf(val scores: Array[Double], val ids: Array[Long],
    var n: Int) extends Serializable {

  /** Insertion point for (s, id) in the sorted prefix [0, n). */
  private def position(s: Double, id: Long): Int = {
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      val better = scores(mid) > s || (scores(mid) == s && ids(mid) < id)
      if (better) lo = mid + 1 else hi = mid
    }
    lo
  }

  def insert(s: Double, id: Long): Unit = {
    val k = scores.length
    if (n == k) {
      val last = n - 1
      if (scores(last) > s || (scores(last) == s && ids(last) < id)) return
    }
    // invariant: pos < k always — when full, the early return above
    // guarantees the new entry beats the last (pos <= k-1); when not
    // full, pos <= n <= k-1
    val pos = position(s, id)
    val shift = math.min(n, k - 1) - pos
    if (shift > 0) {
      System.arraycopy(scores, pos, scores, pos + 1, shift)
      System.arraycopy(ids, pos, ids, pos + 1, shift)
    }
    scores(pos) = s
    ids(pos) = id
    if (n < k) n += 1
  }
}

/** Typed bounded top-k aggregator: keeps the k largest (score, id) pairs
  * per group in a fixed-size buffer.
  *
  * Why it exists: `row_number().over(Window.partitionBy(...))` must
  * shuffle and sort EVERY candidate row before discarding all but k.
  * An Aggregator gets map-side partial aggregation — each input
  * partition reduces to ≤ k pairs per group before the shuffle — so the
  * exchange carries O(groups · k) rows instead of O(candidates). At
  * 100 TB candidate scale that is the difference between a bounded
  * shuffle and a full re-sort of the candidate set.
  *
  * Ordering: descending score, ascending id on ties (deterministic).
  */
class TopKAggregator(k: Int)
    extends Aggregator[(Double, Long), TopKBuf, Seq[(Double, Long)]] {

  override def zero: TopKBuf =
    new TopKBuf(new Array[Double](k), new Array[Long](k), 0)

  override def reduce(buf: TopKBuf, in: (Double, Long)): TopKBuf = {
    buf.insert(in._1, in._2)
    buf
  }

  override def merge(a: TopKBuf, b: TopKBuf): TopKBuf = {
    var i = 0
    while (i < b.n) { a.insert(b.scores(i), b.ids(i)); i += 1 }
    a
  }

  override def finish(buf: TopKBuf): Seq[(Double, Long)] =
    (0 until buf.n).map(i => (buf.scores(i), buf.ids(i)))

  override def bufferEncoder: Encoder[TopKBuf] = Encoders.kryo[TopKBuf]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
}
