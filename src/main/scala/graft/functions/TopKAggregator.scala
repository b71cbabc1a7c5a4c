package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

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
    extends Aggregator[(Double, Long), List[(Double, Long)],
      Seq[(Double, Long)]] {

  private def better(a: (Double, Long), b: (Double, Long)): Boolean =
    a._1 > b._1 || (a._1 == b._1 && a._2 < b._2)

  override def zero: List[(Double, Long)] = Nil

  override def reduce(buf: List[(Double, Long)],
      in: (Double, Long)): List[(Double, Long)] = insert(buf, in)

  private def insert(buf: List[(Double, Long)],
      in: (Double, Long)): List[(Double, Long)] = {
    if (buf.lengthCompare(k) >= 0 && !better(in, buf.last)) buf
    else {
      val (ahead, behind) = buf.span(better(_, in))
      (ahead ::: in :: behind).take(k)
    }
  }

  override def merge(a: List[(Double, Long)],
      b: List[(Double, Long)]): List[(Double, Long)] =
    b.foldLeft(a)(insert)

  override def finish(buf: List[(Double, Long)]): Seq[(Double, Long)] = buf

  override def bufferEncoder: Encoder[List[(Double, Long)]] =
    Encoders.kryo[List[(Double, Long)]]
  override def outputEncoder: Encoder[Seq[(Double, Long)]] =
    Encoders.kryo[Seq[(Double, Long)]]
}
