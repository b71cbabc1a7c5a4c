package graft.stream

import org.apache.spark.sql.{Dataset, Encoders, KeyValueGroupedDataset}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Custom streaming state operators (SURVEY.md §2.5 north star) — the
  * two Spark APIs for state the built-in windowed aggregates can't
  * express, shipped as library surface (StreamingSpec drives both
  * against a file source + memory sink and checks batch parity).
  *
  * Scale posture: state is per-key and O(1) per key (a single
  * count/total), partitioned by the grouping key across executors; with
  * the RocksDB provider state spills off-heap and snapshots
  * incrementally, so the operator's memory footprint is independent of
  * stream length.
  */
object Stateful {

  private implicit val longEnc: org.apache.spark.sql.Encoder[Long] =
    Encoders.scalaLong
  private implicit val doubleEnc: org.apache.spark.sql.Encoder[Double] =
    Encoders.scalaDouble
  private implicit val longPairEnc
      : org.apache.spark.sql.Encoder[(Long, Long)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  private implicit val longDoubleEnc
      : org.apache.spark.sql.Encoder[(Long, Double)] =
    Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble)

  /** Running event count per key via `mapGroupsWithState` — the classic
    * sessionless per-key accumulator. */
  def runningCounts(
      grouped: KeyValueGroupedDataset[Long, (Long, Long)]): Dataset[(Long, Long)] =
    grouped.mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
      (key: Long, rows: Iterator[(Long, Long)], state: GroupState[Long]) =>
        val n = state.getOption.getOrElse(0L) + rows.size
        state.update(n)
        (key, n)
    }

  /** Running value total per key as a `transformWithState`
    * StatefulProcessor (the arbitrary-state API; needs a
    * column-family-capable store, e.g. RocksDBStateStoreProvider). */
  class TotalsProcessor
      extends StatefulProcessor[Long, (Long, Double), (Long, Double)] {
    @transient private var total: ValueState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      total = getHandle.getValueState[Double]("total",
        Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Double)],
        timerValues: TimerValues): Iterator[(Long, Double)] = {
      var t = if (total.exists()) total.get() else 0.0
      rows.foreach(t += _._2)
      total.update(t)
      Iterator.single((key, t))
    }
  }

  /** Running totals per key via [[TotalsProcessor]]. */
  def runningTotals(
      grouped: KeyValueGroupedDataset[Long, (Long, Double)]): Dataset[(Long, Double)] =
    grouped.transformWithState(new TotalsProcessor,
      TimeMode.None(), OutputMode.Update())

  /** Input row for [[forwardFill]]: `v = None` is a hole to repair. */
  case class FillIn(userId: Long, tsMicros: Long, eventId: Long,
      v: Option[Double])

  /** Output row: `filled = None` only for leading holes (no observation
    * yet for that key, ever, across all batches). */
  case class FillOut(userId: Long, eventId: Long, wasMissing: Boolean,
      filled: Option[Double])

  private implicit val fillInEnc: org.apache.spark.sql.Encoder[FillIn] =
    Encoders.product[FillIn]
  private implicit val fillOutEnc: org.apache.spark.sql.Encoder[FillOut] =
    Encoders.product[FillOut]

  /** Input row for [[scd2]]. */
  case class ScdIn(userId: Long, tsMicros: Long, eventId: Long,
      eventType: String)

  /** The open (unclosed) version carried in state: one small tuple per
    * key, O(1) regardless of stream length. */
  case class ScdOpen(fromMicros: Long, eventId: Long, eventType: String)

  /** A CLOSED dimension version (the streaming operator emits versions
    * as soon as the change that closes them arrives; the open version
    * per key lives in state and is queryable from the state store, not
    * the output — append-mode sinks cannot retract). */
  case class ScdClosed(userId: Long, eventId: Long, eventType: String,
      fromMicros: Long, toMicros: Long)

  private implicit val scdOpenEnc: org.apache.spark.sql.Encoder[ScdOpen] =
    Encoders.product[ScdOpen]
  private implicit val scdClosedEnc
      : org.apache.spark.sql.Encoder[ScdClosed] =
    Encoders.product[ScdClosed]

  /** Streaming SCD type-2 build — the streaming twin of the batch q67
    * (`ops.Relational6.q67Scd2`): per key, a new dimension version opens
    * when `eventType` changes; the arriving change CLOSES the previous
    * version, which is emitted immediately (append output). Consecutive
    * repeats of the same type collapse into the open version, exactly as
    * in the batch form.
    *
    * Emission discipline: only CLOSED versions are output — an
    * append-mode sink cannot retract, so the open version (batch q67's
    * `is_current` row) stays in per-key state until a later change
    * closes it. On an in-order source, emitted rows equal the batch
    * operator's non-current rows exactly (StreamingSpec asserts this,
    * and that a change arriving in a LATER micro-batch closes the
    * version opened earlier). Same caveat as all append-mode stream
    * derivations: cross-batch ordering follows arrival. */
  def scd2(
      grouped: KeyValueGroupedDataset[Long, ScdIn]): Dataset[ScdClosed] =
    grouped.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (key: Long, rows: Iterator[ScdIn], state: GroupState[ScdOpen]) =>
        var open: Option[ScdOpen] = state.getOption
        val closed = Seq.newBuilder[ScdClosed]
        rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
          open match {
            case Some(o) if o.eventType != r.eventType =>
              closed += ScdClosed(key, o.eventId, o.eventType,
                o.fromMicros, r.tsMicros)
              open = Some(ScdOpen(r.tsMicros, r.eventId, r.eventType))
            case Some(_) => // same type: stays in the open version
            case None =>
              open = Some(ScdOpen(r.tsMicros, r.eventId, r.eventType))
          }
        }
        open.foreach(state.update)
        closed.result().iterator
    }

  /** Streaming forward fill (LOCF) — the streaming twin of the batch
    * q70 (`ops.Relational6.q70ForwardFill`): each key's holes take the
    * most recent earlier observation, and the carried value SURVIVES
    * ACROSS MICRO-BATCHES in O(1) per-key state (one Double), so a
    * reading that arrives hours after the last good one still fills.
    *
    * Within a micro-batch the group's rows are put in event-time order
    * before filling (the iterator carries no order guarantee); ACROSS
    * batches the fill follows arrival order — the inherent streaming
    * caveat, shared with every LOCF stream repair: a late (out-of-order
    * beyond the batch) observation does not rewrite already-emitted
    * fills. With an in-order source the result equals the batch
    * operator exactly (StreamingSpec asserts this). The per-batch sort
    * bounds memory by each key's per-batch volume, not stream
    * history. */
  def forwardFill(
      grouped: KeyValueGroupedDataset[Long, FillIn]): Dataset[FillOut] =
    grouped.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (key: Long, rows: Iterator[FillIn], state: GroupState[Double]) =>
        var last: Option[Double] = state.getOption
        val out = rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).map { r =>
          r.v match {
            case Some(x) =>
              last = Some(x)
              FillOut(key, r.eventId, wasMissing = false, Some(x))
            case None =>
              FillOut(key, r.eventId, wasMissing = true, last)
          }
        }
        last.foreach(state.update)
        out.iterator
    }
}
