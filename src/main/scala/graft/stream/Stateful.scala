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

  /** Input row for [[forwardFillUpdate]] — carries the REAL event-time
    * column (`ts`) so the caller's `withWatermark("ts", …)` survives
    * into the stateful operator (late-row admission and
    * `getCurrentWatermarkMs` both key off it). */
  case class FillUpdIn(userId: Long, ts: java.sql.Timestamp,
      eventId: Long, v: Option[Double])

  /** A row buffered inside the watermark horizon: its fill is still
    * PROVISIONAL (an admissible late observation could precede it).
    * `emitted`/`lastFill` record what the sink last saw, so a re-emit
    * happens exactly when a late row changes the answer. */
  case class FillBufRow(tsMicros: Long, eventId: Long, v: Option[Double],
      emitted: Boolean, lastFill: Option[Double])

  /** Per-key state for [[forwardFillUpdate]]: the carried observation
    * from the settled (≤ watermark) past — O(1) — plus the buffered
    * rows inside the watermark horizon — O(rows within the lateness
    * bound), the standard watermark-bounded-state contract. */
  case class FillUpdState(carried: Option[Double], buf: List[FillBufRow])

  private implicit val fillUpdInEnc
      : org.apache.spark.sql.Encoder[FillUpdIn] =
    Encoders.product[FillUpdIn]
  private implicit val fillUpdStateEnc
      : org.apache.spark.sql.Encoder[FillUpdState] =
    Encoders.product[FillUpdState]

  private def micros(ts: java.sql.Timestamp): Long = {
    val i = ts.toInstant
    i.getEpochSecond * 1000000L + i.getNano / 1000L
  }

  /** Update-mode streaming forward fill WITH late-data retraction — the
    * watermark twin of [[forwardFill]], which follows arrival order and
    * can never rewrite an emitted fill. Here an out-of-order
    * observation arriving within the watermark bound REWRITES the fills
    * it should have fed: every row younger than the watermark stays
    * buffered in per-key state with the fill it last emitted; when a
    * late observation lands between buffered rows, the affected rows
    * re-emit with their corrected fill (update-mode sink semantics —
    * last write per (userId, eventId) wins). Rows at or below the
    * watermark are SETTLED — no admissible late row can precede them —
    * so they evict from the buffer, folding their observation into the
    * O(1) carried value; Spark's standard pre-operator late-row filter
    * drops anything older than the watermark before it reaches us.
    *
    * State per key is O(rows inside the watermark horizon), the exact
    * trade the lateness bound buys (tighter watermark = less state +
    * less rewrite reach; looser = more of both) — at 100 TB/day scale
    * the horizon, not the stream length, is the state budget.
    * Event-time timers (not just row arrival) drive eviction, so a key
    * that goes quiet still settles as the watermark passes its buffer.
    *
    * The caller must apply `withWatermark("ts", …)` BEFORE `groupByKey`
    * (EventTimeTimeout requires it; StreamingSpec drives the full
    * late-rewrite scenario and batch parity). */
  def forwardFillUpdate(
      grouped: KeyValueGroupedDataset[Long, FillUpdIn]): Dataset[FillOut] =
    grouped.flatMapGroupsWithState(
      OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
      (key: Long, rows: Iterator[FillUpdIn], state: GroupState[FillUpdState]) =>
        val s0 = state.getOption.getOrElse(FillUpdState(None, Nil))
        val incoming = rows.map(r => FillBufRow(micros(r.ts), r.eventId,
          r.v, emitted = false, lastFill = None)).toList
        val buf = (s0.buf ++ incoming).sortBy(b => (b.tsMicros, b.eventId))
        // one in-order pass: recompute every buffered fill from the
        // settled carried value; emit rows whose answer is new or changed
        var last = s0.carried
        val out = Seq.newBuilder[FillOut]
        val recomputed = buf.map { b =>
          val fill = b.v.orElse(last)
          if (b.v.isDefined) last = b.v
          if (!b.emitted || b.lastFill != fill)
            out += FillOut(key, b.eventId, b.v.isEmpty, fill)
          b.copy(emitted = true, lastFill = fill)
        }
        // settle: rows the watermark has passed leave the buffer, their
        // observations fold into the carried value (in event-time order)
        val wmMicros = state.getCurrentWatermarkMs() * 1000L
        val (settled, live) = recomputed.partition(_.tsMicros <= wmMicros)
        var carried = s0.carried
        settled.foreach(b => b.v.foreach(x => carried = Some(x)))
        state.update(FillUpdState(carried, live))
        // re-arm an event-time timer while rows await settlement, so
        // eviction doesn't depend on the key receiving more data
        if (live.nonEmpty)
          state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)
        out.result().iterator
    }

  /** Conversion window for [[funnel]] — 8 hours in micros, the SAME
    * window `ops.Relational7.q71Sql` hard-codes as `INTERVAL 8 HOUR`
    * (StreamingSpec asserts the parity, so the two cannot drift
    * silently). */
  val FunnelWindowMicros: Long = 8L * 3600 * 1000000

  /** Input row for [[funnel]]. */
  case class FunnelIn(userId: Long, tsMicros: Long, eventId: Long,
      eventType: String)

  /** Per-key funnel state: the accepted timestamp of each reached
    * stage — three Option[Long]s, O(1) regardless of stream length. */
  case class FunnelState(view: Option[Long], click: Option[Long],
      purchase: Option[Long])

  /** A stage ADVANCE: emitted exactly once per key per stage, the
    * moment the qualifying event arrives. */
  case class FunnelAdvance(userId: Long, stage: String, tsMicros: Long,
      eventId: Long)

  private implicit val funnelStateEnc
      : org.apache.spark.sql.Encoder[FunnelState] =
    Encoders.product[FunnelState]
  private implicit val funnelAdvanceEnc
      : org.apache.spark.sql.Encoder[FunnelAdvance] =
    Encoders.product[FunnelAdvance]

  /** Streaming ordered-funnel attribution — the streaming twin of the
    * batch q71 (`ops.Relational7.q71Funnel`): per user, the first
    * `view` opens the funnel, the first `click` strictly after it
    * within [[FunnelWindowMicros]] advances it, and the first
    * `purchase` strictly after that click within the window completes
    * it. Each advance emits immediately (append output) — the live
    * feed a conversion dashboard increments on — so a user's furthest
    * emitted stage at any moment IS their current funnel position, and
    * on an in-order source the final positions equal the batch
    * operator's stages exactly (StreamingSpec asserts both that and
    * the cross-batch carry: a click arriving batches after its view
    * still converts, because the accepted stage timestamps live in
    * per-key state).
    *
    * Within a micro-batch the group's rows are processed in event-time
    * order; across batches, arrival order — the standard append-stream
    * caveat (an out-of-order view arriving after a click was rejected
    * cannot resurrect that click). State never retracts: stages only
    * advance, exactly like the batch form's conditional minimums on an
    * in-order stream. A production deployment would add an event-time
    * TTL (the funnel is dead once the window can no longer be met);
    * kept timeout-free here so parity with the batch semantics is
    * exact. */
  def funnel(
      grouped: KeyValueGroupedDataset[Long, FunnelIn]): Dataset[FunnelAdvance] =
    grouped.flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (key: Long, rows: Iterator[FunnelIn], state: GroupState[FunnelState]) =>
        var s = state.getOption.getOrElse(FunnelState(None, None, None))
        val out = Seq.newBuilder[FunnelAdvance]
        rows.toSeq.sortBy(r => (r.tsMicros, r.eventId)).foreach { r =>
          r.eventType match {
            case "view" if s.view.isEmpty =>
              s = s.copy(view = Some(r.tsMicros))
              out += FunnelAdvance(key, "view", r.tsMicros, r.eventId)
            case "click" if s.click.isEmpty && s.view.exists(v =>
                r.tsMicros > v && r.tsMicros <= v + FunnelWindowMicros) =>
              s = s.copy(click = Some(r.tsMicros))
              out += FunnelAdvance(key, "click", r.tsMicros, r.eventId)
            case "purchase" if s.purchase.isEmpty && s.click.exists(c =>
                r.tsMicros > c && r.tsMicros <= c + FunnelWindowMicros) =>
              s = s.copy(purchase = Some(r.tsMicros))
              out += FunnelAdvance(key, "purchase", r.tsMicros, r.eventId)
            case _ => // repeat stage, out-of-window, or out-of-sequence
          }
        }
        state.update(s)
        out.result().iterator
    }

  /** Input for [[topKUpdate]]: one row per event, pre-bucketed to its
    * window start (micros). */
  case class TopKIn(windowMicros: Long, eventType: String)

  /** Per-window state: the full per-type counts (bounded by the event-
    * type VOCABULARY, not the stream) and the last emitted top-k so the
    * operator can diff instead of re-emitting. */
  case class TopKState(counts: Map[String, Long],
      last: Map[String, (Long, Long)])

  /** A ranking delta: `op = "upsert"` places/updates a type at (n, rk);
    * `op = "retract"` withdraws a type that fell out of the top-k. A
    * sink reconstructs the live leaderboard by applying deltas in
    * emission order. */
  case class TopKDelta(windowMicros: Long, eventType: String, n: Long,
      rk: Long, op: String)

  private implicit val topKStateEnc
      : org.apache.spark.sql.Encoder[TopKState] = Encoders.product[TopKState]
  private implicit val topKDeltaEnc
      : org.apache.spark.sql.Encoder[TopKDelta] = Encoders.product[TopKDelta]

  /** Streaming per-window top-k maintenance with RANK RETRACTION — the
    * stateful, update-mode twin of the batch st09
    * (`stream.EventWindows.st09TopEventsHourly`). The foreachBatch
    * form (StreamingSpec's "via foreachBatch" case) re-ranks the whole
    * aggregate every trigger under complete output — correct, but its
    * per-trigger cost is ALL windows ever seen. This operator keys
    * state by window, folds each micro-batch's events into per-type
    * counts, recomputes that window's top-k (n DESC, type ASC — st09's
    * exact tie-break), and emits ONLY the difference vs what it last
    * emitted: upserts for types whose (n, rk) changed, retracts for
    * types pushed out. Per-trigger output and work are proportional to
    * the windows that actually received events — the incremental-view-
    * maintenance contract, and the retraction is the piece append mode
    * cannot express (a type that WAS rank 2 and got overtaken must be
    * withdrawn from the live leaderboard, not left stale).
    *
    * Scale: state per window is the type→count map (bounded by the
    * event-type vocabulary; for an unbounded vocabulary the variant is
    * a count-min + k-sized heap, declined here — NOTES.md — because it
    * surrenders the exactness the oracle checks) plus the k-row last
    * emission. Windows partition across executors by key; an
    * event-time timer could evict closed windows (kept timeout-free
    * for batch parity, same call as [[funnel]]). */
  def topKUpdate(k: Int)(
      grouped: KeyValueGroupedDataset[Long, TopKIn]): Dataset[TopKDelta] =
    grouped.flatMapGroupsWithState(
      OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
      (window: Long, rows: Iterator[TopKIn], state: GroupState[TopKState]) =>
        val s0 = state.getOption.getOrElse(TopKState(Map.empty, Map.empty))
        var counts = s0.counts
        rows.foreach { r =>
          counts = counts.updated(r.eventType,
            counts.getOrElse(r.eventType, 0L) + 1L)
        }
        val top = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
          .zipWithIndex
          .map { case ((t, n), i) => t -> (n, (i + 1).toLong) }.toMap
        val out = Seq.newBuilder[TopKDelta]
        s0.last.keysIterator.filterNot(top.contains).foreach { t =>
          out += TopKDelta(window, t, 0L, 0L, "retract")
        }
        top.foreach { case (t, (n, rk)) =>
          if (!s0.last.get(t).contains((n, rk)))
            out += TopKDelta(window, t, n, rk, "upsert")
        }
        state.update(TopKState(counts, top))
        out.result().iterator
    }
}
