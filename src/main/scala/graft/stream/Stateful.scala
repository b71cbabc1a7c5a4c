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
}
