package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** `ListState` under `transformWithState` — the third typed state
  * variable (st10 ValueState, st15 MapState, st12 timers): a per-key
  * APPEND log the store keeps as one entry per element, the
  * recent-activity-buffer shape (last-k events feeding a realtime
  * feature vector). The buffer is bounded at k BY EVENT TIME with a
  * deterministic (ts, event_id) order, so the final state is a pure
  * function of the event set — micro-batch boundaries and arrival
  * order cannot change it, which is what makes a batch oracle
  * possible at all (an arrival-ordered "last k seen" is not
  * replayable).
  *
  * Emission: after each batch that touches a key, the CURRENT top-k as
  * one row (k pivoted columns — engines hash scalar columns, not
  * arrays) plus n_seen, the running event count; the final row per key
  * (max n_seen) must equal the batch top-k, the st16 oracle.
  */
object RecentEventsStream {

  case class EvR(user_id: Long, event_id: Long, ts_us: Long)
  case class RecentOut(user_id: Long, n_seen: Long,
                       e1: java.lang.Long, e2: java.lang.Long, e3: java.lang.Long)

  class RecentProcessor(k: Int = 3) extends StatefulProcessor[Long, EvR, RecentOut] {
    @transient private var buf: ListState[EvR] = _
    @transient private var seen: org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      buf = getHandle.getListState[EvR]("recent", Encoders.product[EvR], TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("n_seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[EvR],
        timerValues: TimerValues): Iterator[RecentOut] = {
      val incoming = rows.toSeq
      val merged = (buf.get().toSeq ++ incoming)
        .sortBy(e => (-e.ts_us, -e.event_id)).take(k)
      buf.clear()
      merged.foreach(buf.appendValue)
      val n = (if (seen.exists()) seen.get() else 0L) + incoming.size
      seen.update(n)
      def at(i: Int): java.lang.Long =
        if (i < merged.size) java.lang.Long.valueOf(merged(i).event_id) else null
      Iterator.single(RecentOut(key, n, at(0), at(1), at(2)))
    }
  }

  def recentStream(events: DataFrame): Dataset[RecentOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us")).as[EvR]
      .groupByKey(_.user_id)
      .transformWithState(new RecentProcessor(3), TimeMode.None, OutputMode.Update)
  }

  /** Bounded run; the final (max n_seen) emission per key. */
  def runFinalRecent(spark: SparkSession, dir: String): DataFrame = {
    val updates = EventStreams.runBounded(spark, "st16_recent",
      s => recentStream(EventStreams.readEventStream(s, dir)).toDF(),
      outputMode = "update",
      extraConf = EventStreams.RocksDbConf)
    updates.groupBy(col("user_id"))
      .agg(max(struct(col("n_seen"), col("e1"), col("e2"), col("e3"))).as("r"))
      .select(col("user_id"), col("r.n_seen"),
        col("r.e1"), col("r.e2"), col("r.e3"))
  }
}
