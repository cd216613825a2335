package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}
import graft.operators.StatefulSessions.{Ev, SessionOut}

/** The st06 gap-sessionizer re-expressed on Spark 4's state-v2 API
  * (`transformWithState` + EVENT-TIME TIMERS) — same emission contract,
  * new machinery: `flatMapGroupsWithState`'s single timeout-per-key
  * becomes explicit `registerTimer` calls, and the "has my timeout
  * fired spuriously?" problem moves from the framework to the processor
  * (v2 keeps EVERY registered timer until deleted, so a session that
  * extends after a timer was set must either delete the stale timer or
  * recognize and ignore its firing — we store the live deadline in
  * state and drop non-matching fires, the idempotent-receiver pattern).
  *
  * Emission contract (append mode), identical to st06:
  *  - data-closed sessions emit as soon as a later event proves the gap;
  *  - the trailing open session flushes when the watermark passes
  *    `end + gap` (timer fire); younger sessions are held back.
  *
  * Scale: per-key state = one open session + one live deadline; timers
  * live in the RocksDB store alongside values — still O(active keys). */
object TimerSessionStream {

  case class EvW2(user_id: Long, ts_us: Long, event_id: Long, value: Double,
                  ts: java.sql.Timestamp)
  /** seq = next session ordinal; open = current run; deadlineMs = the
    * one live timer (stale fires compare unequal and are ignored). */
  case class TState(seq: Long, open: List[Ev], deadlineMs: Long)

  import graft.operators.StatefulSessions.{splitRuns, toSession}

  class SessionProcessor(gapUs: Long) extends StatefulProcessor[Long, EvW2, SessionOut] {
    @transient private var st: ValueState[TState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[TState]("sess", Encoders.product[TState], TTLConfig.NONE)

    override def handleInputRows(uid: Long, rows: Iterator[EvW2],
        tv: TimerValues): Iterator[SessionOut] = {
      val prev = if (st.exists()) st.get() else TState(0L, Nil, -1L)
      // shared kernel with st06's processor — one definition of the gap
      val (closed, open) = splitRuns(prev.open,
        rows.map(e => Ev(e.user_id, e.ts_us, e.event_id, e.value)), gapUs)
      // re-arm: delete nothing — store the live deadline and let stale
      // timers no-op in handleExpiredTimer
      val deadlineMs = (open.last.ts_us + gapUs + 999) / 1000
      getHandle.registerTimer(deadlineMs)
      st.update(TState(prev.seq + closed.size, open, deadlineMs))
      closed.zipWithIndex.map { case (run, i) => toSession(uid, prev.seq + i, run) }.iterator
    }

    override def handleExpiredTimer(uid: Long, tv: TimerValues,
        info: ExpiredTimerInfo): Iterator[SessionOut] = {
      if (!st.exists()) return Iterator.empty
      val cur = st.get()
      // stale timer from an extended session: the live deadline moved on
      if (cur.deadlineMs != info.getExpiryTimeInMs || cur.open.isEmpty) Iterator.empty
      else {
        val out = toSession(uid, cur.seq, cur.open)
        // keep the ordinal so a key that revives later continues its
        // session numbering (st06's remove() restarts at 0 — a bounded-
        // replay-only equivalence); production would add a TTL for
        // permanently-idle keys
        st.update(TState(cur.seq + 1, Nil, -1L))
        Iterator.single(out)
      }
    }
  }

  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       watermark: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"), col("ts"))
      .as[EvW2]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapUs), TimeMode.EventTime, OutputMode.Append)
  }
}
