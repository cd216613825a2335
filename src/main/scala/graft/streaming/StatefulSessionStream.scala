package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.operators.StatefulSessions.{Ev, SessionOut}

/** Custom keyed state under a REAL stream: gap sessionization with
  * `flatMapGroupsWithState` + event-time timeout — the streaming twin of
  * the batch operator in `graft.operators.StatefulSessions`.
  *
  * Emission contract (append mode):
  *  - a session closes and emits as soon as a LATER event of the same
  *    user proves the gap (data-closed — no watermark wait);
  *  - the user's trailing open session stays buffered until the
  *    watermark passes `session_end + gap`, then the state times out and
  *    flushes it. On a bounded replay the final watermark rests at
  *    `max(ts) - watermark_delay`, so trailing sessions younger than
  *    `gap + delay` are (correctly) HELD BACK — the oracle encodes
  *    exactly that holdback.
  *
  * Scale: one shuffle by user_id into the state store; per-key state is
  * one open session (not the event history), evicted by timeout — the
  * bounded-state shape an unbounded 100 TB stream requires.
  */
object StatefulSessionStream {

  /** seq = next session ordinal for the user; open = current open run. */
  case class SessState(seq: Long, open: List[Ev])

  /** Ev plus the raw event-time column — the watermark attribute must
    * reach the stateful operator for EventTimeTimeout to be legal. */
  case class EvW(user_id: Long, ts_us: Long, event_id: Long, value: Double,
                 ts: java.sql.Timestamp)

  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
                       watermark: String = "10 minutes"): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    import graft.operators.StatefulSessions.{splitRuns, toSession}

    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"), col("ts"))
      .as[EvW]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessState, SessionOut](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, itW: Iterator[EvW], state: GroupState[SessState]) =>
          val it = itW.map(e => Ev(e.user_id, e.ts_us, e.event_id, e.value))
          if (state.hasTimedOut) {
            // watermark passed open-session end + gap: flush and evict
            val st = state.get
            state.remove()
            if (st.open.isEmpty) Iterator.empty
            else Iterator.single(toSession(uid, st.seq, st.open))
          } else {
            val st = state.getOption.getOrElse(SessState(0L, Nil))
            // split into gap-delimited runs (shared kernel); all but the
            // last are data-closed and emit now, the last stays open
            val (closed, open) = splitRuns(st.open, it, gapUs)
            val out = closed.zipWithIndex.map { case (run, i) =>
              toSession(uid, st.seq + i, run)
            }
            state.update(SessState(st.seq + closed.size, open))
            // timeout once the watermark passes open-end + gap (ceil to
            // ms — the state store tracks watermarks in milliseconds)
            state.setTimeoutTimestamp((open.last.ts_us + gapUs + 999) / 1000)
            out.iterator
          }
      }
  }
}
