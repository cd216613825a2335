package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful processing via `flatMapGroupsWithState` — the escape
  * hatch for per-key logic no built-in window expresses (the Spark
  * analogue of a hand-written keyed operator). Demonstrated with gap
  * sessionization so the result is pinned by the same DuckDB oracle as
  * the declarative formulation (`Events.sessionize`).
  *
  * Scope: demonstrated in BATCH execution (one state invocation per
  * key). Running this body under a real stream would additionally need
  * `state.update` buffering plus an EventTimeTimeout flush — the
  * streaming sessionization contract is `EventStreams.sessionWindows`
  * (native session_window + watermark), which handles that state
  * machinery inside Spark.
  *
  * Scale: one shuffle by user_id; per-group memory is bounded by the
  * group's event count here (streaming bounds it via watermark +
  * timeout-based eviction instead).
  */
object StatefulSessions {

  case class Ev(user_id: Long, ts_us: Long, event_id: Long, value: Double)
  case class SessionOut(user_id: Long, session_seq: Long,
                        session_start_us: Long, session_end_us: Long,
                        n_events: Long, total_value: Double)

  /** Spark's double→DECIMAL(18,4) cast semantics (HALF_UP), so the
    * hand-rolled sum matches the `dsum` pattern bit-for-bit. */
  /** The session-semantics kernel shared by BOTH streaming sessionizers
    * (flatMapGroupsWithState st06, transformWithState st12): merge the
    * open run with new events, split into gap-delimited runs — all but
    * the last are data-closed, the last stays open in state. One copy
    * so a gap/rounding tweak can't silently diverge the two APIs. */
  private[graft] def splitRuns(open: List[Ev], incoming: Iterator[Ev],
      gapUs: Long): (List[List[Ev]], List[Ev]) = {
    val merged = (open ++ incoming).sortBy(e => (e.ts_us, e.event_id))
    var runs = List.empty[List[Ev]]
    merged.foreach { e =>
      if (runs.isEmpty || e.ts_us - runs.head.head.ts_us > gapUs) runs ::= List(e)
      else runs = (e :: runs.head) :: runs.tail
    }
    val ordered = runs.reverse.map(_.reverse)
    (ordered.dropRight(1), ordered.last)
  }

  /** One closed run → its emitted session row (shared kernel, as above). */
  private[graft] def toSession(uid: Long, seq: Long, run: List[Ev]): SessionOut = {
    val s = run.sortBy(e => (e.ts_us, e.event_id))
    SessionOut(uid, seq, s.head.ts_us, s.last.ts_us, s.size.toLong,
      s.map(e => dec4(e.value)).sum.toDouble)
  }

  private[graft] def dec4(d: Double): BigDecimal =
    BigDecimal(java.math.BigDecimal.valueOf(d).setScale(4, java.math.RoundingMode.HALF_UP))

  private def emitSessions(uid: Long, evs: Seq[Ev], gapUs: Long): Iterator[SessionOut] = {
    if (evs.isEmpty) Iterator.empty
    else {
      val sorted = evs.sortBy(e => (e.ts_us, e.event_id))
      val sessions = Seq.newBuilder[SessionOut]
      var seq = 0L
      var cur = List.empty[Ev]
      def flush(): Unit = if (cur.nonEmpty) {
        val s = cur.reverse
        sessions += SessionOut(uid, seq, s.head.ts_us, s.last.ts_us,
          s.size.toLong, s.map(e => dec4(e.value)).sum.toDouble)
      }
      sorted.foreach { e =>
        if (cur.isEmpty || e.ts_us - cur.head.ts_us <= gapUs) cur ::= e
        else { flush(); seq += 1; cur = List(e) }
      }
      flush()
      sessions.result().iterator
    }
  }

  /** Gap-based sessionization as a custom stateful operator. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value")).as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Ev], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[List[Ev]]) =>
          // batch execution: one invocation per key, state starts empty;
          // a streaming run would buffer in `state` and flush on timeout.
          val buffered = state.getOption.getOrElse(Nil)
          emitSessions(uid, buffered ++ it.toSeq, gapUs)
      }
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e05_custom_state_sessions" -> ((s, d) =>
      sessionize(t(s, d, "events")).toDF()
        .orderBy(col("user_id"), col("session_seq"))))

  private val tsUs = "(epoch_ns(ts) // 1000)"

  /** Same semantics as e03 (the declarative sessionize) — one oracle
    * pins both formulations. */
  def oracleSql: Map[String, String] = Map(
    "e05_custom_state_sessions" ->
      s"""WITH marked AS (
           SELECT user_id, event_id, value, $tsUs AS ts_us,
             CASE WHEN lag($tsUs, 1) OVER w IS NULL
               OR $tsUs - lag($tsUs, 1) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY $tsUs, event_id)),
         sessions AS (
           SELECT user_id, value, ts_us,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) - 1 AS session_seq
           FROM marked)
         SELECT user_id, session_seq,
           min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM sessions GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""")
}
