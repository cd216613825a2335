package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** The streaming twin `Events.ewmaPerUser`'s scaladoc promises: a
  * NON-ASSOCIATIVE sequential fold (EWMA) under a real stream. A fold
  * needs its inputs in event-time order, but micro-batches deliver
  * arrival order — so the operator buffers events in state and folds
  * ONLY the prefix the watermark has sealed (`ts_ms < watermark_ms`):
  * nothing below the fold frontier can still arrive, so the fold order
  * is the true event-time order by construction. Per-key state =
  * unsealed buffer + two longs (n, s) — the buffer is bounded by the
  * watermark delay × event rate, NOT the stream length.
  *
  * Emission: update mode; each invocation re-emits the key's running
  * (n_done, ewma_q). An event-time timeout re-arms to just past the
  * earliest unsealed event so the trailing watermark-only batches keep
  * draining the buffer; on a bounded replay events inside the final
  * horizon stay (correctly) unfolded — the oracle folds exactly the
  * sealed prefix.
  */
object OrderedFoldStream {

  case class EvF(user_id: Long, ts_us: Long, event_id: Long, vq: Long,
                 ts: java.sql.Timestamp)
  case class FoldState(buf: List[(Long, Long, Long)], n: Long, s: Long) // (ts_us, event_id, vq)
  case class FoldOut(user_id: Long, n_done: Long, ewma_q: Long)

  def ewmaStream(events: DataFrame, watermark: String = "10 minutes"): Dataset[FoldOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .withWatermark("ts", watermark)
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
          .cast("long").as("vq"), col("ts"))
      .as[EvF]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FoldState, FoldOut](
        OutputMode.Update, GroupStateTimeout.EventTimeTimeout) {
        (uid: Long, rows: Iterator[EvF], state: GroupState[FoldState]) =>
          val prev = state.getOption.getOrElse(FoldState(Nil, 0L, 0L))
          val buf = (prev.buf ++ rows.map(e => (e.ts_us, e.event_id, e.vq))).sorted
          val wmMs = state.getCurrentWatermarkMs()
          val (done, open) = buf.span(_._1 / 1000 < wmMs)
          var n = prev.n; var s = prev.s
          done.foreach { case (_, _, vq) =>
            // Scala `/`, Spark `div` and DuckDB `//` ALL truncate toward
            // zero on int64 (checked: -7/2 == -3 in each engine), so this
            // recurrence is defined identically across the stream, the
            // batch twin and the oracle on the full domain — negative
            // values included, not just the vq >= 0 the data exhibits.
            s = if (n == 0) vq else (85 * s + 15 * vq) / 100
            n += 1
          }
          // keep (n, s) even when the buffer drains — a key that revives
          // later continues its fold instead of restarting at the seed
          state.update(FoldState(open, n, s))
          if (open.nonEmpty)
            // fire once the watermark passes the earliest unsealed event
            state.setTimeoutTimestamp(open.head._1 / 1000 + 1)
          if (n > 0) Iterator.single(FoldOut(uid, n, s)) else Iterator.empty
      }
  }
}
