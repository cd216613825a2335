package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{MapState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** `MapState` under `transformWithState` — the state-v2 primitive the
  * st10 (ValueState) and st12 (event-time timers) processors don't
  * exercise: a keyed SUB-map the store lays out as one RocksDB entry
  * per (key, map-key) pair, so updating one event-type's counter
  * rewrites ONE small entry, not a serialized blob of all of them —
  * the difference between O(1) and O(|map|) write amplification per
  * event once a user's sub-map is wide (the per-user feature-bundle
  * shape: one slot per feature, thousands of features at 100 TB).
  *
  * Emission contract: per (user, micro-batch-with-data), one row per
  * event type SEEN IN THAT BATCH carrying the running total (update
  * mode). The final row per (user, type) — max n — must equal the
  * batch groupBy(user, type).count(), which is the st15 oracle.
  */
object TypeCountStream {

  case class EvT(user_id: Long, event_type: String)
  case class TypeCountOut(user_id: Long, event_type: String, n_events: Long)

  class TypeCountProcessor extends StatefulProcessor[Long, EvT, TypeCountOut] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long](
        "type_counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvT],
        timerValues: TimerValues): Iterator[TypeCountOut] = {
      // fold the batch locally, then write each touched slot once —
      // EAGERLY (a lazy .map over the output iterator would only apply
      // state updates as the engine drains it; any partially-consumed
      // iterator downstream would silently lose counter writes)
      val touched = collection.mutable.Map.empty[String, Long]
      rows.foreach { e => touched(e.event_type) = touched.getOrElse(e.event_type, 0L) + 1L }
      val out = touched.toSeq.sortBy(_._1).map { case (tpe, add) =>
        val total = (if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L) + add
        counts.updateValue(tpe, total)
        TypeCountOut(key, tpe, total)
      }
      out.iterator
    }
  }

  def typeCountStream(events: DataFrame): Dataset[TypeCountOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(col("user_id"), col("event_type")).as[EvT]
      .groupByKey(_.user_id)
      .transformWithState(new TypeCountProcessor, TimeMode.None, OutputMode.Update)
  }

  /** Bounded run; reduce the update stream to the final count per
    * (user, type) — the batch-equivalence surface the oracle checks. */
  def runFinalCounts(spark: SparkSession, dir: String): DataFrame = {
    val updates = EventStreams.runBounded(spark, "st15_type_counts",
      s => typeCountStream(EventStreams.readEventStream(s, dir)).toDF(),
      outputMode = "update",
      extraConf = EventStreams.RocksDbConf)
    updates.groupBy(col("user_id"), col("event_type"))
      .agg(max(col("n_events")).as("n_events"))
  }
}
