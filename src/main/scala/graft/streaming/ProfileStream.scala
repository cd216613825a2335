package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Arbitrary keyed state via Spark 4's `transformWithState` — the
  * successor API to `(flat)mapGroupsWithState` (SPARK-45939, "state v2"):
  * typed state variables (`ValueState`/`ListState`/`MapState`) fetched
  * from a handle instead of one opaque state object, per-variable TTL,
  * event-time timers, and a mandatory RocksDB state store (the provider
  * a 100 TB deployment runs anyway — state spills to disk instead of
  * capping at executor heap like the HDFS-backed store).
  *
  * The operator itself is the streaming feature-store pattern: a running
  * per-user profile (event count + decimal-quantized value total, int64
  * so every emission is exact) updated each micro-batch in update mode.
  * Per-key state is two longs — O(keys), not O(events), the bounded-state
  * shape an unbounded stream requires. The memory sink sees one profile
  * row per (key, batch-with-data); the FINAL profile per key — the
  * max-n row — must equal the batch groupBy, which is the oracle.
  */
object ProfileStream {

  case class EvQ(user_id: Long, event_id: Long, vq: Long)
  case class Profile(n: Long, vq_sum: Long)
  case class ProfileOut(user_id: Long, n_events: Long, value_q: Long)

  /** Running (count, Σ value·1e4) per user; emits the updated profile. */
  class ProfileProcessor extends StatefulProcessor[Long, EvQ, ProfileOut] {
    @transient private var profile: ValueState[Profile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[Profile](
        "profile", Encoders.product[Profile], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[EvQ],
        timerValues: TimerValues): Iterator[ProfileOut] = {
      var st = if (profile.exists()) profile.get() else Profile(0L, 0L)
      rows.foreach { e => st = Profile(st.n + 1, st.vq_sum + e.vq) }
      profile.update(st)
      Iterator.single(ProfileOut(key, st.n, st.vq_sum))
    }
  }

  def profileStream(events: DataFrame): Dataset[ProfileOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"),
        (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
          .cast("long").as("vq"))
      .as[EvQ]
      .groupByKey(_.user_id)
      .transformWithState(new ProfileProcessor, TimeMode.None, OutputMode.Update)
  }

  /** Bounded run; reduce the update stream to the final profile per key. */
  def runFinalProfiles(spark: SparkSession, dir: String): DataFrame = {
    val updates = EventStreams.runBounded(spark, "st10_profiles",
      s => profileStream(EventStreams.readEventStream(s, dir)).toDF(),
      outputMode = "update",
      extraConf = Map("spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"))
    updates.groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("value_q"))).as("p"))
      .select(col("user_id"), col("p.n_events"), col("p.value_q"))
  }
}
