package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessorWithInitialState, TTLConfig, TimeMode, TimerValues, ValueState}

/** `transformWithState` with INITIAL STATE — the warehouse-bootstrap
  * path: a stream does not start from zero, it starts from the batch
  * snapshot the lake already holds (running totals, feature values),
  * and only the tail of the log is replayed through the stream. State
  * v2 makes the handoff first-class: the batch aggregate arrives as a
  * `KeyValueGroupedDataset[K, S]` and `handleInitialState` installs
  * each key's snapshot before the first micro-batch — no synthetic
  * "priming events", no state-file surgery.
  *
  * Fixture split: events with even event_id play the warehouse history
  * (aggregated in BATCH to per-user (n, Σvq) snapshots), odd event_id
  * play the live tail (streamed). The final per-user profile must
  * equal the batch aggregate over ALL events — the composition proof
  * that bootstrap + stream ≡ batch. Totals are decimal-quantized int64
  * (exact, order-free), so the oracle hash-compares.
  *
  * Scale: initial state is shuffled once by key into the state store
  * (RocksDB); per-key state stays two longs, O(keys) not O(events).
  */
object BootstrapProfileStream {

  import ProfileStream.{EvQ, Profile, ProfileOut}

  /** st10's running profile, bootstrapped from a batch snapshot. */
  class BootstrapProcessor
      extends StatefulProcessorWithInitialState[Long, EvQ, ProfileOut, Profile] {
    @transient private var profile: ValueState[Profile] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      profile = getHandle.getValueState[Profile](
        "profile", Encoders.product[Profile], TTLConfig.NONE)

    override def handleInitialState(key: Long, initialState: Profile,
        timerValues: TimerValues): Unit =
      profile.update(initialState)

    override def handleInputRows(key: Long, rows: Iterator[EvQ],
        timerValues: TimerValues): Iterator[ProfileOut] = {
      var st = if (profile.exists()) profile.get() else Profile(0L, 0L)
      rows.foreach { e => st = Profile(st.n + 1, st.vq_sum + e.vq) }
      profile.update(st)
      Iterator.single(ProfileOut(key, st.n, st.vq_sum))
    }
  }

  private def quantize(events: DataFrame): DataFrame =
    events.select(col("user_id"), col("event_id"),
      (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
        .cast("long").as("vq"))

  /** Bounded run: batch-aggregate the even half as the snapshot, stream
    * the odd half through the bootstrapped processor, reduce updates to
    * the final per-user profile (one emission per key per data batch;
    * n is strictly increasing, so max-struct picks the last). Users
    * with history but NO tail events never emit — union their
    * snapshots back so the result covers every user, exactly as the
    * batch oracle does. */
  def runFinalProfiles(spark: SparkSession, dir: String): DataFrame = {
    val scopedRun = EventStreams.runBounded(spark, "st19_bootstrap",
      s => {
        import s.implicits._
        val snapshot = quantize(
          graft.sources.Tables(s, dir, "events").filter(col("event_id") % 2 === 0))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("n"), sum(col("vq")).as("vq_sum"))
          .as[(Long, Long, Long)]
          .map { case (u, n, v) => (u, Profile(n, v)) }
          .groupByKey(_._1)
          .mapValues(_._2)
        quantize(EventStreams.readEventStream(s, dir)
            .filter(col("event_id") % 2 === 1))
          .as[EvQ]
          .groupByKey(_.user_id)
          .transformWithState(new BootstrapProcessor,
            TimeMode.None, OutputMode.Update, snapshot)
          .toDF()
      },
      outputMode = "update",
      extraConf = EventStreams.RocksDbConf)
    val streamed = scopedRun.groupBy(col("user_id"))
      .agg(max(struct(col("n_events"), col("value_q"))).as("p"))
      .select(col("user_id"), col("p.n_events").as("n_events"),
        col("p.value_q").as("value_q"))
    val historyOnly = quantize(
      graft.sources.Tables(spark, dir, "events").filter(col("event_id") % 2 === 0))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("vq")).as("value_q"))
      .join(streamed.select(col("user_id")), Seq("user_id"), "left_anti")
    streamed.unionByName(historyOnly)
  }
}
