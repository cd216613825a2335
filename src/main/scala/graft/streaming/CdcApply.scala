package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CDC apply — the "apply changes into a keyed table" loop
  * every lakehouse runs (Delta's `MERGE INTO` under a stream, Iceberg
  * upsert sinks), expressed with public Spark only: `foreachBatch`
  * reduces each micro-batch to one row per key, full-outer-merges it
  * with the current state table, and atomically replaces the state.
  *
  * The merge rule is LAST-WRITER-WINS BY EVENT TIME — `max(struct(
  * ts_us, event_id, payload))`, not "update wins": batch arrival order
  * carries no event-time guarantee (file sources list nondeterministic-
  * ally, backfills interleave), and a max-struct register is associative
  * + commutative, so the final table equals the batch answer under ANY
  * batch partitioning of the input — that invariance is exactly what
  * the oracle pins.
  *
  * Scale notes: per batch this shuffles only the BATCH on the key (the
  * map-side-combinable max-struct), then one outer join against the
  * state; at 100 TB the state table is bucketed by key so the join is
  * shuffle-free on the state side, and the rewrite is a transactional
  * table-format commit (Delta/Iceberg) rather than a parquet dir swap —
  * `localCheckpoint` here stands in for the read-before-overwrite
  * isolation a real table format provides.
  */
object CdcApply {

  /** One merged profile row per key: the event-time-latest
    * (event_type, value_q) per user_id. */
  private def lastPerKey(batch: DataFrame): DataFrame =
    batch
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("ts_us"), col("event_id"),
          col("event_type"),
          (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
            .cast("long").as("value_q")).as("s"))
      .groupBy(col("user_id"))
      .agg(max(col("s")).as("s"))

  /** Merge one (micro-)batch of raw events into the keyed state table.
    * Associative + commutative in the batch partitioning — see above. */
  def applyBatch(batch: DataFrame, stateDir: String): Unit = {
    val updates = lastPerKey(batch)
    val cur =
      if (java.nio.file.Files.exists(java.nio.file.Paths.get(stateDir)))
        // materialize BEFORE overwriting the files it was read from
        graft.operators.eagerCut(
          batch.sparkSession.read.parquet(stateDir))
      else updates.limit(0)
    val merged = cur.select(col("user_id"), col("s").as("cur_s"))
      .join(updates.select(col("user_id"), col("s").as("new_s")), Seq("user_id"), "full_outer")
      .select(col("user_id"),
        greatest(col("cur_s"), col("new_s")).as("s"))
    merged.write.mode("overwrite").parquet(stateDir)
  }

  /** Read the state table back in flat row form. */
  def readState(spark: SparkSession, stateDir: String): DataFrame =
    spark.read.parquet(stateDir)
      .select(col("user_id"), col("s.ts_us").as("ts_us"), col("s.event_id").as("event_id"),
        col("s.event_type").as("event_type"), col("s.value_q").as("value_q"))

  def runCdcApply(spark: SparkSession, dir: String, stateDir: String): DataFrame = {
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cdc_ckpt")
    try {
      val q = EventStreams.readEventStream(scoped, dir).writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         batchId: Long) =>
          applyBatch(batch.toDF(), stateDir)
        }
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
    readState(scoped, stateDir)
  }
}
