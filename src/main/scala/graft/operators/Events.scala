package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Event/time-series operators in their batch form: tumbling / sliding
  * windows, gap-based sessionization, keyed dedup. The Structured
  * Streaming equivalents (watermarks, `session_window`, `dropDuplicates`
  * state) live in `graft.streaming.EventStreams`; these batch forms are
  * the DuckDB-oracle-checkable semantics they must agree with.
  *
  * Window starts are emitted as exact epoch microseconds (bigint) —
  * timestamps round-trip differently across engines, integers don't.
  */
object Events {

  /** Tumbling-window aggregate (Spark `window()`, epoch-aligned). */
  def tumbling(events: DataFrame, width: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Sliding-window aggregate (each event lands in width/slide windows). */
  def sliding(events: DataFrame, width: String = "10 minutes", slide: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col("ts"), width, slide).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
      .select(unix_micros(col("w.start")).as("w_start_us"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Gap-based sessionization (new session when idle > gap): the classic
    * lag + running-sum-of-boundaries formulation — one shuffle by user. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gapUs = gapMinutes * 60L * 1000000L
    events
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("ts_us"), 1).over(byUser))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("ts_us") - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_seq", sum(col("is_new")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        count(lit(1)).as("n_events"),
        dsum(col("value")).as("total_value"))
  }

  /** Keyed dedup: first event per (user_id, event_type) by time. */
  def firstPerKey(events: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
  }

  /** Fixed-point EWMA (α = 0.15) per user over the time-ordered event
    * series — the sequential-fold operator. A linear recurrence
    * `s' = (85·s + 15·x) div 100` can't be a window function (it isn't
    * associative), but BOTH engines express a left fold: Spark's
    * `aggregate` higher-order function over a sort_array'd struct list,
    * DuckDB's `list_reduce` over `list(... ORDER BY ...)`. Values are
    * decimal-quantized to int64 (×1e4) first so the fold is pure integer
    * arithmetic — bit-identical everywhere (Spark `div` = DuckDB `//`
    * on the non-negative domain; `value` ≥ 0 by schema contract).
    *
    * Scale: one shuffle on user_id; the per-key series materializes in
    * memory, which is the fold's inherent requirement — bounded here by
    * events-per-user, not corpus size. For unbounded keys the streaming
    * twin is `streaming.OrderedFoldStream` (st13): buffer-until-sealed
    * state folds the watermark-sealed prefix in true event-time order;
    * this batch shape is its oracle's core. */
  def ewmaPerUser(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"),
      unix_micros(col("ts")).as("ts_us"), col("event_id"),
      (col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)) * 10000)
        .cast("long").as("vq"))
    ev.groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("ts_us"), col("event_id"), col("vq")))).as("seq"))
      .select(col("user_id"),
        size(col("seq")).cast("long").as("n_events"),
        expr("element_at(seq, 1).vq").as("first_q"),
        expr("""aggregate(slice(seq, 2, size(seq) - 1), element_at(seq, 1).vq,
                          (s, x) -> (85 * s + 15 * x.vq) div 100)""").as("ewma_q"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "e06_ewma" -> ((s, d) => ewmaPerUser(t(s, d, "events")).orderBy(col("user_id"))),
    "e01_tumbling_window" -> ((s, d) =>
      tumbling(t(s, d, "events")).orderBy(col("w_start_us"), col("event_type"))),
    "e02_sliding_window" -> ((s, d) =>
      sliding(t(s, d, "events")).orderBy(col("w_start_us"), col("event_type"))),
    "e03_sessionize" -> ((s, d) =>
      sessionize(t(s, d, "events")).orderBy(col("user_id"), col("session_seq"))),
    "e04_first_per_key" -> ((s, d) =>
      firstPerKey(t(s, d, "events")).orderBy(col("user_id"), col("event_type")))
  )

  // DuckDB mirrors: ts is TIMESTAMP_NS there; truncate to micros first so
  // both engines window/compare identical integer microsecond values.
  private val tsUs = "(epoch_ns(ts) // 1000)"

  def oracleSql: Map[String, String] = Map(
    "e06_ewma" ->
      s"""WITH ev AS (
           SELECT user_id, $tsUs AS ts_us, event_id,
                  CAST(CAST(value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS vq
           FROM events),
         agg AS (
           SELECT user_id, list(vq ORDER BY ts_us, event_id) AS seq
           FROM ev GROUP BY user_id)
         SELECT user_id, CAST(len(seq) AS BIGINT) AS n_events,
                seq[1] AS first_q,
                list_reduce(seq, (s, x) -> (85 * s + 15 * x) // 100) AS ewma_q
         FROM agg""",
    "e01_tumbling_window" ->
      s"""SELECT epoch_us(time_bucket(INTERVAL 5 MINUTE, make_timestamp($tsUs))) AS w_start_us,
         event_type, count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM events GROUP BY w_start_us, event_type
         ORDER BY w_start_us, event_type""",
    "e02_sliding_window" ->
      s"""WITH assigned AS (
           SELECT epoch_us(time_bucket(INTERVAL 5 MINUTE, make_timestamp($tsUs)))
             + offs AS w_start_us, event_type, value
           FROM events, (SELECT unnest([CAST(0 AS BIGINT), CAST(-300000000 AS BIGINT)]) AS offs))
         SELECT w_start_us, event_type, count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM assigned GROUP BY w_start_us, event_type
         ORDER BY w_start_us, event_type""",
    "e03_sessionize" ->
      s"""WITH marked AS (
           SELECT user_id, event_id, value, $tsUs AS ts_us,
             CASE WHEN lag($tsUs, 1) OVER w IS NULL
               OR $tsUs - lag($tsUs, 1) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY $tsUs, event_id)),
         sessions AS (
           SELECT user_id, value, ts_us,
             CAST(sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
           FROM marked)
         SELECT user_id, session_seq,
           min(ts_us) AS session_start_us, max(ts_us) AS session_end_us,
           count(*) AS n_events,
           CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM sessions GROUP BY user_id, session_seq
         ORDER BY user_id, session_seq""",
    "e04_first_per_key" ->
      s"""SELECT user_id, event_type, event_id, ts_us FROM (
           SELECT user_id, event_type, event_id, $tsUs AS ts_us,
             row_number() OVER (PARTITION BY user_id, event_type
               ORDER BY $tsUs, event_id) AS rn
           FROM events) WHERE rn = 1
         ORDER BY user_id, event_type"""
  )
}
