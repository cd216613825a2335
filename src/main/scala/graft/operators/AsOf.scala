package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, attach the single
  * latest right row with the same key and `right.ts <= left.ts`.
  *
  * The reference has no joins at all (SURVEY.md §2.6); this is the
  * canonical "latest signal as of event time" operator every
  * training-data/feature pipeline needs (kdb+ `aj`, Flink temporal
  * join, DuckDB/Pandas ASOF JOIN), so it enters the catalog as a
  * first-class extension.
  *
  * Spark-first formulation: tag both sides, UNION them, and carry the
  * right-side payload forward with `last(_, ignoreNulls)` over a
  * per-key event-time window, then keep only left rows. That is ONE
  * shuffle on the join key and a linear pass per key — a naive
  * range-join formulation (`r.ts <= l.ts` + max-per-left) materializes
  * every earlier right row for every left row first, which is
  * quadratic per key and explodes at 100 TB. Equal timestamps order
  * right rows BEFORE left rows so `<=` semantics hold; `rightSeq`
  * makes the pick among equal right timestamps deterministic.
  */
object AsOf {

  /** @param rightVals right columns to attach (null where no right row
    *                  is at-or-before the left timestamp — left-join
    *                  semantics). Names must not collide with left.
    *
    * The right payload travels as ONE struct column so a single
    * `last(ignoreNulls)` picks one whole right row atomically — filling
    * each value column independently would mix fields from different
    * right rows whenever the latest matching row holds a NULL in one of
    * them, which is not ASOF semantics. */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
               leftTs: String, rightTs: String, rightSeq: String,
               rightVals: Seq[String]): DataFrame = {
    val leftPayload = left.columns.filterNot(_ == key).toSeq
    val payloadT = org.apache.spark.sql.types.StructType(
      rightVals.map(c => right.schema(c).copy(name = c)))
    val lSel: Seq[Column] =
      Seq(col(key), col(leftTs).as("_ts"), lit(1).as("_side"),
        lit(Long.MaxValue).as("_seq")) ++
        leftPayload.map(col) :+
        lit(null).cast(payloadT).as("_r")
    val rSel: Seq[Column] =
      Seq(col(key), col(rightTs).as("_ts"), lit(0).as("_side"),
        col(rightSeq).cast("long").as("_seq")) ++
        leftPayload.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightVals.map(col): _*).as("_r")
    val u = left.select(lSel: _*).unionByName(right.select(rSel: _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"), col("_seq"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = u.withColumn("_r", last(col("_r"), ignoreNulls = true).over(w))
    filled.filter(col("_side") === 1)
      .select(Seq(col(key)) ++ leftPayload.map(col) ++
        rightVals.map(c => col(s"_r.$c").as(c)): _*)
  }

  /** The same as-of semantics through the NATIVE whole-operator path
    * (`plans.AsOfJoinNode` → `AsOfJoinExec` sort-merge): one shuffle per
    * side on the key, single streaming pass, O(1) per-key state. Column
    * resolution is by name against each side's analyzed plan. */
  def asofJoinNative(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String, rightSeq: String,
                     rightVals: Seq[String]): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lp = left.queryExecution.analyzed
    val rp0 = right.queryExecution.analyzed
    // Fresh-alias barrier on the right: when both sides share lineage
    // (e.g. two filters of one scan) their attribute ids collide, and
    // re-analysis deduplicates the right subtree's ids UNDER this node —
    // attributes stored here would go stale. Aliases mint ids that are
    // unambiguous against the left and stable through that rewrite.
    val aliases = rp0.output.map(a => Alias(a, a.name)())
    val rp = Project(aliases, rp0)
    val rAttrs = aliases.map(_.toAttribute)
    def la(n: String) = lp.output.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no left column $n"))
    def ra(n: String) = rAttrs.find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"no right column $n"))
    // the exec's orderings are built from the LEFT types — a mismatch
    // would otherwise surface as a ClassCastException inside a task
    require(la(key).dataType == ra(key).dataType,
      s"as-of key type mismatch: ${la(key).dataType} vs ${ra(key).dataType}")
    require(la(leftTs).dataType == ra(rightTs).dataType,
      s"as-of ts type mismatch: ${la(leftTs).dataType} vs ${ra(rightTs).dataType}")
    org.apache.spark.sql.graftshim.ofRows(left.sparkSession,
      graft.plans.AsOfJoinNode(lp, rp, la(key), la(leftTs),
        ra(key), ra(rightTs), ra(rightSeq), rightVals.map(ra)))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // q34's exact semantics through the custom physical operator — same
    // DuckDB ASOF JOIN oracle pins both implementations
    "q48_asof_native" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("c_ts_us"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_us").as("v_ts_us"))
        .agg(max(col("event_id")).as("view_id"))
      asofJoinNative(clicks, views, "user_id", "c_ts_us", "v_ts_us",
        "view_id", Seq("view_id", "v_ts_us"))
        .select(col("user_id"), col("click_id"), col("view_id"),
          (col("c_ts_us") - col("v_ts_us")).as("lag_us"))
        .orderBy(col("click_id"))
    }),
    // each click joined to the same user's latest view at-or-before it;
    // views pre-deduped to one per (user, ts) so the pick is
    // deterministic on both engines
    "q34_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"), col("event_type"))
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts_us").as("c_ts_us"))
      val views = ev.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts_us").as("v_ts_us"))
        .agg(max(col("event_id")).as("view_id"))
      asofJoin(clicks, views, "user_id", "c_ts_us", "v_ts_us", "view_id",
        Seq("view_id", "v_ts_us"))
        .select(col("user_id"), col("click_id"), col("view_id"),
          (col("c_ts_us") - col("v_ts_us")).as("lag_us"))
        .orderBy(col("click_id"))
    })
  )

  private val AsOfOracle =
    """WITH ev AS (
         SELECT user_id, event_id, (epoch_ns(ts) // 1000) AS ts_us, event_type
         FROM events),
       clicks AS (
         SELECT user_id, event_id AS click_id, ts_us AS c_ts_us
         FROM ev WHERE event_type = 'click'),
       views AS (
         SELECT user_id, ts_us AS v_ts_us, max(event_id) AS view_id
         FROM ev WHERE event_type = 'view' GROUP BY user_id, ts_us)
       SELECT c.user_id, c.click_id, v.view_id,
         c.c_ts_us - v.v_ts_us AS lag_us
       FROM clicks c ASOF LEFT JOIN views v
         ON c.user_id = v.user_id AND v.v_ts_us <= c.c_ts_us
       ORDER BY click_id"""

  def oracleSql: Map[String, String] = Map(
    "q48_asof_native" -> AsOfOracle,
    "q34_asof_join" -> AsOfOracle
  )
}
