package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator catalog: scans, filters/projections, joins
  * (broadcast / shuffle / semi / anti / range), hash & sort aggregations,
  * rollup/cube, window functions, sort/limit/top-k, set operations,
  * string/date/json scalar functions, scalar subqueries.
  *
  * The reference (`OMTZHModifier.java`) hand-fuses scan→filter→project
  * (`OMT:134-146`) and executes its one semantic join as point UPDATEs
  * (`OMT:156-178`); here each capability is a declarative Spark plan so
  * Catalyst performs pushdown/pruning/join-selection (SURVEY.md §4).
  *
  * Scale notes (100 TB): every query below is a single declarative plan —
  * filters reach the parquet scan, small dimensions are broadcast
  * (`broadcast()` hints on region/nation/customer-sized tables), large
  * fact-fact joins shuffle on their equi-keys where AQE can re-plan skew,
  * and window top-k uses rank-filter (no global sort of the fact table).
  */
object Relational {

  /** Exact decimal running/window sum of a double column as double. */
  private def wsum(c: org.apache.spark.sql.Column, w: org.apache.spark.sql.expressions.WindowSpec) =
    sum(c.cast(DecimalType(18, 4))).over(w).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- scan + aggregate (TPC-H Q1 style; hash agg, map-side partials)
    "q01_pricing_summary" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }),

    // ---- filter + project, predicates pushed to parquet scan
    "q02_filter_project" -> ((s, d) => {
      t(s, d, "lineitem")
        .filter(col("l_quantity") > 30 && col("l_discount") <= 0.05)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount"))).as("net_price"),
          col("l_shipdate").cast("date").as("ship_date"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
    }),

    // ---- broadcast join chain (dims broadcast, no shuffle of fact)
    "q03_join_broadcast" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders"); val n = t(s, d, "nation")
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("o_totalprice")).as("total_revenue"), count(lit(1)).as("n_orders"))
        .orderBy(col("n_name"))
    }),

    // ---- large fact-fact shuffle join (sort-merge/shuffled-hash + AQE)
    "q04_join_shuffle" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(dsum(col("l_extendedprice")).as("sum_price"), count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- left semi join (EXISTS)
    "q05_semi_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    }),

    // ---- left anti join (NOT EXISTS)
    "q06_anti_join" -> ((s, d) => {
      val c = t(s, d, "customer"); val o = t(s, d, "orders")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
        .orderBy(col("c_custkey"))
    }),

    // ---- window top-k per group (rank-filter; no global sort)
    "q07_topk_per_group" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("rk", row_number().over(w).cast("long"))
        .filter(col("rk") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rk"))
        .orderBy(col("o_custkey"), col("rk"))
    }),

    // ---- running window aggregate (exact decimal prefix sums)
    "q08_window_running" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, d, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          wsum(col("o_totalprice"), w).as("running_spend"))
        .orderBy(col("o_custkey"), col("o_orderkey"))
    }),

    // ---- global sort + limit (TakeOrderedAndProject, no full sort)
    "q09_sort_limit" -> ((s, d) => {
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    }),

    // ---- distinct (shuffle dedup)
    "q10_distinct" -> ((s, d) => {
      t(s, d, "customer").select(col("c_mktsegment")).distinct()
        .orderBy(col("c_mktsegment"))
    }),

    // ---- set operations: intersect / except / union all
    "q11_setops" -> ((s, d) => {
      val c = t(s, d, "customer")
      val rich = c.filter(col("c_acctbal") > 5000).select(col("c_custkey"))
      val even = c.filter(col("c_custkey") % 2 === 0).select(col("c_custkey"))
      rich.intersect(even).withColumn("op", lit("both"))
        .unionAll(rich.except(even).withColumn("op", lit("only_rich")))
        .orderBy(col("op"), col("c_custkey"))
    }),

    // ---- rollup (hierarchical subtotals)
    //      Rollup over map-side-combined partials, not the fact table:
    //      Expand replicates every input row per grouping set, so a
    //      direct rollup ships 3× the facts into the shuffle. Aggregating
    //      on the FULL key first (count + exact decimal sum — both
    //      reaggregable) bounds the Expand input by the key cardinality,
    //      turning the grouping-set cost O(sets × facts) into
    //      O(facts + sets × |keys|) — the difference between a 3× and a
    //      1× fact shuffle at 100 TB. Decimal partials re-sum exactly,
    //      so the result is bit-identical to the direct rollup.
    "q12_rollup" -> ((s, d) => {
      val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
      val partial = c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(count(lit(1)).as("pn"),
          sum(col("c_acctbal").cast("decimal(18,4)")).as("pbal"))
      partial.rollup(col("r_name"), col("n_name"))
        .agg(sum(col("pn")).as("n_customers"),
          sum(col("pbal")).cast("double").as("total_balance"))
        .select(
          coalesce(col("r_name"), lit("ALL")).as("region"),
          coalesce(col("n_name"), lit("ALL")).as("nation"),
          col("n_customers"), col("total_balance"))
        .orderBy(col("region"), col("nation"))
    }),

    // ---- cube (all grouping-set combinations)
    //      Same partial-aggregate shape as q12: the direct cube Expands
    //      every order 4× before the shuffle; cubing the ≤|status×prio|
    //      partial table instead costs one plain fact aggregation plus
    //      an Expand over a handful of rows.
    "q13_cube" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("pn"),
          sum(col("o_totalprice").cast("decimal(18,4)")).as("prev"))
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(sum(col("pn")).as("n"), sum(col("prev")).cast("double").as("revenue"))
        .select(
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n"), col("revenue"))
        .orderBy(col("status"), col("priority"))
    }),

    // ---- string scalar functions (codegen'd built-ins)
    "q14_string_funcs" -> ((s, d) => {
      t(s, d, "part")
        .filter(col("p_name").like("%a%"))
        .select(
          col("p_partkey"),
          upper(col("p_brand")).as("brand_u"),
          substring(col("p_name"), 1, 8).as("name_pfx"),
          length(col("p_name")).cast("long").as("name_len"),
          regexp_replace(col("p_type"), "[aeiou]", "").as("type_novowel"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"))
        .orderBy(col("p_partkey"))
    }),

    // ---- date/time functions + grouping
    "q15_date_funcs" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(
          year(col("o_orderdate")).cast("long").as("yr"),
          month(col("o_orderdate")).cast("long").as("mo"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
        .orderBy(col("yr"), col("mo"))
    }),

    // ---- conditional aggregation (CASE WHEN inside agg)
    "q16_case_agg" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          dsum(when(col("o_orderpriority") === "1-URGENT", col("o_totalprice")).otherwise(0.0)).as("urgent_revenue"),
          count(when(col("o_orderpriority") === "1-URGENT", lit(1))).as("urgent_orders"),
          count(lit(1)).as("all_orders"))
        .orderBy(col("o_orderstatus"))
    }),

    // ---- JSON extraction (events.props is a JSON string)
    "q17_json_extract" -> ((s, d) => {
      t(s, d, "events")
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          get_json_object(col("props"), "$.k").cast("long").as("k_num"))
        .filter(col("k_num") > 50)
        .orderBy(col("event_id"))
    }),

    // ---- group-by + HAVING
    "q18_having" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_partkey"))
        .agg(dsum(col("l_quantity")).as("total_qty"), count(lit(1)).as("n_lines"))
        .filter(col("total_qty") > 100)
        .orderBy(col("l_partkey"))
    }),

    // ---- scalar subquery (orders above the global average price)
    "q19_above_avg" -> ((s, d) => {
      val o = t(s, d, "orders")
      val avgP = o.agg(davg(col("o_totalprice")).as("avg_price"))
      o.join(broadcast(avgP), o("o_totalprice") > avgP("avg_price"))
        .select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
    }),

    // ---- range (non-equi band) join against a broadcast dimension
    "q20_range_join" -> ((s, d) => {
      import s.implicits._
      val tiers = Seq(
        ("low", -1.0e9, 50.0), ("mid", 50.0, 120.0), ("high", 120.0, 1.0e9)
      ).toDF("tier", "lo", "hi")
      t(s, d, "events")
        .join(broadcast(tiers), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("total_value"))
        .orderBy(col("tier"))
    }),

    // ---- approximate distinct (HLL sketch; no exact oracle by design)
    "q21_approx_distinct" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_orderkey")).as("exact_orders"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- ERROR-BOUND PIN for q21's HLL sketch: per group,
    //      |approx − exact| must stay within 5× the configured rsd
    //      (2%) — emitted rows are violations, oracle = the empty set
    //      (the d11 pin pattern). HLL++ is deterministic for a fixed
    //      input, so the pin is a hard check, not a flaky one; 5σ makes
    //      it robust to the estimator's per-dataset bias.
    //      One pass over the fact table: mixing countDistinct with a
    //      non-distinct aggregate triggers Catalyst's distinct-rewrite
    //      (Expand doubles the aggregation input, two agg passes). A
    //      pre-dedup on (flag, partkey) — one map-side-combined shuffle
    //      — makes both finals plain aggregates over the distinct set:
    //      exact_n = count(*), and HLL insertion is idempotent, so
    //      approx over deduped values is BIT-IDENTICAL to approx over
    //      the raw column. Halves the fact-table aggregation work.
    "q60_approx_distinct_pin" -> ((s, d) => {
      t(s, d, "lineitem")
        // NULL partkeys out first: countDistinct (the pre-r8 form) and
        // approx_count_distinct both ignore NULLs, but count(*) over the
        // deduped set would tally a NULL group — a spurious +1 on
        // exact_n on any dataset with NULL keys
        .filter(col("l_partkey").isNotNull)
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey"), 0.02).as("approx_n"),
          count(lit(1)).as("exact_n"))
        .filter(abs(col("approx_n") - col("exact_n")) >
          lit(5 * 0.02) * col("exact_n"))
        .select(col("l_returnflag"), col("approx_n"), col("exact_n"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- multi-way join: revenue per region (5-table chain)
    "q22_multi_join" -> ((s, d) => {
      val li = t(s, d, "lineitem"); val o = t(s, d, "orders")
      val c = t(s, d, "customer"); val n = t(s, d, "nation"); val r = t(s, d, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"))
    }),

    // ---- window lag/lead (event deltas per user)
    "q23_window_lag" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          lag(col("event_id"), 1).over(w).as("prev_event_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"))
        .orderBy(col("user_id"), col("event_id"))
    }),

    // ---- pivot (wide aggregation; explicit value list keeps one pass)
    "q24_pivot" -> ((s, d) => {
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .select(col("o_orderpriority"), col("F").as("f_total"),
          col("O").as("o_total"), col("P").as("p_total"))
        .orderBy(col("o_orderpriority"))
    }),

    // ---- array functions over a grouped collect (sorted => deterministic)
    "q25_array_funcs" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sort_array(collect_list(col("l_quantity"))).as("qs"))
        .select(
          col("l_orderkey"),
          size(col("qs")).cast("long").as("n_items"),
          element_at(col("qs"), 1).as("min_q"),
          element_at(col("qs"), -1).as("max_q"),
          array_contains(col("qs"), 50.0).as("has_fifty"))
        .orderBy(col("l_orderkey"))
    }),

    // ---- deterministic hash sampling (the 100 TB sampling pattern:
    //      content-hash mod, not rand() — reproducible on any engine/run)
    "q26_hash_sample" -> ((s, d) => {
      val key = concat(col("l_orderkey").cast("string"), lit("-"),
        col("l_linenumber").cast("string"))
      t(s, d, "lineitem")
        .filter(substring(md5(key.cast("binary")), 1, 2) < "1a") // ≈10.2%
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_extendedprice")).as("sum_price"))
    }),

    // ---- GROUPING SETS via the SQL entry point (same text runs in DuckDB)
    "q27_grouping_sets" -> ((s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(GroupingSetsSql)
    }),

    // ---- Spark 4 VARIANT: parse once into the binary-encoded Variant
    //      (shredded typed access; the 4.x replacement for per-path
    //      get_json_object re-parsing), typed-extract and aggregate.
    //      Unlike q17/q33 (string re-parse / rigid struct schema) the
    //      Variant keeps open schema AND typed access — the semi-
    //      structured path a 100 TB event lake actually takes.
    "q57_variant_extract" -> ((s, d) =>
      t(s, d, "events")
        .select(col("event_type"),
          expr("variant_get(parse_json(props), '$.k', 'bigint')").as("k"))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
        .orderBy(col("event_type"))),

    // ---- WITH RECURSIVE (Spark 4 UnionLoop; the oracle still runs the
    //      full self-contained RecursiveBfsSql text in DuckDB).
    //      r22 (guide §2.4/§3.3, VERDICT item 5): Spark's UnionLoop
    //      re-evaluates referenced CTEs on every iteration, so the
    //      `und` edge relation — a DISTINCT over ALL of lineitem,
    //      mirrored — re-ran per BFS level (6 lineitem scans + 3 big
    //      DISTINCT aggregates in the before-plan). The edge relation
    //      is now built once as a DataFrame, checkpointed (eagerCut),
    //      and exposed to the UNCHANGED recursive tail as a temp view:
    //      each loop step joins the materialized RDD instead of
    //      recomputing the CTE. Result-identical by construction (the
    //      reach/closure text is byte-for-byte the oracle's; only the
    //      edge relation's physical source changed), and the driver's
    //      oracle re-proves it value-level.
    "q55_recursive_bfs" -> ((s, d) => {
      graft.sources.Tables.registerAll(s, d)
      val pairs = t(s, d, "lineitem")
        .select(col("l_partkey").as("p"), col("l_suppkey").as("s")).distinct()
      val nPart = s.sessionState.conf.numShufflePartitions
      val und = eagerCut(
        pairs.select((col("p") * 2).as("src"), (col("s") * 2 + 1).as("dst"))
          .unionAll(pairs.select((col("s") * 2 + 1).as("src"), (col("p") * 2).as("dst")))
          .repartition(nPart, col("src")))
      und.createOrReplaceTempView("q55_und")
      val out = s.sql("""WITH RECURSIVE reach(node, dist) AS (
           SELECT DISTINCT src AS node, 0 AS dist FROM q55_und WHERE src % 200 = 1
           UNION ALL
           SELECT u.dst AS node, r.dist + 1 AS dist
           FROM reach r JOIN q55_und u ON u.src = r.node
           WHERE r.dist < 2)
         SELECT CAST(dist AS BIGINT) AS dist, count(DISTINCT node) AS n_nodes
         FROM (SELECT node, min(dist) AS dist FROM reach GROUP BY node)
         GROUP BY dist ORDER BY dist""")
      // drop the view immediately: analysis already inlined the
      // checkpointed relation into `out`, and a catalog-held reference
      // would keep every run's checkpoint blocks alive (leak — the
      // bench's prdds sentinel is the detector)
      s.catalog.dropTempView("q55_und")
      out
    }),

    // ---- correlated LATERAL top-n (same text runs in DuckDB)
    "q56_lateral_topn" -> ((s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(LateralTopNSql)
    }),

    // ---- salted two-phase aggregation: the 100 TB skew pattern. 5
    //      distinct event_types over N executors would hot-spot 5
    //      reducers; salting fans each key over 16 partials first.
    //      Decimal sums are associative, so result == plain groupBy.
    "q28_salted_agg" -> ((s, d) => {
      val partials = t(s, d, "events")
        .withColumn("_salt", pmod(xxhash64(col("event_id")), lit(16)))
        .groupBy(col("event_type"), col("_salt"))
        .agg(sum(col("value").cast(DecimalType(18, 4))).as("pv"),
          count(lit(1)).as("pc"))
      partials.groupBy(col("event_type"))
        .agg(sum(col("pv")).cast("double").as("total_value"),
          sum(col("pc")).cast("long").as("n_events"))
        .orderBy(col("event_type"))
    }),

    // ---- binned band join: large×large range join as an equi-join.
    //      q20 broadcasts the small side; when BOTH sides are big, bin
    //      the band width and replicate one side to ±1 bin so the range
    //      predicate becomes a shuffle-partitionable (user, bin) key.
    //      A pair matches in exactly one bin (the right side is unique
    //      per bin), so no post-join dedup is needed.
    "q29_binned_band_join" -> ((s, d) => {
      val w = 0.5
      val ev = t(s, d, "events")
      val a = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("a_id"), col("value").as("a_val"))
        .withColumn("bin", explode(array(
          floor(col("a_val") / w) - 1, floor(col("a_val") / w), floor(col("a_val") / w) + 1)))
      val b = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("b_id"), col("value").as("b_val"))
        .withColumn("bin", floor(col("b_val") / w))
      a.join(b, Seq("user_id", "bin"))
        .filter(abs(col("a_val") - col("b_val")) <= w)
        .select(col("user_id"), col("a_id"), col("b_id"))
        .orderBy(col("user_id"), col("a_id"), col("b_id"))
    }),

    // ---- correlated scalar subquery (Catalyst decorrelates to a join)
    "q30_correlated_subquery" -> ((s, d) => {
      graft.sources.Tables.registerAll(s, d)
      s.sql(CorrelatedSql)
    }),

    // ---- ranking-function family (all order-exact: unique tie-break)
    "q31_window_ranks" -> ((s, d) => {
      val w = Window.partitionBy(col("o_orderstatus"))
        .orderBy(col("o_totalprice"), col("o_orderkey"))
      t(s, d, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"),
          rank().over(w).cast("long").as("rnk"),
          dense_rank().over(w).cast("long").as("drnk"),
          percent_rank().over(w).as("prnk"),
          ntile(4).over(w).cast("long").as("quartile"))
        .orderBy(col("o_orderstatus"), col("rnk"))
    }),

    // ---- schema-full JSON parsing (from_json → typed struct; q17 is
    //      the path-extraction variant). Parsed once, pruned by Catalyst
    //      (JsonOptimization prunes unaccessed struct fields).
    "q33_from_json" -> ((s, d) => {
      val schema = "k BIGINT"
      t(s, d, "events")
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL(schema)).as("p"))
        .select(col("event_id"), col("p.k").as("k"))
        .filter(col("k").isNotNull && col("k") % 7 === 0)
        .orderBy(col("event_id"))
    }),

    // ---- exact interpolated percentiles per group. Spark's
    //      `percentile` and DuckDB's `quantile_cont` share the
    //      definition; over BIGINT values with binary-exact fractions
    //      (k/4) the interpolation is ulp-exact cross-engine, so this
    //      hash-compares (approx_percentile stays rows-only in q21's
    //      sketch family). At scale the exact form is a sort-based
    //      agg per group; the approx t-digest/KLL path is the 100 TB
    //      default and this the auditing path.
    "q35_percentiles" -> ((s, d) => {
      val q = col("l_quantity").cast("long")
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          expr("percentile(CAST(l_quantity AS BIGINT), 0.25D)").as("p25"),
          expr("percentile(CAST(l_quantity AS BIGINT), 0.5D)").as("p50"),
          expr("percentile(CAST(l_quantity AS BIGINT), 0.75D)").as("p75"),
          max(q).as("pmax"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- RANK-ERROR PIN for the approx percentile sketch (the 100 TB
    //      path q35's comment points at): percentile_approx(accuracy=K)
    //      promises a value whose RANK is within n/K of the target.
    //      Re-derive the returned value's true rank interval with a
    //      plain conditional count and emit any group where the target
    //      rank falls outside [rank_lo − n/K − 1, rank_hi + n/K + 1] —
    //      all integer arithmetic (milli-scaled), deterministic for a
    //      fixed dataset. Oracle = the empty set (q60 pattern).
    "q61_approx_percentile_pin" -> ((s, d) => {
      val li = t(s, d, "lineitem").select(col("l_returnflag"),
        col("l_quantity").cast("long").as("q"))
      val ap = li.groupBy(col("l_returnflag"))
        .agg(expr("percentile_approx(q, 0.5D, 1000)").as("ap"),
          count(lit(1)).as("n"))
      li.join(ap, Seq("l_returnflag"))
        .groupBy(col("l_returnflag"), col("ap"), col("n"))
        .agg(sum(when(col("q") < col("ap"), 1L).otherwise(0L)).as("rank_lo"),
          sum(when(col("q") <= col("ap"), 1L).otherwise(0L)).as("rank_hi"))
        .withColumn("slack", expr("n div 1000") + 1)
        .filter(col("rank_lo") * 1000 > col("n") * 500 + col("slack") * 1000 ||
          col("rank_hi") * 1000 < col("n") * 500 - col("slack") * 1000)
        .select(col("l_returnflag"), col("ap"), col("n"),
          col("rank_lo"), col("rank_hi"))
        .orderBy(col("l_returnflag"))
    }),

    // ---- moment statistics via explicit decimal sums (order-exact;
    //      built-in stddev/var would be float-summation-order dependent)
    "q32_moment_stats" -> ((s, d) => {
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          dsum(col("l_quantity")).as("s1"),
          sum((col("l_quantity") * col("l_quantity")).cast(DecimalType(28, 8)))
            .cast("double").as("s2"))
        .select(col("l_returnflag"), col("n"),
          (col("s1") / col("n")).as("mean_qty"),
          ((col("s2") - col("s1") * col("s1") / col("n")) / col("n")).as("var_qty"))
        .orderBy(col("l_returnflag"))
    })
  )

  /** Correlated scalar subquery — Catalyst decorrelates it into an
    * aggregate + left join (`RewriteCorrelatedScalarSubquery`), so the
    * per-row subquery never executes row-at-a-time. Shared ANSI text
    * runs verbatim on DuckDB as the oracle. */
  private val CorrelatedSql =
    """SELECT o_orderkey, o_totalprice,
       (SELECT count(*) FROM lineitem WHERE l_orderkey = o_orderkey) AS n_items
       FROM orders ORDER BY o_orderkey"""

  /** Identical ANSI text executes on Spark and DuckDB — the SQL surface
    * of the engine (grouping sets + GROUPING() disambiguation). */
  /** Spark 4's `WITH RECURSIVE` (SPARK-24497: a physical UnionLoop —
    * the SQL-level iterative surface, complementing the DataFrame-loop
    * iteration in Dedup/Graph): bounded-depth BFS over the
    * part↔supplier bipartite graph from every 100th supplier. The SAME
    * text runs in DuckDB — recursion, seed dedup, and the min-dist
    * closure are all ANSI. Depth is capped at 2 and the per-level
    * frontier is deduped in the outer aggregate, so row growth is
    * seeds·deg²  — bounded by design, not by engine mercy. Spark's loop
    * re-evaluates referenced CTEs per iteration, so the edge relation
    * dedups on the raw (part, supp) pairs once and MIRRORS with
    * UNION ALL — half the dedup volume per evaluation (the DataFrame
    * loop in `operators.Graph` is the form that caches the edges; this
    * entry is the portable SQL surface, not the 100 TB path). */
  private val RecursiveBfsSql =
    """WITH RECURSIVE pairs AS (
         SELECT DISTINCT l_partkey AS p, l_suppkey AS s FROM lineitem),
       und AS (
         SELECT p * 2 AS src, s * 2 + 1 AS dst FROM pairs
         UNION ALL
         SELECT s * 2 + 1 AS src, p * 2 AS dst FROM pairs),
       reach(node, dist) AS (
         SELECT DISTINCT src AS node, 0 AS dist FROM und WHERE src % 200 = 1
         UNION ALL
         SELECT u.dst AS node, r.dist + 1 AS dist
         FROM reach r JOIN und u ON u.src = r.node
         WHERE r.dist < 2)
       SELECT CAST(dist AS BIGINT) AS dist, count(DISTINCT node) AS n_nodes
       FROM (SELECT node, min(dist) AS dist FROM reach GROUP BY node)
       GROUP BY dist ORDER BY dist"""

  /** Correlated LATERAL subquery with ORDER BY + LIMIT — the per-row
    * top-n join Catalyst decorrelates into a ranked window under the
    * hood (DecorrelateInnerQuery); the declarative form a SQL user
    * writes when "top 2 per outer row" is the ask. Same text in DuckDB
    * (which executes it as a literal lateral loop) — two engines, two
    * physical strategies, one answer. */
  private val LateralTopNSql =
    """SELECT n.n_name, l.c_name, l.c_acctbal
       FROM nation n, LATERAL (
         SELECT c_name, c_acctbal FROM customer
         WHERE c_nationkey = n.n_nationkey
         ORDER BY c_acctbal DESC, c_name LIMIT 2) l
       ORDER BY n.n_name, l.c_acctbal DESC, l.c_name"""

  /** Shared Spark/DuckDB text. Grouping sets over a full-key partial
    * aggregate (CTE `p`): Expand replicates input rows per set, so
    * pre-aggregating bounds its input by |seg × nation| instead of the
    * customer row count — same rationale as q12/q13, expressed portably
    * (exact decimal partials re-sum to bit-identical totals). */
  private val GroupingSetsSql =
    """WITH p AS (
         SELECT c_mktsegment, n_name, count(*) AS pn,
           sum(CAST(c_acctbal AS DECIMAL(18,4))) AS pbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         GROUP BY c_mktsegment, n_name)
       SELECT CASE WHEN GROUPING(c_mktsegment) = 1 THEN 'ALL' ELSE c_mktsegment END AS seg,
       CASE WHEN GROUPING(n_name) = 1 THEN 'ALL' ELSE n_name END AS nat,
       CAST(sum(pn) AS BIGINT) AS n,
       CAST(sum(pbal) AS DOUBLE) AS total_bal
       FROM p
       GROUP BY GROUPING SETS ((c_mktsegment), (n_name), ())
       ORDER BY seg, nat"""

  def oracleSql: Map[String, String] = Map(
    "q60_approx_distinct_pin" ->
      """SELECT CAST(NULL AS VARCHAR) AS l_returnflag,
         CAST(NULL AS BIGINT) AS approx_n, CAST(NULL AS BIGINT) AS exact_n
         WHERE 1 = 0""",
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_qty,
         CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS avg_disc,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q02_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
         l_extendedprice * (1 - l_discount) AS net_price,
         CAST(l_shipdate AS DATE) AS ship_date
         FROM lineitem WHERE l_quantity > 30 AND l_discount <= 0.05
         ORDER BY l_orderkey, l_linenumber""",
    "q03_join_broadcast" ->
      """SELECT n_name,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue,
         count(*) AS n_orders
         FROM orders JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q04_join_shuffle" ->
      """SELECT o_orderpriority,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q05_semi_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q06_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
         ORDER BY c_custkey""",
    "q07_topk_per_group" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey) AS rk
           FROM orders) WHERE rk <= 3
         ORDER BY o_custkey, rk""",
    "q08_window_running" ->
      """SELECT o_custkey, o_orderkey,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
           PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
         FROM orders ORDER BY o_custkey, o_orderkey""",
    "q09_sort_limit" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""",
    "q10_distinct" ->
      "SELECT DISTINCT c_mktsegment FROM customer ORDER BY c_mktsegment",
    "q11_setops" ->
      """SELECT c_custkey, 'both' AS op FROM (
           SELECT c_custkey FROM customer WHERE c_acctbal > 5000
           INTERSECT
           SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
         UNION ALL
         SELECT c_custkey, 'only_rich' AS op FROM (
           SELECT c_custkey FROM customer WHERE c_acctbal > 5000
           EXCEPT
           SELECT c_custkey FROM customer WHERE c_custkey % 2 = 0)
         ORDER BY op, c_custkey""",
    "q12_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
         count(*) AS n_customers,
         CAST(sum(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY region, nation""",
    "q13_cube" ->
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
         coalesce(o_orderpriority, 'ALL') AS priority,
         count(*) AS n,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY status, priority""",
    "q14_string_funcs" ->
      """SELECT p_partkey, upper(p_brand) AS brand_u,
         substring(p_name, 1, 8) AS name_pfx,
         CAST(length(p_name) AS BIGINT) AS name_len,
         regexp_replace(p_type, '[aeiou]', '', 'g') AS type_novowel,
         concat_ws('|', p_brand, p_type) AS brand_type
         FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey""",
    "q15_date_funcs" ->
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
         CAST(month(o_orderdate) AS BIGINT) AS mo,
         count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
         FROM orders GROUP BY yr, mo ORDER BY yr, mo""",
    "q16_case_agg" ->
      """SELECT o_orderstatus,
         CAST(sum(CAST(CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice ELSE 0.0 END AS DECIMAL(18,4))) AS DOUBLE) AS urgent_revenue,
         count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS urgent_orders,
         count(*) AS all_orders
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q17_json_extract" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_num
         FROM events WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50
         ORDER BY event_id""",
    "q18_having" ->
      """SELECT l_partkey,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS total_qty,
         count(*) AS n_lines
         FROM lineitem GROUP BY l_partkey
         HAVING CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) > 100
         ORDER BY l_partkey""",
    "q19_above_avg" ->
      """SELECT o_orderkey, o_totalprice FROM orders
         WHERE o_totalprice > (
           SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) / count(*)
           FROM orders)
         ORDER BY o_orderkey""",
    "q20_range_join" ->
      """SELECT tier, count(*) AS n_events,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value
         FROM events JOIN (VALUES
           ('low', -1000000000.0, 50.0),
           ('mid', 50.0, 120.0),
           ('high', 120.0, 1000000000.0)) AS tiers(tier, lo, hi)
         ON value >= lo AND value < hi
         GROUP BY tier ORDER BY tier""",
    "q22_multi_join" ->
      """SELECT r_name,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q23_window_lag" ->
      """SELECT user_id, event_id,
         lag(event_id, 1) OVER w AS prev_event_id,
         (epoch_ns(ts) // 1000)
           - (lag(epoch_ns(ts), 1) OVER w // 1000) AS gap_us
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, event_id""",
    "q24_pivot" ->
      """SELECT o_orderpriority,
         CAST(sum(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS f_total,
         CAST(sum(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS o_total,
         CAST(sum(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,4)) END) AS DOUBLE) AS p_total
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q25_array_funcs" ->
      """SELECT l_orderkey,
         CAST(len(qs) AS BIGINT) AS n_items,
         qs[1] AS min_q, qs[-1] AS max_q,
         list_contains(qs, 50.0) AS has_fifty
         FROM (SELECT l_orderkey, list_sort(list(l_quantity)) AS qs
               FROM lineitem GROUP BY l_orderkey)
         ORDER BY l_orderkey""",
    "q26_hash_sample" ->
      """SELECT count(*) AS n_rows,
         CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM lineitem
         WHERE substring(md5(concat(CAST(l_orderkey AS VARCHAR), '-', CAST(l_linenumber AS VARCHAR))), 1, 2) < '1a'""",
    "q27_grouping_sets" -> GroupingSetsSql,
    "q55_recursive_bfs" -> RecursiveBfsSql,
    "q57_variant_extract" ->
      """SELECT event_type, count(*) AS n,
         CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
         max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q56_lateral_topn" -> LateralTopNSql,
    "q28_salted_agg" ->
      """SELECT event_type,
         CAST(sum(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS total_value,
         count(*) AS n_events
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q29_binned_band_join" ->
      """SELECT a.user_id AS user_id, a.event_id AS a_id, b.event_id AS b_id
         FROM events a JOIN events b
         ON a.user_id = b.user_id
           AND a.event_type = 'error' AND b.event_type = 'purchase'
           AND abs(a.value - b.value) <= 0.5
         ORDER BY a.user_id, a_id, b_id""",
    "q30_correlated_subquery" -> CorrelatedSql,
    "q33_from_json" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events
         WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL
           AND CAST(json_extract_string(props, '$.k') AS BIGINT) % 7 = 0
         ORDER BY event_id""",
    "q31_window_ranks" ->
      """SELECT o_orderkey, o_orderstatus,
         rank() OVER w AS rnk,
         dense_rank() OVER w AS drnk,
         percent_rank() OVER w AS prnk,
         ntile(4) OVER w AS quartile
         FROM orders
         WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice, o_orderkey)
         ORDER BY o_orderstatus, rnk""",
    "q32_moment_stats" ->
      """SELECT l_returnflag, count(*) AS n,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*) AS mean_qty,
         (CAST(sum(CAST(l_quantity * l_quantity AS DECIMAL(28,8))) AS DOUBLE)
           - CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
             * CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*)) / count(*) AS var_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q61_approx_percentile_pin" ->
      """SELECT CAST(NULL AS VARCHAR) AS l_returnflag, CAST(NULL AS BIGINT) AS ap,
         CAST(NULL AS BIGINT) AS n, CAST(NULL AS BIGINT) AS rank_lo,
         CAST(NULL AS BIGINT) AS rank_hi WHERE 1 = 0""",
    "q35_percentiles" ->
      """SELECT l_returnflag,
         quantile_cont(CAST(l_quantity AS BIGINT), 0.25) AS p25,
         quantile_cont(CAST(l_quantity AS BIGINT), 0.5) AS p50,
         quantile_cont(CAST(l_quantity AS BIGINT), 0.75) AS p75,
         max(CAST(l_quantity AS BIGINT)) AS pmax
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""
  )
}
