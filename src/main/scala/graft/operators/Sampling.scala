package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling & data-mixing operators — the down-select
  * stage of a training-data pipeline (domain re-weighting, corpus
  * mixing, held-out carving). Everything is HASH-deterministic, never
  * `rand()`: membership is recomputable from the row id alone, so a
  * re-run, a retry after executor loss, or a different partitioning
  * yields the identical sample (and the DuckDB oracle can replay it).
  *
  * Scale (100 TB):
  *  - rate sampling is a narrow filter over the scan — no shuffle, no
  *    state, and the scan-level filter means the dropped rows never
  *    leave the input stage;
  *  - quota mixing shuffles only (domain, id-hash) pairs-worth of key
  *    data and the rank filter rides WindowGroupLimit, so each domain's
  *    sort is capped at quota per partition before the final window.
  */
object Sampling {

  /** Deterministic percent-bucket in [0, 100) from a row id — the
    * SHARED c01 arithmetic ([[Corpus.hashBucket]], single-sourced next
    * to its DuckDB mirror so this oracle pair can't drift from c01's). */
  private def hashPct(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    Corpus.hashBucket(id)

  /** Stratified sampling: each stratum keeps its own percentage of
    * rows, decided per row by the id-hash bucket. The rates table is
    * tiny (one row per stratum) and broadcasts; everything else is a
    * narrow filter. The inner join doubles as the stratum whitelist —
    * strata absent from `rates` drop entirely (explicit beats a
    * silently-kept 100%). */
  def stratifiedSample(df: DataFrame, strataCol: String, idCol: String,
                       rates: Map[String, Int]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val rdf = rates.toSeq.toDF(strataCol, "keep_pct")
    df.join(broadcast(rdf), Seq(strataCol))
      .filter(hashPct(col(idCol)) < col("keep_pct"))
      .drop("keep_pct")
  }

  /** Epoch quota mixing with deterministic OVERSAMPLING: every domain
    * contributes EXACTLY `quota` slots per epoch — a long domain
    * contributes its hash-order prefix, a short domain WRAPS (slot s
    * takes the doc ranked (s mod n)+1, with copy_idx = s div n) — the
    * semantics a training mixer actually needs to hit a target mixture
    * when domains are shorter than their share (top-k-per-group alone
    * under-fills; that selection shape is q43/t11). Fully id-hash-
    * deterministic, so retries and re-runs emit the identical epoch.
    *
    * Scale: one domain-keyed shuffle ranks each domain (linear per
    * domain); the slot spine is quota rows per DISTINCT domain (tiny)
    * and meets the ranked docs on an equi-join on (domain, rank) —
    * output is exactly quota·|domains| rows, never an intermediate
    * blow-up. */
  def epochQuotaMix(docs: DataFrame, domainCol: String, idCol: String,
                    quota: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    val ranked = docs.select(col(domainCol), col(idCol))
      .withColumn("rk", row_number().over(w).cast("long"))
    // per-domain size == max(rk) by construction, but a plain count
    // over the input is a map-side-combinable aggregate — reading it
    // off `ranked` would re-run the whole md5-order window a second time
    val sizes = docs.groupBy(col(domainCol)).agg(count(lit(1)).as("n"))
    val slots = sizes
      .select(col(domainCol), col("n"),
        explode(sequence(lit(0L), lit(quota - 1L))).as("slot"))
      .select(col(domainCol), col("slot"),
        (col("slot") % col("n") + 1).as("rk"),
        expr("slot div n").as("copy_idx"))
    slots.join(ranked, Seq(domainCol, "rk"))
      .select(col(domainCol), col("slot"), col(idCol), col("copy_idx"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-status order sampling: O/F/P keep 10/20/50 percent
    "q63_stratified_sample" -> ((s, d) =>
      stratifiedSample(t(s, d, "orders"), "o_orderstatus", "o_orderkey",
          Map("O" -> 10, "F" -> 20, "P" -> 50))
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))),
    // every language fills exactly 120 slots; short languages wrap
    // (the sf0.01 corpus has ~100-doc languages, so real copy_idx > 0
    // rows exercise the oversampling path)
    "q64_quota_mix" -> ((s, d) =>
      epochQuotaMix(t(s, d, "documents"), "lang", "doc_id", 120)
        .orderBy(col("lang"), col("slot")))
  )

  def oracleSql: Map[String, String] = Map(
    "q63_stratified_sample" ->
      s"""SELECT o_orderkey, o_orderstatus
         FROM orders o
         JOIN (VALUES ('O', 10), ('F', 20), ('P', 50)) r(st, pct)
           ON o.o_orderstatus = r.st
         WHERE ${Corpus.bucketSql("o_orderkey")} < pct
         ORDER BY o_orderkey""",
    // both engines order the hex md5 string bytewise, so the per-domain
    // rank — and therefore every slot's doc — is identical
    "q64_quota_mix" ->
      """WITH r AS (
           SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
           FROM documents),
         sz AS (SELECT lang, max(rk) AS n FROM r GROUP BY lang),
         sl AS (
           SELECT lang, n, unnest(range(0, 120)) AS slot FROM sz)
         SELECT sl.lang, CAST(sl.slot AS BIGINT) AS slot, r.doc_id,
           CAST(sl.slot // sl.n AS BIGINT) AS copy_idx
         FROM sl JOIN r ON r.lang = sl.lang AND r.rk = sl.slot % sl.n + 1
         ORDER BY sl.lang, sl.slot"""
  )
}
