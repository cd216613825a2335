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

  /** Deterministic percent-bucket in [0, 100) from a row id — the same
    * first-4-hex-digits-of-md5 arithmetic as the c01 split, so any
    * engine recomputes membership from the id alone. */
  private def hashPct(id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 100

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

  /** Quota mixing: EXACTLY min(quota, |domain|) rows per domain, chosen
    * by deterministic hash order (md5 of the id, id tiebreak) — the
    * "equal parts of every language/domain" mix step, with the
    * uniform-but-reproducible selection rand() cannot give. The rank
    * filter is WindowGroupLimit-eligible, so shuffled data per domain
    * is capped near the quota rather than the domain's full size. */
  def quotaMix(docs: DataFrame, domainCol: String, idCol: String,
               quota: Int): DataFrame = {
    val w = Window.partitionBy(col(domainCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    docs.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= quota)
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // per-status order sampling: O/F/P keep 10/20/50 percent
    "q63_stratified_sample" -> ((s, d) =>
      stratifiedSample(t(s, d, "orders"), "o_orderstatus", "o_orderkey",
          Map("O" -> 10, "F" -> 20, "P" -> 50))
        .select(col("o_orderkey"), col("o_orderstatus"))
        .orderBy(col("o_orderkey"))),
    // fixed per-language quota over the documents corpus
    "q64_quota_mix" -> ((s, d) =>
      quotaMix(t(s, d, "documents"), "lang", "doc_id", 30)
        .select(col("doc_id"), col("lang"), col("rk"))
        .orderBy(col("doc_id")))
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
    // rank — and therefore the selected quota — is identical
    "q64_quota_mix" ->
      """WITH r AS (
           SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rk
           FROM documents)
         SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk
         FROM r WHERE rk <= 30 ORDER BY doc_id"""
  )
}
