package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Zh._
import graft.sources.OsmFixture

/** Driver-contract entries for the ZH parity core. The ICU conversions
  * are not DuckDB-expressible (SURVEY.md §5) — those entries carry no
  * oracle; Han-script *detection* is expressible via RE2 `\p{Han}` and
  * gets a real oracle over the documents table. */
object ZhQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Full reference pipeline on the fixture table (golden-tested in
    // ZhSpec; here so the driver exercises it end-to-end). No oracle:
    // ICU conversion is not SQL-expressible.
    "z01_zh_enrich" -> ((s, _) => {
      ZhEnrich.zhEnrich(OsmFixture(s), "id").orderBy(col("id"))
    }),
    // Enrich + merge-back: tags map projected to plain columns (maps stay
    // out of oracle comparisons per SURVEY.md §5). No oracle.
    "z02_zh_enrich_applied" -> ((s, _) => {
      ZhEnrich.enrichTable(OsmFixture(s), "id")
        .select(col("id"), col("name"),
          element_at(col("tags"), "name:zh-Hans").as("hans"),
          element_at(col("tags"), "name:zh-Hant").as("hant"),
          element_at(col("tags"), "amenity").as("amenity"),
          col("geometry"))
        .orderBy(col("id"))
    }),
    // Conversion throughput over the full documents table: exercises the
    // codegen'd transliteration expressions at data scale (the fixture
    // pins correctness; this pins cost). Latin text passes through ICU
    // unchanged, so the invariant n_diff == 0 also guards against the
    // transliterator corrupting non-Han input. Rows-only (ICU not
    // SQL-expressible).
    "z04_zh_convert_throughput" -> ((s, d) => {
      t(s, d, "documents")
        .select(col("doc_id"),
          length(zh_to_traditional(col("text"))).cast("long").as("n_hant"),
          length(zh_to_simplified(col("text"))).cast("long").as("n_hans"),
          (length(col("text")) - length(zh_to_traditional(col("text"))))
            .cast("long").as("n_diff"))
        .orderBy(col("doc_id"))
    }),
    // z01 with conversion stubbed to IDENTITY: oracle-checks the entire
    // enrichment structure (F2–F5 filters, X4 empty→null, X5 coalesce-
    // guard, X6 conditional derive, Han detection) against a DuckDB
    // mirror of the same fixture — confining the no-oracle surface to
    // the two ICU calls themselves (SURVEY.md §5.1).
    "z05_zh_enrich_structure" -> ((s, _) => {
      ZhEnrich.zhEnrichWith(OsmFixture(s), "id", identity, identity).orderBy(col("id"))
    }),
    // Han-script detection over real data — DuckDB-oracled (RE2 \p{Han}).
    "z03_han_script_stats" -> ((s, d) => {
      t(s, d, "documents")
        .select(contains_han(col("text")).as("has_han"), col("n_chars"))
        .groupBy(col("has_han"))
        .agg(count(lit(1)).as("n_docs"), dsum(col("n_chars").cast("double")).as("total_chars"))
        .orderBy(col("has_han"))
    })
  )

  def oracleSql: Map[String, String] = Map(
    // The OsmFixture rows inlined with tag values pre-extracted (the map
    // lookup itself is trivial element_at; semantics under test are the
    // filters/derives). Identity conversion ⇒ hans/hant = coalesce(tag, zh).
    "z05_zh_enrich_structure" ->
      """WITH f(id, name, zh, hans_t, hant_t) AS (VALUES
           (1, '北京市', NULL, NULL, NULL),
           (2, 'Springfield', NULL, NULL, NULL),
           (3, '成田 Airport', NULL, NULL, NULL),
           (4, NULL, '萬國碼', NULL, NULL),
           (5, NULL, NULL, NULL, NULL),
           (6, '', NULL, NULL, NULL),
           (7, '头发', NULL, '头发', NULL),
           (8, '頭髮', NULL, NULL, '頭髮'),
           (9, '東京', NULL, '东京', '東京'),
           (10, '上海', NULL, '', NULL),
           (11, '广州', NULL, NULL, NULL)),
         e AS (
           SELECT CAST(id AS BIGINT) AS id, name,
             nullif(zh, '') AS ezh, nullif(hans_t, '') AS ehans, nullif(hant_t, '') AS ehant
           FROM f),
         d AS (
           SELECT id, ehans, ehant,
             COALESCE(ezh, CASE WHEN regexp_matches(name, '\p{Han}') THEN name END) AS _zh
           FROM e
           WHERE (name IS NOT NULL OR ezh IS NOT NULL)
             AND (ehant IS NULL OR ehans IS NULL))
         SELECT id, COALESCE(ehans, _zh) AS hans, COALESCE(ehant, _zh) AS hant
         FROM d
         WHERE _zh IS NOT NULL AND (ehans IS NULL OR ehant IS NULL)
         ORDER BY id""",
    "z03_han_script_stats" ->
      """SELECT regexp_matches(text, '\p{Han}') AS has_han,
         count(*) AS n_docs,
         CAST(sum(CAST(CAST(n_chars AS DOUBLE) AS DECIMAL(18,4))) AS DOUBLE) AS total_chars
         FROM documents GROUP BY has_han ORDER BY has_han"""
  )
}
