package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates the full operator catalog: relational (graft.operators.
  * Relational), ZH-enrichment parity core (graft.operators.ZhEnrich),
  * and the LLM-pipeline extensions (dedup / similarity / text analysis /
  * streaming-equivalent / multimodal).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    operators.Relational.queries("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    operators.Relational.queries ++
      operators.Analytics.queries ++
      operators.Warehouse.queries ++
      operators.AsOf.queries ++
      operators.ZhQueries.queries ++
      operators.TextAnalysis.queries ++
      operators.Corpus.queries ++
      operators.Curation.queries ++
      operators.Dedup.queries ++
      operators.Graph.queries ++
      operators.Similarity.queries ++
      operators.Events.queries ++
      operators.StatefulSessions.queries ++
      operators.Multimodal.queries ++
      operators.Quality.queries ++
      operators.Sampling.queries ++
      streaming.StreamingQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    operators.Relational.oracleSql ++
      operators.Analytics.oracleSql ++
      operators.Warehouse.oracleSql ++
      operators.AsOf.oracleSql ++
      operators.ZhQueries.oracleSql ++
      operators.TextAnalysis.oracleSql ++
      operators.Corpus.oracleSql ++
      operators.Curation.oracleSql ++
      operators.Dedup.oracleSql ++
      operators.Graph.oracleSql ++
      operators.Similarity.oracleSql ++
      operators.Events.oracleSql ++
      operators.StatefulSessions.oracleSql ++
      operators.Multimodal.oracleSql ++
      operators.Quality.oracleSql ++
      operators.Sampling.oracleSql ++
      streaming.StreamingQueries.oracleSql
}
