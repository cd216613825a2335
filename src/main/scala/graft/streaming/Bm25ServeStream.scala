package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextAnalysis}

/** Streaming BM25 serving — the TEXT mirror of [[AnnServeStream]],
  * completing the retrieval lifecycle symmetry: a stream of query
  * documents is answered, batch by batch, against the PERSISTED
  * inverted index (the t24 `buildBm25Index` layout: postings, doclens,
  * dfreq, stats), results appended to a parquet sink.
  *
  * Shape: `foreachBatch` serving under st18's stream-static contract —
  * the index relations are static, re-planned per batch, and hold no
  * streaming state. Each batch derives its query terms with
  * [[TextAnalysis.bm25QueryWorkload]] (a narrow map over the arriving
  * docs) and scores them with the shared BM25 tail. A query's answer
  * depends only on the index, never on other queries, so the union
  * over any micro-batch partitioning of the query stream equals the
  * batch answer — st24 hash-matches the SAME DuckDB oracle as the
  * batch t23/t24 entries: micro-batched arrival AND index persistence
  * are both provably invisible to results.
  *
  * Delivery is [[AnnServeStream]]'s exactly-once-results recipe
  * verbatim: at-least-once `foreachBatch` + idempotent per-batch
  * overwrite of the deterministic `batch=<batchId>` subdirectory.
  *
  * Scale (100 TB): the index builds once per corpus pass and serves
  * forever; per batch the work is the t24 serve plan — probed terms'
  * posting lists only, query side broadcast. */
object Bm25ServeStream {

  /** Run the bounded query-stream replay to completion and return the
    * full served result read back from the sink. Queries = doc_id ≡ 0
    * mod `queryMod` — the same workload as the batch t23/t24 entries,
    * so the same oracle. */
  def runBm25Serve(spark: SparkSession, dir: String, k: Int = 5,
                   queryMod: Int = 50): DataFrame = {
    // built at most once per (process, sf); shared with t24 — the
    // steady state an arriving batch sees is "the index already exists"
    val idx = Similarity.cachedIndex("bm25", dir)(d =>
      TextAnalysis.buildBm25Index(
        graft.sources.Tables(spark, dir, "documents"), d))
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    val staged = AnnServeStream.stagedTable(dir, "documents.parquet")
    val schema = scoped.read.parquet(staged).schema
    val outDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_bm25serve_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(dir).getFileName).toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bm25serve_ckpt")
    try {
      val q = scoped.readStream.schema(schema).parquet(staged)
        .filter(col("doc_id") % queryMod === 0)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         batchId: Long) =>
          TextAnalysis.bm25RetrieveFromIndex(scoped, idx,
              TextAnalysis.bm25QueryWorkload(batch.toDF(), queryMod), k)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        }
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
    // batch=N is layout, not data (see AnnServeStream)
    scoped.read.parquet(outDir).drop("batch")
  }
}
