package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, TextAnalysis, Warehouse}

/** Streaming BM25 index MAINTENANCE — the text mirror of
  * [[AnnIngestStream]]/st22, completing the retrieval-lifecycle
  * symmetry (st24 serves, this ingests): a STREAM of new documents is
  * folded into the persisted inverted index batch by batch, with a
  * serve after every commit proving the index stays answerable
  * mid-ingest.
  *
  * Per micro-batch, three moves (st22's shape applied to text):
  *  1. TOKENIZE the arriving batch alone into its partial postings
  *     (doc_id, w, tf) and doc lengths — narrow over the batch (a
  *     document never splits across batches, so per-batch tf IS the
  *     document's true tf);
  *  2. COMMIT both relations via the manifest-pointer APPEND
  *     ([[Warehouse.appendManifested]], generation keyed by batchId —
  *     the idempotent-commit recipe), so a reader at any instant
  *     resolves complete committed posting sets;
  *  3. SERVE the t23 query population against base + delta-so-far
  *     postings/doclens — with the BASE index's df AND corpus scalars
  *     FROZEN. Frozen global statistics are the segment-ingestion
  *     contract every production search engine runs between merges
  *     (new segments are searchable immediately; idf/avgdl refresh on
  *     the compaction cadence) — the exact analogue of st22's frozen
  *     codebooks, with the same documented drift-vs-availability
  *     trade. A query term that first appears in the DELTA has no
  *     frozen df row and is dropped — deterministic, and replayed
  *     identically by the oracle.
  *
  * The final commit's serve covers the complete delta, so the bounded
  * replay answers to ONE DuckDB oracle: the t23 pipeline with postings
  * and doc lengths over ALL documents but df/stats computed over the
  * BASE population only (`doc_id % 3 != 0`) — batching, the manifest
  * protocol, and stats freezing all provably visible/invisible exactly
  * as designed.
  *
  * Scale (100 TB): the postings and doclens relations are the only
  * things that grow — immutable generations folded back to one by
  * [[Warehouse.compactManifested]] on the maintenance cadence; the
  * per-batch tokenize is embarrassingly parallel; the serve is the
  * t24 plan. Delivery: at-least-once foreachBatch + batchId-keyed
  * generation commits and batchId-keyed serve output = exactly-once
  * index state and results (the st21/st22 recipe verbatim).
  */
object Bm25IngestStream {

  /** The manifested postings/doclens roots for scale-factor `dir` —
    * deterministic (pid, sf)-scoped. */
  def postingsTableDir(dir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_bm25ingest_postings_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(dir).getFileName).toString
  def doclensTableDir(dir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_bm25ingest_doclens_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(dir).getFileName).toString

  /** Run the bounded ingest replay to completion and return the final
    * post-commit serve — the frozen-stats BM25 answer over the full
    * corpus. Base population: doc_id % 3 != 0; the stream delivers the
    * rest in ≥ 2 micro-batches. */
  def runBm25Ingest(spark: SparkSession, dir: String, k: Int = 5,
                    queryMod: Int = 50): DataFrame = {
    // base inverted index over the resident corpus — built at most once
    // per (process, sf); its dfreq/stats are the FROZEN statistics
    val idx = Similarity.cachedIndex("bm25base", dir)(d =>
      TextAnalysis.buildBm25Index(
        graft.sources.Tables(spark, dir, "documents")
          .filter(col("doc_id") % 3 =!= 0), d))
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    val docs = graft.sources.Tables(scoped, dir, "documents")

    // fresh manifested tables per run, seeded with the base relations
    // as generation 0 (at 100 TB the seed is a pointer, not a copy)
    val postDir = postingsTableDir(dir)
    val dlDir = doclensTableDir(dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(postDir))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dlDir))
    Warehouse.appendManifested(scoped, postDir,
      scoped.read.parquet(s"$idx/postings"))
    Warehouse.appendManifested(scoped, dlDir,
      scoped.read.parquet(s"$idx/doclens"))

    // stage the arriving docs as TWO files so the bounded replay runs
    // >= 2 real commits (maxFilesPerTrigger = 1)
    val stageDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_bm25ingest_src_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(dir).getFileName).toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stageDir))
    val delta = docs.filter(col("doc_id") % 3 === 0)
    delta.filter(col("doc_id") % 6 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$stageDir/b1")
    delta.filter(col("doc_id") % 6 =!= 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$stageDir/b2")
    val schema = scoped.read.parquet(s"$stageDir/b1").schema

    val outDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_bm25ingest_out_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(dir).getFileName).toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_bm25ingest_ckpt")
    try {
      val q = scoped.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$stageDir/*")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         batchId: Long) =>
          val b = batch.toDF()
          // (1) the batch's partial postings + doc lengths, narrow
          val tfB = b.select(col("doc_id"),
              explode(split(col("text"), " ")).as("w"))
            .filter(col("w") =!= "")
            .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("tf"))
          val dlB = TextAnalysis.bm25DocLens(b)
          // (2) idempotent manifest commits, generation = batchId + 1
          // (generation 0 is the base seed)
          Warehouse.appendManifested(scoped, postDir, tfB,
            genId = Some(batchId + 1))
          Warehouse.appendManifested(scoped, dlDir, dlB,
            genId = Some(batchId + 1))
          // (3) serve over base + delta-so-far, FROZEN base df/stats
          TextAnalysis.bm25Score(
              Warehouse.readManifested(scoped, postDir),
              Warehouse.readManifested(scoped, dlDir),
              scoped.read.parquet(s"$idx/dfreq"),
              scoped.read.parquet(s"$idx/stats"),
              TextAnalysis.bm25QueryWorkload(docs, queryMod), k)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        }
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
    // the last commit's serve covers base + the COMPLETE delta
    val last = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=").toLong).max
    scoped.read.parquet(s"$outDir/batch=$last")
  }

  /** st26 — the MAINTENANCE step completing the text lifecycle (st25
    * ingests, this compacts, st24 serves — the st23 move applied to
    * the inverted index): fold the streamed-in generation lists of
    * BOTH grown relations back to one ([[Warehouse.compactManifested]]
    * — pointer commits, racing readers always resolve a complete
    * set), then serve the same query population from the manifests
    * with the same frozen statistics. Same answer (and oracle) as
    * st25 — compaction must be invisible to results. Self-sufficient:
    * replays the bounded ingest first if this process hasn't (in the
    * catalog's alphabetical order st25 just did, so this entry prices
    * compact + serve — the maintenance cadence cost). */
  def runCompactedServe(spark: SparkSession, dir: String, k: Int = 5,
                        queryMod: Int = 50): DataFrame = {
    val postDir = postingsTableDir(dir)
    val dlDir = doclensTableDir(dir)
    if (!new java.io.File(postDir, "_current").exists())
      runBm25Ingest(spark, dir, k, queryMod)
    val idx = Similarity.cachedIndex("bm25base", dir)(d =>
      TextAnalysis.buildBm25Index(
        graft.sources.Tables(spark, dir, "documents")
          .filter(col("doc_id") % 3 =!= 0), d))
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    Warehouse.compactManifested(scoped, postDir)
    Warehouse.compactManifested(scoped, dlDir)
    TextAnalysis.bm25Score(
      Warehouse.readManifested(scoped, postDir),
      Warehouse.readManifested(scoped, dlDir),
      scoped.read.parquet(s"$idx/dfreq"),
      scoped.read.parquet(s"$idx/stats"),
      TextAnalysis.bm25QueryWorkload(
        graft.sources.Tables(scoped, dir, "documents"), queryMod), k)
  }
}
