package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Streaming ANN serving — the online half of the ANN index lifecycle:
  * a STREAM of query vectors is answered, batch by batch, against the
  * PERSISTED PQ index (the s15 `buildPqIndex` layout: codebooks + codes
  * parquet relations), with results appended to a parquet sink.
  *
  * Shape: `foreachBatch` serving. Each arriving micro-batch of queries
  * runs the [[Similarity.adcServeQueries]] kernel — per-query m·k
  * distance table broadcast against the static codes relation, map-side
  * partial sums, bounded top-k — and appends its answers. Serving is
  * stateless per query (a query's answer depends only on the index),
  * so the union over any micro-batch partitioning of the query stream
  * equals the batch answer — which is why st21 hash-matches the SAME
  * DuckDB oracle as the batch s13/s15 entries. The stream-static join
  * contract is st18's: the static index relations are re-planned per
  * batch (broadcast at these sizes) and hold NO streaming state.
  *
  * Scale (100 TB): the index is built once and serves forever (builds
  * amortize across every query batch); per batch the work is
  * O(batch · corpus/codes-touched) with the corpus codes never
  * shuffling (broadcast distance tables), exactly the batch serve
  * plan. A production deployment would point `readStream` at the
  * query-arrival directory/bus and keep the sink appending.
  *
  * Delivery: `foreachBatch` is at-least-once on restart — a batch
  * re-fired after a failure runs its body again — so the sink write is
  * made IDEMPOTENT: each batch overwrites its own deterministic
  * `batch=<batchId>` subdirectory (batchIds are stable across
  * restarts from the same checkpoint), turning the re-fire into a
  * no-op rewrite of identical content. At-least-once execution +
  * idempotent per-batch overwrite = exactly-once RESULTS, which is
  * the standard Structured Streaming recipe for file sinks driven
  * from foreachBatch.
  */
object AnnServeStream {

  /** Stage the single-file embeddings table into a directory the file
    * stream source can monitor (same convention as
    * [[EventStreams.readEventStream]]). Staleness guard: the staged
    * copy is reused only while its size AND mtime still match the
    * source — testdata regenerated in place (the driver rewrites the
    * sf dirs between rounds; a hard link to the OLD inode would keep
    * serving deleted data) re-stages on next use, the same
    * invalidation [[Similarity.cachedIndex]] gets for free from its
    * pid scoping. */
  private def stagedEmbeddings(dir: String): String =
    stagedTable(dir, "embeddings.parquet")

  /** The generic single-file staging move (shared with
    * [[Bm25ServeStream]]): same contract and staleness guard as the
    * scaladoc above, parameterized by table file. */
  private[streaming] def stagedTable(dir: String, fileName: String): String = {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    val src = Paths.get(dir, fileName)
    val staged = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_stage_${fileName.stripSuffix(".parquet")}",
      Paths.get(dir).getFileName.toString)
    Files.createDirectories(staged)
    val dst = staged.resolve(fileName)
    val fresh = Files.exists(dst) &&
      Files.size(dst) == Files.size(src) &&
      Files.getLastModifiedTime(dst) == Files.getLastModifiedTime(src)
    if (!fresh) {
      Files.deleteIfExists(dst)
      try Files.createLink(dst, src)
      catch { case _: Exception =>
        Files.copy(src, dst, StandardCopyOption.REPLACE_EXISTING,
          StandardCopyOption.COPY_ATTRIBUTES) }
    }
    staged.toString
  }

  /** Run the bounded query-stream replay to completion and return the
    * full served result (one row per (q_id, rk)) read back from the
    * parquet sink. Queries = vec_id ≡ 0 mod `queryMod` — the same
    * query population as the batch s13 entry, so the same oracle. */
  def runAnnServe(spark: SparkSession, dir: String, topK: Int = 5,
                  queryMod: Int = 400): DataFrame = {
    // index: built at most once per (process, sf) — the steady state
    // every arriving batch actually sees is "the index already exists"
    val idx = Similarity.cachedIndex("pqserve", dir)(d =>
      Similarity.buildPqIndex(graft.sources.Tables(spark, dir, "embeddings"), d))
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    val cb = scoped.read.parquet(s"$idx/codebooks")
    val codes = scoped.read.parquet(s"$idx/codes")
    val staged = stagedEmbeddings(dir)
    val schema = scoped.read.parquet(staged).schema
    // per-(pid, sf) sink dir, cleared per run so repeated catalog runs
    // start empty; WITHIN a run (and across restarts from the same
    // checkpoint) each batch owns the batch=<batchId> subdirectory and
    // overwrites it — the idempotent-sink half of the exactly-once
    // recipe in the class doc
    val outDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_annserve_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(dir).getFileName).toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_annserve_ckpt")
    try {
      val q = scoped.readStream.schema(schema).parquet(staged)
        .filter(col("vec_id") % queryMod === 0)
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         batchId: Long) =>
          Similarity.adcServeQueries(batch.toDF(), cb, codes, topK)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        }
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
    // batch=N is layout, not data: partition discovery surfaces it as a
    // column — drop it so the served result is the union of batches,
    // independent of how the stream chopped the queries
    scoped.read.parquet(outDir).drop("batch")
  }
}
