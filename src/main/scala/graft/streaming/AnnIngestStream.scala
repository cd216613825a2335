package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.operators.{Similarity, Warehouse}

/** Streaming ANN index MAINTENANCE — the ingestion half of the index
  * lifecycle ([[AnnServeStream]]/st21 is the serve half): a STREAM of
  * new vectors is folded into the persisted PQ index batch by batch,
  * with a serve after every commit proving the index stays answerable
  * mid-ingest.
  *
  * Per micro-batch, three moves (the s17 steady-state shape, now under
  * a real stream):
  *  1. DELTA-ENCODE the batch against the FROZEN base codebooks — a
  *     narrow map over the arrival batch alone (codebooks broadcast,
  *     nothing else touched; no retrain, quantization drift is the
  *     documented trade with s12's reconstruction error as the
  *     retrain trigger);
  *  2. COMMIT the batch's codes to the codes table via the manifest-
  *     pointer APPEND ([[Warehouse.appendManifested]]): one immutable
  *     generation directory + one atomic pointer swap, so a reader at
  *     ANY instant resolves a complete, committed code set — never a
  *     partially-written batch (StreamingSpec races a reader across
  *     the commits to pin exactly this);
  *  3. SERVE the s17 query population against base + delta-so-far
  *     through the manifest. The LAST commit's serve covers the
  *     complete delta, so the bounded replay answers to the SAME
  *     DuckDB oracle as the batch s17 entry — ingestion batching must
  *     be invisible to the final answer.
  *
  * Scale (100 TB): the codes relation is the only thing that grows —
  * m bytes/vector/batch appended as immutable generations, compacted
  * back to one by [[Warehouse.compactManifested]] on the maintenance
  * cadence; the encode is embarrassingly parallel over the batch; the
  * serve is the st21 plan. Delivery follows the st21 recipe at BOTH
  * sinks: the serve output overwrites its batchId-keyed directory, and
  * the code commit keys its GENERATION by batchId
  * (`appendManifested(genId = batchId + 1)`; the base seed is
  * generation 0) — batchIds are stable across restarts from one
  * checkpoint, so a re-fired batch overwrites its own generation with
  * identical deterministic content and leaves the pointer untouched.
  * At-least-once execution + idempotent commit and sink = exactly-once
  * index state and results.
  */
object AnnIngestStream {

  /** The manifested codes-table directory for scale-factor dir `dir` —
    * deterministic (pid, sf)-scoped, so the StreamingSpec pin can read
    * it concurrently while the catalog entry runs. */
  def codesTableDir(dir: String): String =
    java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_anningest_codes_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(dir).getFileName).toString

  /** Run the bounded ingest replay to completion and return the final
    * post-commit serve (one row per (q_id, rk)) — the s17 answer. */
  def runAnnIngest(spark: SparkSession, dir: String, topK: Int = 5,
                   queryMod: Int = 400): DataFrame = {
    // base index (codebooks trained on vec_id % 10 != 0 + their codes):
    // shared with s17 via the same cachedIndex, built at most once per
    // (process, sf) — the steady state an arriving batch sees
    val idx = Similarity.cachedIndex("pqbase", dir)(d =>
      Similarity.buildPqIndex(graft.sources.Tables(spark, dir, "embeddings")
        .filter(col("vec_id") % 10 =!= 0), d))
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    val cb = scoped.read.parquet(s"$idx/codebooks")
    val emb = graft.sources.Tables(scoped, dir, "embeddings")

    // fresh manifested codes table per run, seeded with the base codes
    // as generation 0 (at 100 TB the seed is a pointer to the existing
    // relation, not a copy — one-time either way)
    val codesDir = codesTableDir(dir)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(codesDir))
    Warehouse.appendManifested(scoped, codesDir, scoped.read.parquet(s"$idx/codes"))

    // stage the delta (vec_id % 10 == 0, the s17 arrival population) as
    // TWO files so even the bounded replay runs >= 2 real commits
    // (maxFilesPerTrigger=1); split by parity of vec_id/10
    val stageDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_anningest_src_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(dir).getFileName).toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(stageDir))
    val delta = emb.filter(col("vec_id") % 10 === 0)
    delta.filter(col("vec_id") % 20 === 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$stageDir/b1")
    delta.filter(col("vec_id") % 20 =!= 0)
      .coalesce(1).write.mode("overwrite").parquet(s"$stageDir/b2")
    val schema = scoped.read.parquet(s"$stageDir/b1").schema

    val outDir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_anningest_out_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(dir).getFileName).toString
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(outDir))
    val ckpt = java.nio.file.Files.createTempDirectory("graft_anningest_ckpt")
    try {
      val q = scoped.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$stageDir/*")
        .writeStream
        .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
                         batchId: Long) =>
          // (1) narrow delta-encode of THIS batch, frozen codebooks
          val deltaCodes = Similarity.encodeWithCodebooks(batch.toDF(), cb)
          // (2) manifest-pointer commit: complete-or-invisible, keyed
          // by batchId so a re-fired batch is a no-op rewrite
          Warehouse.appendManifested(scoped, codesDir, deltaCodes,
            genId = Some(batchId + 1))
          // (3) serve after the commit over base + delta-so-far
          Similarity.adcServeQueries(
              emb.filter(col("vec_id") % queryMod === 0), cb,
              Warehouse.readManifested(scoped, codesDir), topK)
            .write.mode("overwrite").parquet(s"$outDir/batch=$batchId")
        }
        .option("checkpointLocation", ckpt.toString).start()
      try q.processAllAvailable() finally q.stop()
    } finally {
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
    // the last commit's serve covers base + the COMPLETE delta == the
    // batch s17 answer (and oracle)
    val last = new java.io.File(outDir).listFiles()
      .filter(_.getName.startsWith("batch="))
      .map(_.getName.stripPrefix("batch=").toLong).max
    scoped.read.parquet(s"$outDir/batch=$last")
  }

  /** st23 — the MAINTENANCE step that completes the lifecycle (st22
    * ingests, this compacts, st21 serves): fold the generation list
    * the streaming appends accumulated back to ONE generation
    * ([[Warehouse.compactManifested]] — a pointer commit, so a racing
    * reader resolves the multi-generation list or the compacted one,
    * both complete), then serve the same query population from the
    * manifest. Same answer (and oracle) as s17/st22 — compaction must
    * be invisible to results, which is the entire point of running it
    * online. Self-sufficient: replays the bounded ingest first if this
    * process hasn't (in the catalog's alphabetical order st22 just
    * did, so this entry prices compact + serve — the maintenance
    * cadence cost, not the ingest). */
  def runCompactedServe(spark: SparkSession, dir: String, topK: Int = 5,
                        queryMod: Int = 400): DataFrame = {
    val codesDir = codesTableDir(dir)
    if (!new java.io.File(codesDir, "_current").exists())
      runAnnIngest(spark, dir, topK, queryMod)
    val idx = Similarity.cachedIndex("pqbase", dir)(d =>
      Similarity.buildPqIndex(graft.sources.Tables(spark, dir, "embeddings")
        .filter(col("vec_id") % 10 =!= 0), d))
    val scoped = spark.newSession()
    scoped.conf.set("spark.sql.shuffle.partitions", "8")
    Warehouse.compactManifested(scoped, codesDir)
    Similarity.adcServeQueries(
      graft.sources.Tables(scoped, dir, "embeddings")
        .filter(col("vec_id") % queryMod === 0),
      scoped.read.parquet(s"$idx/codebooks"),
      Warehouse.readManifested(scoped, codesDir), topK)
  }
}
