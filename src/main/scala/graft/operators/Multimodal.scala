package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * fixed-size chunking, and a batched feature-extraction stage.
  *
  * The real decode step (image/audio/video codecs) is STUBBED — the
  * container has no media libraries — but the Spark-side plumbing is
  * real and tested: schema (binary + metadata struct), partition-batched
  * processing via `mapPartitions` over a typed Dataset (the Scala
  * analogue of `mapInPandas` batch processing), deterministic output
  * shape. Swapping `fakeDecode` for a JNI/codec call changes nothing
  * structurally.
  *
  * Scale: chunking and feature extraction are narrow (no shuffle);
  * payloads at 100 TB would live in parquet binary columns exactly like
  * this, with `spark.sql.files.maxPartitionBytes` sizing the splits.
  */
object Multimodal {

  /** Documents as a multimodal table: payload bytes + metadata struct. */
  def asBinary(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      col("text").cast("binary").as("payload"),
      struct(
        length(col("text").cast("binary")).cast("long").as("byte_len"),
        md5(col("text").cast("binary")).as("content_md5"),
        lit("text/plain").as("mime")).as("meta"))

  /** Fixed-size chunk index (idx, byte length) per payload — the shape a
    * frame-sampler or tile-splitter produces. */
  def chunkIndex(docs: DataFrame, chunkBytes: Int = 64): DataFrame =
    asBinary(docs)
      .select(col("doc_id"), length(col("payload")).cast("long").as("n"))
      // n = 0 must yield zero chunks — unguarded sequence(0, -1) would
      // DESCEND and emit two bogus chunks for an empty payload
      .filter(col("n") > 0)
      .withColumn("chunk_idx",
        explode(expr(s"sequence(0, cast(ceil(n / $chunkBytes.0) as bigint) - 1)")))
      .select(col("doc_id"), col("chunk_idx"),
        least(lit(chunkBytes.toLong), col("n") - col("chunk_idx") * chunkBytes).as("chunk_bytes"))

  /** Record shape entering/leaving the "decoder". */
  case class Payload(doc_id: Long, payload: Array[Byte])
  case class Features(doc_id: Long, n_bytes: Long, features: Array[Float])

  /** STUB decode: a real implementation would decode image/audio bytes
    * here (no media libs in this container). The stub derives a
    * deterministic 8-dim feature vector from the bytes so the plumbing —
    * typed Dataset, per-partition batching, output schema — is fully
    * exercisable and testable. Lane sums accumulate in exact integer
    * arithmetic with ONE terminal float division, so the features are
    * losslessly recoverable as integers (round(f*255) == lane sum while
    * sums stay < 2^23) — which is what lets m03 carry a DuckDB oracle
    * instead of a rows-only check. */
  private def fakeDecode(bytes: Array[Byte]): Array[Float] = {
    val acc = new Array[Long](8)
    var i = 0
    while (i < bytes.length) {
      acc(i % 8) += (bytes(i) & 0xff)
      i += 1
    }
    Array.tabulate(8)(j => acc(j).toFloat / 255.0f)
  }

  /** Partition-batched feature extraction over binary payloads. */
  def extractFeatures(docs: DataFrame): Dataset[Features] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions { it =>
        // per-partition setup (a real decoder would init its codec here)
        it.map(p => Features(p.doc_id, p.payload.length.toLong, fakeDecode(p.payload)))
      }
  }

  case class Embedding(doc_id: Long, e0: Long, e1: Long, e2: Long, e3: Long)

  /** Batched "model inference" over binary payloads: `grouped(batchSize)`
    * is the batch shape — a real embedding model would run ONCE per batch
    * here (amortizing per-call overhead), exactly how `mapInPandas`
    * batches arrow record-batches. The stub embedding is a deterministic
    * closed form of (byte_len, doc_id) so even the inference path is
    * oracle-checkable; per-doc output never depends on batch membership
    * (which partitioning would make nondeterministic). */
  def batchedEmbed(docs: DataFrame, batchSize: Int = 64): Dataset[Embedding] = {
    val spark = docs.sparkSession
    import spark.implicits._
    asBinary(docs).select(col("doc_id"), col("payload")).as[Payload]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // model.call(batch) would go here, once per group
          batch.iterator.map { p =>
            val n = p.payload.length.toLong
            def e(k: Long) = (n * (k + 1) + p.doc_id * 31) % 9973
            Embedding(p.doc_id, e(0), e(1), e(2), e(3))
          }
        }
      }
  }

  /** TRAINING-SAMPLE ASSEMBLY — the last step of a multimodal pipeline:
    * one nested record per document joining every modality (binary
    * payload + typed metadata, the chunk index as an ordered
    * array-of-structs, the embedding vector, the language tag). All
    * joins are 1:1 or 1:N on doc_id, so at 100 TB the three inputs
    * bucket on doc_id and assembly is exchange-free; the nested output
    * is exactly the row-group layout a training dataloader reads
    * (sample-contiguous, no reassembly joins at read time). */
  def trainingSamples(docs: DataFrame, emb: DataFrame): DataFrame = {
    val chunks = chunkIndex(docs)
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("chunk_idx"), col("chunk_bytes")))).as("chunks"))
    asBinary(docs)
      .join(docs.select(col("doc_id"), col("lang")), Seq("doc_id"))
      .join(chunks, Seq("doc_id"), "left")
      .join(emb.select(col("vec_id").as("doc_id"), col("embedding")), Seq("doc_id"), "left")
      .select(col("doc_id"), col("lang"), col("payload"), col("meta"),
        coalesce(col("chunks"), expr("array()")).as("chunks"), col("embedding"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // nested assembly verified through a flat projection (the nested
    // schema itself is pinned by MultimodalSpec-style field access here)
    "m06_training_samples" -> ((s, d) =>
      trainingSamples(t(s, d, "documents"), t(s, d, "embeddings"))
        .select(col("doc_id"), col("lang"),
          col("meta.byte_len").as("byte_len"),
          col("meta.content_md5").as("content_md5"),
          size(col("chunks")).cast("long").as("n_chunks"),
          size(col("embedding")).cast("long").as("emb_dim"))
        .orderBy(col("doc_id"))),
    "m05_batched_embed" -> ((s, d) =>
      batchedEmbed(t(s, d, "documents")).toDF().orderBy(col("doc_id"))),
    "m01_binary_meta" -> ((s, d) =>
      asBinary(t(s, d, "documents"))
        .select(col("doc_id"), col("meta.byte_len").as("byte_len"),
          col("meta.content_md5").as("content_md5"), col("meta.mime").as("mime"))
        .orderBy(col("doc_id"))),
    "m02_chunk_index" -> ((s, d) =>
      chunkIndex(t(s, d, "documents")).orderBy(col("doc_id"), col("chunk_idx"))),
    // all 8 float lanes roundtripped to their exact integer lane sums
    // (see fakeDecode) — hash-comparable against a byte-arithmetic oracle
    "m03_feature_stub" -> ((s, d) =>
      extractFeatures(t(s, d, "documents")).toDF()
        .select(col("doc_id") +: col("n_bytes") +:
          (0 until 8).map(j => expr(
            s"cast(round(cast(element_at(features, ${j + 1}) as double) * 255.0) as bigint)")
            .as(s"l$j")): _*)
        .orderBy(col("doc_id"))),
    // frame sampling: keep every 4th chunk — the stride pattern a video
    // frame-sampler applies before decode (narrow, pushdown-friendly)
    "m04_frame_sample" -> ((s, d) =>
      chunkIndex(t(s, d, "documents"))
        .filter(col("chunk_idx") % 4 === 0)
        .orderBy(col("doc_id"), col("chunk_idx")))
  )

  def oracleSql: Map[String, String] = Map(
    "m06_training_samples" ->
      """SELECT d.doc_id, d.lang,
           CAST(octet_length(encode(d.text)) AS BIGINT) AS byte_len,
           md5(d.text) AS content_md5,
           CAST(ceil(octet_length(encode(d.text)) / 64.0) AS BIGINT) AS n_chunks,
           CAST(len(e.embedding) AS BIGINT) AS emb_dim
         FROM documents d LEFT JOIN embeddings e ON e.vec_id = d.doc_id
         ORDER BY d.doc_id""",
    "m05_batched_embed" ->
      """SELECT doc_id,
           (CAST(octet_length(encode(text)) AS BIGINT) * 1 + doc_id * 31) % 9973 AS e0,
           (CAST(octet_length(encode(text)) AS BIGINT) * 2 + doc_id * 31) % 9973 AS e1,
           (CAST(octet_length(encode(text)) AS BIGINT) * 3 + doc_id * 31) % 9973 AS e2,
           (CAST(octet_length(encode(text)) AS BIGINT) * 4 + doc_id * 31) % 9973 AS e3
         FROM documents ORDER BY doc_id""",
    "m01_binary_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
         md5(text) AS content_md5, 'text/plain' AS mime
         FROM documents ORDER BY doc_id""",
    "m02_chunk_index" ->
      """WITH c AS (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n,
             unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS i
           FROM documents)
         SELECT doc_id, i AS chunk_idx, least(64, n - i * 64) AS chunk_bytes
         FROM c ORDER BY doc_id, chunk_idx""",
    // lane j = bytes at 0-based positions ≡ j (mod 8); docs are ASCII so
    // ord(char) == byte value (equality with octet_length checked above)
    "m03_feature_stub" ->
      ("""SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         """ + (0 until 8).map { j =>
        s"COALESCE(CAST(list_sum(list_transform(range(${j + 1}, length(text) + 1, 8), i -> ord(text[i]))) AS BIGINT), 0) AS l$j"
      }.mkString(",\n         ") +
        "\n         FROM documents ORDER BY doc_id"),
    "m04_frame_sample" ->
      """WITH c AS (
           SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n,
             unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS i
           FROM documents)
         SELECT doc_id, i AS chunk_idx, least(64, n - i * 64) AS chunk_bytes
         FROM c WHERE i % 4 = 0 ORDER BY doc_id, chunk_idx"""
  )
}
