package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Corpus-preparation operators: the split/pack/scrub plumbing that sits
  * between a cleaned web corpus and the training loop — deterministic
  * hash splits, cross-split leakage scans, sequence packing
  * (concat-and-chunk), and PII redaction. Every one is a narrow map or a
  * single bounded shuffle, and every one carries a DuckDB oracle.
  */
object Corpus {

  // ---------------------------------------------------------------- c01
  /** Deterministic train/val/test assignment: bucket = the first 4 hex
    * digits of md5(doc_id) mod 100 → 80/10/10. Content-independent and
    * id-stable, so re-crawls and re-processings keep every document in
    * its split (the property random() splits lack), and any engine can
    * recompute membership from the id alone — no split table to join.
    * Scale: a narrow map over the scan, no shuffle, no state.
    */
  def hashSplit(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), hashBucket(col("doc_id")).as("bucket"))
      .withColumn("split",
        when(col("bucket") < 80, "train")
          .when(col("bucket") < 90, "val")
          .otherwise("test"))

  /** The Spark side of the percent-bucket arithmetic — SINGLE-SOURCED
    * here next to its DuckDB mirror [[bucketSql]] so the pair stays
    * bit-identical (hashSplit/c01, stratifiedSample/q63, and any future
    * hash-membership operator all route through this one expression). */
  private[operators] def hashBucket(
      id: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long") % 100

  /** DuckDB mirror of the bucket arithmetic (DuckDB has no base-16
    * string→int conversion, so the 4 hex digits are positional strpos
    * lookups — identical values, plain SQL). */
  private[operators] def bucketSql(idExpr: String): String = {
    def digit(i: Int) =
      s"(strpos('0123456789abcdef', substring(md5(CAST($idExpr AS VARCHAR)), $i, 1)) - 1)"
    s"((${digit(1)} * 4096 + ${digit(2)} * 256 + ${digit(3)} * 16 + ${digit(4)}) % 100)"
  }

  // ---------------------------------------------------------------- c02
  /** Cross-split leakage scan: any TRAIN document sharing a word n-gram
    * with any TEST document leaks benchmark text into training. Composes
    * [[hashSplit]] with [[TextAnalysis.contaminationScan]] — the same
    * inverted-gram-index join t10 uses (never a doc×doc scan), with the
    * hash split deciding the two sides. Scale: the gram join shuffles on
    * gram; the test side is ~10% of the corpus and arrives via the same
    * index, so no side is ever replicated.
    */
  def splitLeakage(docs: DataFrame, n: Int = 4): DataFrame = {
    val s = hashSplit(docs)
    val withSplit = docs.join(s.select(col("doc_id"), col("split")), Seq("doc_id"))
    TextAnalysis.contaminationScan(
      withSplit.filter(col("split") === "train"),
      withSplit.filter(col("split") === "test"), n)
  }

  // ---------------------------------------------------------------- c03
  /** Sequence packing (concat-and-chunk): documents are concatenated in
    * id order and sliced into fixed `budget`-token training sequences;
    * each doc's placement is its running-token offset. Packing runs
    * WITHIN deterministic shards (`doc_id % shards`) so the prefix-sum
    * window is a single bounded exchange per shard, never a global
    * single-partition sort — at 100 TB `shards` grows with the corpus
    * (corpus_tokens / desired_shard_tokens) and shards pack in parallel.
    * Emitted per doc: the pack its first token lands in, the offset
    * inside that pack, and how many packs it spans (boundary-straddling
    * docs are the loss-masking edge case training loaders care about).
    */
  def sequencePacking(docs: DataFrame, budget: Int = 2048, shards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
    docs.select(col("doc_id"), (col("doc_id") % shards).as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .withColumn("start_tok", sum(col("n_tokens")).over(w) - col("n_tokens"))
      // pack_id = shard ⋅ 2⁴⁰ + pack index: the 40-bit stride keeps ids
      // collision-free to ~2⁴⁰ packs (≈ 2.2e15 tokens PER SHARD at
      // budget 2048), and `div` is exact integer arithmetic — floor(/)
      // rides a double and loses exactness past 2⁵³ tokens
      .select(col("doc_id"), col("shard"), col("n_tokens"), col("start_tok"),
        (shiftleft(col("shard"), 40) + expr(s"start_tok div $budget")).as("pack_id"),
        (col("start_tok") % budget).as("off_in_pack"),
        (expr(s"(start_tok + n_tokens - 1) div $budget")
          - expr(s"start_tok div $budget") + 1).as("n_packs_spanned"))
  }

  // ---------------------------------------------------------------- c07
  /** Balanced training-shard assignment: give each document to one of
    * `shards` output shards so shard TOKEN totals come out near-equal —
    * the step that decides whether 1000 trainer workers finish together
    * or wait on one fat shard. Deterministic greedy-free scheme:
    * size-descending global order, then SERPENTINE (boustrophedon)
    * dealing — cycle c hands its S docs out in forward order when c is
    * even, reversed when odd — so each double-cycle adds a
    * near-identical total to every shard (plain `g % S` would
    * systematically starve the high shards of every cycle's big docs).
    * All integer arithmetic, so the assignment replays exactly in SQL.
    *
    * Scale: the global position comes from `zipWithIndex` over
    * range-sorted partitions (the d15 primitive — a row_number over a
    * global ORDER BY collapses to one partition, the named
    * scale-killer); everything after it is a narrow map. */
  def balancedShards(docs: DataFrame, shards: Int = 8): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sized = docs.select(col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"))
      .repartitionByRange(col("n_tokens").desc, col("doc_id"))
      .sortWithinPartitions(col("n_tokens").desc, col("doc_id"))
      .as[(Long, Long)]
    val indexed = sized.rdd.zipWithIndex
      .map { case ((id, n), g) => (id, n, g) }
      .toDF("doc_id", "n_tokens", "g")
    indexed.select(col("doc_id"), col("n_tokens"),
      expr(s"""CASE WHEN (g div $shards) % 2 = 0 THEN g % $shards
               ELSE ${shards - 1} - (g % $shards) END""").cast("long").as("shard"))
  }

  // ---------------------------------------------------------------- c04
  /** PII redaction: scrub emails and phone numbers with codegen'd
    * regexp_replace (patterns restricted to the syntax Java regex and
    * RE2 agree on — char classes and bounded repetition, no lookaround),
    * reporting per-doc match counts and the md5 of the scrubbed text
    * (the full text stays out of the result). The synthetic corpus
    * carries no PII, so a deterministic contact line is appended to
    * every 7th doc FIRST — the oracle injects the identical line, so the
    * redaction itself is what's hash-compared. Scale: a narrow map.
    */
  def piiRedact(docs: DataFrame): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val phone = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
    val seeded = docs.withColumn("t",
      when(col("doc_id") % 7 === 0,
        concat(col("text"), lit(" contact user"), col("doc_id"),
          lit("@example.com or 555-123-4567")))
        .otherwise(col("text")))
    seeded.select(col("doc_id"),
      regexp_count(col("t"), lit(email)).cast("long").as("n_emails"),
      regexp_count(col("t"), lit(phone)).cast("long").as("n_phones"),
      md5(regexp_replace(regexp_replace(col("t"), email, "<EMAIL>"),
        phone, "<PHONE>")).as("redacted_md5"))
  }

  // ---------------------------------------------------------------- c05
  /** Length-bucketed batching: documents fall into fixed-width length
    * buckets, and batches of `batchSize` similar-length docs form inside
    * each bucket — the padding-minimization step a training dataloader
    * runs (a batch pads every sequence to its longest member; batching
    * similar lengths bounds the waste to < bucketWidth per doc by
    * construction). Batches form WITHIN deterministic (bucket, shard)
    * cells — the c03 shard pattern: the ranking window is one bounded
    * exchange per cell, never a global sort, and shards scale with the
    * corpus. Emitted per batch: size, length range, and the exact
    * padding waste Σ(max_len − len) the loader will burn — the number
    * that justifies the bucketing. All-integer arithmetic.
    */
  def lengthBucketBatches(docs: DataFrame, bucketWidth: Int = 256,
                          batchSize: Int = 16, shards: Int = 4): DataFrame = {
    val w = Window.partitionBy(col("bucket"), col("shard"))
      .orderBy(col("len"), col("doc_id"))
    docs.select(col("doc_id"), col("n_chars").as("len"),
        expr(s"n_chars div $bucketWidth").as("bucket"),
        (col("doc_id") % shards).as("shard"))
      .withColumn("rk", (row_number().over(w) - 1).cast("long"))
      .withColumn("batch_idx", expr(s"rk div $batchSize"))
      .groupBy(col("bucket"), col("shard"), col("batch_idx"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("len")).as("min_len"), max(col("len")).as("max_len"),
        (count(lit(1)) * max(col("len")) - sum(col("len"))).as("pad_waste"))
      .select(col("bucket"), col("shard"), col("batch_idx"),
        col("n_docs"), col("min_len"), col("max_len"), col("pad_waste"))
  }

  // ---------------------------------------------------------------- c06
  /** Source-balanced deterministic interleave — the epoch-order
    * generator: within each source, documents take a deterministic
    * pseudo-random rank (the c01 md5 bucket, then doc_id — content-
    * independent, so every re-run and engine reproduces the "shuffle");
    * the global stream key `rank·nSources + source_idx` cycles sources
    * round-robin, so no training window is dominated by one source (the
    * mix stays at the corpus ratio at every prefix ± one doc per
    * source). No global sort executes: the key is COMPUTED per row off
    * a per-source window (one bounded exchange on source) plus two
    * broadcast dims; the loader reads key order off the sorted write.
    */
  def sourceInterleave(docs: DataFrame): DataFrame = {
    val srcs = docs.select(col("source")).distinct()
    // dim-sized (a handful of sources): the single-partition window over
    // the DISTINCT list is |sources| rows, not corpus rows
    val sIdx = srcs.withColumn("source_idx",
      (row_number().over(Window.orderBy(col("source"))) - 1).cast("long"))
    val nSrc = srcs.agg(count(lit(1)).as("n_sources"))
    val w = Window.partitionBy(col("source")).orderBy(col("bkt"), col("doc_id"))
    docs.select(col("doc_id"), col("source"), hashBucket(col("doc_id")).as("bkt"))
      .withColumn("rank_in_source", (row_number().over(w) - 1).cast("long"))
      .join(broadcast(sIdx), Seq("source"))
      .crossJoin(broadcast(nSrc))
      .select(col("doc_id"), col("source"), col("rank_in_source"),
        (col("rank_in_source") * col("n_sources") + col("source_idx"))
          .as("interleave_key"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "c01_hash_split" -> ((s, d) =>
      hashSplit(t(s, d, "documents")).orderBy(col("doc_id"))),
    "c06_source_interleave" -> ((s, d) =>
      sourceInterleave(t(s, d, "documents")).orderBy(col("interleave_key"))),
    "c05_length_buckets" -> ((s, d) =>
      lengthBucketBatches(t(s, d, "documents"))
        .orderBy(col("bucket"), col("shard"), col("batch_idx"))),
    "c02_split_leakage" -> ((s, d) =>
      splitLeakage(t(s, d, "documents")).orderBy(col("train_id"))),
    "c03_sequence_packing" -> ((s, d) =>
      sequencePacking(t(s, d, "documents")).orderBy(col("doc_id"))),
    "c04_pii_redact" -> ((s, d) =>
      piiRedact(t(s, d, "documents")).orderBy(col("doc_id"))),
    "c07_balanced_shards" -> ((s, d) =>
      balancedShards(t(s, d, "documents")).orderBy(col("doc_id")))
  )

  def oracleSql: Map[String, String] = Map(
    // row_number replays the size-descending order the zipWithIndex
    // kernel computes distributively; the serpentine deal is pure
    // integer arithmetic
    "c07_balanced_shards" ->
      """WITH sized AS (
           SELECT doc_id,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         g AS (SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id) - 1 AS g
           FROM sized)
         SELECT doc_id, n_tokens,
           CAST(CASE WHEN (g // 8) % 2 = 0 THEN g % 8
                ELSE 7 - (g % 8) END AS BIGINT) AS shard
         FROM g ORDER BY doc_id""",
    "c06_source_interleave" ->
      s"""WITH s AS (SELECT DISTINCT source FROM documents),
         si AS (SELECT source, row_number() OVER (ORDER BY source) - 1
                  AS source_idx FROM s),
         ns AS (SELECT count(*) AS n FROM s),
         b AS (SELECT doc_id, source, ${bucketSql("doc_id")} AS bkt
               FROM documents),
         r AS (SELECT doc_id, source,
                 row_number() OVER (PARTITION BY source ORDER BY bkt, doc_id) - 1
                   AS rank_in_source
               FROM b)
         SELECT r.doc_id, r.source,
           CAST(r.rank_in_source AS BIGINT) AS rank_in_source,
           CAST(r.rank_in_source * ns.n + si.source_idx AS BIGINT) AS interleave_key
         FROM r JOIN si USING (source) CROSS JOIN ns
         ORDER BY interleave_key""",
    "c05_length_buckets" ->
      """WITH b AS (
           SELECT doc_id, n_chars AS len, n_chars // 256 AS bucket,
             doc_id % 4 AS shard
           FROM documents),
         r AS (
           SELECT *, row_number() OVER (
             PARTITION BY bucket, shard ORDER BY len, doc_id) - 1 AS rk
           FROM b)
         SELECT bucket, shard, rk // 16 AS batch_idx,
           count(*) AS n_docs,
           min(len) AS min_len, max(len) AS max_len,
           CAST(count(*) * max(len) - sum(len) AS BIGINT) AS pad_waste
         FROM r GROUP BY bucket, shard, batch_idx
         ORDER BY bucket, shard, batch_idx""",
    "c01_hash_split" ->
      s"""SELECT doc_id, CAST(${bucketSql("doc_id")} AS BIGINT) AS bucket,
         CASE WHEN ${bucketSql("doc_id")} < 80 THEN 'train'
              WHEN ${bucketSql("doc_id")} < 90 THEN 'val'
              ELSE 'test' END AS split
         FROM documents ORDER BY doc_id""",
    "c02_split_leakage" ->
      s"""WITH sp AS (
           SELECT doc_id, ${bucketSql("doc_id")} AS bucket FROM documents),
         grams AS (
           SELECT doc_id, gram FROM (
             SELECT d.doc_id, unnest(list_transform(range(1, len(ws) - 2),
               i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3]))) AS gram
             FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) d
             WHERE len(ws) >= 4)
           GROUP BY doc_id, gram),
         train_g AS (
           SELECT g.doc_id AS train_id, g.gram FROM grams g JOIN sp USING (doc_id)
           WHERE sp.bucket < 80),
         test_g AS (
           SELECT g.doc_id AS test_id, g.gram FROM grams g JOIN sp USING (doc_id)
           WHERE sp.bucket >= 90)
         SELECT train_id,
           CAST(count(DISTINCT gram) AS BIGINT) AS n_shared_grams,
           CAST(count(DISTINCT test_id) AS BIGINT) AS n_eval_docs
         FROM train_g JOIN test_g USING (gram)
         GROUP BY train_id ORDER BY train_id""",
    "c03_sequence_packing" ->
      """WITH tok AS (
           SELECT doc_id, doc_id % 8 AS shard,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
           FROM documents),
         run AS (
           SELECT doc_id, shard, n_tokens,
             CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
               AS BIGINT) AS start_tok
           FROM tok)
         SELECT doc_id, shard, n_tokens, start_tok,
           CAST(shard * 1099511627776 + start_tok // 2048 AS BIGINT) AS pack_id,
           CAST(start_tok % 2048 AS BIGINT) AS off_in_pack,
           CAST((start_tok + n_tokens - 1) // 2048 - start_tok // 2048 + 1
             AS BIGINT) AS n_packs_spanned
         FROM run ORDER BY doc_id""",
    "c04_pii_redact" ->
      """WITH seeded AS (
           SELECT doc_id,
             CASE WHEN doc_id % 7 = 0
               THEN text || ' contact user' || CAST(doc_id AS VARCHAR)
                    || '@example.com or 555-123-4567'
               ELSE text END AS t
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{3}-[0-9]{4}')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(t,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '[0-9]{3}-[0-9]{3}-[0-9]{4}', '<PHONE>', 'g')) AS redacted_md5
         FROM seeded ORDER BY doc_id"""
  )
}
