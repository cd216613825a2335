package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines: exact
  * (hash-groupBy), blocked n-gram Jaccard, MinHash+LSH, SimHash.
  *
  * Scale design (100 TB):
  *  - exact dedup groups by a 128-bit content hash, never shuffling the
  *    document bodies themselves;
  *  - pairwise Jaccard is only ever computed inside blocks / LSH buckets
  *    (candidate generation bounds the quadratic term);
  *  - MinHash signatures are built in ONE pass over exploded shingles
  *    (k min-aggregates), then banded so near-dup candidates meet in a
  *    bucket-join — the standard shuffle-friendly LSH layout;
  *  - SimHash pairs are blocked on 16-bit signature bands (a Hamming-
  *    distance-≤-budget pair must agree on at least one of 4 bands).
  */
object Dedup {

  /** Content hash used as the dedup key (md5 here so DuckDB can mirror
    * it; the cheaper xxhash64 is used where no oracle is needed). */
  private def contentHash(c: org.apache.spark.sql.Column) = md5(c.cast("binary"))

  /** Exact dedup: one canonical (min) doc_id per distinct text. */
  def exactDedupGroups(docs: DataFrame): DataFrame =
    docs.select(contentHash(col("text")).as("h"), col("doc_id"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .select(col("canonical_id"), col("n_copies"))

  /** Exact-duplicate pairs (a < b). */
  def exactDupPairs(docs: DataFrame): DataFrame = {
    val h = docs.select(contentHash(col("text")).as("h"), col("doc_id"))
    val a = h.select(col("h"), col("doc_id").as("a_id"))
    val b = h.select(col("h"), col("doc_id").as("b_id"))
    a.join(b, Seq("h")).filter(col("a_id") < col("b_id")).select(col("a_id"), col("b_id"))
  }

  /** SKEW-BOUNDED within-block self-join — the shared candidate
    * generator under every blocked pair scorer (text Jaccard d03,
    * containment d10, embedding cosine s04/p02).
    *
    * The naive `a.join(b, "blk")` shuffles BOTH sides on the block key,
    * so one hot block (boilerplate-prefixed web pages, a dense LSH
    * bucket) lands on ONE task that must produce |block|² pairs — the
    * classic skewed-key scale-killer AQE cannot split (the blow-up is
    * inside the join, not in the shuffled input sizes).
    *
    * Fix, output-identical: within each block, rows get a group index
    * `g = (rank-1)/cap` (rank by id — deterministic), and the unordered
    * pair (x∈g₁ ≤ y∈g₂) meets on join key `(blk, g₁, g₂)`: the a-side
    * replicates each row to keys (g, g..gmax), the b-side to keys
    * (0..g, g). Every join key now carries ≤ cap rows PER SIDE, so no
    * task exceeds cap² pairs regardless of block skew; replication is
    * O(|block|²/cap) rows — the same order as the pair output itself,
    * i.e. proportional to work the operator must do anyway. Each pair
    * meets exactly once (for g₁<g₂ the key fixes which side is which;
    * for g₁=g₂ the id filter orders it), and since ranks are ordered by
    * id, cross-group pairs already satisfy a_id < b_id.
    *
    * `base` must have columns (blk, id, p) — p is the opaque payload
    * structs/arrays the scorer needs. Returns (a_id, a_p, b_id, b_p).
    */
  private[graft] def boundedPairJoin(base: DataFrame, cap: Int): DataFrame = {
    val (a, b) = boundedPairSides(base, cap)
    a.join(b, Seq("blk", "_ga", "_gb"))
      .filter(col("_ga") < col("_gb") || col("a_id") < col("b_id"))
      .select(col("a_id"), col("a_p"), col("b_id"), col("b_p"))
  }

  /** The two replicated sides of [[boundedPairJoin]], exposed so the
    * cap invariant (≤ cap rows per join key, per side) is directly
    * testable (DedupSpec/SimilaritySpec). */
  private[graft] def boundedPairSides(base: DataFrame, cap: Int): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("blk")).orderBy(col("id"))
    val cw = Window.partitionBy(col("blk"))
    val g = base
      .withColumn("_g", ((row_number().over(w) - 1) / cap).cast("long"))
      .withColumn("_gmax", ((count(lit(1)).over(cw) - 1) / cap).cast("long"))
    val a = g.select(col("blk"), col("_g").as("_ga"),
      explode(sequence(col("_g"), col("_gmax"))).as("_gb"),
      col("id").as("a_id"), col("p").as("a_p"))
    val b = g.select(col("blk"),
      explode(sequence(lit(0L), col("_g"))).as("_ga"),
      col("_g").as("_gb"), col("id").as("b_id"), col("p").as("b_p"))
    (a, b)
  }

  /** SKEW-BOUNDED two-table block join — the asymmetric companion of
    * [[boundedPairJoin]] for DELTA-vs-CORPUS candidate generation: every
    * (a ∈ left, b ∈ right) pair sharing a block meets exactly once, and
    * no task sees more than cap left × cap right rows. Each side is
    * group-indexed within its block (deterministic id rank) and
    * replicated across the OTHER side's group range (a block-level
    * count-join supplies that range — broadcast-sized: one row per
    * distinct block), so a hot block costs `⌈n_a/cap⌉·⌈n_b/cap⌉`
    * bounded tasks instead of one quadratic straggler. Unlike the
    * self-join kernel the right side never pairs with itself — the
    * point of incremental dedup is that the 100 TB corpus side is
    * already deduped and must not be re-crossed.
    *
    * Inputs need (blk, id, p); returns (a_id, a_p, b_id, b_p). */
  private[graft] def boundedCrossPairJoin(left: DataFrame, right: DataFrame,
                                          cap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("blk")).orderBy(col("id"))
    val cw = Window.partitionBy(col("blk"))
    def grouped(df: DataFrame) = df
      .withColumn("_g", ((row_number().over(w) - 1) / cap).cast("long"))
      .withColumn("_gmax", ((count(lit(1)).over(cw) - 1) / cap).cast("long"))
    val gl = grouped(left)
    val gr = grouped(right)
    val rRange = gr.groupBy(col("blk")).agg(max(col("_gmax")).as("_rmax"))
    val lRange = gl.groupBy(col("blk")).agg(max(col("_gmax")).as("_lmax"))
    val a = gl.join(rRange, Seq("blk"))
      .select(col("blk"), col("_g").as("_ga"),
        explode(sequence(lit(0L), col("_rmax"))).as("_gb"),
        col("id").as("a_id"), col("p").as("a_p"))
    val b = gr.join(lRange, Seq("blk"))
      .select(col("blk"), explode(sequence(lit(0L), col("_lmax"))).as("_ga"),
        col("_g").as("_gb"), col("id").as("b_id"), col("p").as("b_p"))
    a.join(b, Seq("blk", "_ga", "_gb"))
      .select(col("a_id"), col("a_p"), col("b_id"), col("b_p"))
  }

  /** Blocked exact word-set Jaccard: candidate pairs share a 20-char
    * prefix block (cheap blocking key), verified with exact Jaccard.
    * |A∪B| computed as |A|+|B|−|A∩B| for cross-engine parity. Pairs are
    * generated through [[boundedPairJoin]], so a hot prefix (web
    * boilerplate) costs bounded tasks, not one quadratic straggler —
    * the DuckDB oracle is the plain blocked join (identical output). */
  private def blockedWordSetPairs(docs: DataFrame, cap: Int = 256): DataFrame = {
    val base = docs.select(
      substring(col("text"), 1, 20).as("blk"),
      col("doc_id").as("id"),
      array_distinct(split(col("text"), " ")).as("p"))
    boundedPairJoin(base, cap)
      .select(col("a_id"), col("b_id"), col("a_p").as("a_ws"), col("b_p").as("b_ws"))
      .withColumn("inter", size(array_intersect(col("a_ws"), col("b_ws"))).cast("long"))
  }

  def jaccardPairs(docs: DataFrame, threshold: Double = 0.5): DataFrame =
    blockedWordSetPairs(docs)
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("a_ws")) + size(col("b_ws")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))

  /** Containment near-dup pairs: C(A,B) = |A∩B| / min(|A|,|B|) — the
    * asymmetric companion to Jaccard that catches SUBSET duplicates (a
    * doc wholly contained in a longer one scores C≈1 but Jaccard≈|A|/|B|,
    * far below any Jaccard threshold — the truncation/expansion dup class
    * in web corpora, Broder 1997's "containment"). Same block join as
    * [[jaccardPairs]]; the threshold compare and the reported score are
    * pure integer arithmetic (`inter·100 ≥ pct·min`, milli-scaled `div`),
    * so no float crosses an engine boundary. */
  def containmentPairs(docs: DataFrame, thresholdPct: Int = 60): DataFrame =
    blockedWordSetPairs(docs)
      .withColumn("msize", least(size(col("a_ws")), size(col("b_ws"))).cast("long"))
      .filter(col("inter") * 100 >= lit(thresholdPct) * col("msize"))
      .select(col("a_id"), col("b_id"), col("inter"), col("msize"),
        expr("(inter * 10000) div msize").as("cont_x1e4"))

  /** INCREMENTAL dedup: the survivors of a NEW shard (`delta`) arriving
    * against an already-deduped `corpus` — the shape 100 TB ingestion
    * actually runs (a daily crawl lands against the accumulated lake;
    * re-deduping the lake per shard would be quadratic in shards).
    * A delta doc is dropped iff it word-set-Jaccard-matches (≥
    * thresholdMilli/1000, integer compare — no float crosses an engine
    * boundary) a corpus doc, or an EARLIER delta doc (smaller doc_id =
    * earlier arrival; the greedy first-wins rule, deterministic without
    * a component pass). Candidates share the 20-char prefix block and
    * ride [[boundedCrossPairJoin]]:
    *  - the corpus NEVER self-pairs (its dedup already happened) and its
    *    text never reshuffles beyond block routing;
    *  - an exact-hash anti-join tier drops verbatim copies first — it is
    *    semantically subsumed by Jaccard = 1 ≥ t, so the output is
    *    unchanged, but at scale it prunes the word-set machinery with an
    *    8-byte-key join.
    * Returns the surviving delta doc_ids. */
  def incrementalDedup(corpus: DataFrame, delta: DataFrame,
                       thresholdMilli: Long = 500, cap: Int = 256): DataFrame = {
    val ch = corpus.select(md5(col("text")).as("h")).distinct()
    val s1 = delta.withColumn("h", md5(col("text")))
      .join(ch, Seq("h"), "left_anti").drop("h")
    def sided(df: DataFrame, flag: Int) = df.select(
      substring(col("text"), 1, 20).as("blk"),
      col("doc_id").as("id"),
      struct(array_distinct(split(col("text"), " ")).as("ws"),
        lit(flag).as("is_delta")).as("p"))
    val rightSide = sided(corpus, 0).union(sided(delta, 1))
    val hits = boundedCrossPairJoin(sided(s1, 1), rightSide, cap)
      .filter(col("b_p.is_delta") === 0 || col("b_id") < col("a_id"))
      .withColumn("inter",
        size(array_intersect(col("a_p.ws"), col("b_p.ws"))).cast("long"))
      .withColumn("asz", size(col("a_p.ws")).cast("long"))
      .withColumn("bsz", size(col("b_p.ws")).cast("long"))
      .filter(col("inter") * 1000 >=
        lit(thresholdMilli) * (col("asz") + col("bsz") - col("inter")))
      .select(col("a_id").as("doc_id")).distinct()
    s1.join(hits, Seq("doc_id"), "left_anti")
      .select(col("doc_id"))
  }

  /** Sorted-neighborhood near-dup pairs (Hernández & Stolfo's SNM, the
    * classic alternative to hash blocking): sort the corpus by a key,
    * pair every record with its `w` successors, verify with exact
    * Jaccard. Where a hash block needs candidates to agree EXACTLY on
    * the key, sort order tolerates drifted keys (typo'd prefixes,
    * truncations) that land records near — not at — each other.
    *
    * Scale shape: the cost IS one global range sort; after it each
    * record pairs with a CONSTANT w successors, so candidates are w·n
    * regardless of key skew — no hot block exists by construction, the
    * property the bounded-join kernels must engineer. The global
    * position comes from `zipWithIndex` over the range-sorted
    * partitions (the distributed global-index primitive — a lead()
    * window over a global ORDER BY would collapse to one partition,
    * the named scale-killer), and neighbors meet through w skew-free
    * equi-joins on the 8-byte index. */
  def sortedNeighborhoodPairs(docs: DataFrame, w: Int = 2,
                              threshold: Double = 0.5): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sorted = docs.select(col("doc_id"),
        substring(col("text"), 1, 24).as("sort_key"),
        array_distinct(split(col("text"), " ")).as("ws"))
      .repartitionByRange(col("sort_key"), col("doc_id"))
      .sortWithinPartitions(col("sort_key"), col("doc_id"))
      .as[(Long, String, Seq[String])]
    val indexed = sorted.rdd.zipWithIndex
      .map { case ((id, _, ws), g) => (g, id, ws) }
      .toDF("g", "id", "ws")
    val a = indexed.select(col("g"), col("id").as("a_id"), col("ws").as("a_ws"))
    val paired = (1 to w).map { off =>
      a.join(indexed.select((col("g") - off).as("g"),
        col("id").as("b_id"), col("ws").as("b_ws")), Seq("g"))
    }.reduce(_ unionAll _)
    paired
      .withColumn("inter", size(array_intersect(col("a_ws"), col("b_ws"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("a_ws")) + size(col("b_ws")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(least(col("a_id"), col("b_id")).as("a_id"),
        greatest(col("a_id"), col("b_id")).as("b_id"), col("jaccard"))
      .orderBy(col("a_id"), col("b_id"))
  }

  /** MinHash signature: k min-hashes over word-3-shingles, computed in a
    * single explode + k min-aggregates pass (one shuffle by doc_id). */
  def minHashSignatures(docs: DataFrame, k: Int = 64): DataFrame = {
    val shingled = docs
      .withColumn("_ws", split(col("text"), " "))
      .withColumn("shingle", explode(expr(
        """transform(sequence(1, greatest(size(_ws) - 2, 1)),
           i -> concat_ws(' ', element_at(_ws, i),
             element_at(_ws, least(i + 1, size(_ws))),
             element_at(_ws, least(i + 2, size(_ws)))))""")))
      .select(col("doc_id"), col("shingle"))
    val minCols = (0 until k).map(j => min(xxhash64(col("shingle"), lit(j))).as(s"m$j"))
    shingled.groupBy(col("doc_id")).agg(minCols.head, minCols.tail: _*)
  }

  /** The ENGINE-REPLAYABLE MinHash twin (d16): the same word-3-shingle
    * split, ONE md5 per shingle, and the k permutation values taken as
    * k overlapping 8-hex-char slices of that 128-bit digest (Broder's
    * one-strong-hash minwise family — slices of a strong hash are
    * themselves uniform) — each signature lane is the min of its slice
    * over the document's shingles. Pure-ASCII hex everywhere, so
    * Spark's binary string min and DuckDB's agree byte for byte (the
    * t21 trick applied to the sketch); emitted long-form
    * (doc_id, seed, sig). The xxhash64 signatures
    * ([[minHashSignatures]] / the native MinHashSig) stay the
    * production path; this twin exists so the SIGNATURE computation
    * itself carries a full value oracle — the piece d11's soundness
    * pin (which value-checks emitted candidate PAIRS, not signatures)
    * cannot see. One explode + one digest per shingle + the
    * [[minHashSignatures]] aggregate shape — k min-lanes over ONE
    * doc_id shuffle of the un-multiplied shingle rows (not a k×-row
    * seed explode), unpivoted to long form after the aggregate. */
  def minHashSignaturesMd5(docs: DataFrame, k: Int = 8): DataFrame = {
    // ORACLE-TWIN ONLY, not a production MinHash family: the k lanes are
    // stride-3 slices of ONE md5, so adjacent lanes share 5 of their 8
    // hex chars — heavily correlated, weaker than independent minwise
    // permutations. k ≤ 8 keeps every slice inside the 32-char digest
    // (lane 7 reads chars 22-29); beyond that the slices silently
    // truncate. Production signatures are [[minHashSignaturesFast]].
    require(k >= 1 && k <= 8, s"md5 twin supports 1..8 lanes, got $k")
    val minCols = (0 until k).map(j =>
      min(expr(s"substring(h, ${j * 3 + 1}, 8)")).as(s"m$j"))
    val lanes = (0 until k).map(j =>
      s"named_struct('seed', CAST($j AS BIGINT), 'sig', m$j)").mkString(",")
    docs
      .withColumn("_ws", split(col("text"), " "))
      .withColumn("shingle", explode(expr(
        """transform(sequence(1, greatest(size(_ws) - 2, 1)),
           i -> concat_ws(' ', element_at(_ws, i),
             element_at(_ws, least(i + 1, size(_ws))),
             element_at(_ws, least(i + 2, size(_ws)))))""")))
      .withColumn("h", md5(col("shingle")))
      .groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
      .select(col("doc_id"), explode(expr(s"array($lanes)")).as("e"))
      .select(col("doc_id"), col("e.seed").as("seed"), col("e.sig").as("sig"))
  }

  /** The ENGINE-REPLAYABLE LSH BANDING twin (d17): the complete
    * candidate→verify pipeline of [[minHashNearDupPairs]], re-expressed
    * in arithmetic BOTH engines share so the banding JOIN itself —
    * the last oracle-able dedup surface d16's signature oracle could
    * not reach — carries a full value oracle. Same shape as the
    * production kernel: signatures (here the md5 lanes of
    * [[minHashSignaturesMd5]], wide form), bands of `rowsPerBand`
    * adjacent lanes with the band VALUE the plain string concat of its
    * lanes (pure-ASCII hex — no xxhash64 band digest, the one
    * DuckDB-inexpressible step in d04), bucket equi-join on
    * (band, value), `a_id < b_id` dedup, then exact word-set Jaccard
    * verification at `threshold` — byte-identical double arithmetic on
    * both engines (the d15 precedent). Scale shape is the production
    * kernel's: candidates meet through a skew-bounded equi-join on the
    * band value, verification is O(candidates), no all-pairs anywhere.
    * xxhash64 banding ([[minHashNearDupPairs]]) stays the production
    * path; this twin exists for the oracle. */
  def minHashBandedPairsMd5(docs: DataFrame, k: Int = 8, bands: Int = 4,
                            threshold: Double = 0.5): DataFrame = {
    require(k >= 1 && k <= 8, s"md5 twin supports 1..8 lanes, got $k")
    require(bands >= 1 && k % bands == 0,
      s"bands must divide k, got k=$k bands=$bands")
    val rowsPerBand = k / bands
    val minCols = (0 until k).map(j =>
      min(expr(s"substring(h, ${j * 3 + 1}, 8)")).as(s"m$j"))
    val wide = docs
      .withColumn("_ws", split(col("text"), " "))
      .withColumn("shingle", explode(expr(
        """transform(sequence(1, greatest(size(_ws) - 2, 1)),
           i -> concat_ws(' ', element_at(_ws, i),
             element_at(_ws, least(i + 1, size(_ws))),
             element_at(_ws, least(i + 2, size(_ws)))))""")))
      .withColumn("h", md5(col("shingle")))
      .groupBy(col("doc_id"))
      .agg(minCols.head, minCols.tail: _*)
    val bandCols = (0 until bands).map { b =>
      val lanes = (0 until rowsPerBand).map(r => col(s"m${b * rowsPerBand + r}"))
      struct(lit(b).as("band"), concat(lanes: _*).as("bv"))
    }
    // one row per doc — materialized so the bucket self-join below does
    // not re-run the shingle explode + md5 + 8-lane min aggregate per
    // join side (r21; the dominant cost of the twin)
    val buckets = eagerCut(wide)
      .select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bv").as("bv"))
    val cand = buckets.select(col("band"), col("bv"), col("doc_id").as("a_id"))
      .join(buckets.select(col("band"), col("bv"), col("doc_id").as("b_id")),
        Seq("band", "bv"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val ws = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("ws"))
    cand
      .join(ws.select(col("doc_id").as("a_id"), col("ws").as("a_ws")), Seq("a_id"))
      .join(ws.select(col("doc_id").as("b_id"), col("ws").as("b_ws")), Seq("b_id"))
      .withColumn("inter",
        size(array_intersect(col("a_ws"), col("b_ws"))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") /
        (size(col("a_ws")) + size(col("b_ws")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** One-pass MinHash signatures via the native `MinHashSig` expression
    * (graft.functions): no shingle explode, no 64-column aggregate, no
    * shuffle — the 100 TB path. Bit-compatible with
    * [[minHashSignatures]] (asserted in DedupSpec). */
  def minHashSignaturesFast(docs: DataFrame, k: Int = 64): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.MinHashSig.minhash_sig(col("text"), k).as("sig"))

  /** MinHash-LSH near-dup pairs: band the signature (bands × rowsPerBand
    * = k), bucket-join on (band, band-hash), verify candidates with exact
    * Jaccard ≥ threshold. */
  def minHashNearDupPairs(docs: DataFrame, k: Int = 64, bands: Int = 16,
                          threshold: Double = 0.7): DataFrame = {
    val rowsPerBand = k / bands
    val sig = minHashSignaturesFast(docs, k)
    val bandCols = (0 until bands).map { b =>
      val cols = (0 until rowsPerBand).map(r =>
        element_at(col("sig"), b * rowsPerBand + r + 1))
      struct(lit(b).as("band"), xxhash64(cols: _*).as("bh"))
    }
    val buckets = sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bh").as("bh"))
    val a = buckets.select(col("band"), col("bh"), col("doc_id").as("a_id"))
    val b = buckets.select(col("band"), col("bh"), col("doc_id").as("b_id"))
    val cand = a.join(b, Seq("band", "bh"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    // verify candidates with exact word-set Jaccard
    val ws = docs.select(col("doc_id"), array_distinct(split(col("text"), " ")).as("ws"))
    cand
      .join(ws.select(col("doc_id").as("a_id"), col("ws").as("a_ws")), Seq("a_id"))
      .join(ws.select(col("doc_id").as("b_id"), col("ws").as("b_ws")), Seq("b_id"))
      .withColumn("inter", size(array_intersect(col("a_ws"), col("b_ws"))).cast("long"))
      .withColumn("jaccard",
        col("inter").cast("double") /
          (size(col("a_ws")) + size(col("b_ws")) - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** 64-bit SimHash over whitespace tokens (unweighted): bit i of the
    * signature is the sign of Σ_tokens (±1 by bit i of xxhash64(token)). */
  def simHash(docs: DataFrame): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map { i =>
      sum(when(expr(s"(h >> $i) & 1") === 1, 1).otherwise(-1)).as(s"b$i")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, expr(s"cast(1 as bigint) << $i")).otherwise(0L)
    }.reduce((x, y) => x.bitwiseOR(y))
    agg.select(col("doc_id"), sig.as("simhash"))
  }

  /** One-pass SimHash via the native `SimHashSig` expression — no token
    * explode, no 64-column aggregate (bit-compatible with [[simHash]],
    * asserted in DedupSpec). */
  def simHashFast(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      graft.functions.SimHashSig.simhash_sig(col("text")).as("simhash"))

  /** SimHash near-dup pairs with Hamming distance ≤ maxDist, candidates
    * blocked on 4 × 16-bit signature bands. */
  def simHashNearDupPairs(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    // not materialized (r21, measured): the one-pass native signature
    // scan is cheaper to run per join side than a checkpoint roundtrip
    val sig = simHashFast(docs)
    val banded = sig.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), expr(s"(simhash >> ${b * 16}) & 65535").as("bk"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    val a = banded.select(col("band"), col("bk"), col("doc_id").as("a_id"), col("simhash").as("a_sig"))
    val b = banded.select(col("band"), col("bk"), col("doc_id").as("b_id"), col("simhash").as("b_sig"))
    a.join(b, Seq("band", "bk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** The ENGINE-REPLAYABLE SimHash BANDING twin (d18): d05's complete
    * sign-of-bit-sums → 16-bit-band blocking → Hamming-verify pipeline
    * with the per-token hash replaced by md5, its 64 bits taken as the
    * 16 hex digits' nibbles — `instr`/`strpos` over the ASCII hex
    * string plus shifts/masks, arithmetic BOTH engines share exactly
    * (the d16/d17 trick applied to SimHash). The banding join AND the
    * `bit_count(xor)` Hamming verify now carry a full value oracle;
    * the xxhash64 signature ([[simHashFast]], native `SimHashSig`)
    * stays the production path. Same shapes as [[simHashNearDupPairs]]:
    * one doc_id shuffle for the 64 bit-sums, band bucket equi-join,
    * O(candidates) verify. */
  def simHashBandedPairsMd5(docs: DataFrame, maxDist: Int = 3): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .withColumn("h", md5(col("tok")))
      .withColumn("ds", expr(
        "transform(sequence(1, 16), j -> instr('0123456789abcdef', substring(h, j, 1)) - 1)"))
    val bitSums = (0 until 64).map { i =>
      sum(when(expr(s"(element_at(ds, ${i / 4 + 1}) >> ${i % 4}) & 1") === 1, 1)
        .otherwise(-1)).as(s"b$i")
    }
    val agg = tok.groupBy(col("doc_id")).agg(bitSums.head, bitSums.tail: _*)
    // disjoint bit values, so + ≡ OR; the i=63 literal is negative
    // (two's complement), matching the SQL mirror's generated literal
    val sig = (0 until 64).map { i =>
      when(col(s"b$i") > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    // NOT materialized (r21, measured): the heavy token explode + md5 +
    // 64 bit-sums partial aggregate sits BELOW the doc_id exchange, so
    // ReuseExchange already shares it between the two banding join
    // sides — a localCheckpoint barrier only added write+read overhead
    // (2.55 s → 3.0 s isolated ×4)
    val sigDf = agg.select(col("doc_id"), sig.as("simhash"))
    val banded = sigDf.select(col("doc_id"), col("simhash"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"), expr(s"(simhash >> ${b * 16}) & 65535").as("bk"))): _*)).as("bb"))
      .select(col("doc_id"), col("simhash"), col("bb.band").as("band"), col("bb.bk").as("bk"))
    val a = banded.select(col("band"), col("bk"), col("doc_id").as("a_id"), col("simhash").as("a_sig"))
    val b = banded.select(col("band"), col("bk"), col("doc_id").as("b_id"), col("simhash").as("b_sig"))
    a.join(b, Seq("band", "bk"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).cast("long").as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxDist)
  }

  /** The DuckDB mirror of [[simHashBandedPairsMd5]], generated so the
    * 64 bit-sum/signature terms cannot drift from the Spark side (the
    * bandedScoredCtes precedent): same nibble extraction, same ±1
    * sums, same disjoint-bit-literal signature assembly, same banding
    * and `bit_count(xor(...))` verify. */
  private[operators] def simHashMd5OracleSql(maxDist: Int = 3): String = {
    val sums = (0 until 64).map(i =>
      s"sum(CASE WHEN (ds[${i / 4 + 1}] >> ${i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b$i")
      .mkString(",\n             ")
    val sigTerms = (0 until 64).map(i =>
      s"(CASE WHEN b$i > 0 THEN CAST(${1L << i} AS BIGINT) ELSE CAST(0 AS BIGINT) END)")
      .mkString("\n             + ")
    s"""WITH tok AS (
           SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS tok
           FROM documents),
         bits AS (
           SELECT doc_id, list_transform(range(1, 17),
             j -> strpos('0123456789abcdef',
               substring(md5(tok), CAST(j AS INTEGER), 1)) - 1) AS ds
           FROM tok),
         sums AS (
           SELECT doc_id,
             $sums
           FROM bits GROUP BY doc_id),
         sig AS MATERIALIZED (
           SELECT doc_id,
             $sigTerms AS simhash
           FROM sums),
         banded AS (
           SELECT doc_id, simhash, b AS band, (simhash >> (b * 16)) & 65535 AS bk
           FROM sig, (SELECT unnest(range(0, 4)) AS b)),
         cand AS (
           SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
           FROM banded a JOIN banded b
             ON a.band = b.band AND a.bk = b.bk AND a.doc_id < b.doc_id)
         SELECT a_id, b_id, hamming FROM cand WHERE hamming <= $maxDist
         ORDER BY a_id, b_id"""
  }

  /** Duplicate clusters: connected components over a near-dup pair
    * graph, as (doc_id, cluster_id = min doc_id in the component) —
    * the step that turns pairwise near-dup evidence into "keep one
    * representative per cluster" for corpus dedup.
    *
    * Pregel-style iterative min-label propagation: each round is one
    * join + min-aggregate (both shuffle on doc_id and AQE-re-plannable);
    * rounds ≈ graph diameter, tiny for near-dup clusters (members of a
    * cluster mostly pair directly). The only driver-side value per round
    * is the converged? count — no row data ever collects. At 100 TB with
    * adversarial long-chain graphs, swap the loop body for the O(log n)
    * large-star/small-star rounds (Kiveris et al., MapReduce CC) — the
    * same join+agg primitive, so the skeleton below holds. */
  def duplicateClusters(pairs: DataFrame): DataFrame = {
    // both edge directions from ONE pass over `pairs` — a self-union
    // would run the (possibly expensive) upstream pair pipeline twice
    val edges = pairs.select(explode(array(
        struct(col("a_id").as("u"), col("b_id").as("v")),
        struct(col("b_id").as("u"), col("a_id").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .distinct().cache()
    // seed with the 1-hop minimum (what round one would compute from
    // identity labels) — one aggregate replaces a whole propagation
    // round. Per-round lineage cut (`cutLineage`, also below): each
    // round's plan references the previous round's labels twice, so an
    // uncut logical tree doubles per round and ANALYSIS goes
    // exponential on long-diameter graphs — caching reuses the physical
    // result but does not truncate the logical plan.
    var (labels, labelsRdd) = cutLineage(edges.groupBy(col("u"))
      .agg(least(min(col("v")), col("u")).as("lbl")))
    // Convergence via the label-sum invariant: min-label propagation only
    // ever DECREASES each u's label, so the total is strictly monotone and
    // "sum unchanged" == "fixed point". That makes the convergence probe a
    // single-stage aggregate over the cached round result instead of a
    // join back against the previous labels (halves the jobs per round).
    // Decimal sum: immune to int64 overflow at any vertex-id scale.
    // Option-wrapped: sum over an EMPTY label table is SQL NULL (no
    // pairs at all ⇒ no clusters) — a bare getDecimal would NPE on the
    // first compare and crash the no-duplicates case.
    def lblSum(df: DataFrame): Option[java.math.BigDecimal] =
      Option(df.agg(sum(col("lbl").cast(org.apache.spark.sql.types.DecimalType(38, 0))))
        .head.getDecimal(0))
    var prevSum = lblSum(labels)
    var converged = false
    while (!converged) {
      val viaNeighbor = edges
        .join(labels.withColumnRenamed("u", "v"), Seq("v"))
        .select(col("u"), col("lbl"))
      val (next, nextRdd) = cutLineage(
        viaNeighbor.union(labels.select(col("u"), col("lbl")))
          .groupBy(col("u")).agg(min(col("lbl")).as("lbl")))
      val s = lblSum(next) // materializes this round's cached RDD
      converged = s == prevSum
      prevSum = s
      labelsRdd.unpersist(false)
      labels = next
      labelsRdd = nextRdd
    }
    edges.unpersist()
    // The final round's RDD cache is reclaimed by the ContextCleaner
    // once the returned DataFrame is unreferenced — no session-lifetime
    // leak. Caveat for a long-lived cluster deployment with executor
    // loss/dynamic allocation: cut lineage via reliable storage
    // (scratch parquet) instead; the shape of the loop is unchanged.
    labels.select(col("u").as("doc_id"), col("lbl").as("cluster_id"))
  }

  /** Connected components via alternating large-star / small-star
    * contraction (Kiveris et al., "Connected Components in MapReduce and
    * Beyond"): O(log n) rounds regardless of graph diameter — the
    * swap-in for adversarial long-chain graphs where plain min-label
    * propagation needs diameter rounds. Each operator is one
    * groupBy-min + join over the edge list (the same shuffle primitive
    * as the simple loop); at the fixpoint the edges form star forests
    * rooted at each component's minimum.
    *
    *  - large-star(u): m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u
    *  - small-star(u): over max→min directed edges, m = min(N(u) ∪ {u});
    *    emit (v, m) for v ∈ N(u) and (u, m)
    */
  def duplicateClustersLargeStar(pairs: DataFrame): DataFrame = {
    def sym(e: DataFrame): DataFrame =
      e.select(explode(array(
          struct(col("u"), col("v")),
          struct(col("v").as("u"), col("u").as("v")))).as("p"))
        .select(col("p.u").as("u"), col("p.v").as("v"))
    def largeStar(e: DataFrame): DataFrame = {
      val s = sym(e)
      val m = s.groupBy(col("u")).agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      s.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .filter(col("u") =!= col("v")).distinct()
    }
    def smallStar(e: DataFrame): DataFrame = {
      val d = e.select(greatest(col("u"), col("v")).as("u"),
        least(col("u"), col("v")).as("v")).filter(col("u") =!= col("v"))
      val m = d.groupBy(col("u")).agg(min(col("v")).as("m"))
      d.join(m, "u").select(col("v").as("u"), col("m").as("v"))
        .union(m.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v")).distinct()
    }
    // fingerprint for the fixpoint probe: order-independent, one stage
    // (bit_xor, not sum — summing full-range hashes overflows ANSI int64)
    def fp(e: DataFrame): (Long, Long) = {
      val r = e.agg(count(lit(1)), bit_xor(xxhash64(col("u"), col("v")))).head
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    // per-round lineage cut — see duplicateClusters
    var (edges, edgesRdd) = cutLineage(
      pairs.select(col("a_id").as("u"), col("b_id").as("v"))
        .filter(col("u") =!= col("v")).distinct())
    var prev = fp(edges)
    var converged = prev._1 == 0L // fp's count: no edges, no rounds
    var rounds = 0
    while (!converged) {
      val (next, nextRdd) = cutLineage(smallStar(largeStar(edges)))
      val cur = fp(next)
      converged = cur == prev
      prev = cur
      edgesRdd.unpersist(false)
      edges = next
      edgesRdd = nextRdd
      rounds += 1
      require(rounds < 200, "large-star/small-star failed to converge")
    }
    // star edges are (member → root); roots label themselves
    edges.select(col("u").as("doc_id"), col("v").as("cluster_id"))
      .union(edges.select(col("v").as("doc_id"), col("v").as("cluster_id")))
      .distinct()
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // the O(log n)-round components through the same oracle as d07
    "d09_clusters_largestar" -> ((s, d) =>
      duplicateClustersLargeStar(jaccardPairs(t(s, d, "documents")))
        .orderBy(col("doc_id"))),
    "d01_exact_dedup" -> ((s, d) =>
      exactDedupGroups(t(s, d, "documents")).orderBy(col("canonical_id"))),
    "d02_exact_dup_pairs" -> ((s, d) =>
      exactDupPairs(t(s, d, "documents")).orderBy(col("a_id"), col("b_id"))),
    "d10_containment_pairs" -> ((s, d) =>
      containmentPairs(t(s, d, "documents")).orderBy(col("a_id"), col("b_id"))),
    "d03_jaccard_pairs" -> ((s, d) =>
      jaccardPairs(t(s, d, "documents")).orderBy(col("a_id"), col("b_id"))),
    "d07_dup_clusters" -> ((s, d) =>
      duplicateClusters(jaccardPairs(t(s, d, "documents")))
        .orderBy(col("doc_id"))),
    // QUALITY-AWARE representative per near-dup cluster: d08 keeps the
    // min-id member — the arbitrary-but-deterministic baseline; real
    // curation keeps the BEST member (Gopher/RefinedWeb drop the lower-
    // quality twin). Per cluster: the (t03 quality desc, doc_id asc)
    // argmax, as a lexicographic struct-max aggregate over the
    // (members ⋈ quality) join — no per-cluster window, one shuffle on
    // cluster_id. Quality is t03's exact double (integer-ratio IEEE
    // arithmetic — cross-engine identical), so the recursive-CTE
    // closure oracle extends with the same quality replay.
    "d20_quality_representatives" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val members = duplicateClusters(jaccardPairs(docs))
        .join(TextAnalysis.qualityScore(docs)
          .select(col("doc_id"), col("quality")), Seq("doc_id"))
      members.groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_members"),
          max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("m"))
        .select(col("cluster_id"), col("n_members"),
          (-col("m.nid")).as("rep_id"), col("m.quality").as("rep_quality"))
        .orderBy(col("cluster_id"))
    }),
    // the dedup END-PRODUCT: the corpus with every non-representative
    // cluster member dropped (survivors = cluster minima + singletons)
    "d08_dedup_corpus" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val losers = duplicateClusters(jaccardPairs(docs))
        .filter(col("doc_id") =!= col("cluster_id")).select(col("doc_id"))
      docs.join(losers, Seq("doc_id"), "left_anti")
        .select(col("doc_id")).orderBy(col("doc_id"))
    }),
    // incremental ingestion: docs with id % 10 == 0 play the arriving
    // shard, the rest the already-deduped lake
    "d14_incremental_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      incrementalDedup(docs.filter(col("doc_id") % 10 =!= 0),
          docs.filter(col("doc_id") % 10 === 0))
        .orderBy(col("doc_id"))
    }),
    "d04_minhash_neardups" -> ((s, d) =>
      minHashNearDupPairs(t(s, d, "documents")).orderBy(col("a_id"), col("b_id"))),
    "d05_simhash_neardups" -> ((s, d) =>
      simHashNearDupPairs(t(s, d, "documents")).orderBy(col("a_id"), col("b_id"))),
    // the md5 twin of the MinHash signature pass — full value oracle
    // for the sketch itself (see minHashSignaturesMd5 doc)
    "d16_minhash_md5" -> ((s, d) =>
      minHashSignaturesMd5(t(s, d, "documents"))
        .orderBy(col("doc_id"), col("seed"))),
    // the md5 twin of the complete LSH band→bucket-join→verify
    // pipeline — the banding JOIN itself now carries a value oracle
    // (see minHashBandedPairsMd5 doc)
    "d17_banded_pairs_md5" -> ((s, d) =>
      minHashBandedPairsMd5(t(s, d, "documents"))
        .orderBy(col("a_id"), col("b_id"))),
    // the md5 twin of d05's complete band→join→Hamming-verify pipeline
    "d18_simhash_banded_md5" -> ((s, d) =>
      simHashBandedPairsMd5(t(s, d, "documents"))
        .orderBy(col("a_id"), col("b_id"))),
    "d15_sorted_neighborhood" -> ((s, d) =>
      sortedNeighborhoodPairs(t(s, d, "documents"))),
    // SOUNDNESS PIN for d04: every emitted pair must genuinely clear the
    // 0.7 word-set Jaccard threshold, re-derived through an INDEPENDENT
    // arithmetic path — token explode + distinct + equi-join for the
    // intersection, countDistinct for the set sizes, integer milli-
    // threshold compare — none of the kernel's array_intersect/size/
    // double-division machinery. A violation row = a pair the kernel
    // emitted whose independently-recomputed overlap is sub-threshold
    // or whose reported score disagrees with inter/union. Cost is
    // O(emitted pairs × doc tokens) — the pin runs on the FULL corpus at
    // any scale (the earlier form diffed against a quadratic brute-force
    // ground truth and was the slowest query in the bench; a subset pin
    // checks soundness only, which per-pair recompute gives linearly —
    // completeness is d12's pigeonhole territory and DedupSpec's
    // exhaustive unit-scale case).
    "d11_minhash_subset_pin" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tok = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("w")).distinct()
      val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      // pairs-sized — materialized so the whole MinHash kernel runs
      // once, not once for the intersection join and once for the
      // verdict join (r21)
      val emitted = eagerCut(minHashNearDupPairs(docs))
      val inter = emitted
        .join(tok.select(col("doc_id").as("a_id"), col("w")), Seq("a_id"))
        .join(tok.select(col("doc_id").as("b_id"), col("w")), Seq("b_id", "w"))
        .groupBy(col("a_id"), col("b_id")).agg(count(lit(1)).as("inter"))
      emitted
        .join(inter, Seq("a_id", "b_id"), "left_outer")
        .join(sizes.select(col("doc_id").as("a_id"), col("n").as("na")), Seq("a_id"))
        .join(sizes.select(col("doc_id").as("b_id"), col("n").as("nb")), Seq("b_id"))
        .withColumn("i", coalesce(col("inter"), lit(0L)))
        .filter(col("a_id") >= col("b_id") ||
          col("i") * 1000 < lit(700) * (col("na") + col("nb") - col("i")) ||
          col("jaccard") =!= col("i").cast("double") /
            (col("na") + col("nb") - col("i")).cast("double"))
        .select(col("a_id"), col("b_id"))
        .orderBy(col("a_id"), col("b_id"))
    }),
    // PIN for d05, both directions linear-BOUNDED (the r6 form diffed
    // the banded output against a full crossJoin brute side — the one
    // cartesian product left in the catalog; gone now):
    //  - SOUNDNESS, O(emitted): every banded pair re-joins the
    //    signature table and has its Hamming distance recomputed from
    //    the two sigs — a violation is over-threshold or disagrees
    //    with the reported distance.
    //  - COMPLETENESS on a deterministic hash-sampled doc subset:
    //    all-pairs within the sample (window-free tiled equi-join, no
    //    cartesian node) must be ⊆ the banded output. Pigeonhole
    //    (4 bands, maxDist 3 < 4) says every within-distance pair
    //    shares an untouched band, so a sampled pair missing from the
    //    banded output is a real defect; the sample modulus is the
    //    knob that bounds the brute side at any corpus size.
    "d12_simhash_equality_pin" -> ((s, d) =>
      simHashPinViolations(t(s, d, "documents"), maxDist = 3, sampleMod = 4))
  )

  /** Blocking-free exact word-set Jaccard pairs — the ground-truth side
    * of DedupSpec's exhaustive unit-scale containment case (the catalog
    * d11 pin recomputes per emitted pair instead, staying linear at any
    * bench scale). Quadratic BY DESIGN, never a production path; a
    * distinct-word-count band prunes pairs that cannot reach the
    * threshold (J ≥ t ⇒ t·|B| ≤ |A| ≤ |B|/t) before any intersect. */
  private[graft] def exactJaccardPairsBrute(docs: DataFrame, threshold: Double): DataFrame = {
    val ws = docs.select(col("doc_id"),
      array_distinct(split(col("text"), " ")).as("ws"))
      .withColumn("n", size(col("ws")).cast("long"))
    val a = ws.select(col("doc_id").as("a_id"), col("ws").as("a_ws"), col("n").as("a_n"))
    val b = ws.select(col("doc_id").as("b_id"), col("ws").as("b_ws"), col("n").as("b_n"))
    val t1000 = (threshold * 1000).toLong
    a.crossJoin(b)
      .filter(col("a_id") < col("b_id") &&
        col("a_n") * 1000 >= col("b_n") * t1000 && col("b_n") * 1000 >= col("a_n") * t1000)
      .withColumn("inter", size(array_intersect(col("a_ws"), col("b_ws"))).cast("long"))
      .filter(col("inter") * 1000 >= (col("a_n") + col("b_n") - col("inter")) * t1000)
      .select(col("a_id"), col("b_id"))
  }

  /** The two verification sides of the d12 pin (see [[queries]]).
    *
    * Soundness recomputes Hamming per EMITTED pair — two equi-joins
    * back to the signature table, O(output) at any scale. The
    * completeness direction brutes all pairs of a hash-sampled doc
    * subset: each sampled sig gets a deterministic tile `g ∈ [0,
    * tiles)` and the unordered pair (x∈g₁ ≤ y∈g₂) meets exactly once
    * on equi-key (g₁, g₂) — the a-side replicates to (g, g..T-1), the
    * b-side to (0..g, g) — so the plan carries no cartesian/BNLJ node
    * and no single-key window, and `sampleMod` (scaled ∝ corpus size /
    * target sample) bounds the quadratic term. Only 16-byte sigs ride
    * the tile join. */
  private[graft] def simHashPinViolations(docs: DataFrame, maxDist: Int,
                                          sampleMod: Int, tiles: Int = 8): DataFrame = {
    val sig = simHashFast(docs)
    val emitted = simHashNearDupPairs(docs, maxDist)
    val unsound = emitted
      .join(sig.select(col("doc_id").as("a_id"), col("simhash").as("a_sig")), Seq("a_id"))
      .join(sig.select(col("doc_id").as("b_id"), col("simhash").as("b_sig")), Seq("b_id"))
      .withColumn("recomputed",
        bit_count(col("a_sig").bitwiseXOR(col("b_sig"))).cast("long"))
      .filter(col("recomputed") > maxDist || col("recomputed") =!= col("hamming"))
      .select(col("a_id"), col("b_id"), col("hamming"))
    val missed = tiledSampledSigPairs(sig, sampleMod, tiles)
      .filter(col("hamming") <= maxDist)
      .join(emitted.select(col("a_id"), col("b_id")), Seq("a_id", "b_id"), "left_anti")
    unsound.union(missed).orderBy(col("a_id"), col("b_id"))
  }

  /** All-pairs Hamming over a deterministic hash sample of a
    * (doc_id, simhash) table, with NO cartesian node: each sampled sig
    * gets a hash tile `g ∈ [0, tiles)` and the unordered pair
    * (x∈g₁ ≤ y∈g₂) meets exactly once on equi-key (g₁, g₂) — the
    * a-side replicates to (g, g..T-1), the b-side to (0..g, g). Every
    * key carries ~n_sampled/tiles rows per side, so the grid is
    * shuffle-parallel with no single-key window and no straggler.
    * Returns every sampled (a_id < b_id) pair with its distance. */
  private[graft] def tiledSampledSigPairs(sig: DataFrame, sampleMod: Int,
                                          tiles: Int): DataFrame = {
    val sampled = sig
      .filter(pmod(xxhash64(col("doc_id")), lit(sampleMod)) === 0)
      .withColumn("g", pmod(xxhash64(col("doc_id"), lit(1)), lit(tiles)).cast("int"))
    val aSide = sampled.select(col("g").as("ga"),
      explode(sequence(col("g"), lit(tiles - 1))).as("gb"),
      col("doc_id").as("x_id"), col("simhash").as("x_sig"))
    val bSide = sampled.select(explode(sequence(lit(0), col("g"))).as("ga"),
      col("g").as("gb"), col("doc_id").as("y_id"), col("simhash").as("y_sig"))
    aSide.join(bSide, Seq("ga", "gb"))
      .filter(col("ga") < col("gb") || col("x_id") < col("y_id"))
      .select(least(col("x_id"), col("y_id")).as("a_id"),
        greatest(col("x_id"), col("y_id")).as("b_id"),
        bit_count(col("x_sig").bitwiseXOR(col("y_sig"))).cast("long").as("hamming"))
  }

  def oracleSql: Map[String, String] = Map(
    // the pins assert containment/equality holds EXACTLY: expected = ∅
    "d11_minhash_subset_pin" ->
      """SELECT CAST(NULL AS BIGINT) AS a_id, CAST(NULL AS BIGINT) AS b_id
         WHERE 1 = 0""",
    "d12_simhash_equality_pin" ->
      """SELECT CAST(NULL AS BIGINT) AS a_id, CAST(NULL AS BIGINT) AS b_id,
         CAST(NULL AS BIGINT) AS hamming WHERE 1 = 0""",
    // the delta-vs-(corpus ∪ earlier-delta) near-dup predicate, written
    // directly: a delta doc survives iff no blocked Jaccard hit
    "d14_incremental_dedup" ->
      """WITH delta AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 = 0),
         corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 10 <> 0),
         rhs AS (
           SELECT doc_id, text, 0 AS is_delta FROM corpus
           UNION ALL SELECT doc_id, text, 1 FROM delta),
         hits AS (
           SELECT DISTINCT a.doc_id
           FROM delta a JOIN rhs b
           ON substring(a.text, 1, 20) = substring(b.text, 1, 20)
             AND (b.is_delta = 0 OR b.doc_id < a.doc_id)
           WHERE len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                    list_distinct(string_split(b.text, ' ')))) * 1000
             >= 500 * (len(list_distinct(string_split(a.text, ' ')))
               + len(list_distinct(string_split(b.text, ' ')))
               - len(list_intersect(list_distinct(string_split(a.text, ' ')),
                                    list_distinct(string_split(b.text, ' '))))))
         SELECT doc_id FROM delta WHERE doc_id NOT IN (SELECT doc_id FROM hits)
         ORDER BY doc_id""",
    // DuckDB replays the md5 signature pass exactly: same shingles,
    // one digest per shingle, the same 8-hex-char slices, string min
    // over ASCII hex
    "d16_minhash_md5" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT doc_id, md5(unnest(list_transform(
             range(1, greatest(len(w) - 2, 1) + 1),
             i -> concat_ws(' ', w[i], w[least(i + 1, len(w))],
               w[least(i + 2, len(w))])))) AS h
           FROM d),
         sd AS (SELECT unnest(range(0, 8)) AS seed)
         SELECT doc_id, CAST(seed AS BIGINT) AS seed,
           min(substring(h, CAST(seed * 3 + 1 AS INTEGER), 8)) AS sig
         FROM sh CROSS JOIN sd
         GROUP BY doc_id, seed ORDER BY doc_id, seed""",
    // DuckDB replays the ENTIRE LSH pipeline: the d16 signature pass
    // wide-form, band values as lane concats, the bucket equi-join,
    // and the exact-Jaccard verify — both engines do the same ASCII
    // string mins/concats and the same double division (d15 precedent)
    "d17_banded_pairs_md5" ->
      """WITH d AS (
           SELECT doc_id, string_split(text, ' ') AS w FROM documents),
         sh AS (
           SELECT doc_id, md5(unnest(list_transform(
             range(1, greatest(len(w) - 2, 1) + 1),
             i -> concat_ws(' ', w[i], w[least(i + 1, len(w))],
               w[least(i + 2, len(w))])))) AS h
           FROM d),
         sig AS (
           SELECT doc_id,
             min(substring(h, 1, 8)) AS m0, min(substring(h, 4, 8)) AS m1,
             min(substring(h, 7, 8)) AS m2, min(substring(h, 10, 8)) AS m3,
             min(substring(h, 13, 8)) AS m4, min(substring(h, 16, 8)) AS m5,
             min(substring(h, 19, 8)) AS m6, min(substring(h, 22, 8)) AS m7
           FROM sh GROUP BY doc_id),
         bk AS (
           SELECT doc_id, 0 AS band, m0 || m1 AS bv FROM sig
           UNION ALL SELECT doc_id, 1, m2 || m3 FROM sig
           UNION ALL SELECT doc_id, 2, m4 || m5 FROM sig
           UNION ALL SELECT doc_id, 3, m6 || m7 FROM sig),
         cand AS (
           SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
           FROM bk a JOIN bk b
             ON a.band = b.band AND a.bv = b.bv AND a.doc_id < b.doc_id),
         ws AS (
           SELECT doc_id, list_distinct(string_split(text, ' ')) AS ws
           FROM documents),
         v AS (
           SELECT a_id, b_id,
             CAST(len(list_intersect(wa.ws, wb.ws)) AS DOUBLE)
               / (len(wa.ws) + len(wb.ws) - len(list_intersect(wa.ws, wb.ws)))
               AS jaccard
           FROM cand
           JOIN ws wa ON wa.doc_id = a_id
           JOIN ws wb ON wb.doc_id = b_id)
         SELECT a_id, b_id, jaccard FROM v WHERE jaccard >= 0.5
         ORDER BY a_id, b_id""",
    // DuckDB replays d05's whole SimHash pipeline over md5 nibbles —
    // bit-sums, signature assembly, banding, bit_count(xor) verify
    // (SQL generated beside the kernel so the 64 terms cannot drift)
    "d18_simhash_banded_md5" -> simHashMd5OracleSql(),
    // both engines compare strings bytewise (UTF8String / memcmp), so
    // the global (sort_key, doc_id) order — and therefore the candidate
    // neighborhoods — are identical
    "d15_sorted_neighborhood" ->
      """WITH k AS (
           SELECT doc_id, substring(text, 1, 24) AS sort_key,
             list_distinct(string_split(text, ' ')) AS ws
           FROM documents),
         r AS (
           SELECT doc_id, ws,
             row_number() OVER (ORDER BY sort_key, doc_id) AS g
           FROM k),
         p AS (
           SELECT a.doc_id AS a_id0, b.doc_id AS b_id0, a.ws AS a_ws, b.ws AS b_ws
           FROM r a JOIN r b ON b.g - a.g BETWEEN 1 AND 2),
         v AS (
           SELECT least(a_id0, b_id0) AS a_id, greatest(a_id0, b_id0) AS b_id,
             CAST(len(list_intersect(a_ws, b_ws)) AS DOUBLE)
               / (len(a_ws) + len(b_ws) - len(list_intersect(a_ws, b_ws))) AS jaccard
           FROM p)
         SELECT a_id, b_id, jaccard FROM v WHERE jaccard >= 0.5
         ORDER BY a_id, b_id""",
    "d01_exact_dedup" ->
      """SELECT min(doc_id) AS canonical_id, count(*) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY canonical_id""",
    "d02_exact_dup_pairs" ->
      """SELECT a.doc_id AS a_id, b.doc_id AS b_id
         FROM documents a JOIN documents b
         ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
         ORDER BY a_id, b_id""",
    "d10_containment_pairs" ->
      """SELECT a_id, b_id,
         CAST(len(list_intersect(a_ws, b_ws)) AS BIGINT) AS inter,
         CAST(least(len(a_ws), len(b_ws)) AS BIGINT) AS msize,
         (CAST(len(list_intersect(a_ws, b_ws)) AS BIGINT) * 10000)
           // least(len(a_ws), len(b_ws)) AS cont_x1e4
         FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 list_distinct(string_split(a.text, ' ')) AS a_ws,
                 list_distinct(string_split(b.text, ' ')) AS b_ws
               FROM documents a JOIN documents b
               ON substring(a.text, 1, 20) = substring(b.text, 1, 20)
                 AND a.doc_id < b.doc_id)
         WHERE len(list_intersect(a_ws, b_ws)) * 100 >= 60 * least(len(a_ws), len(b_ws))
         ORDER BY a_id, b_id""",
    "d03_jaccard_pairs" ->
      """SELECT a_id, b_id,
         CAST(len(list_intersect(a_ws, b_ws)) AS DOUBLE)
           / (len(a_ws) + len(b_ws) - len(list_intersect(a_ws, b_ws))) AS jaccard
         FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                 list_distinct(string_split(a.text, ' ')) AS a_ws,
                 list_distinct(string_split(b.text, ' ')) AS b_ws
               FROM documents a JOIN documents b
               ON substring(a.text, 1, 20) = substring(b.text, 1, 20)
                 AND a.doc_id < b.doc_id)
         WHERE CAST(len(list_intersect(a_ws, b_ws)) AS DOUBLE)
           / (len(a_ws) + len(b_ws) - len(list_intersect(a_ws, b_ws))) >= 0.5
         ORDER BY a_id, b_id""",
    // connected components as a transitive-closure fixpoint (the
    // recursive CTE mirrors the engine's min-label propagation loop);
    // d09 (large-star/small-star) must produce the identical labeling
    "d09_clusters_largestar" ->
      """WITH RECURSIVE pairs AS (
           SELECT a_id, b_id
           FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   list_distinct(string_split(a.text, ' ')) AS a_ws,
                   list_distinct(string_split(b.text, ' ')) AS b_ws
                 FROM documents a JOIN documents b
                 ON substring(a.text, 1, 20) = substring(b.text, 1, 20)
                   AND a.doc_id < b.doc_id)
           WHERE CAST(len(list_intersect(a_ws, b_ws)) AS DOUBLE)
             / (len(a_ws) + len(b_ws) - len(list_intersect(a_ws, b_ws))) >= 0.5),
         edges AS (
           SELECT a_id AS u, b_id AS v FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach(u, v) AS (
           SELECT u, u FROM edges
           UNION
           SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u)
         SELECT u AS doc_id, min(v) AS cluster_id
         FROM reach GROUP BY u ORDER BY doc_id""",
    "d07_dup_clusters" ->
      """WITH RECURSIVE pairs AS (
           SELECT a_id, b_id
           FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   list_distinct(string_split(a.text, ' ')) AS a_ws,
                   list_distinct(string_split(b.text, ' ')) AS b_ws
                 FROM documents a JOIN documents b
                 ON substring(a.text, 1, 20) = substring(b.text, 1, 20)
                   AND a.doc_id < b.doc_id)
           WHERE CAST(len(list_intersect(a_ws, b_ws)) AS DOUBLE)
             / (len(a_ws) + len(b_ws) - len(list_intersect(a_ws, b_ws))) >= 0.5),
         edges AS (
           SELECT a_id AS u, b_id AS v FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach(u, v) AS (
           SELECT u, u FROM edges
           UNION
           SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u)
         SELECT u AS doc_id, min(v) AS cluster_id
         FROM reach GROUP BY u ORDER BY doc_id""",
    // the d07 closure with the t03 quality formula replayed per member
    // and the (quality desc, doc_id asc) winner per cluster
    "d20_quality_representatives" ->
      """WITH RECURSIVE pairs AS (
           SELECT a_id, b_id
           FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   list_distinct(string_split(a.text, ' ')) AS a_ws,
                   list_distinct(string_split(b.text, ' ')) AS b_ws
                 FROM documents a JOIN documents b
                 ON substring(a.text, 1, 20) = substring(b.text, 1, 20)
                   AND a.doc_id < b.doc_id)
           WHERE CAST(len(list_intersect(a_ws, b_ws)) AS DOUBLE)
             / (len(a_ws) + len(b_ws) - len(list_intersect(a_ws, b_ws))) >= 0.5),
         edges AS (
           SELECT a_id AS u, b_id AS v FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach(u, v) AS (
           SELECT u, u FROM edges
           UNION
           SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
         clusters AS (
           SELECT u AS doc_id, min(v) AS cluster_id FROM reach GROUP BY u),
         q AS (
           SELECT doc_id,
             (CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws))
               * (1.0 - CAST(len(list_filter(ws, w -> w IN ('the', 'a'))) AS DOUBLE)
                   / len(ws)) AS quality
           FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)),
         ranked AS (
           SELECT c.cluster_id, c.doc_id, q.quality,
             row_number() OVER (PARTITION BY c.cluster_id
               ORDER BY q.quality DESC, c.doc_id) AS rk,
             count(*) OVER (PARTITION BY c.cluster_id) AS n_members
           FROM clusters c JOIN q ON q.doc_id = c.doc_id)
         SELECT cluster_id, CAST(n_members AS BIGINT) AS n_members,
           doc_id AS rep_id, quality AS rep_quality
         FROM ranked WHERE rk = 1 ORDER BY cluster_id""",
    "d08_dedup_corpus" ->
      """WITH RECURSIVE pairs AS (
           SELECT a_id, b_id
           FROM (SELECT a.doc_id AS a_id, b.doc_id AS b_id,
                   list_distinct(string_split(a.text, ' ')) AS a_ws,
                   list_distinct(string_split(b.text, ' ')) AS b_ws
                 FROM documents a JOIN documents b
                 ON substring(a.text, 1, 20) = substring(b.text, 1, 20)
                   AND a.doc_id < b.doc_id)
           WHERE CAST(len(list_intersect(a_ws, b_ws)) AS DOUBLE)
             / (len(a_ws) + len(b_ws) - len(list_intersect(a_ws, b_ws))) >= 0.5),
         edges AS (
           SELECT a_id AS u, b_id AS v FROM pairs
           UNION SELECT b_id, a_id FROM pairs),
         reach(u, v) AS (
           SELECT u, u FROM edges
           UNION
           SELECT e.u, r.v FROM edges e JOIN reach r ON e.v = r.u),
         losers AS (
           SELECT u AS doc_id FROM reach GROUP BY u HAVING min(v) <> u)
         SELECT doc_id FROM documents
         WHERE doc_id NOT IN (SELECT doc_id FROM losers)
         ORDER BY doc_id"""
  )
}
