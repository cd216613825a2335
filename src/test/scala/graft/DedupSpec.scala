package graft

import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** MinHash: the one-pass native expression must be bit-compatible with
  * the composable explode + k-min-aggregates formulation — same hashes,
  * same signatures, therefore same LSH buckets and the same near-dup
  * pairs at any scale. */
class DedupSpec extends SparkSpec {

  private val docs =
    graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")

  test("native minhash_sig == explode+aggregate signatures, every lane") {
    val k = 64
    val agg = Dedup.minHashSignatures(docs, k)
    val fast = Dedup.minHashSignaturesFast(docs, k)
      .select(col("doc_id") +: (0 until k).map(j =>
        element_at(col("sig"), j + 1).as(s"m$j")): _*)
    assert(agg.exceptAll(fast).isEmpty && fast.exceptAll(agg).isEmpty,
      "signature mismatch between native and aggregate formulations")
  }

  test("native simhash_sig == explode+aggregate simhash, every doc") {
    val agg = Dedup.simHash(docs)
    val fast = Dedup.simHashFast(docs)
    assert(agg.exceptAll(fast).isEmpty && fast.exceptAll(agg).isEmpty,
      "simhash mismatch between native and aggregate formulations")
  }

  test("near-dup pairs survive the signature-path swap (self-consistency)") {
    val pairs = Dedup.minHashNearDupPairs(docs).collect()
    // every reported pair must genuinely clear the Jaccard threshold
    assert(pairs.forall(_.getDouble(2) >= 0.7))
  }

  test("banded near-dups ⊆ blocking-free exact pair set (exhaustive, unit scale)") {
    // the full-containment form of the d11 pin: affordable here on the
    // 500-doc corpus, quadratic-by-design so it stays OUT of the
    // per-round catalog (d11 itself recomputes per emitted pair)
    val extra = Dedup.minHashNearDupPairs(docs).select(col("a_id"), col("b_id"))
      .except(Dedup.exactJaccardPairsBrute(docs, 0.7).select(col("a_id"), col("b_id")))
    assert(extra.isEmpty, s"banded kernel emitted pairs brute force rejects")
  }

  test("simHashPinViolations: sampleMod=1 makes it the FULL equality pin — empty (exhaustive, unit scale)") {
    // with every doc sampled, the completeness side checks every pair,
    // i.e. the r6 crossJoin pin's exact semantics without the cartesian:
    // banded output == brute Hamming set, both directions
    assert(Dedup.simHashPinViolations(docs, 3, 1).isEmpty,
      "simhash banded kernel disagrees with the exhaustive Hamming pair set")
  }

  test("tiledSampledSigPairs: every pair exactly once, distances right, sampling deterministic") {
    import spark.implicits._
    val n = 120
    val sig = (1 to n).map(i => (i.toLong, i.toLong * 2654435761L))
      .toDF("doc_id", "simhash")
    // sampleMod=1 → full grid: n(n-1)/2 unordered pairs, each ONCE, with
    // the true xor-popcount distance (checked against a driver-side ref)
    val got = Dedup.tiledSampledSigPairs(sig, 1, 4)
      .as[(Long, Long, Long)].collect()
    assert(got.length == n * (n - 1) / 2, s"grid missed/duplicated pairs: ${got.length}")
    assert(got.map(p => (p._1, p._2)).toSet.size == got.length)
    val sigs = (1 to n).map(i => i.toLong -> i.toLong * 2654435761L).toMap
    assert(got.forall { case (a, b, h) =>
      a < b && h == java.lang.Long.bitCount(sigs(a) ^ sigs(b)) })
    // sampleMod>1 yields a strict, pair-consistent subset of the full grid
    val sub = Dedup.tiledSampledSigPairs(sig, 3, 4).as[(Long, Long, Long)].collect()
    assert(sub.toSet.subsetOf(got.toSet), "sampled grid invented a pair")
    assert(sub.nonEmpty && sub.length < got.length, "sampling had no effect")
  }

  test("boundedPairJoin: one 1000-row hot block → every join key ≤ cap per side, output complete") {
    import spark.implicits._
    val cap = 64
    val n = 1000
    // the adversarial case: EVERY row lands in the SAME block (one hot
    // boilerplate prefix) — naive blocking would put all n²/2 pairs on
    // one task
    val base = (1 to n).map(i => ("hot", i.toLong, s"payload$i"))
      .toDF("blk", "id", "p")
    val (a, b) = Dedup.boundedPairSides(base, cap)
    val amax = a.groupBy("blk", "_ga", "_gb").count().agg(max("count")).head.getLong(0)
    val bmax = b.groupBy("blk", "_ga", "_gb").count().agg(max("count")).head.getLong(0)
    assert(amax <= cap, s"a-side key group $amax exceeds cap $cap")
    assert(bmax <= cap, s"b-side key group $bmax exceeds cap $cap")
    // output-identical: all n·(n-1)/2 pairs, each exactly once
    val pairs = Dedup.boundedPairJoin(base, cap)
      .select(col("a_id"), col("b_id")).collect()
    assert(pairs.length == n * (n - 1) / 2)
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSet.size == pairs.length)
    assert(pairs.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("boundedCrossPairJoin: hot shared block → complete asymmetric pair set, no right self-pairs") {
    import spark.implicits._
    val cap = 16
    // one hot block on both sides (100 left × 250 right) plus a
    // left-only and a right-only block (must emit nothing)
    val left = ((1 to 100).map(i => ("hot", i.toLong, s"L$i")) :+
      (("lonlyblk", 900L, "L900"))).toDF("blk", "id", "p")
    val right = ((101 to 350).map(i => ("hot", i.toLong, s"R$i")) :+
      (("ronlyblk", 901L, "R901"))).toDF("blk", "id", "p")
    val out = Dedup.boundedCrossPairJoin(left, right, cap)
      .select(col("a_id"), col("b_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 100 * 250, s"expected the full cross set, got ${out.length}")
    assert(out.toSet.size == out.length, "a pair met more than once")
    assert(out.forall { case (a, b) => a <= 100 && b >= 101 },
      "left/right sides leaked across")
  }

  test("incrementalDedup: exact copies, near-dups of corpus, and later near-dups of delta all drop") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "totally unrelated corpus text about other things")
    ).toDF("doc_id", "text")
    val delta = Seq(
      (10L, "alpha beta gamma delta epsilon zeta eta theta"),   // exact copy of 1 → drop
      (20L, "alpha beta gamma delta epsilon zeta eta iota"),    // near-dup of 1 → drop
      (30L, "fresh new document with wholly original words"),   // survives
      (40L, "fresh new document with wholly original terms")    // near-dup of EARLIER delta 30 → drop
    ).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(corpus, delta)
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(30L), s"expected only 30 to survive, got ${out.toSeq}")
  }

  test("jaccardPairs through the bounded kernel == naive blocked join (mixed blocks)") {
    import spark.implicits._
    // 3 blocks of very different sizes, incl. one above the cap used by
    // blockedWordSetPairs (256): same-prefix docs with drifting suffixes
    val docs = ((1 to 300).map { i =>
      (i.toLong, f"shared twenty char.. tail ${i / 3}%d extra ${i}%d")
    } ++ (1000L to 1004L).map { i =>
      (i, s"another prefix here.. body $i")
    }).toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(docs, 0.5)
      .select("a_id", "b_id", "jaccard").as[(Long, Long, Double)].collect().toSet
    // naive reference: plain blocked self-join, no skew handling
    val base = docs.select(
      substring(col("text"), 1, 20).as("blk"), col("doc_id"),
      array_distinct(split(col("text"), " ")).as("ws"))
    val naive = base.as("x").join(base.as("y"), Seq("blk"))
      .filter($"x.doc_id" < $"y.doc_id")
      .select($"x.doc_id", $"y.doc_id",
        size(array_intersect($"x.ws", $"y.ws")).cast("double").as("i"),
        size($"x.ws").cast("double").as("sa"), size($"y.ws").cast("double").as("sb"))
      .withColumn("j", col("i") / (col("sa") + col("sb") - col("i")))
      .filter(col("j") >= 0.5)
      .select($"x.doc_id", $"y.doc_id", col("j")).as[(Long, Long, Double)]
      .collect().toSet
    assert(got == naive, s"bounded kernel diverged: ${got.size} vs ${naive.size} pairs")
  }

  test("md5 twins: semantic grounding on a constructed fixture") {
    // the tri-scale oracles prove BOTH ENGINES AGREE; this grounds the
    // twins' semantics independently — near-identical docs must pair,
    // unrelated docs must not, through every twin pipeline
    import spark.implicits._
    val fixture = Seq(
      (1L, "the quick brown fox jumps over the lazy dog near the river bank today"),
      (2L, "the quick brown fox jumps over the lazy dog near the river bank tonight"),
      (3L, "completely different content about spark catalyst optimizer internals rules"),
      (4L, "the quick brown fox jumps over the lazy dog near the river bank today")
    ).toDF("doc_id", "text")
    // d17: banded MinHash-md5 — the exact pair AND both near-identical
    // pairs survive banding + the 0.5-Jaccard verify; nothing pairs
    // with the unrelated doc 3
    val mh = Dedup.minHashBandedPairsMd5(fixture)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(mh == Set((1L, 2L), (1L, 4L), (2L, 4L)), s"d17 twin emitted $mh")
    // d18: banded SimHash-md5 — token-set identity (docs 1 and 4) is
    // the scheme's guaranteed-recall case: hamming 0, every band
    // matches. A one-token edit at 14 tokens legitimately flips enough
    // near-balanced bit-sums to miss all four bands — that selectivity
    // is the point of banding, so (1,2) is NOT asserted either way.
    val sh = Dedup.simHashBandedPairsMd5(fixture)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    assert(sh.contains((1L, 4L)) && !sh.exists(p => p._1 == 3L || p._2 == 3L),
      s"d18 twin emitted $sh")
    // d16 lanes: doc 1 and 2 share most shingles, so most min-lanes
    // agree; doc 3 shares none
    val lanes = Dedup.minHashSignaturesMd5(fixture)
      .select("doc_id", "seed", "sig").as[(Long, Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    val agree12 = (0L until 8L).count(s => lanes(1L)(s) == lanes(2L)(s))
    val agree13 = (0L until 8L).count(s => lanes(1L)(s) == lanes(3L)(s))
    assert(agree12 >= 4 && agree13 == 0,
      s"lane agreement 1~2: $agree12, 1~3: $agree13")
    // guard contract: k beyond the digest refuses loudly
    intercept[IllegalArgumentException] {
      Dedup.minHashSignaturesMd5(fixture, k = 9)
    }
  }

  test("quality representatives: the better doc wins the cluster regardless of id order") {
    import spark.implicits._
    // two near-dups (shared 20-char block, word-Jaccard 3/5 = 0.6): doc 1
    // is lower quality (repeated stopwords), doc 2 higher — d08's min-id
    // rule would keep doc 1; the quality argmax must keep doc 2
    val blk = "a" * 20
    val fixture = Seq(
      (1L, s"$blk b c the the"),
      (2L, s"$blk b c d")).toDF("doc_id", "text")
    val members = Dedup.duplicateClusters(Dedup.jaccardPairs(fixture))
      .join(graft.operators.TextAnalysis.qualityScore(fixture)
        .select(col("doc_id"), col("quality")), Seq("doc_id"))
    val rep = members.groupBy(col("cluster_id"))
      .agg(max(struct(col("quality"), (-col("doc_id")).as("nid"))).as("m"))
      .select(col("cluster_id"), (-col("m.nid")).as("rep_id"))
      .as[(Long, Long)].collect().toSeq
    assert(rep == Seq((1L, 2L)), s"expected doc 2 to represent cluster 1, got $rep")
  }

  test("twin pipelines plan without cartesian products (scale-shape pin)") {
    // candidates must meet through equi-joins on band/bucket values —
    // a CartesianProduct/BroadcastNestedLoop node would be the O(n²)
    // scale-killer the banding exists to avoid
    for ((name, df) <- Seq(
        "d17" -> Dedup.minHashBandedPairsMd5(docs),
        "d18" -> Dedup.simHashBandedPairsMd5(docs),
        "d19" -> graft.operators.TextAnalysis.winnowOverlapPairsMd5(docs))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoopJoin"),
        s"$name plans a cartesian:\n$plan")
    }
  }
}
