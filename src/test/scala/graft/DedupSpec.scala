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
}
