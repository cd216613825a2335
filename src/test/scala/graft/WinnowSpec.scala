package graft

import org.apache.spark.sql.functions._
import graft.functions.WinnowFingerprint.winnow_fingerprint

/** Winnowing fingerprint properties: rolling-hash correctness and the
  * SIGMOD'03 guarantee (a shared substring of length ≥ w+k−1 yields at
  * least one shared fingerprint). */
class WinnowSpec extends SparkSpec {

  private def fps(texts: String*): Seq[Set[Long]] = {
    import spark.implicits._
    texts.toDF("text")
      .select(winnow_fingerprint(col("text")).as("f")).collect()
      .map(_.getSeq[Long](0).toSet).toSeq
  }

  test("rolling hash matches direct recomputation (same text, split inputs)") {
    // identical text must fingerprint identically regardless of which
    // row/partition computes it
    val t = "the quick brown fox jumps over the lazy dog again and again"
    val Seq(a, b) = fps(t, t)
    assert(a == b && a.nonEmpty)
  }

  test("shared long substring ⇒ shared fingerprint; disjoint texts ⇒ none") {
    val shared = "common long passage that both documents quote verbatim here"
    val Seq(d1, d2, d3) = fps(
      s"prefix one $shared suffix alpha",
      s"totally different opening $shared and another ending",
      "no overlap with anything else whatsoever in this text")
    assert((d1 & d2).nonEmpty, "shared substring produced no common fingerprint")
    assert((d1 & d3).isEmpty && (d2 & d3).isEmpty)
  }

  test("short documents still fingerprint (single-window fallback)") {
    val Seq(s1) = fps("tiny text")
    assert(s1.size == 1)
    assert(fps("").head.isEmpty) // shorter than k: no grams, empty set
  }
}
