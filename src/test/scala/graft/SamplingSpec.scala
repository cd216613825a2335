package graft

import org.apache.spark.sql.functions._
import graft.operators.{Sampling, Similarity, TextAnalysis}

/** Deterministic sampling / mixing (q63/q64), duplicate-ngram rate
  * (t16), and uint8 quantization (s10) — r7 catalog additions. */
class SamplingSpec extends SparkSpec {

  import spark.implicits._

  test("stratifiedSample: hash-deterministic, rate-monotone, whitelist semantics") {
    val df = (1L to 2000L).map(i => (i, if (i % 3 == 0) "A" else "B"))
      .toDF("id", "stratum")
    val s1 = Sampling.stratifiedSample(df, "stratum", "id", Map("A" -> 20, "B" -> 5))
      .select("id").as[Long].collect().toSet
    val s2 = Sampling.stratifiedSample(df, "stratum", "id", Map("A" -> 20, "B" -> 5))
      .select("id").as[Long].collect().toSet
    assert(s1 == s2, "same inputs must select the same rows")
    // a higher rate keeps a SUPERSET (bucket < pct is monotone in pct)
    val s3 = Sampling.stratifiedSample(df, "stratum", "id", Map("A" -> 60, "B" -> 5))
      .select("id").as[Long].collect().toSet
    assert(s1.subsetOf(s3))
    // strata absent from the rates table drop entirely
    val s4 = Sampling.stratifiedSample(df, "stratum", "id", Map("A" -> 20))
      .select("stratum").distinct().as[String].collect().toSeq
    assert(s4 == Seq("A"))
    // rates land near nominal (hash uniformity; wide tolerance)
    val aTotal = df.filter($"stratum" === "A").count().toDouble
    val aKept = s1.count(_ % 3 == 0).toDouble
    assert(math.abs(aKept / aTotal - 0.20) < 0.06, s"A rate ${aKept / aTotal}")
  }

  test("epochQuotaMix: exact quota per domain; short domains wrap with copy_idx") {
    val docs = ((1L to 500L).map(i => (i, "big")) ++ (1000L to 1009L).map(i => (i, "small")))
      .toDF("doc_id", "lang")
    val out = Sampling.epochQuotaMix(docs, "lang", "doc_id", 30)
      .as[(String, Long, Long, Long)].collect()
    val byLang = out.groupBy(_._1)
    // EVERY domain fills exactly quota slots (the point of epoch fill)
    assert(byLang.view.mapValues(_.length).toMap == Map("big" -> 30, "small" -> 30))
    // long domain: 30 distinct docs, no wrap
    val big = byLang("big")
    assert(big.map(_._3).distinct.length == 30 && big.forall(_._4 == 0L))
    // short domain (10 docs): each doc appears exactly 3 times, with
    // copy_idx 0/1/2 in slot order, and slot s wraps to the same doc
    // as slot s - 10
    val small = byLang("small").sortBy(_._2)
    assert(small.map(_._3).distinct.length == 10)
    assert(small.groupBy(_._3).forall(_._2.map(_._4).sorted.sameElements(Seq(0L, 1L, 2L))))
    assert(small.map(_._3).toSeq == (small.map(_._3).toSeq.take(10) ++
      small.map(_._3).toSeq.take(10) ++ small.map(_._3).toSeq.take(10)))
    // deterministic under re-run
    val again = Sampling.epochQuotaMix(docs, "lang", "doc_id", 30)
      .as[(String, Long, Long, Long)].collect()
    assert(again.sortBy(r => (r._1, r._2)).toSeq == out.sortBy(r => (r._1, r._2)).toSeq)
  }

  test("dupNgramRate: hand corpus — shared 8-gram counted, unique text not") {
    // docs 1/2 share one exact 8-word span; doc 3 shares nothing; doc 4
    // is too short to emit any 8-gram
    val docs = Seq(
      (1L, "a b c d e f g h unique1 tail1"),
      (2L, "prefix2 a b c d e f g h tail2"),
      (3L, "totally different words that never repeat anywhere else ok"),
      (4L, "short doc")).toDF("doc_id", "text")
    val got = TextAnalysis.dupNgramRate(docs)
      .orderBy("doc_id").as[(Long, Long, Long, Long)].collect()
    // doc1: 3 grams, 1 shared ("a..h"); doc2: 3 grams, 1 shared;
    // doc3: 9 words → 2 grams, none shared
    assert(got.toSeq == Seq(
      (1L, 3L, 1L, 3333L), (2L, 3L, 1L, 3333L), (3L, 2L, 0L, 0L)))
  }

  test("quantizeUint8: codes in range, dequant error bounded, constant vector → zeros") {
    val emb = Seq(
      (1L, Array(0.5f, -0.25f, 0.125f, 1.0f), 0),
      (2L, Array(0.3f, 0.3f, 0.3f, 0.3f), 1)) // constant → mx == mn
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.quantizeUint8(emb).orderBy("vec_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val (id1, mn1, mx1, qsum1, qf1, ql1) = got(0)
    assert(id1 == 1L && mn1 == -250L && mx1 == 1000L)
    // lanes (500,-250,125,1000) → q = ((x+250)*255)/1250 truncated
    val q = Seq(500L, -250L, 125L, 1000L).map(x => ((x + 250) * 255) / 1250)
    assert(qf1 == q.head && ql1 == q.last && qsum1 == q.sum)
    assert(q.forall(v => v >= 0 && v <= 255))
    assert(got(1) == ((2L, 300L, 300L, 0L, 0L, 0L)))
  }
}
