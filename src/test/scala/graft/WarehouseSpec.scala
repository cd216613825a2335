package graft

import org.apache.spark.sql.functions._
import graft.operators.{TextAnalysis, Warehouse}

/** Unit pins for the warehouse patterns (q51–q53) and the corpus
  * operators (t09–t11) — micro-cases where each semantic corner is
  * hand-checkable, complementing the data-scale DuckDB oracles.
  */
class WarehouseSpec extends SparkSpec {

  import spark.implicits._

  test("bloomSemiJoin equals the exact semi join (false positives removed)") {
    // 0.5 FPP on 2k probe keys GUARANTEES the bloom alone passes false
    // positives; the trailing exact join must still remove every one.
    val dim = (1L to 50L).map(_ * 40L).toDF("k")
    val fact = (1L to 2000L).toDF("k")
    val got = Warehouse.bloomSemiJoin(fact, "k", dim, "k", fpp = 0.5)
      .agg(count(lit(1)), sum($"k")).as[(Long, Long)].head()
    val want = fact.join(dim, Seq("k"), "left_semi")
      .agg(count(lit(1)), sum($"k")).as[(Long, Long)].head()
    assert(got == want)
    assert(got._1 == 50L)
  }

  test("mergeUpsert: matched updates, source-only inserts, target-only keeps") {
    val target = Seq((1L, "a"), (2L, "b")).toDF("k", "t_val")
    val source = Seq((2L, 20L), (3L, 30L)).toDF("k", "s_val")
    val got = Warehouse.mergeUpsert(target, source, "k")
      .select($"k", $"action").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "keep"), (2L, "update"), (3L, "insert")))
  }

  test("repetitionStats on a hand-checkable doc") {
    // "a b a b a": bigrams = [a b, b a, a b, b a] → n=4, distinct=2,
    // dup_frac=0.5; tie on count broken lexicographically → top "a b"
    val docs = Seq((7L, "a b a b a")).toDF("doc_id", "text")
    val r = TextAnalysis.repetitionStats(docs).head()
    assert(r.getAs[Long]("n_bigrams") == 4L)
    assert(r.getAs[Long]("n_distinct") == 2L)
    assert(r.getAs[Double]("dup_bigram_frac") == 0.5)
    assert(r.getAs[String]("top_bigram") == "a b")
    assert(r.getAs[Double]("top_bigram_frac") == 0.5)
  }

  test("contaminationScan: only the doc sharing a 4-gram with the eval split hits") {
    // doc 20 (id % 20 == 0) is the eval split; doc 1 shares its 4-gram
    // "w x y z", doc 2 does not. Repeating the gram inside doc 1 must
    // not inflate the count (per-doc dedup before the join).
    val docs = Seq(
      (20L, "w x y z q"),
      (1L, "p w x y z r w x y z"),
      (2L, "a b c d e")).toDF("doc_id", "text")
    val got = TextAnalysis.contaminationScan(docs)
      .as[(Long, Long, Long)].collect().toSet
    // doc 1's grams ∩ eval doc 20's {w x y z, x y z q} = {"w x y z"},
    // counted once despite appearing twice in doc 1
    assert(got == Set((1L, 1L, 1L)))
  }

  test("bm25Retrieve: rare-term saturation ranks, stopword cap, self-exclusion") {
    // doc 0 is the query workload (0 % 50 == 0); its terms: zebra, quick,
    // the. "the" is in all 10 docs (df=10 > 80% of N=10) → capped out.
    // doc 1 is zebra-heavy, doc 2 has one "quick", docs 3-9 share no
    // uncapped query term → absent. Expect: doc 1 first (rare idf ×
    // saturating tf beats doc 2's common "quick"), doc 2 second, and
    // doc 0 itself never retrieved.
    val docs = (Seq(
      (0L, "zebra quick the"),
      (1L, "zebra zebra zebra the x1"),
      (2L, "quick the x2 x2 x2")) ++
      (3L to 9L).map(i => (i, s"the filler$i w$i y$i z$i"))).toDF("doc_id", "text")
    val got = TextAnalysis.bm25Retrieve(docs, k = 5)
      .select($"q_id", $"rk", $"doc_id").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got == Seq((0L, 1L, 1L), (0L, 2L, 2L)), s"got $got")
  }

  test("bm25 persisted-index serve ≡ in-query retrieval, row for row") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val root = java.nio.file.Files.createTempDirectory("graft-bm25").toString
    TextAnalysis.buildBm25Index(docs, root)
    val served = TextAnalysis.bm25RetrieveFromIndex(spark, root,
        TextAnalysis.bm25QueryWorkload(docs))
      .orderBy($"q_id", $"rk").collect().toSeq
    val inQuery = TextAnalysis.bm25Retrieve(docs)
      .orderBy($"q_id", $"rk").collect().toSeq
    assert(served.nonEmpty && served == inQuery,
      s"index serve diverged (${served.size} vs ${inQuery.size} rows)")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("temperatureMixture: sqrt-flattened quotas upsample the tail") {
    // 90 "en" docs vs 10 "zh" docs, k=10: proportional would give 9/1;
    // sqrt flattening gives round(10*sqrt(.9))=9, round(10*sqrt(.1))=3
    // — the tail language is upsampled, and each lang returns exactly
    // `quota` rows.
    val docs = ((1L to 90L).map((_, "en")) ++ (91L to 100L).map((_, "zh")))
      .toDF("doc_id", "lang")
    val got = TextAnalysis.temperatureMixture(docs, k = 10)
      .groupBy($"lang").agg(max($"quota").as("q"), count(lit(1)).as("n"))
      .as[(String, Long, Long)].collect().toSet
    assert(got == Set(("en", 9L, 9L), ("zh", 3L, 3L)))
  }
}
