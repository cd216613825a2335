package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.operators.Similarity

/** The one-pass VectorMeanAgg centroids must agree with the exploded
  * decimal-exact formulation up to float-summation order. */
class SimilaritySpec extends SparkSpec {

  // Tolerance bound: labelCentroids quantizes every element to
  // DECIMAL(18,4) before summing (cross-engine oracle exactness), so the
  // two formulations may differ by up to the 5e-5 per-element rounding.
  test("VectorMeanAgg centroids ≈ posexplode/decimal centroids (1e-4)") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = Similarity.labelCentroids(emb)
      .select(col("label").cast("long").as("label"), col("dim"), col("centroid"))
    val agg = Similarity.centroidMeansAgg(emb)
      .select(col("label"), posexplode(col("cv")).as(Seq("pos", "c")))
      .select(col("label"), col("pos").cast("long").as("dim"), col("c"))
    val joined = exact.join(agg, Seq("label", "dim"))
      .select(abs(col("centroid") - col("c")).as("err"))
      .agg(max(col("err"))).first().getDouble(0)
    assert(joined < 1e-4, s"max centroid deviation $joined")
  }

  test("native hyperplane_sig == composable aggregate(zip_with) signature, every vector") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val nBits = 30; val seed = 42L
    val planes = Similarity.hyperplanes(nBits, 64, seed)
    // the pre-native formulation, kept here as the independent reference
    val hofSig = planes.zipWithIndex.map { case (p, j) =>
      val plane = s"array(${p.mkString(",")})"
      s"(case when aggregate(zip_with(qv, $plane, (x, y) -> x * y), cast(0 as bigint), (acc, v) -> acc + v) >= 0 then cast(1 as bigint) << $j else 0 end)"
    }.mkString(" + ")
    val base = emb.select(col("vec_id"), expr(
      "transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000.0) AS BIGINT))").as("qv"))
    val diff = base.select(col("vec_id"),
        graft.functions.HyperplaneSig.hyperplane_sig(col("qv"), planes).as("a"),
        expr(hofSig).as("b"))
      .filter(col("a") =!= col("b")).count()
    assert(diff == 0L, s"$diff vectors disagree between native and HOF signatures")
  }

  // Scale pin for the banded-LSH candidate path: a degenerate corpus
  // (300 identical vectors → one cell per band, the worst skew possible)
  // must still satisfy the boundedPairJoin cap per join key AND emit the
  // complete pair set — bounded tasks, zero recall loss inside the cell.
  test("cosineDupPairs banded blocking: hot cell stays cap-bounded and complete") {
    import spark.implicits._
    val rng = new scala.util.Random(77)
    val hot = (0L until 300L).map(id => (id, Array.fill(64)(0.5f), id % 5))
    val rest = (300L until 400L).map(id => (id, Array.fill(64)(rng.nextFloat() - 0.5f), id % 5))
    val emb = (hot ++ rest).toDF("vec_id", "embedding", "label").repartition(7)

    val cap = 32
    val blocks = Similarity.bandedBlocks(emb, nBands = 5, bitsPerBand = 6, seed = 42)
    val (aSide, _) = graft.operators.Dedup.boundedPairSides(blocks, cap)
    val maxKey = aSide.groupBy("blk", "_ga", "_gb").count()
      .agg(max(col("count"))).first().getLong(0)
    assert(maxKey <= cap, s"join-key side size $maxKey exceeds cap $cap")

    val got = Similarity.cosineDupPairs(emb, threshold = 0.999, cap = cap)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSet
    // identical vectors agree on every band ⇒ all hot pairs are candidates
    val want = (for { a <- 0L until 300L; b <- a + 1 to 299L } yield (a, b)).toSet
    assert(want.subsetOf(got), s"missing ${(want -- got).size} hot-cell pairs")
  }

  // The pruning claim is exactness: Cauchy–Schwarz stops are strict, so
  // the pruned scan must equal the un-pruned ranking bit for bit —
  // including tie-breaks — on data it has never seen.
  test("knnMipsPruned ≡ un-pruned MIPS ranking on randomized vectors") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val rng = new scala.util.Random(4242)
    // small dim + coarse values → plenty of exact ip ties
    val emb = (0L until 400L).map { id =>
      (id, Array.fill(8)(rng.nextInt(7).toFloat - 3f), id % 5)
    }.toDF("vec_id", "embedding", "label").repartition(7)
    val got = Similarity.knnMipsPruned(emb, k = 4, queryMod = 25)
      .orderBy("q_id", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // reference: plain exhaustive ranking, same quantization
    val base = emb.select(col("vec_id"),
      expr("transform(embedding, x -> cast(round(cast(x as double) * 1000.0) as bigint))").as("qv"))
    val q = base.filter(col("vec_id") % 25 === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("ip").desc, col("vec_id"))
    val want = base.crossJoin(q).filter(col("vec_id") =!= col("q_id"))
      .withColumn("ip", expr(
        "aggregate(zip_with(qv, q_qv, (x, y) -> x * y), cast(0 as bigint), (a, v) -> a + v)"))
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 4)
      .select(col("q_id"), col("vec_id"), col("rk"), col("ip"))
      .orderBy("q_id", "rk").collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == want.toSeq)
  }

  test("recallVsExact: structural sanity on the fixture (measurement utility)") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val r = Similarity.recallVsExact(
      Similarity.knnIvf(emb), Similarity.knnBruteForce(emb)).collect().head
    val (hits, nTrue, recall) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(nTrue > 0 && hits >= 0 && hits <= nTrue)
    assert(recall == hits * 10000 / nTrue && recall <= 10000)
  }

  test("ivf-pq recall telemetry: recall@5 vs exact-L2 and vs cosine brute, per nProbe") {
    // A MEASUREMENT, not a gate (the s09 lesson: at these corpus sizes a
    // recall floor cannot reliably separate a working index from chance
    // without flaking) — the test pins structure (bounds, monotonicity in
    // nProbe at full probe count) and REPORTS the numbers; SURVEY §8.3
    // records them per scale factor. GRAFT_RECALL_SF overrides the SF.
    val sf = sys.env.getOrElse("GRAFT_RECALL_SF", "0.001")
    val emb = graft.sources.Tables(spark, s"/root/testdata/sf$sf", "embeddings")
    val queryMod = 100
    // exact-L2 ground truth over the same quantized vectors: separates
    // quantization+probe loss from metric mismatch (ADC is L2², the s01
    // brute ranking is cosine — both reported)
    val base = Similarity.quantized(emb).select(col("vec_id"), col("qv"))
    val q = base.filter(col("vec_id") % queryMod === 0)
      .select(col("vec_id").as("q_id"), col("qv").as("q_qv"))
    val w = Window.partitionBy(col("q_id")).orderBy(col("d2"), col("vec_id"))
    val exactL2 = base.crossJoin(broadcast(q)).filter(col("vec_id") =!= col("q_id"))
      .withColumn("d2", expr("aggregate(zip_with(qv, q_qv, (x, y) -> (x - y) * (x - y)), " +
        "cast(0 as bigint), (a, v) -> a + v)"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("vec_id").as("neighbor_id"))
    val cosine = Similarity.knnBruteForce(emb, 5, queryMod)
    // sweep BOTH knobs: k (cells AND codewords per subspace — the
    // codebook budget) and nProbe (routing coverage). NOTE recall is NOT
    // guaranteed monotone in nProbe: more probes add candidates whose
    // UNDERESTIMATED ADC can displace true neighbors from the top-5
    // (observed at sf0.1: k=16 nProbe 2→4 dropped 900→800). The
    // deterministic structural law is different: at nProbe = k every
    // cell is probed, the candidate set is the whole corpus minus self,
    // and ivfPqTopK must EQUAL the pure ADC ranking (same distance, same
    // (adc, vec_id) tie-break) — asserted below; the recall values
    // themselves are telemetry, recorded in SURVEY §8.3.
    val sweeps = Seq(4 -> Seq(1, 2, 4), 16 -> Seq(2, 4, 16))
    sweeps.foreach { case (k, probes) =>
      probes.foreach { nProbe =>
        val approx = Similarity.ivfPqTopK(emb, topK = 5, queryMod = queryMod,
          nProbe = nProbe, k = k)
        val rL2 = Similarity.recallVsExact(approx, exactL2).collect().head
        val rCos = Similarity.recallVsExact(approx, cosine).collect().head
        Seq(rL2, rCos).foreach { r =>
          assert(r.getLong(1) > 0 && r.getLong(0) >= 0 && r.getLong(0) <= r.getLong(1))
          assert(r.getLong(2) <= 10000)
        }
        info(s"sf=$sf k=$k nProbe=$nProbe recall@5 ×1e4: vs exact-L2 ${rL2.getLong(2)} " +
          s"(${rL2.getLong(0)}/${rL2.getLong(1)}), vs cosine ${rCos.getLong(2)} " +
          s"(${rCos.getLong(0)}/${rCos.getLong(1)})")
      }
    }
    // full-probe equivalence: routing at nProbe = k removes itself from
    // the picture entirely — ivfPqTopK degenerates to pqAdcTopK exactly
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id", "rk", "adc").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._3))
    val full = rows(Similarity.ivfPqTopK(emb, topK = 5, queryMod = queryMod,
      nProbe = 4, k = 4))
    val adc = rows(Similarity.pqAdcTopK(emb, topK = 5, queryMod = queryMod, k = 4))
    assert(full.toSeq == adc.toSeq,
      s"full-probe IVF-PQ must equal the pure ADC ranking")
  }

  test("retrieve+rerank: full probe + full shortlist degenerates to brute force exactly") {
    // with every cell probed and an uncapped shortlist, stage 1 passes
    // the whole corpus through and stage 2's exact cosine ranking IS the
    // s01 brute force — same integer dot, same norms, same (cos desc,
    // neighbor_id) ties ⇒ bit-identical doubles, not approximate
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id", "rk", "cos").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .sortBy(t => (t._1, t._3))
    val got = rows(Similarity.retrieveRerank(emb, topK = 5, shortlist = 10000,
      queryMod = 100, nProbe = 4))
    val want = rows(Similarity.knnBruteForce(emb, 5, 100))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("prefix-refine: uncapped shortlist degenerates to the exact MIPS ranking") {
    // with shortlist ≥ corpus, stage 1 prunes nothing and stage 2's
    // full-dim integer MIPS rank IS s07's brute ranking — bit-identical
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("q_id", "neighbor_id", "rk", "ip").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._3))
    val got = rows(Similarity.prefixRefineTopK(emb, shortlist = 10000))
    val want = rows(Similarity.knnMipsPruned(emb))
    assert(got.nonEmpty && got.toSeq == want.toSeq)
  }

  test("pq: exact reconstruction when clusters are pure, ADC == true L2², partition-invariant") {
    import spark.implicits._
    // 4 patterns, 16-milli apart in every dim, each repeated 3× — after
    // the Lloyd step every cluster holds copies of ONE pattern, so the
    // codebook equals the patterns, reconstruction is exact (d2 = 0),
    // and ADC collapses to the true integer L2²
    val base = Array.tabulate(4)(c =>
      Array.tabulate(64)(i => (c * 16 + i % 7).toFloat / 1000f))
    val emb = (0L until 12L).map(id => (id, base((id % 4).toInt), 0))
      .toDF("vec_id", "embedding", "label")
    val codes = Similarity.pqCodes(emb).collect()
    assert(codes.length == 12 * 8)
    assert(codes.forall(_.getLong(3) == 0L), "pure clusters must reconstruct exactly")
    // identical results under any input layout (integer/floor arithmetic)
    val a = Similarity.pqCodes(emb.repartition(5)).orderBy("vec_id", "s")
      .as[(Long, Int, Long, Long)].collect().toSeq
    val b = Similarity.pqCodes(emb.repartition(2)).orderBy("vec_id", "s")
      .as[(Long, Int, Long, Long)].collect().toSeq
    assert(a == b)
    // the one query (vec_id 0): its two exact duplicates (4, 8) rank
    // first at adc 0; every adc equals the true subspace-summed L2²
    val top = Similarity.pqAdcTopK(emb).orderBy("q_id", "rk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    def l2(x: Array[Float], y: Array[Float]): Long =
      x.zip(y).map { case (p, q) =>
        val d = math.round(p * 1000.0) - math.round(q * 1000.0); d * d
      }.sum
    assert(top.take(2).map(r => (r._2, r._4)) == Seq((4L, 0L), (8L, 0L)))
    top.foreach { case (q, n, _, adc) =>
      assert(adc == l2(base((q % 4).toInt), base((n % 4).toInt)),
        s"adc($q, $n) diverged from true L2²")
    }
    // the composed IVF-PQ path routes the query to its own (pure)
    // cluster first, so the exact duplicates again rank 1–2 at adc 0,
    // and every returned candidate lies in a probed cluster
    val ivfpq = Similarity.ivfPqTopK(emb).orderBy("q_id", "rk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(ivfpq.take(2).map(r => (r._2, r._4)) == Seq((4L, 0L), (8L, 0L)))
    ivfpq.foreach { case (q, n, _, adc) =>
      assert(adc == l2(base((q % 4).toInt), base((n % 4).toInt)))
    }
    // frozen-codebook upsert on the same fixture: vec 0 (a DELTA id,
    // excluded from training with vec 10) still finds its exact twins —
    // base clusters stay pure without them, so the base-trained
    // codebooks equal the patterns and every ADC keeps the true L2²
    val ups = Similarity.pqIndexUpsert(emb).orderBy("q_id", "rk")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(ups.take(2).map(r => (r._2, r._4)) == Seq((4L, 0L), (8L, 0L)),
      s"upsert lost the exact twins: $ups")
    ups.foreach { case (q, n, _, adc) =>
      assert(adc == l2(base((q % 4).toInt), base((n % 4).toInt)),
        s"upsert adc($q, $n) diverged from true L2²")
    }
  }

  test("kmeansAssign: partitioning-invariant, seeds self-assign at round one, dist2 exact") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val emb = (0L until 150L).map { id =>
      (id, Array.fill(8)(rng.nextInt(9).toFloat / 4f - 1f), 0)
    }.toDF("vec_id", "embedding", "label")
    val a = Similarity.kmeansAssign(emb.repartition(7))
      .orderBy("vec_id").as[(Long, Long, Long)].collect()
    val b = Similarity.kmeansAssign(emb.repartition(3))
      .orderBy("vec_id").as[(Long, Long, Long)].collect()
    // the labels (not just counts) must be identical under any layout —
    // the reproducibility claim the integer/floor arithmetic buys
    assert(a.toSeq == b.toSeq)
    assert(a.length == 150)
    val cids = a.map(_._2).toSet
    assert(cids.subsetOf(Set(0L, 1L, 2L, 3L)) && cids.size >= 2)
    // dist2 is the exact integer L2² to the FINAL centroid ≥ 0
    assert(a.forall(_._3 >= 0L))
  }

  test("persisted-index serve ≡ in-query training: s16 and s17 steady-state paths") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val root = java.nio.file.Files.createTempDirectory("graft-idx").toString

    // IVF-PQ: build once, serve from the read-back layout — row-for-row
    // equal to the train-in-query s16 composition
    Similarity.buildIvfPqIndex(emb, s"$root/ivfpq")
    val fromIdx = Similarity.retrieveRerankFromIndex(spark, s"$root/ivfpq")
      .orderBy("q_id", "rk").collect().toSeq
    val trained = Similarity.retrieveRerank(emb)
      .orderBy("q_id", "rk").collect().toSeq
    assert(fromIdx == trained, s"from-index serve diverged: $fromIdx vs $trained")

    // frozen-codebook upsert: persisted base index + in-query delta
    // encode — equal to the full in-query s17
    Similarity.buildPqIndex(emb.filter(col("vec_id") % 10 =!= 0), s"$root/pqbase")
    val upsertIdx = Similarity.pqIndexUpsertFromBase(emb, s"$root/pqbase")
      .orderBy("q_id", "rk").collect().toSeq
    val upsert = Similarity.pqIndexUpsert(emb)
      .orderBy("q_id", "rk").collect().toSeq
    assert(upsertIdx == upsert, s"upsert-from-base diverged: $upsertIdx vs $upsert")
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }

  test("hard negatives: all cross-label, ranked exactly as label-filtered brute force") {
    import spark.implicits._
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val got = Similarity.hardNegatives(emb)
    // 1) every mined negative crosses the label boundary
    val labels = emb.select(col("vec_id"), col("label"))
    val crossed = got
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("ql")), Seq("q_id"))
      .filter(col("neg_label") === col("ql")).count()
    assert(crossed == 0L, s"$crossed same-label rows leaked into the negatives")
    // 2) ranking ≡ the independent reference: scoredAllPairs filtered by
    //    label AFTER scoring, then top-5 — pre-join label pruning must
    //    not change which candidates win
    val ref = Similarity.scoredAllPairs(emb, 100)
      .join(labels.select(col("vec_id").as("q_id"), col("label").as("ql")), Seq("q_id"))
      .join(labels.select(col("vec_id").as("neighbor_id"), col("label").as("nl")),
        Seq("neighbor_id"))
      .filter(col("nl") =!= col("ql"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("q_id"))
          .orderBy(col("cos").desc, col("neighbor_id"))).cast("long"))
      .filter(col("rk") <= 5)
      .select(col("q_id"), col("neighbor_id"), col("rk"))
    val gotKeys = got.select(col("q_id"), col("neighbor_id"), col("rk"))
      .as[(Long, Long, Long)].collect().toSet
    val refKeys = ref.as[(Long, Long, Long)].collect().toSet
    assert(gotKeys == refKeys, "pre-scoring label prune changed the ranking")
  }

  test("ivfRecall aggregates to exactly the recallVsExact corpus measurement") {
    import spark.implicits._
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    // per-query n_matched must sum to the corpus-level hit count the
    // tuning harness reports — the two recall formulations agree
    val perQuery = Similarity.ivfRecall(emb)
      .agg(sum(col("n_matched"))).as[Long].head()
    val corpus = Similarity.recallVsExact(
        Similarity.knnIvf(emb), Similarity.knnBruteForce(emb))
      .select(col("n_hits")).as[Long].head()
    assert(perQuery == corpus, s"per-query sum $perQuery vs corpus $corpus")
  }

  test("from-index serve plan: broadcasts only — no sort-merge join, no cartesian") {
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val root = java.nio.file.Files.createTempDirectory("graft-idxplan").toString
    Similarity.buildIvfPqIndex(emb, s"$root/ivfpq")
    val p = Similarity.retrieveRerankFromIndex(spark, s"$root/ivfpq")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"serve lost its broadcasts:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus-side SMJ crept into the serve:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(root))
  }
}
