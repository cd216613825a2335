package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.operators.Dedup

/** Property tests over the skew-bounded pair kernels — the candidate
  * generators every dedup family rides. Fixed-seed scalacheck corpora
  * (deterministic; no scalatestplus bridge in the offline cache):
  * random block-size mixtures, including hot blocks over the cap and
  * singleton/empty blocks, checked output-identical against the naive
  * quadratic definition. */
class PairKernelPropertySpec extends SparkSpec {

  // a corpus profile: per-block row counts, spanning 0..well-over-cap
  private val profile: Gen[List[Int]] =
    Gen.listOfN(6, Gen.frequency(3 -> Gen.choose(0, 3),
      2 -> Gen.choose(4, 40), 1 -> Gen.choose(41, 90)))

  private val profiles: Seq[List[Int]] =
    Gen.listOfN(12, profile)(Gen.Parameters.default, Seed(7L)).get

  test("boundedPairJoin == naive within-block pairs on random block mixtures (cap 16)") {
    import spark.implicits._
    profiles.foreach { prof =>
      val rows = prof.zipWithIndex.flatMap { case (n, b) =>
        (0 until n).map(i => (s"blk$b", (b * 1000 + i).toLong, s"p$b-$i"))
      }
      val base = rows.toDF("blk", "id", "p")
      val got = Dedup.boundedPairJoin(base, 16)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      val want = rows.groupBy(_._1).values.flatMap { blk =>
        for (x <- blk; y <- blk if x._2 < y._2) yield (x._2, y._2)
      }.toSet
      assert(got == want, s"profile $prof: ${got.size} vs ${want.size} pairs")
    }
  }

  test("tiledSampledSigPairs == naive all-pairs over the hash sample (random sizes/tiles)") {
    import spark.implicits._
    val cfgs = Gen.listOfN(8,
      Gen.zip(Gen.choose(0, 60), Gen.choose(1, 4), Gen.choose(1, 9)))(
      Gen.Parameters.default, Seed(13L)).get
    cfgs.foreach { case (n, sampleMod, tiles) =>
      val sig = (1 to n).map(i => (i.toLong, i.toLong * 0x9E3779B97F4A7C15L))
        .toDF("doc_id", "simhash")
      val got = Dedup.tiledSampledSigPairs(sig, sampleMod, tiles)
        .select("a_id", "b_id").as[(Long, Long)].collect().toSet
      // the sample predicate replayed driver-side via the same kernel
      val sampled = sig.filter(pmod(xxhash64(col("doc_id")), lit(sampleMod)) === 0)
        .select("doc_id").as[Long].collect().toSet
      val want = (for (a <- sampled; b <- sampled if a < b) yield (a, b)).toSet
      assert(got == want, s"n=$n mod=$sampleMod tiles=$tiles: ${got.size} vs ${want.size}")
    }
  }
}
