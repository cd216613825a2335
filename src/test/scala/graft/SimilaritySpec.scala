package graft

import org.apache.spark.sql.functions._
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
}
