package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator`: element-wise mean of an embedding column in ONE
  * pass — the UDAF surface of the engine (SURVEY.md §2.7/§7.4).
  *
  * The composable formulation (`Similarity.labelCentroids`) posexplodes
  * every vector into dim× rows before aggregating; this buffer keeps one
  * running (sums, count) per group — no row blow-up in the scan stage,
  * map-side partials merge associatively, and the shuffle carries one
  * 64-double buffer per (partition × label). The centroid means differ
  * from the decimal-exact oracle formulation only by float-summation
  * order (bounded by test tolerance), which is why the IVF coarse
  * quantizer uses it while the oracle-checked s03 keeps decimal sums.
  */
class VectorMeanAgg(dim: Int)
    extends Aggregator[Seq[Float], (Array[Double], Long), Seq[Double]] {

  override def zero: (Array[Double], Long) = (new Array[Double](dim), 0L)

  override def reduce(b: (Array[Double], Long), v: Seq[Float]): (Array[Double], Long) = {
    var i = 0
    while (i < dim && i < v.length) { b._1(i) += v(i); i += 1 }
    (b._1, b._2 + 1)
  }

  override def merge(x: (Array[Double], Long), y: (Array[Double], Long)): (Array[Double], Long) = {
    var i = 0
    while (i < dim) { x._1(i) += y._1(i); i += 1 }
    (x._1, x._2 + y._2)
  }

  override def finish(b: (Array[Double], Long)): Seq[Double] =
    if (b._2 == 0) Seq.empty else b._1.map(_ / b._2).toSeq

  override def bufferEncoder: Encoder[(Array[Double], Long)] =
    ExpressionEncoder[(Array[Double], Long)]()
  override def outputEncoder: Encoder[Seq[Double]] =
    ExpressionEncoder[Seq[Double]]()
}
