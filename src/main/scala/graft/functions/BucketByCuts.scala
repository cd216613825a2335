package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Quantile bucketing for the skew-robust Z-order layout
  * ([[graft.operators.Warehouse.compactManifested]]'s
  * `zorderQuantiles`): map a value to the count of sampled cut points
  * ≤ it, times `scale` — a monotone map from the column's VALUE
  * distribution to a near-uniform bucket distribution, which is what
  * keeps Morton tiles narrow-in-mass on a zipfian dimension (linear
  * min/max bucketing collapses such a dimension into a handful of
  * buckets and the skipping read stops pruning exactly on the tables
  * big enough to care — the range-partitioner insight applied to the
  * layout key).
  *
  * The cut array is a broadcast-sized constant (≤ 4095 doubles)
  * registered as a codegen reference object; per row the kernel is
  * one branch-light binary search (~12 compares), a static call
  * inside whole-stage codegen like its [[InterleaveBits]] sibling —
  * write-time-only cost, nothing at read time. Duplicate cuts (a
  * value heavier than one quantile step) collapse into one bucket
  * boundary; the upper-bound rule keeps the map monotone either way.
  * Null in → null out (the caller's all-null fallback handles the
  * degenerate column).
  */
case class BucketByCuts(child: Expression, cuts: Array[Double], scale: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(DoubleType)
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    BucketByCuts.bucket(v.asInstanceOf[Double], cuts) * scale
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cutsRef = ctx.addReferenceObj("cuts", cuts, "double[]")
    defineCodeGen(ctx, ev,
      v => s"graft.functions.BucketByCuts.bucket($v, $cutsRef) * ${scale}L")
  }
  override protected def withNewChildInternal(newChild: Expression): BucketByCuts =
    copy(child = newChild)
  override def prettyName: String = "bucket_by_cuts"
  // the generated case-class equals compares the Array[Double] by
  // REFERENCE, so two semantically identical expressions never compare
  // equal — defeating Catalyst canonicalization / common-subexpression
  // dedup. Compare the cuts by value (r18 ADVICE).
  override def equals(other: Any): Boolean = other match {
    case b: BucketByCuts =>
      child == b.child && scale == b.scale &&
        java.util.Arrays.equals(cuts, b.cuts)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(scale),
      Integer.valueOf(java.util.Arrays.hashCode(cuts)))
}

object BucketByCuts {

  /** Upper-bound binary search: the number of cuts ≤ v. Monotone
    * non-decreasing in v, stable under duplicate cuts. */
  def bucket(v: Double, cuts: Array[Double]): Long = {
    var lo = 0
    var hi = cuts.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cuts(mid) <= v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** Column wrapper. */
  def bucket_by_cuts(c: Column, cuts: Array[Double], scale: Int): Column = {
    import org.apache.spark.sql.{graftshim => shim}
    shim.column(BucketByCuts(shim.expression(c), cuts, scale))
  }
}
