package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{graftshim => shim}

/** Random-hyperplane LSH signature of a quantized bigint vector in one
  * tight pass: bit j = (v · plane_j ≥ 0), planes a ±1 matrix baked into
  * the expression (seed-derived — the SAME array generates the DuckDB
  * oracle mirror, so the engines cannot drift).
  *
  * Replaces the composable `sum of CASE WHEN aggregate(zip_with(...))`
  * form: that evaluates TWO lambda closures per (bit, element) and
  * allocates a zipped array per bit — nBits×dim closure dispatches per
  * row, sitting outside whole-stage codegen. This expression runs the
  * whole nBits×dim sweep as straight-line generated Java inside the
  * surrounding codegen span, and since plane entries are ±1 the inner
  * step is an add/subtract, not a multiply. Signature computation is
  * the map-side cost of every banded candidate generator (s02 buckets,
  * s04/p02 banded blocks), so this is the hot path of embedding dedup
  * at corpus scale.
  *
  * `planes` is a Seq-of-Seq so the case class gets CONTENT equality —
  * with raw nested arrays, two semantically identical signatures never
  * compare equal and Catalyst canonicalization / common-subexpression
  * elimination silently stop applying. Vector ELEMENTS are assumed
  * non-null (the quantized embedding columns are built with
  * containsNull = false); a null element would read as 0 here, where
  * the composable HOF form null-propagated the whole bit.
  */
case class HyperplaneSig(child: Expression, planes: Seq[Seq[Long]])
    extends UnaryExpression with ExpectsInputTypes {

  /** Primitive matrix for the hot loops (derived once per instance). */
  @transient private lazy val planeArr: Array[Array[Long]] =
    planes.map(_.toArray).toArray

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_sig"

  override def nullSafeEval(a: Any): Any = {
    val v = a.asInstanceOf[ArrayData]
    val pls = planeArr
    var bits = 0L
    var j = 0
    while (j < pls.length) {
      val p = pls(j)
      val n = math.min(v.numElements(), p.length)
      var dot = 0L
      var i = 0
      while (i < n) {
        val x = v.getLong(i)
        dot += (if (p(i) >= 0L) x else -x)
        i += 1
      }
      if (dot >= 0L) bits |= 1L << j
      j += 1
    }
    bits
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val pl = ctx.addReferenceObj("planes", planeArr, "long[][]")
      val bits = ctx.freshName("bits")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val row = ctx.freshName("row")
      val x = ctx.freshName("x")
      s"""
         |long $bits = 0L;
         |for (int $j = 0; $j < $pl.length; $j++) {
         |  final long[] $row = $pl[$j];
         |  final int $n = java.lang.Math.min($v.numElements(), $row.length);
         |  long $dot = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    final long $x = $v.getLong($i);
         |    $dot += ($row[$i] >= 0L) ? $x : -$x;
         |  }
         |  if ($dot >= 0L) $bits |= 1L << $j;
         |}
         |${ev.value} = $bits;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSig =
    copy(child = newChild)
}

object HyperplaneSig {
  def hyperplane_sig(v: Column, planes: Array[Array[Long]]): Column =
    shim.column(HyperplaneSig(shim.expression(v),
      planes.map(_.toSeq).toSeq))
}
