package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.{graftshim => shim}

/** Exact integer dot product of two bigint arrays in one tight loop.
  *
  * The composable form — `aggregate(zip_with(a, b, (x,y) -> x*y), 0,
  * (acc,v) -> acc+v)` — allocates the zipped array and evaluates two
  * lambda closures per element (higher-order functions sit outside
  * whole-stage codegen), which dominates the similarity kernels at
  * scale. Same exact integer semantics for equal-length inputs (the
  * quantized-embedding invariant; enforced in `Similarity.quantized`).
  *
  * Natively codegen'd: the brute-force ANN path evaluates this once per
  * (query, candidate) pair, so a CodegenFallback here would box both
  * arrays and break the surrounding whole-stage span on the hottest
  * inner loop in the engine.
  */
case class DotLL(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "dot_ll"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLL =
    copy(left = newLeft, right = newRight)
}

object DotLL {
  def dot_ll(a: Column, b: Column): Column =
    shim.column(DotLL(shim.expression(a), shim.expression(b)))
}
