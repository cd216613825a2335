package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
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
  */
case class DotLL(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with CodegenFallback {

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

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLL =
    copy(left = newLeft, right = newRight)
}

object DotLL {
  def dot_ll(a: Column, b: Column): Column =
    shim.column(DotLL(shim.expression(a), shim.expression(b)))
}
