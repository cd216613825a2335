package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** Native Catalyst expressions for the reference's three scalar functions
  * (`OMTZHModifier.java:228,233,247-250`) — the codegen'd upgrade over the
  * Scala-UDF forms in [[Zh]] (SURVEY.md §4 "Codegen for the zh functions").
  *
  * Unlike a UDF (an opaque black box that breaks expression-level
  * optimization and forces Row-encoder boundaries), these participate in
  * whole-stage codegen: `defineCodeGen` splices a direct static call into
  * the generated Java, so the derivation pipeline stays one fused loop —
  * exactly how the reference hand-fuses its per-row `processRecord`.
  * Null handling comes from `UnaryExpression` (null in → null out), which
  * both ICU conversion and Han detection satisfy.
  */
case class ContainsHan(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(input: Any): Any =
    Zh.hasHanU(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Zh.hasHanU($c)")
  override protected def withNewChildInternal(newChild: Expression): ContainsHan =
    copy(child = newChild)
  override def prettyName: String = "contains_han"
}

/** ICU Traditional→Simplified conversion (reference `toSimple`, OMT:228). */
case class ZhToSimplified(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Zh.toSimplifiedU(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Zh.toSimplifiedU($c)")
  override protected def withNewChildInternal(newChild: Expression): ZhToSimplified =
    copy(child = newChild)
  override def prettyName: String = "zh_to_simplified"
}

/** ICU Simplified→Traditional conversion (reference `toTraditional`, OMT:233). */
case class ZhToTraditional(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    Zh.toTraditionalU(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Zh.toTraditionalU($c)")
  override protected def withNewChildInternal(newChild: Expression): ZhToTraditional =
    copy(child = newChild)
  override def prettyName: String = "zh_to_traditional"
}
