package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) bit interleaving — the space-filling-curve key behind
  * multi-dimensional data layout (Z-ordered parquet files cluster BOTH
  * join/filter dimensions, so a range predicate on either column prunes
  * row groups; the same trick Delta/Iceberg expose as `OPTIMIZE ZORDER`).
  *
  * `morton(x, y)` interleaves the low 32 bits of each operand:
  * bit i of x lands at position 2i, bit i of y at 2i+1. The spread is the
  * classic parallel-prefix magic-mask ladder (5 shift/mask steps, no loop,
  * no branch), so the expression stays a straight-line static call inside
  * whole-stage codegen — the layout key costs ~10 ALU ops per row at
  * 100 TB write time, and nothing at read time.
  *
  * Scale rationale: sorting/range-partitioning by the Morton key is one
  * exchange at write time; every later scan with a predicate on either
  * dimension reads a contiguous fraction of the files instead of all of
  * them. This is the multi-dim generalization of the single-column
  * partition layout pinned by SinkSpec.
  */
case class InterleaveBits(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(LongType, LongType)
  override def dataType: DataType = LongType
  override def nullSafeEval(x: Any, y: Any): Any =
    InterleaveBits.morton(x.asInstanceOf[Long], y.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.InterleaveBits.morton($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): InterleaveBits =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "interleave_bits"
}

object InterleaveBits {

  /** Spread the low 32 bits of v to the even bit positions of a Long. */
  def spread(v0: Long): Long = {
    var v = v0 & 0xFFFFFFFFL
    v = (v | (v << 16)) & 0x0000FFFF0000FFFFL
    v = (v | (v << 8)) & 0x00FF00FF00FF00FFL
    v = (v | (v << 4)) & 0x0F0F0F0F0F0F0F0FL
    v = (v | (v << 2)) & 0x3333333333333333L
    v = (v | (v << 1)) & 0x5555555555555555L
    v
  }

  /** Interleave the low 32 bits of x (even positions) and y (odd). */
  def morton(x: Long, y: Long): Long = spread(x) | (spread(y) << 1)

  /** Column wrapper. */
  def interleave_bits(x: Column, y: Column): Column = {
    import org.apache.spark.sql.{graftshim => shim}
    shim.column(InterleaveBits(shim.expression(x), shim.expression(y)))
  }

  /** DuckDB-expressible mirror of [[morton]] restricted to the low
    * `bits` bits per operand — an unrolled sum of shifted bit tests, so
    * the oracle computes the identical key with plain SQL arithmetic. */
  def mortonSql(x: String, y: String, bits: Int): String = {
    val terms =
      (0 until bits).map(i => s"((($x >> $i) & 1) << ${2 * i})") ++
        (0 until bits).map(i => s"((($y >> $i) & 1) << ${2 * i + 1})")
    terms.mkString("(", " | ", ")")
  }
}
