package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
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

/** N-ary Morton interleave (r17) — the ≥3-dimension form of
  * [[InterleaveBits]]: bit `i` of dimension `d` lands at position
  * `n·i + d` (the round-robin interleave Delta's OPTIMIZE ZORDER
  * uses), over the low `bits` bits of each operand, so `n · bits`
  * must fit the 64-bit key. The kernel is a plain bit loop (`n ×
  * bits` shift/or steps — ~48 ALU ops for 3×16 at write time only)
  * rather than the 2-D magic-mask ladder, emitted as ONE static call
  * so the expression stays inside whole-stage codegen like its
  * binary sibling. Null in any dimension → null key (the caller's
  * range partitioner groups nulls together, same as the 2-D form). */
case class InterleaveBitsN(children: Seq[Expression], bits: Int)
    extends Expression with ExpectsInputTypes {
  require(children.size >= 2, s"interleave_bits_n needs >= 2 dims, got ${children.size}")
  require(children.size * bits <= 64,
    s"interleave_bits_n: ${children.size} dims x $bits bits exceeds the 64-bit key")
  override def inputTypes: Seq[AbstractDataType] = Seq.fill(children.size)(LongType)
  override def dataType: DataType = LongType
  override def nullable: Boolean = children.exists(_.nullable)
  override def eval(input: InternalRow): Any = {
    val vs = new Array[Long](children.size)
    var i = 0
    while (i < children.size) {
      val v = children(i).eval(input)
      if (v == null) return null
      vs(i) = v.asInstanceOf[Long]
      i += 1
    }
    InterleaveBits.mortonN(vs, bits)
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val childrenCode = evals.map(_.code).reduce(_ + _)
    val anyNull = evals.map(_.isNull.toString).mkString(" || ")
    val call = s"graft.functions.InterleaveBits.mortonN(new long[]{" +
      evals.map(_.value.toString).mkString(", ") + s"}, $bits)"
    ev.copy(code = childrenCode +
      code"""
        boolean ${ev.isNull} = $anyNull;
        long ${ev.value} = ${ev.isNull} ? -1L : $call;
      """)
  }
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override def prettyName: String = "interleave_bits_n"
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

  /** Round-robin n-dim Morton over the low `bits` bits per operand:
    * bit i of dim d → position n·i + d. The interpreted kernel behind
    * [[InterleaveBitsN]]; for n = 2, bits = 32 it agrees bit-for-bit
    * with [[morton]] (pinned by ExpressionSpec). */
  def mortonN(xs: Array[Long], bits: Int): Long = {
    val n = xs.length
    var out = 0L
    var i = 0
    while (i < bits) {
      var d = 0
      while (d < n) {
        out |= ((xs(d) >>> i) & 1L) << (i * n + d)
        d += 1
      }
      i += 1
    }
    out
  }

  /** Column wrapper. */
  def interleave_bits(x: Column, y: Column): Column = {
    import org.apache.spark.sql.{graftshim => shim}
    shim.column(InterleaveBits(shim.expression(x), shim.expression(y)))
  }

  /** Column wrapper for the n-ary form (16-bit buckets by default —
    * the [[graft.operators.Warehouse.compactManifested]] zorderBy
    * bucket width; 4 dims fill the key). */
  def interleave_bits_n(xs: Seq[Column], bits: Int = 16): Column = {
    import org.apache.spark.sql.{graftshim => shim}
    shim.column(InterleaveBitsN(xs.map(shim.expression), bits))
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

  /** DuckDB-expressible mirror of the n-ary [[mortonN]] INCLUDING the
    * sign-XOR fold — the exact signed value of
    * `interleave_bits_n(cols, bits).bitwiseXOR(Long.MinValue)`, the
    * key [[graft.operators.Warehouse.compactManifested]] range-
    * partitions a `zorderBy` fold on. Same unrolled bit-test sum as
    * [[mortonSql]], position `n·i + d`, but over HUGEINT: with
    * n·bits = 64 the top term lands on bit 63, which 64-bit SQL
    * arithmetic cannot place without overflow. In the wider type the
    * XOR-with-2⁶³ fold collapses to plain arithmetic: for an unsigned
    * key k ∈ [0, 2⁶⁴), `k XOR 2⁶³` reinterpreted signed is k − 2⁶³ in
    * BOTH halves — so the mirror is `CAST(Σ terms − 2⁶³ AS BIGINT)`,
    * bit-for-bit the engine's folded key (ExpressionSpec pins the
    * agreement; the v15 catalog row puts it under the DuckDB oracle). */
  def mortonSqlN(cols: Seq[String], bits: Int): String = {
    require(cols.size >= 2 && cols.size * bits <= 64,
      s"mortonSqlN: ${cols.size} dims x $bits bits exceeds the 64-bit key")
    val n = cols.size
    val terms = for {
      (c, d) <- cols.zipWithIndex
      i <- 0 until bits
    } yield s"(CAST((($c >> $i) & 1) AS HUGEINT) << ${n * i + d})"
    terms.mkString("CAST((", " + ", ") - 9223372036854775808 AS BIGINT)")
  }
}
