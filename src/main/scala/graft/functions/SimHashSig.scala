package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.sql.{graftshim => shim}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass 64-bit SimHash over distinct whitespace tokens — the scalar
  * twin of [[MinHashSig]]: the composable formulation
  * (`Dedup.simHash`: explode distinct tokens → 64 conditional-sum
  * aggregates → 64-term bitwise OR) materializes every token as a row
  * and shuffles them; this expression folds the whole signature inside
  * the scan projection. Bit-compatible with the aggregate form — same
  * `xxhash64(token)` (seed 42), same sign rule (`sum > 0` sets the
  * bit), distinct-token semantics via an in-row hash set.
  *
  * Natively codegen'd (r7, the MinHashSig treatment): the generated
  * loop calls the same `catalyst.expressions.XXH64` statics Spark's
  * xxhash64 emits, so interpreted and generated paths are
  * bit-identical (ExpressionSpec compile-gate + parity).
  */
case class SimHashSig(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_sig"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val seen = new java.util.HashSet[UTF8String](words.length * 2)
    val sums = new Array[Int](64)
    var w = 0
    while (w < words.length) {
      val tok = words(w)
      if (seen.add(tok)) {
        val h = XxHash64Function.hash(tok, StringType, 42L)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) sums(i) += 1 else sums(i) -= 1
          i += 1
        }
      }
      w += 1
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (sums(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val sp = ctx.addReferenceObj("space", space, utf8)
      val words = ctx.freshName("words")
      val seen = ctx.freshName("seen")
      val sums = ctx.freshName("sums")
      val w = ctx.freshName("w")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val tok = ctx.freshName("tok")
      val h = ctx.freshName("h")
      val sig = ctx.freshName("sig")
      s"""
         |final $utf8[] $words = $in.split($sp, -1);
         |final java.util.HashSet $seen = new java.util.HashSet($words.length * 2);
         |final int[] $sums = new int[64];
         |for (int $w = 0; $w < $words.length; $w++) {
         |  final $utf8 $tok = $words[$w];
         |  if ($seen.add($tok)) {
         |    final long $h = $xxh.hashUnsafeBytes(
         |      $tok.getBaseObject(), $tok.getBaseOffset(), $tok.numBytes(), 42L);
         |    for (int $i = 0; $i < 64; $i++) {
         |      if ((($h >>> $i) & 1L) == 1L) $sums[$i] += 1; else $sums[$i] -= 1;
         |    }
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($sums[$j] > 0) $sig |= (1L << $j);
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSig =
    copy(child = newChild)
}

object SimHashSig {
  def simhash_sig(c: Column): Column = shim.column(SimHashSig(shim.expression(c)))
}
