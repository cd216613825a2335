package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.sql.{graftshim => shim}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass MinHash signature: k min-hashes over word-3-shingles of a
  * document, computed inside a single narrow projection.
  *
  * The composable formulation (explode shingles → k min-aggregates,
  * `Dedup.minHashSignatures`) materializes |doc| shingle rows and runs a
  * 64-column hash aggregate — a shuffle of the whole exploded corpus. At
  * 100 TB that explode is the dominant cost; this expression keeps the
  * scan → signature pipeline shuffle-free (the only shuffle left in
  * near-dup detection is the tiny banded-bucket join).
  *
  * Hashes are bit-compatible with the aggregate formulation
  * (`xxhash64(shingle, j)` — XxHash64 seeded at 42 over the UTF8 bytes,
  * then the band index j hashed on top), asserted by DedupSpec.
  *
  * Natively codegen'd (the DotLL treatment): the signature pass is the
  * map-side cost of MinHash dedup — the hottest kernel of the 100 TB
  * dedup path — and a CodegenFallback here would force the surrounding
  * projection to materialize an InternalRow and box the result per
  * document. The generated loop calls the same
  * `catalyst.expressions.XXH64` statics Spark's own xxhash64 codegen
  * emits (`hashUnsafeBytes`/`hashInt`), so
  * interpreted and generated paths are bit-identical (gated by
  * ExpressionSpec's GenerateMutableProjection compile test).
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    // UTF8String.split with limit -1 ≡ Spark's split(text, ' ') —
    // trailing empty tokens preserved, unlike java.lang.String#split
    val words = input.asInstanceOf[UTF8String].split(space, -1)
    val mins = Array.fill(k)(Long.MaxValue)
    val nShingles = math.max(words.length - 2, 1)
    var i = 0
    while (i < nShingles) {
      // 3-shingle with clamped tail — same shape as the aggregate form
      val s = UTF8String.concatWs(space, words(i),
        words(math.min(i + 1, words.length - 1)),
        words(math.min(i + 2, words.length - 1)))
      val h0 = XxHash64Function.hash(s, StringType, 42L)
      var j = 0
      while (j < k) {
        // xxhash64(shingle, lit(j)): an IntegerType literal on top of
        // the string hash — must use the int path, not the long path
        val h = XxHash64Function.hash(j, IntegerType, h0)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    ArrayData.toArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val utf8 = "org.apache.spark.unsafe.types.UTF8String"
      val xxh = "org.apache.spark.sql.catalyst.expressions.XXH64"
      val sp = ctx.addReferenceObj("space", space, utf8)
      val words = ctx.freshName("words")
      val mins = ctx.freshName("mins")
      val nsh = ctx.freshName("nsh")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val sh = ctx.freshName("sh")
      val h0 = ctx.freshName("h0")
      val h = ctx.freshName("h")
      s"""
         |final $utf8[] $words = $in.split($sp, -1);
         |final long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |final int $nsh = java.lang.Math.max($words.length - 2, 1);
         |for (int $i = 0; $i < $nsh; $i++) {
         |  final $utf8 $sh = $utf8.concatWs($sp, $words[$i],
         |    $words[java.lang.Math.min($i + 1, $words.length - 1)],
         |    $words[java.lang.Math.min($i + 2, $words.length - 1)]);
         |  final long $h0 = $xxh.hashUnsafeBytes(
         |    $sh.getBaseObject(), $sh.getBaseOffset(), $sh.numBytes(), 42L);
         |  for (int $j = 0; $j < $k; $j++) {
         |    final long $h = $xxh.hashInt($j, $h0);
         |    if ($h < $mins[$j]) $mins[$j] = $h;
         |  }
         |}
         |${ev.value} =
         |  org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {
  def minhash_sig(c: Column, k: Int = 64): Column =
    shim.column(MinHashSig(shim.expression(c), k))
}
