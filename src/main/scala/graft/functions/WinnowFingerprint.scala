package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.AbstractDataType
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.{graftshim => shim}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing document fingerprint over a Rabin–Karp ROLLING hash
  * (Schleimer, Wilkerson, Aiken — "Winnowing: Local Algorithms for
  * Document Fingerprinting", SIGMOD 2003): hash every k-gram of the
  * UTF-8 byte stream in O(1) amortized via the rolling recurrence
  * `h' = (h − c₀·bᵏ⁻¹)·b + c_new`, then keep the minimum hash of each
  * window of `w` consecutive k-gram hashes, deduplicating repeats —
  * the standard near-dup/similarity fingerprint that guarantees any
  * shared substring of length ≥ w+k−1 yields a shared fingerprint.
  *
  * Returns the sorted distinct fingerprint array. Position-independent
  * by construction, so overlap between documents is a plain
  * `array_intersect` — no shuffle-heavy shingle explode anywhere.
  *
  * Natively codegen'd (r7): the generated loop is the same rolling
  * recurrence + monotonic-deque sliding minimum over primitive arrays
  * (sort+dedupe replaces the interpreted TreeSet — same sorted
  * distinct output), gated by ExpressionSpec compile + parity.
  */
case class WinnowFingerprint(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprint"

  private val Base = 1000003L
  // Base^(k-1) for the rolling subtraction, in wrapping 64-bit arithmetic
  private val BasePow: Long = {
    var p = 1L; var i = 1
    while (i < k) { p *= Base; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val n = bytes.length
    if (n < k) return ArrayData.toArrayData(Array.empty[Long])
    // rolling k-gram hashes
    val grams = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
    grams(0) = h
    while (i < n) {
      h = (h - (bytes(i - k) & 0xff) * BasePow) * Base + (bytes(i) & 0xff)
      grams(i - k + 1) = h
      i += 1
    }
    // winnow: min per window of w (rightmost min on ties), dedupe runs.
    // O(n) monotonic-deque sliding minimum — popping `>=` from the back
    // makes the RIGHTMOST minimal gram survive, matching the winnowing
    // tie rule. Short docs degrade to one window over all grams.
    val win = math.min(w, grams.length)
    val out = scala.collection.mutable.TreeSet.empty[Long]
    val deque = new Array[Int](grams.length) // indices, values increasing
    var head = 0
    var tail = 0 // exclusive
    var i2 = 0
    while (i2 < grams.length) {
      while (tail > head && grams(deque(tail - 1)) >= grams(i2)) tail -= 1
      deque(tail) = i2; tail += 1
      if (deque(head) <= i2 - win) head += 1
      if (i2 >= win - 1) out += grams(deque(head))
      i2 += 1
    }
    ArrayData.toArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val uad = "org.apache.spark.sql.catalyst.expressions.UnsafeArrayData"
      val bytes = ctx.freshName("bytes")
      val n = ctx.freshName("n")
      val grams = ctx.freshName("grams")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      val win = ctx.freshName("win")
      val mins = ctx.freshName("mins")
      val nm = ctx.freshName("nm")
      val deque = ctx.freshName("deque")
      val head = ctx.freshName("head")
      val tail = ctx.freshName("tail")
      val u = ctx.freshName("u")
      val t = ctx.freshName("t")
      s"""
         |final byte[] $bytes = $in.getBytes();
         |final int $n = $bytes.length;
         |if ($n < $k) {
         |  ${ev.value} = $uad.fromPrimitiveArray(new long[0]);
         |} else {
         |  final long[] $grams = new long[$n - $k + 1];
         |  long $h = 0L;
         |  int $i = 0;
         |  for (; $i < $k; $i++) { $h = $h * ${Base}L + ($bytes[$i] & 0xff); }
         |  $grams[0] = $h;
         |  for (; $i < $n; $i++) {
         |    $h = ($h - ($bytes[$i - $k] & 0xff) * ${BasePow}L) * ${Base}L
         |      + ($bytes[$i] & 0xff);
         |    $grams[$i - $k + 1] = $h;
         |  }
         |  final int $win = java.lang.Math.min($w, $grams.length);
         |  final long[] $mins = new long[$grams.length];
         |  int $nm = 0;
         |  final int[] $deque = new int[$grams.length];
         |  int $head = 0;
         |  int $tail = 0;
         |  for (int $t = 0; $t < $grams.length; $t++) {
         |    while ($tail > $head && $grams[$deque[$tail - 1]] >= $grams[$t]) $tail--;
         |    $deque[$tail] = $t; $tail++;
         |    if ($deque[$head] <= $t - $win) $head++;
         |    if ($t >= $win - 1) $mins[$nm++] = $grams[$deque[$head]];
         |  }
         |  java.util.Arrays.sort($mins, 0, $nm);
         |  int $u = 0;
         |  for (int $t = 0; $t < $nm; $t++) {
         |    if ($t == 0 || $mins[$t] != $mins[$t - 1]) { $mins[$u] = $mins[$t]; $u++; }
         |  }
         |  ${ev.value} = $uad.fromPrimitiveArray(java.util.Arrays.copyOfRange($mins, 0, $u));
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprint =
    copy(child = newChild)
}

object WinnowFingerprint {
  def winnow_fingerprint(c: Column, k: Int = 8, w: Int = 16): Column =
    shim.column(WinnowFingerprint(shim.expression(c), k, w))
}
