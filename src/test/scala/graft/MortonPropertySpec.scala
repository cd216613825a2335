package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.InterleaveBits

/** Property tests over the Morton layout kernels (no Spark session
  * needed — pure bit arithmetic). Fixed-seed scalacheck corpora, the
  * PairKernelPropertySpec convention. The properties are the ones the
  * Z-order layout actually relies on:
  *
  *  - ROUND-TRIP: every dimension's bits are recoverable from the key
  *    (no collision between distinct cells ⇒ range-partitioning by
  *    the key is a permutation of cells, never a merge).
  *  - LOCALITY ORDER: keys sort by interleaved-bit significance — the
  *    property that makes a contiguous key range a bounded tile.
  *  - n=2 ≡ the magic-mask ladder, at full 32-bit width.
  */
class MortonPropertySpec extends AnyFunSuite {

  private def gen16(n: Int, seed: Long): Seq[Array[Long]] =
    Gen.listOfN(200, Gen.listOfN(n, Gen.choose(0L, 65535L)))(
      Gen.Parameters.default, Seed(seed)).get.map(_.toArray)

  /** Reference inverse: extract dimension d from a round-robin key. */
  private def extract(key: Long, d: Int, n: Int, bits: Int): Long =
    (0 until bits).foldLeft(0L)((acc, i) =>
      acc | (((key >>> (i * n + d)) & 1L) << i))

  test("mortonN round-trips every dimension for n = 2, 3, 4 (16-bit buckets)") {
    for (n <- 2 to 4; xs <- gen16(n, 100 + n)) {
      val key = InterleaveBits.mortonN(xs, 16)
      (0 until n).foreach { d =>
        assert(extract(key, d, n, 16) == xs(d),
          s"dim $d of ${xs.toSeq} lost through key $key")
      }
    }
  }

  test("mortonN is injective over distinct cells (n = 3)") {
    val cells = gen16(3, 11).map(_.toSeq).distinct
    val keys = cells.map(c => InterleaveBits.mortonN(c.toArray, 16))
    assert(keys.distinct.size == keys.size,
      "distinct cells collided in the Morton key")
  }

  test("mortonN(n=2, 32 bits) equals the magic-mask morton on full-width operands") {
    val pairs = Gen.listOfN(300,
      Gen.zip(Gen.choose(0L, 0xFFFFFFFFL), Gen.choose(0L, 0xFFFFFFFFL)))(
      Gen.Parameters.default, Seed(23L)).get
    pairs.foreach { case (x, y) =>
      assert(InterleaveBits.mortonN(Array(x, y), 32) ==
        InterleaveBits.morton(x, y), s"drift on ($x, $y)")
    }
  }

  test("UNSIGNED key order refines the high-bit order of every dimension (tile locality)") {
    // if every dimension's TOP bucket bit of a is <= b's, and at least
    // one is <, then key(a) < key(b) whenever all lower bits equal —
    // i.e. the key's most significant positions are the dims' most
    // significant bits, which is exactly why a contiguous key range
    // stays inside a bounded box per dimension. UNSIGNED: n = 4 puts
    // dim 3's top bucket bit at position 63 — the Long sign bit — so
    // the curve contract is unsigned order, and the fold presents the
    // key to the engine's SIGNED range partitioner XOR'd with
    // Long.MinValue (Warehouse.compactManifested; this test pinned
    // the signed wrap before that fix existed).
    for (n <- 2 to 4) {
      val base = Array.fill(n)(0L)
      (0 until n).foreach { d =>
        val hi = base.clone(); hi(d) = 1L << 15
        val lo = base.clone(); lo(d) = (1L << 15) - 1 // all lower bits set
        assert(java.lang.Long.compareUnsigned(
          InterleaveBits.mortonN(hi, 16), InterleaveBits.mortonN(lo, 16)) > 0,
          s"n=$n dim $d: top bit does not dominate lower bits in key order")
        // and the engine-facing form (sign-bit XOR) orders the same
        // way under the SIGNED comparison the range partitioner uses
        assert((InterleaveBits.mortonN(hi, 16) ^ Long.MinValue) >
          (InterleaveBits.mortonN(lo, 16) ^ Long.MinValue),
          s"n=$n dim $d: signed order of the XOR'd key disagrees")
      }
    }
  }
}
