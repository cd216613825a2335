package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Count–Min sketch (Cormode & Muthukrishnan 2005) as a typed
  * `Aggregator`: a depth×width counter grid summarizing an unbounded
  * token stream, answering point-frequency queries with one-sided error
  * (estimate ≥ true count, always; overcount bounded by collision mass,
  * ≤ 2n/width per row w.h.p.). Completes the mergeable-summary set next
  * to [[MisraGriesAgg]] (membership of heavy hitters) and HLL (distinct
  * counts): CMS answers "how often", the query sketches can't.
  *
  * Why this shape at 100 TB: the exact frequency table shuffles one row
  * per DISTINCT token (the full vocabulary); this sketch ships exactly
  * depth·width longs per map partition and merges by element-wise add —
  * associative and commutative, so the result is invariant under any
  * partitioning, retry, or executor count. The grid is a few KB however
  * large the corpus.
  *
  * Two hash families, same merge algebra:
  *  - "md5" (the catalog default): bucket_r(tok) = (first 4 hex digits
  *    of md5("r:tok")) mod width — the c01 percent-bucket arithmetic
  *    with a row-index salt, chosen because BOTH engines replay it
  *    bit-identically (DuckDB mirrors it in plain SQL — TextAnalysis
  *    .cmsBucketSql), so the ENTIRE sketch carries a value-level
  *    oracle (t17/st20).
  *  - "xx" (the production family): bucket = `xxhash64(tok, r)` mod
  *    width, in EXACTLY Spark SQL's chained-seed arithmetic (token
  *    hashed at seed 42, then the int row index folded on top — the
  *    same two-step the MinHash kernel uses per lane), so the built-in
  *    `functions.xxhash64` is an INDEPENDENT engine-side reference for
  *    the spec. ~20× cheaper per token than md5; not DuckDB-replayable,
  *    so cross-engine it is spec-pinned, not oracled — the d11 trade.
  *
  * reduce: +1 at (r, bucket_r(tok)) for every row r. merge: element-wise
  * sum. finish: the flat grid (row-major), read by the estimate join.
  */
class CountMinAgg(depth: Int, width: Int, hashFamily: String = "md5")
    extends Aggregator[String, Array[Long], Array[Long]] {

  require(hashFamily == "md5" || hashFamily == "xx",
    s"unknown CMS hash family: $hashFamily")
  // the md5 family draws buckets from the first two digest bytes
  // (0..65535): a width beyond that range would leave buckets ≥ 65536
  // permanently empty and silently skew every estimate (the DuckDB
  // mirror shares the limitation, so oracles could never catch it).
  // The xx family folds a full 64-bit hash, so ANY positive width
  // fills — no cap there (production widths go well past 2¹⁶)
  require(depth > 0, s"CMS depth must be positive: $depth")
  require(width > 0, s"CMS width must be positive: $width")
  require(hashFamily != "md5" || width <= 65536,
    s"md5-family CMS width must be ≤ 65536 (two digest bytes): $width")

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  /** The row-salted bucket. md5: first two digest bytes of "r:tok" as a
    * big-endian int (exactly `TextAnalysis.cmsBucketSql`'s arithmetic);
    * xx: Spark SQL's `xxhash64(tok, r)` chain — token bytes at seed 42,
    * then the int row index at seed h0 (`XxHash64Function` semantics),
    * so the codegen'd built-in recomputes the identical bucket. Exposed
    * to the spec, which checks it AGAINST that built-in. */
  private[graft] def bucketOf(r: Int, tok: String): Int = hashFamily match {
    case "md5" =>
      val d = md.digest(s"$r:$tok".getBytes(java.nio.charset.StandardCharsets.UTF_8))
      (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % width
    case _ =>
      val b = tok.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val h0 = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
        b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
      val h = org.apache.spark.sql.catalyst.expressions.XXH64.hashInt(r, h0)
      java.lang.Math.floorMod(h, width.toLong).toInt
  }

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], tok: String): Array[Long] = {
    var r = 0
    while (r < depth) { b(r * width + bucketOf(r, tok)) += 1L; r += 1 }
    b
  }

  override def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
    var i = 0
    while (i < x.length) { x(i) += y(i); i += 1 }
    x
  }

  override def finish(b: Array[Long]): Array[Long] = b

  override def bufferEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
