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
  * Hash family: bucket_r(tok) = (first 4 hex digits of md5("r:tok"))
  * mod width — the c01 percent-bucket arithmetic with a row-index salt.
  * md5 is chosen because BOTH engines can replay it bit-identically
  * (DuckDB mirrors it in plain SQL — see TextAnalysis.cmsBucketSql), so
  * the ENTIRE sketch, not just a property of it, carries a value-level
  * oracle. A production deployment would swap the two-line [[bucket]]
  * for the XXH64 statics the MinHash/SimHash kernels codegen against —
  * same API, same merge algebra, no oracle then (d11-pin pattern
  * instead).
  *
  * reduce: +1 at (r, bucket_r(tok)) for every row r. merge: element-wise
  * sum. finish: the flat grid (row-major), read by the estimate join.
  */
class CountMinAgg(depth: Int, width: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  /** First 4 hex digits of md5("r:tok") mod width — i.e. the first two
    * digest bytes as a big-endian int. Exactly `TextAnalysis
    * .cmsBucketSql`'s arithmetic (oracle mirror) and `Corpus
    * .hashBucket`'s shape (the c01 split family). */
  private def bucket(r: Int, tok: String): Int = {
    val d = md.digest(s"$r:$tok".getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % width
  }

  override def zero: Array[Long] = new Array[Long](depth * width)

  override def reduce(b: Array[Long], tok: String): Array[Long] = {
    var r = 0
    while (r < depth) { b(r * width + bucket(r, tok)) += 1L; r += 1 }
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
