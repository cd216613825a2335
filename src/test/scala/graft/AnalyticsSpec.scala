package graft

import org.apache.spark.sql.functions._
import graft.operators.Analytics

/** The q73 skyline kernel — the distributed global-order prefix scan —
  * checked against the quadratic NOT-EXISTS definition it replaces, at
  * unit scale where quadratic is fine, including the edge cases the
  * window formulation gets wrong without care (exact duplicates,
  * same-price chains, empty range partitions). */
class AnalyticsSpec extends SparkSpec {

  import spark.implicits._

  // (key, price, epoch-day): crafted so the frontier includes a
  // same-price pair decided by date, an exact DUPLICATE pair (both must
  // survive — no strict edge), and dominated interior points
  private val fixture = Seq(
    (1L, 10.0, 100L), // frontier (cheapest)
    (2L, 10.0, 90L),  // dominated by 1 (same price, older)
    (3L, 20.0, 200L), // frontier
    (4L, 20.0, 200L), // exact duplicate of 3 — must ALSO survive
    (5L, 30.0, 150L), // dominated by 3 (pricier, older)
    (6L, 40.0, 300L), // frontier (newest)
    (7L, 35.0, 250L), // frontier (cheaper than 6, newer than 3)
    (8L, 50.0, 300L), // dominated by 6 (same date, pricier)
    (9L, 5.0, 50L)    // frontier (global cheapest)
  )

  private def df = fixture
    .map { case (k, p, d) => (k, p, java.sql.Date.valueOf(
      java.time.LocalDate.ofEpochDay(d))) }
    .toDF("o_orderkey", "o_totalprice", "o_orderdate")

  private def brute: Set[Long] = fixture.filter { a =>
    !fixture.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
      (b._2 < a._2 || b._3 > a._3))
  }.map(_._1).toSet

  test("skyline == quadratic NOT-EXISTS ground truth, duplicates survive") {
    val got = Analytics.skylinePareto(df).select("o_orderkey")
      .collect().map(_.getLong(0)).toSet
    assert(got == brute, s"got $got want $brute")
    assert(got.contains(3L) && got.contains(4L),
      "exact duplicates must BOTH be non-dominated")
    assert(!got.contains(2L) && !got.contains(8L),
      "same-price-older / same-date-pricier must be dominated")
  }

  test("skyline == brute force on seeded random sets (duplicate-heavy, clustered, uniform)") {
    // three deterministic generators stress different frontier shapes:
    // heavy duplicates (collision-prone small value grids), clustered
    // prices (long same-price chains), and uniform spread
    for ((seed, nRows, priceRange, dayRange) <- Seq(
        (42L, 200, 10, 10),    // dense collisions: many exact duplicates
        (7L, 300, 5, 1000),    // few prices — long same-price chains
        (13L, 500, 1000, 1000) // uniform
      )) {
      val rng = new scala.util.Random(seed)
      val rows = (1L to nRows.toLong).map(k =>
        (k, (rng.nextInt(priceRange) + 1).toDouble,
          rng.nextInt(dayRange).toLong + 1))
      val want = rows.filter { a =>
        !rows.exists(b => b._2 <= a._2 && b._3 >= a._3 &&
          (b._2 < a._2 || b._3 > a._3))
      }.map(_._1).toSet
      val in = rows.map { case (k, p, d) => (k, p, java.sql.Date.valueOf(
        java.time.LocalDate.ofEpochDay(d))) }
        .toDF("o_orderkey", "o_totalprice", "o_orderdate")
      val got = Analytics.skylinePareto(in, nPart = 8)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
      assert(got == want,
        s"seed=$seed: missing ${want -- got}, extra ${got -- want}")
    }
  }

  test("skyline is invariant to the range-partition count (incl. empty partitions)") {
    // 9 rows over 16 range partitions forces empty partitions — the
    // exclusive-prefix chain must carry across the gaps
    val results = Seq(1, 3, 16).map { n =>
      Analytics.skylinePareto(df, nPart = n)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
    }
    assert(results.distinct.size == 1, s"partition-count dependent: $results")
    assert(results.head == brute)
  }

  test("running records == sequential scan, invariant to partition count") {
    // ground truth: fold the fixture in (day, key) order, keep strict
    // new maxima — the definition the distributed kernel must match
    val want = {
      var mx = Double.NegativeInfinity
      fixture.sortBy(r => (r._3, r._1)).flatMap { r =>
        if (r._2 > mx) { mx = r._2; Some(r._1) } else None
      }.toSet
    }
    val results = Seq(1, 3, 16).map { n =>
      Analytics.runningRecords(df, nPart = n)
        .select("o_orderkey").collect().map(_.getLong(0)).toSet
    }
    assert(results.distinct.size == 1, s"partition-count dependent: $results")
    assert(results.head == want, s"got ${results.head} want $want")
    // strictness: a price TIE is not a record (row 1 repeats row 2's
    // price ten days later); a same-day strict increase IS (row 8
    // follows row 6 in key order and beats its price)
    assert(!results.head.contains(1L) && results.head.contains(8L))
  }

  test("cumulative share == sequential prefix sum, invariant to partition count") {
    // ground truth: exact integer cents folded in (day, key) order,
    // one terminal double division — the full-output emit shape
    val totalCents = fixture.map(r => math.round(r._2 * 100)).sum
    val want = {
      var cum = 0L
      fixture.sortBy(r => (r._3, r._1)).map { r =>
        cum += math.round(r._2 * 100)
        r._1 -> cum.toDouble / totalCents.toDouble
      }.toMap
    }
    val results = Seq(1, 3, 16).map { n =>
      Analytics.cumulativeRevenueShare(df, nPart = n)
        .select("o_orderkey", "cum_share").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    }
    assert(results.distinct.size == 1, s"partition-count dependent: $results")
    assert(results.head == want, s"got ${results.head} want $want")
    // every row emits (full-output instantiation), last share is 1.0
    assert(results.head.size == fixture.size)
    // last row of the global (day, key) order is key 8 (day 300 ties
    // with key 6, key order decides) — it must close at share 1.0
    assert(results.head(8L) == 1.0, "final row must close at share 1.0")
  }
}
