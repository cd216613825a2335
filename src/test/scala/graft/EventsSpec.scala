package graft

import org.apache.spark.sql.functions._
import graft.operators.Events

/** Hand-fixture pins for the event-analytics kernels whose distinguishing
  * edges the synthetic corpus barely exercises — the e10 conversion
  * window above all: on the shipped data almost no purchase falls inside
  * the 1-hour window, so a broken purchase-leg predicate would pass the
  * oracle gate with all-NULL p_us. */
class EventsSpec extends SparkSpec {

  import spark.implicits._

  private val H = 3600L * 1000000L // one hour in µs

  private def ts(us: Long) = new java.sql.Timestamp(us / 1000)

  test("time-bounded funnel: each leg honors its window; first-touch anchoring; e07 superset") {
    // u1: full conversion — click at +30 min of view, purchase at +50 min
    //     of click (both in window)
    // u2: click in window, purchase at +2 h of click → p_us NULL
    // u3: click at +2 h of view → c_us NULL, and the purchase 10 min
    //     after that click must NOT count (no valid click to anchor on)
    // u4: boundary — click EXACTLY +1 h (inclusive), purchase EXACTLY
    //     +1 h of click (inclusive)
    // u5: first-touch anchor — first view's window has no click, a
    //     second view 3 h later is followed by a click in ITS window:
    //     anchoring stays on the FIRST view, so c_us must be NULL
    val rows = Seq(
      (1L, "view", 0L), (1L, "click", 30 * 60 * 1000000L),
      (1L, "purchase", 80 * 60 * 1000000L),
      (2L, "view", 0L), (2L, "click", 10 * 60 * 1000000L),
      (2L, "purchase", 10 * 60 * 1000000L + 2 * H),
      (3L, "view", 0L), (3L, "click", 2 * H),
      (3L, "purchase", 2 * H + 10 * 60 * 1000000L),
      (4L, "view", 0L), (4L, "click", H), (4L, "purchase", 2 * H),
      (5L, "view", 0L), (5L, "view", 3 * H),
      (5L, "click", 3 * H + 10 * 60 * 1000000L)
    ).zipWithIndex.map { case ((u, tp, us), i) => (u, i.toLong, ts(us), tp) }
      .toDF("user_id", "event_id", "ts", "event_type")

    val got = Events.timeBoundedFunnel(rows).orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)).map(_.asInstanceOf[Long]),
        Option(r.get(2)).map(_.asInstanceOf[Long]),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSeq
    val m = 60 * 1000000L
    assert(got == Seq(
      (1L, Some(0L), Some(30 * m), Some(80 * m)),
      (2L, Some(0L), Some(10 * m), None),
      (3L, Some(0L), None, None),
      (4L, Some(0L), Some(H), Some(2 * H)),
      (5L, Some(0L), None, None)
    ), got.toString)

    // structural law vs e07: tightening each leg with a window can only
    // null out steps — never add or change a surviving timestamp
    val free = Events.funnel(rows).orderBy("user_id").collect()
      .map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2)), Option(r.get(3))))
    got.zip(free).foreach { case ((u, v, c, p), (u2, v2, c2, p2)) =>
      assert(u == u2 && v == v2.map(_.asInstanceOf[Long]))
      c.foreach(cv => assert(c2.contains(cv)))
      p.foreach(pv => assert(p2.contains(pv)))
    }
  }
}
