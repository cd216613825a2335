package graft

import org.apache.spark.sql.functions._
import graft.operators.{AsOf, Dedup}

/** As-of join semantics (latest right row at-or-before each left row)
  * and duplicate-cluster connected components. */
class AsOfSpec extends SparkSpec {

  import spark.implicits._

  test("asof join: latest at-or-before, equal-ts inclusive, null when none") {
    val clicks = Seq( // (user, click_id, ts)
      (1L, 100L, 50L), // after two views -> latest (ts 40)
      (1L, 101L, 40L), // exactly at a view's ts -> that view (<=)
      (1L, 102L, 5L),  // before every view -> null
      (2L, 103L, 10L)  // user with no views -> null
    ).toDF("user_id", "click_id", "c_ts")
    val views = Seq( // (user, view_id, ts)
      (1L, 900L, 10L), (1L, 901L, 40L)
    ).toDF("user_id", "view_id", "v_ts")

    val out = AsOf.asofJoin(clicks, views, "user_id", "c_ts", "v_ts",
        "view_id", Seq("view_id", "v_ts"))
      .select("click_id", "view_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out == Map(100L -> 901L, 101L -> 901L, 102L -> -1L, 103L -> -1L))
  }

  test("asof join: ties on right ts resolved by rightSeq (max wins)") {
    val clicks = Seq((1L, 100L, 50L)).toDF("user_id", "click_id", "c_ts")
    val views = Seq((1L, 900L, 40L), (1L, 905L, 40L))
      .toDF("user_id", "view_id", "v_ts")
    val out = AsOf.asofJoin(clicks, views, "user_id", "c_ts", "v_ts",
        "view_id", Seq("view_id")).select("view_id").as[Long].head()
    assert(out == 905L)
  }

  test("asof join: right payload attaches atomically (no cross-row mix)") {
    // latest view (ts 40) has a NULL referrer; an older view (ts 10) has
    // one. ASOF must attach the latest row WHOLE — view_id 901 with a
    // null referrer — never 901's id with 900's referrer backfilled.
    val clicks = Seq((1L, 100L, 50L)).toDF("user_id", "click_id", "c_ts")
    val views = Seq(
      (1L, 900L, 10L, Option("ads")), (1L, 901L, 40L, Option.empty[String])
    ).toDF("user_id", "view_id", "v_ts", "referrer")
    val r = AsOf.asofJoin(clicks, views, "user_id", "c_ts", "v_ts",
        "view_id", Seq("view_id", "referrer")).select("view_id", "referrer")
      .collect().head
    assert(r.getLong(0) == 901L && r.isNullAt(1))
  }

  test("native as-of exec: same edge semantics as the composed operator") {
    val clicks = Seq(
      (1L, 100L, 50L), (1L, 101L, 40L), (1L, 102L, 5L), (2L, 103L, 10L)
    ).toDF("user_id", "click_id", "c_ts")
    val views = Seq((1L, 900L, 10L), (1L, 901L, 40L), (1L, 905L, 40L))
      .toDF("user_id", "view_id", "v_ts")
    val composed = AsOf.asofJoin(clicks, views, "user_id", "c_ts", "v_ts",
        "view_id", Seq("view_id", "v_ts"))
      .orderBy("click_id").collect().map(_.toSeq).toSeq
    val native = AsOf.asofJoinNative(clicks, views, "user_id", "c_ts", "v_ts",
        "view_id", Seq("view_id", "v_ts"))
      .orderBy("click_id").collect().map(_.toSeq).toSeq
    // equal-ts inclusive (click 101 -> max-seq view at ts 40), null when
    // none (102), missing key (user 2) — identical on both paths
    assert(native == composed, s"native=$native composed=$composed")
    assert(native.head(3) == 905L) // click 100: latest view, max seq among ties
  }

  test("duplicate clusters: components found across chained pairs") {
    // a-b, b-c chained; d-e separate; min doc_id labels the cluster
    val pairs = Seq((2L, 7L), (7L, 3L), (10L, 11L)).toDF("a_id", "b_id")
    val got = Dedup.duplicateClusters(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(2L -> 2L, 7L -> 2L, 3L -> 2L, 10L -> 10L, 11L -> 10L))
  }

  test("native as-of == composed as-of on randomized inputs") {
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 4) {
      // few keys + tiny ts range forces heavy ties, interleaving,
      // users with no views, and views after every click
      val nKeys = 1 + trial
      def k() = rnd.nextInt(nKeys).toLong
      def ts() = rnd.nextInt(12).toLong
      val clicks = (0 until 60).map(i => (k(), 100L + i, ts()))
        .toDF("user_id", "click_id", "c_ts")
      val views = (0 until 40).map(i => (k(), 900L + i, ts()))
        .toDF("user_id", "view_id", "v_ts")
        .groupBy("user_id", "v_ts").agg(max("view_id").as("view_id"))
      def canon(df: org.apache.spark.sql.DataFrame) =
        df.orderBy("click_id").collect().map(_.toSeq).toSeq
      val composed = canon(AsOf.asofJoin(clicks, views, "user_id",
        "c_ts", "v_ts", "view_id", Seq("view_id", "v_ts")))
      val native = canon(AsOf.asofJoinNative(clicks, views, "user_id",
        "c_ts", "v_ts", "view_id", Seq("view_id", "v_ts")))
      assert(native == composed, s"trial $trial mismatch")
    }
  }

  test("large-star/small-star components == min-label propagation (random + chain)") {
    val rnd = new scala.util.Random(7)
    for (trial <- 0 until 4) {
      // random edges over n nodes plus one long chain (the adversarial
      // diameter case large-star/small-star exists for)
      val n = 40 + trial * 20
      val random = Seq.fill(n)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val chainBase = 1000L
      val chain = (0 until 30).map(i => (chainBase + i, chainBase + i + 1))
        .map { case (a, b) => (a.toLong, b.toLong) }
      val pairs = (random ++ chain).toDF("a_id", "b_id")
      val simple = Dedup.duplicateClusters(pairs)
        .as[(Long, Long)].collect().toMap
      val star = Dedup.duplicateClustersLargeStar(pairs)
        .as[(Long, Long)].collect().toMap
      assert(star == simple, s"trial $trial: star=$star simple=$simple")
    }
  }

  test("duplicate clusters: empty pair input yields an empty result") {
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    assert(Dedup.duplicateClusters(pairs).count() == 0L)
  }

  test("tf-idf: rarer term outranks commoner term at equal tf") {
    val docs = Seq(
      (1L, "apple banana"), (2L, "apple cherry"), (3L, "apple banana")
    ).toDF("doc_id", "text")
    val top = graft.operators.TextAnalysis.tfIdfTopTerms(docs, 1)
      .select("doc_id", "term").as[(Long, String)].collect().toMap
    // "apple" df=3 is everywhere; the doc-specific term must rank first
    assert(top == Map(1L -> "banana", 2L -> "cherry", 3L -> "banana"))
  }
}
