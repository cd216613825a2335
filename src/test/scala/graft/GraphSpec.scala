package graft

import graft.operators.Graph
import org.apache.spark.sql.functions._

/** Pins the fixed-point PageRank against an independent driver-side
  * reference implementation of the same integer recurrence. */
class GraphSpec extends SparkSpec {

  /** Reference: adjacency as Map[node -> neighbors], same int64 math. */
  private def refPageRank(adj: Map[Long, Seq[Long]], iters: Int): Map[Long, Long] = {
    val n = adj.size
    val teleport = Graph.SCALE * 15 / 100 / n
    var pr = adj.keys.map(_ -> Graph.SCALE / n).toMap
    for (_ <- 1 to iters) {
      val inbox = collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((u, vs) <- adj; contrib = pr(u) / vs.size; v <- vs)
        inbox(v) += contrib
      pr = adj.keys.map(u => u -> (teleport + inbox(u) * 85 / 100)).toMap
    }
    pr
  }

  test("pageRank matches the integer reference on a path graph") {
    import spark.implicits._
    // path a-b-c-d plus a pendant e off b: mixed degrees 1..3
    val undirected = Seq(1L -> 2L, 2L -> 3L, 3L -> 4L, 2L -> 5L)
    val edges = (undirected ++ undirected.map(_.swap)).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val adj = (undirected ++ undirected.map(_.swap))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    assert(got == refPageRank(adj, 4))
  }

  test("two-node graph sits at the analytic fixed point") {
    import spark.implicits._
    // deg 1 both sides: r = teleport + 0.85 r  =>  r = SCALE/2 exactly
    val edges = Seq(1L -> 2L, 2L -> 1L).toDF("src", "dst")
    val got = Graph.pageRank(edges, iters = 3)
      .collect().map(_.getLong(1)).toSet
    assert(got == Set(Graph.SCALE / 2))
  }

  test("rank mass stays bounded by SCALE (no overflow headroom loss)") {
    val li = operators.t(spark, "/root/testdata/sf0.001", "lineitem")
    val pr = Graph.pageRank(Graph.partSupplierEdges(li), iters = 5)
    val total = pr.agg(sum("pr")).collect().head.getLong(0)
    assert(total > 0L && total <= Graph.SCALE)
  }

  test("triangleStats: known graphs — K4, star, path") {
    import spark.implicits._
    def stats(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) = {
      val r = Graph.triangleStats(edges.toDF("u", "v")).collect().head
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    }
    // K4: 4 nodes, 6 edges, every vertex degree 3 → 12 wedges, 4 triangles
    assert(stats(Seq((1L,2L),(1L,3L),(1L,4L),(2L,3L),(2L,4L),(3L,4L))) == (4L, 6L, 12L, 4L))
    // star S4 (hub 0): degree-skew case — wedges only at the hub, 0 triangles
    assert(stats(Seq((0L,1L),(0L,2L),(0L,3L),(0L,4L))) == (5L, 4L, 6L, 0L))
    // path: 0 triangles, wedge at each interior node
    assert(stats(Seq((1L,2L),(2L,3L),(3L,4L))) == (4L, 3L, 2L, 0L))
  }

  test("kCore: K4+tail peels the tail, keeps the clique; known fixture exact") {
    import spark.implicits._
    // K4 on {0,1,2,3} plus a tail 3–4–5: 3-core = exactly the K4
    val und = Seq((0L,1L),(0L,2L),(0L,3L),(1L,2L),(1L,3L),(2L,3L),(3L,4L),(4L,5L))
    val edges = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = Graph.kCore(edges, k = 3, rounds = 4).as[(Long, Long)].collect().toSeq
    assert(got == Seq((0L,3L),(1L,3L),(2L,3L),(3L,3L)))
  }

  test("labelPropagation: two cliques joined by a bridge keep separate communities") {
    import spark.implicits._
    // Two K4 cliques {0..3} and {10..13} with one bridge 3–10: frequency
    // voting converges each clique to its min label, and the single
    // bridge vote never outvotes 3 clique votes — min-label components
    // (d07) would collapse this graph to ONE label; LPA must not
    val c1 = Seq((0L,1L),(0L,2L),(0L,3L),(1L,2L),(1L,3L),(2L,3L))
    val c2 = c1.map { case (a, b) => (a + 10L, b + 10L) }
    val got = Graph.labelPropagation((c1 ++ c2 :+ (3L, 10L)).toDF("u", "v"))
      .as[(Long, Long)].collect().toMap
    assert((0L to 3L).forall(got(_) == 0L), s"clique 1 not converged: $got")
    assert((10L to 13L).forall(got(_) == 10L), s"clique 2 leaked across the bridge: $got")
  }

  test("kCore: bench fixture converges within the default rounds (round-4 ≡ round-5)") {
    val edges = Graph.partSupplierEdges(
      graft.sources.Tables(spark, "/root/testdata/sf0.001", "lineitem"))
    val r4 = Graph.kCore(edges, 3, 4).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val r5 = Graph.kCore(edges, 3, 5).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(r4 == r5, "peeling had not converged at the default round count")
    assert(r4.forall(_._2 >= 3L))
  }
}
