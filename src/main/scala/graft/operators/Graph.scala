package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relational edge lists — PageRank as
  * the representative fixed-point computation (the reference has no
  * graph surface; this is north-star coverage for corpus link analysis,
  * e.g. ranking hosts/documents in a web-scale crawl before sampling).
  *
  * All arithmetic is FIXED-POINT int64 (scale 1e12): rank mass, the
  * per-edge contribution `rank div deg`, and the damping step
  * `teleport + (sum · 85) div 100` are integer ops, so every engine
  * computes bit-identical values — the same determinism stance as the
  * catalog's decimal aggregates (floating PageRank never hash-compares
  * cross-engine, and at 1000 executors isn't even self-reproducible
  * because float addition isn't associative). The oracle unrolls the
  * five iterations as chained CTEs; DuckDB's `//` and Spark's `div`
  * agree on non-negative operands.
  *
  * Scale notes: the edge list with degrees is computed once and cached;
  * each round is one shuffle (contributions grouped by destination) —
  * the irreducible Pregel superstep cost. Lineage is cut per round
  * (`cutLineage`) so the logical plan stays O(1) deep instead of
  * O(rounds); the previous round's cache is released eagerly. Total
  * rank mass is bounded by SCALE, so `sum · 85` tops out near 8.5e13 —
  * no int64 overflow at any node count.
  */
object Graph {

  val SCALE = 1000000000000L // 1e12: 12 fixed decimal digits of rank

  /** Undirected bipartite part↔supplier edge list from lineitem;
    * node id = 2·partkey for parts, 2·suppkey+1 for suppliers. */
  def partSupplierEdges(lineitem: DataFrame): DataFrame = {
    val e = lineitem
      .select((col("l_partkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
      .distinct()
    e.union(e.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** `iters` rounds of damped PageRank over an undirected edge list
    * (`src`, `dst`), in fixed-point int64. Returns (node, pr). */
  def pageRank(edges: DataFrame, iters: Int = 5): DataFrame = {
    val spark = edges.sparkSession
    val deg = edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("d"))
    // one cached (src, dst, d) relation serves every round
    val (adj, adjRdd) = cutLineage(
      edges.join(deg, edges("src") === deg("node")).select(col("src"), col("dst"), col("d")))
    val n = adj.select(col("src")).distinct().count()
    val teleport = SCALE * 15 / 100 / n
    var (pr, prRdd) = cutLineage(
      adj.select(col("src").as("node")).distinct().withColumn("pr", lit(SCALE / n)))
    for (_ <- 1 to iters) {
      val next = adj.join(pr, adj("src") === pr("node"))
        .select(col("dst"), expr("pr div d").as("contrib"))
        .groupBy(col("dst").as("node"))
        .agg((lit(teleport) + expr("(sum(contrib) * 85) div 100")).as("pr"))
      val (cut, cutRdd) = cutLineage(next)
      prRdd.unpersist()
      pr = cut; prRdd = cutRdd
    }
    // materialize the (tiny, O(nodes)) result NOW, while adj is still
    // cached — unpersisting adj before the action would silently
    // recompute the edge+degree join once per round; localCheckpoint
    // pins the result so both caches can be released leak-free
    val out = pr.select(col("node"), col("pr")).localCheckpoint(true)
    prRdd.unpersist(blocking = false)
    adjRdd.unpersist(blocking = false)
    out
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "g01_pagerank" -> ((s, d) => pageRank(partSupplierEdges(t(s, d, "lineitem")), iters = 5))
  )

  private def oracleRounds(iters: Int): String =
    (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT u.dst AS node,
         |         CAST(150000000000 // (SELECT n FROM nn)
         |              + (sum(p.pr // d.d) * 85) // 100 AS BIGINT) AS pr
         |  FROM pr${i - 1} p
         |  JOIN deg d ON d.node = p.node
         |  JOIN und u ON u.src = p.node
         |  GROUP BY u.dst)""".stripMargin
    }.mkString(",\n")

  def oracleSql: Map[String, String] = Map(
    "g01_pagerank" ->
      s"""WITH e0 AS (
         |  SELECT DISTINCT l_partkey * 2 AS src, l_suppkey * 2 + 1 AS dst FROM lineitem),
         |und AS (SELECT src, dst FROM e0 UNION ALL SELECT dst AS src, src AS dst FROM e0),
         |deg AS (SELECT src AS node, count(*) AS d FROM und GROUP BY src),
         |nn AS (SELECT count(*) AS n FROM deg),
         |pr0 AS (
         |  SELECT node, CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS pr FROM deg),
         |${oracleRounds(5)}
         |SELECT node, pr FROM pr5""".stripMargin
  )
}
