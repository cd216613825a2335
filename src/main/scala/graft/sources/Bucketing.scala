package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table layout — the 100 TB co-located-join strategy.
  *
  * The reference's only join-equivalent runs as per-row point UPDATEs
  * against a b-tree index (`OMTZHModifier.java:89-99,156-178`); the
  * warehouse-scale analogue is hash-bucketing both sides of a repeated
  * equi-join key at write time so the join needs NO exchange at read
  * time (Spark matches `HashPartitioning(key, n)` output partitioning
  * from the bucketed scan). PlanSpec asserts the shuffle-free plan.
  *
  * At 100 TB: bucket count sized so bucket × file-size ≈ target split
  * (e.g. 2048 buckets for a 10 TB fact), sortBy on the key makes the
  * join a streaming merge within buckets.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table (idempotent). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Bucketize lineitem + orders on the join key; returns the pair.
    * Both tables are checked — a run killed between the two writes must
    * not leave the guard permanently satisfied by the first table. */
  def bucketedPair(spark: SparkSession, dir: String, buckets: Int = 8): (DataFrame, DataFrame) = {
    if (!spark.catalog.tableExists("li_bucketed") || !spark.catalog.tableExists("o_bucketed")) {
      writeBucketed(Tables(spark, dir, "lineitem"), "li_bucketed", "l_orderkey", buckets)
      writeBucketed(Tables(spark, dir, "orders"), "o_bucketed", "o_orderkey", buckets)
    }
    (spark.table("li_bucketed"), spark.table("o_bucketed"))
  }
}
