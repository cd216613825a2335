package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Shared helpers for the operator catalog.
  *
  * Cross-engine determinism: the driver hash-compares our results against
  * DuckDB. Floating-point SUM/AVG are order-dependent, so both engines
  * first cast to an exact DECIMAL, sum exactly, and only then convert the
  * final (order-independent) value back to DOUBLE. A single terminal
  * double conversion/division is bit-exact across IEEE-754 engines.
  */
package object operators {

  /** Iterative-loop round barrier: truncates the logical plan (an uncut
    * round plan references the previous round's twice, so analysis goes
    * exponential with round count) while keeping the round's data hot.
    * The internal-row RDD is lazily cached — one materialization job per
    * round, AQE intact, blocks reclaimed by the ContextCleaner once the
    * wrapping DataFrame is unreferenced. Returns the cut DataFrame plus
    * the cached RDD handle so the loop can unpersist the PREVIOUS round
    * promptly instead of waiting for GC. */
  def cutLineage(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) = {
    // .copy() is load-bearing: toRdd streams REUSED UnsafeRow buffers —
    // persisting them uncopied caches aliased references (row loss)
    val rdd = df.queryExecution.toRdd.map(_.copy())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (org.apache.spark.sql.graftshim.wrapInternalRdd(df.sparkSession, rdd, df.schema), rdd)
  }

  /** Load `name`.parquet from the scale-factor dir. */
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    graft.sources.Tables(spark, dir, name)

  /** Order-independent exact sum of a double column, returned as double.
    * DuckDB equivalent: CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE). */
  def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 4))).cast("double")

  /** Order-independent mean: exact decimal sum / count, one double div.
    * DuckDB: CAST(sum(CAST(x AS DECIMAL(18,4))) AS DOUBLE) / count(*). */
  def davg(c: Column): Column =
    sum(c.cast(DecimalType(18, 4))).cast("double") / count(lit(1))
}
