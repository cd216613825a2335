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

  // Hadoop path/filesystem aliases shared by the Warehouse modules
  // (r18 split — one definition; per-trait private aliases would
  // conflict when mixed into the object)
  private[operators] type HPath = org.apache.hadoop.fs.Path
  private[operators] type HFs = org.apache.hadoop.fs.FileSystem

  /** True when the session opts into RELIABLE (fault-tolerant) lineage
    * cuts: `spark.graft.reliableCheckpoint=true` plus a
    * `sparkContext.setCheckpointDir`. Default (false) cuts lineage with
    * executor-local blocks — the right cost locally and on a healthy
    * cluster, but an executor loss destroys those blocks mid-job. In an
    * executor-loss environment (spot/preemptible fleets) the switch
    * routes every kernel barrier through `Dataset.checkpoint` to the
    * fault-tolerant checkpoint directory instead, at the price of a
    * write+read of each cut dataset (SURVEY §9). */
  private[graft] def reliableCheckpoints(spark: SparkSession): Boolean =
    spark.conf.getOption("spark.graft.reliableCheckpoint").exists(_.toBoolean)

  /** The eager materialization barrier the two-pass/output-pinning
    * kernels use ([[graft.operators.Analytics]] runningScan, the graph
    * loops' result pin, the CDC read-before-overwrite): executor-local
    * `localCheckpoint` by default, a reliable `checkpoint` under the
    * [[reliableCheckpoints]] switch. Both are EAGER — callers rely on
    * the barrier having materialized before they mutate/unpersist what
    * it read. */
  private[graft] def eagerCut[T](ds: org.apache.spark.sql.Dataset[T]): org.apache.spark.sql.Dataset[T] =
    if (reliableCheckpoints(ds.sparkSession)) {
      require(ds.sparkSession.sparkContext.getCheckpointDir.isDefined,
        "spark.graft.reliableCheckpoint=true requires sparkContext.setCheckpointDir(...)")
      ds.checkpoint(true)
    } else ds.localCheckpoint(true)

  /** Iterative-loop round barrier: truncates the logical plan (an uncut
    * round plan references the previous round's twice, so analysis goes
    * exponential with round count) while keeping the round's data hot.
    * The internal-row RDD is lazily cached — one materialization job per
    * round, AQE intact, blocks reclaimed by the ContextCleaner once the
    * wrapping DataFrame is unreferenced. Returns the cut DataFrame plus
    * the cached RDD handle so the loop can unpersist the PREVIOUS round
    * promptly instead of waiting for GC.
    *
    * Under [[reliableCheckpoints]] the round barrier is a reliable
    * `Dataset.checkpoint` instead: round state lives in the checkpoint
    * directory (survives executor loss; an eager materialization job
    * per round, same as the cached path), and the returned handle's
    * unpersist is a harmless no-op — checkpoint files are reclaimed by
    * the ContextCleaner (`spark.cleaner.referenceTracking.cleanCheckpoints`)
    * or the deployment's checkpoint-dir hygiene. */
  def cutLineage(df: DataFrame): (DataFrame, org.apache.spark.rdd.RDD[_]) =
    if (reliableCheckpoints(df.sparkSession)) {
      val cp = eagerCut(df)
      (cp, org.apache.spark.sql.graftshim.checkpointRdd(cp)
        .getOrElse(cp.queryExecution.toRdd))
    } else {
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
