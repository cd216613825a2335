package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table registry over a scale-factor directory.
  *
  * The reference discovers tables dynamically from a live PostgreSQL
  * catalog (`OMTZHModifier.java:36-43` via `DatabaseMetaData.getTables`);
  * the Spark-native analogue for a file-backed engine is a directory of
  * parquet datasets enumerated here. Each table is exposed lazily so
  * Catalyst sees a plain `FileSourceScanExec` with full predicate
  * pushdown / column pruning; at cluster scale these paths would be
  * partitioned directories and nothing here changes.
  */
object Tables {
  /** All driver-generated tables (TESTDATA.md). */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Load one table from a scale-factor directory.
    *
    * `events.ts` is written as parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; we read it as a long (nanos since epoch,
    * `spark.sql.legacy.parquet.nanosAsLong`) and convert to a microsecond
    * TimestampType (truncation — matches DuckDB's TIMESTAMP_NS→TIMESTAMP
    * cast, so oracle comparisons stay exact). */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
