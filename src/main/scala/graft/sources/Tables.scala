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
    * `events.ts` is written as parquet TIMESTAMP(NANOS). Depending on
    * the Spark build, the inferred type is either a long (nanos since
    * epoch, `spark.sql.legacy.parquet.nanosAsLong`) or — on builds
    * where NTZ inference takes precedence over that legacy conf — a
    * micros-truncated TIMESTAMP_NTZ. Normalize BOTH to the engine's
    * canonical microsecond TimestampType by inspecting the type the
    * reader actually produced: long → explicit nanos-div-1000
    * truncation; NTZ → cast (the session timezone is pinned UTC by
    * GraftSession, so the cast is value-preserving and lands on the
    * same micros-truncated instants). Either path matches DuckDB's
    * TIMESTAMP_NS→TIMESTAMP cast, so oracle comparisons stay exact. */
  def apply(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$dir/$name.parquet")
      raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case _ =>
          raw.withColumn("ts",
            col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    } else spark.read.parquet(s"$dir/$name.parquet")

  /** Register every table as a temp view (for spark.sql entry points). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => apply(spark, dir, n).createOrReplaceTempView(n))
}
