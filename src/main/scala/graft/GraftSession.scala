package graft

import org.apache.spark.sql.SparkSession

/** Canonical engine session builder: every entry point (Verify, Bench,
  * tests) builds its session here so the engine-critical confs are never
  * forgotten:
  *
  *  - `mapKeyDedupPolicy=LAST_WIN` — hstore `||` is right-wins merge
  *    (SURVEY.md §2.5 X8); the Spark default EXCEPTION would throw on
  *    re-enriching an already-enriched row;
  *  - `spark.sql.extensions=GraftExtensions` — native zh functions +
  *    the merge-then-extract optimizer rule;
  *  - shuffle partitions sized to the local core count (the 100 TB
  *    deploy would size these to cluster cores × a small factor).
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.mapKeyDedupPolicy", "LAST_WIN")
      // engine-wide: nanos timestamps (events.ts) read as longs; set
      // here rather than only as a loader side effect
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // per-process warehouse: managed (bucketed) tables never collide
      // with a previous run's leftover directories
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      // State-store maintenance runs on ONE per-JVM task whose interval
      // is pinned by the FIRST stateful query's conf — setting it only
      // in EventStreams.RocksDbConf would be a no-op whenever a
      // default-conf stateful query ran first in the JVM. Every entry
      // point here runs bounded, seconds-long streams over throwaway
      // checkpoints, so deferring background snapshot consolidation
      // JVM-wide is always right; a durable 100 TB deployment keeps
      // the 60 s default (snapshots bound replay time there).
      .config("spark.sql.streaming.stateStore.maintenanceInterval", "600s")
      .config("spark.ui.enabled", "false")
}
