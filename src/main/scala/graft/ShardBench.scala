package graft

/** Measurement harness for the sharded-CDC commit price: runs the
  * SAME pipeline as the st28 gate query
  * (`CdcApply.runCdcApplyManifestedPartitioned`) at several shard
  * counts over `SPARK_GRAFT_SF_DIR` and prints one JSON line per
  * count. NOT part of the driver bench contract — the catalog query
  * keeps its gate shape (4 shards); this answers the scaling question
  * for the ledger.
  *
  * Two modes:
  *  - default: the full events feed — at this data scale every batch's
  *    keys touch every shard, so this measures the worst case (per-
  *    batch cost ~ O(touched) = O(all) here).
  *  - `sparse`: the feed filtered to keys routing to shards 0..3 of 64
  *    (`user_id % 64 < 4`), so every batch touches AT MOST 4 shards at
  *    ANY shard count ≥ 64 that is a multiple of 64's divisor — the
  *    r16 version-map contract says per-batch cost is O(touched
  *    shards) + one root commit, so the 64-shard run should land
  *    within ~1.5× of the 4-shard run over the same feed (under r15
  *    lockstep it paid 60 extra empty leaf commits per batch).
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ShardBench [sparse] [n...]"`
  * (default shard counts: 4 32; sparse default: 4 64).
  */
object ShardBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sparse = args.contains("sparse")
    val nums = args.filterNot(_ == "sparse").toSeq.map(_.toInt)
    val counts =
      if (nums.nonEmpty) nums else if (sparse) Seq(4, 64) else Seq(4, 32)
    if (sparse) {
      // STEADY-STATE per-batch commit price: keys bounded to 4 of 64
      // shard classes, table creation (batch 0: bootstrap + first
      // merge) excluded from the clock — what's timed is 3 merge
      // batches + the periodic compaction, i.e. exactly the per-batch
      // work of a long-running stream. Under the r16 version map this
      // is O(touched shards): the 64-shard figure should sit near the
      // 4-shard one over the same feed.
      import org.apache.spark.sql.functions._
      // GRAFT_SPARSE_MOD (r17): the residue modulus bounding the key
      // classes. Default 64 keeps the r16 ledger rows comparable; 1024
      // bounds the feed to ≤4 touched shards at EVERY count dividing
      // 1024, for the 256/1024-shard extension table (under mod 64 a
      // 256-shard run touches 16 classes, not 4 — the invariant the
      // extension measures would silently change).
      val mod = sys.env.getOrElse("GRAFT_SPARSE_MOD", "64").toInt
      val ev = graft.sources.Tables(spark, sfDir, "events")
        .filter(pmod(col("user_id"), lit(mod)) < 4)
      val parts = (0 until 4).map(i =>
        graft.operators.eagerCut(ev.filter(pmod(col("event_id"), lit(4)) === i)))
      counts.foreach { n =>
        val root = java.nio.file.Files
          .createTempDirectory(s"graft_shardbench_$n").resolve("t").toString
        streaming.CdcApply.applyBatchManifestedPartitioned(
          parts(0), root, nShards = n, Some(0L))
        val t0 = System.nanoTime()
        (1 until 4).foreach(i => streaming.CdcApply
          .applyBatchManifestedPartitioned(parts(i), root, nShards = n,
            Some(i.toLong)))
        operators.Warehouse.compactManifestedPartitioned(spark, root,
          targetFileBytes = 1L << 30)
        val sec = (System.nanoTime() - t0) / 1e9
        val rows = operators.Warehouse.readManifestedPartitioned(spark, root)
          .count()
        println(f"""{"metric":"st28_shards_sparse","nShards":$n,"mod":$mod,"rows":$rows,"batches":3,"sec":$sec%.2f}""")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(root).getParentFile)
      }
    } else counts.foreach { n =>
      val root = java.nio.file.Files.createTempDirectory(s"graft_shardbench_$n")
      val t0 = System.nanoTime()
      val out = streaming.CdcApply.runCdcApplyManifestedPartitioned(
        spark, sfDir, root.resolve("t").toString, nShards = n)
      val rows = out.count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"metric":"st28_shards","nShards":$n,"rows":$rows,"sec":$sec%.2f}""")
      org.apache.commons.io.FileUtils.deleteQuietly(root.toFile)
    }
    spark.stop()
  }
}
