package graft

/** Measurement harness for the sharded-CDC lockstep price: runs the
  * SAME pipeline as the st28 gate query
  * (`CdcApply.runCdcApplyManifestedPartitioned`) at several shard
  * counts over `SPARK_GRAFT_SF_DIR` and prints one JSON line per
  * count. NOT part of the driver bench contract — the catalog query
  * keeps its gate shape (4 shards); this answers the scaling question
  * for the ledger: with per-batch shard pruning on the read side, the
  * residual cost of more shards is the per-leaf COMMIT fan-out (one
  * claim + N lockstep leaf commits per batch), i.e. O(touched shards)
  * per batch — and at this data scale every batch's keys touch every
  * shard, so this measures the worst case of that fan-out.
  *
  * Usage: `SPARK_GRAFT_SF_DIR=... sbt "runMain graft.ShardBench [n...]"`
  * (default shard counts: 4 32).
  */
object ShardBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val counts = if (args.isEmpty) Seq(4, 32) else args.toSeq.map(_.toInt)
    counts.foreach { n =>
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
