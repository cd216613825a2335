package graft

/** SURVEY §9's executor-loss story, made executable: with
  * `spark.graft.reliableCheckpoint=true` (plus a checkpoint dir) every
  * kernel lineage cut — the `cutLineage` round barriers and the
  * `eagerCut` output pins / two-pass barriers — goes through
  * `Dataset.checkpoint` into the fault-tolerant checkpoint directory
  * instead of executor-local blocks. This spec runs one representative
  * kernel of each cut class in BOTH modes and asserts identical
  * results, plus that the reliable run actually wrote checkpoint data
  * (the switch is real, not a silent fallback to local blocks).
  */
class ReliableCheckpointSpec extends SparkSpec {

  // declared FIRST: the identical-results test below sets the shared
  // context's checkpoint dir, which cannot be unset
  test("reliable-checkpoint mode without a checkpoint dir fails loudly") {
    val s2 = spark.newSession()
    s2.conf.set("spark.graft.reliableCheckpoint", "true")
    assume(s2.sparkContext.getCheckpointDir.isEmpty,
      "another suite already set a checkpoint dir on the shared context")
    val e = intercept[IllegalArgumentException] {
      operators.eagerCut(s2.range(3).toDF("id"))
    }
    assert(e.getMessage.contains("setCheckpointDir"), e.getMessage)
  }

  test("reliable-checkpoint mode: identical kernel results, real checkpoint files") {
    val dir = "/root/testdata/sf0.001"
    // one kernel per cut class: the runningScan two-pass barrier
    // (q73), the iterative cutLineage loop + output pin (g01), the
    // alternating-round large-star loop (d09), and the CDC
    // read-before-overwrite (st11)
    val names = Seq("q73_skyline_pareto", "g01_pagerank",
      "d09_clusters_largestar", "st11_cdc_apply")
    def run(name: String): Seq[String] =
      SparkEntry.queries(name)(spark, dir).collect().map(_.toString).sorted.toSeq
    val baseline = names.map(n => n -> run(n)).toMap

    val ckpt = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    spark.sparkContext.setCheckpointDir(ckpt.toString)
    spark.conf.set("spark.graft.reliableCheckpoint", "true")
    try {
      for (n <- names)
        assert(run(n) == baseline(n), s"$n diverged under reliable checkpoints")
      // the mode really routed through the checkpoint directory
      val wrote = org.apache.commons.io.FileUtils
        .listFiles(ckpt.toFile, null, true)
      assert(!wrote.isEmpty, "reliable mode wrote no checkpoint files")
    } finally {
      spark.conf.unset("spark.graft.reliableCheckpoint")
      org.apache.commons.io.FileUtils.deleteQuietly(ckpt.toFile)
    }
  }
}
