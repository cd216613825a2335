package graft

import org.apache.spark.sql.functions._

/** Runtime-adaptivity and source-format pins — 100 TB survival
  * properties that no oracle query exercises directly:
  *  - AQE splits a skewed join partition at runtime (the mechanism that
  *    saves an unsalted hot-key join from a straggler executor);
  *  - CSV and JSON sources roundtrip with explicit schemas (the engine
  *    is not parquet-only).
  */
class ScaleSpec extends SparkSpec {

  test("AQE splits the skewed partition of a hot-key sort-merge join") {
    import spark.implicits._
    // one hot key (0) carrying 500k rows, 200 cold keys; thresholds
    // lowered so local-scale data crosses the skew bar (coalescing off
    // to keep the adaptive read unambiguous)
    val confs = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      "spark.sql.shuffle.partitions" -> "8")
    val prior = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val left = spark.range(0, 520000)
        .select((when(col("id") < 500000, 0L).otherwise(col("id") % 200)).as("k"),
          col("id").as("payload"))
      val right = spark.range(0, 201).select(col("id").as("k"), lit("dim").as("name"))
      val joined = left.join(right, "k").groupBy(col("name")).count()
      assert(joined.collect().map(_.getLong(1)).sum == 520000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark/split the skewed join:\n$finalPlan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("csv and json sources roundtrip with explicit schemas") {
    val events = sources.Tables(spark, "/root/testdata/sf0.001", "events")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
    val n = events.count()
    val base = java.nio.file.Files.createTempDirectory("graft-src").toString

    events.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val csvBack = spark.read.schema(events.schema)
      .option("header", "true").csv(s"$base/csv")
    assert(csvBack.count() == n)
    assert(csvBack.agg(sum(col("event_id"))).head.getLong(0) ==
      events.agg(sum(col("event_id"))).head.getLong(0))

    events.write.mode("overwrite").json(s"$base/json")
    val jsonBack = spark.read.schema(events.schema).json(s"$base/json")
    assert(jsonBack.count() == n)
    assert(jsonBack.agg(sum(col("user_id"))).head.getLong(0) ==
      events.agg(sum(col("user_id"))).head.getLong(0))
  }

  // A 100 TB crawl ALWAYS contains malformed records; what matters is
  // that the engine's three contracts are explicit and chosen, not
  // incidental: quarantine (PERMISSIVE + corrupt-record column), drop
  // (DROPMALFORMED), or fail the job (FAILFAST).
  test("malformed json records: quarantine, drop, and fail-fast contracts") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("graft-badrec").toString
    val lines = Seq(
      """{"event_id": 1, "value": 1.5}""",
      """{"event_id": "not-a-number", "value": 2.5}""",   // type mismatch
      """{"event_id": 3 BROKEN""",                        // syntax error
      """{"event_id": 4, "value": 4.5}""")
    lines.toDF("v").coalesce(1).write.mode("overwrite").text(base)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("event_id",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("_corrupt_record",
        org.apache.spark.sql.types.StringType)))
    // PERMISSIVE: all rows survive; bad ones carry the raw line in the
    // quarantine column (and null data columns) — the audit-friendly
    // default for an unattended ingest
    val perm = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(base).cache()
    assert(perm.count() == 4)
    assert(perm.filter(col("_corrupt_record").isNotNull).count() == 2)
    assert(perm.filter(col("_corrupt_record").isNull)
      .agg(sum(col("event_id"))).head.getLong(0) == 5L)
    perm.unpersist()
    // DROPMALFORMED's row count is PROJECTION-DEPENDENT — the gotcha
    // this pin exists for: count() prunes every column, so the parser
    // only detects syntax errors (3 rows survive), while materializing
    // the fields forces full parsing and the type-mismatch row drops
    // too (2 rows). An unattended ingest must therefore never infer
    // "rows kept" from a pruned count — quarantine via PERMISSIVE is
    // the auditable contract.
    val dropped = spark.read
      .schema(org.apache.spark.sql.types.StructType(schema.take(2)))
      .option("mode", "DROPMALFORMED").json(base)
    assert(dropped.count() == 3)
    val materialized = dropped.select(col("event_id"), col("value")).collect()
    assert(materialized.length == 2)
    assert(materialized.map(_.getLong(0)).sorted.toSeq == Seq(1L, 4L))
    // FAILFAST: the first bad record aborts the job
    val ex = intercept[org.apache.spark.SparkException] {
      spark.read.schema(org.apache.spark.sql.types.StructType(schema.take(2)))
        .option("mode", "FAILFAST").json(base).collect()
    }
    assert(ex.getMessage.contains("FAILFAST") ||
      ex.getCause != null, s"unexpected failure shape: ${ex.getMessage.take(200)}")
  }

  // df.observe: accumulator-backed metrics collected DURING the normal
  // action — the way a 100 TB job instruments row counts / null rates /
  // quality tallies without a second scan of the input.
  test("session additions are partitioning-invariant (the 1000-executor determinism class)") {
    // every kernel added this round must produce identical rows however
    // the input is partitioned — the property that makes a local[32]
    // hash-green result meaningful for a 1000-executor cluster
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val emb = graft.sources.Tables(spark, "/root/testdata/sf0.001", "embeddings")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    import graft.operators.{TextAnalysis => TA, Similarity => S, Graph, Corpus}
    val cases: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame, Boolean)] = Seq(
      ("t23 bm25", (d: org.apache.spark.sql.DataFrame) => TA.bm25Retrieve(d), true),
      ("t25 bigram surprise", (d: org.apache.spark.sql.DataFrame) => TA.bigramSurprise(d), true),
      ("c07 balanced shards", (d: org.apache.spark.sql.DataFrame) => Corpus.balancedShards(d), true),
      ("g04 lpa", (d: org.apache.spark.sql.DataFrame) =>
        Graph.labelPropagation(d.selectExpr("doc_id % 37 AS u", "doc_id % 53 AS v")
          .where("u <> v").distinct()), true),
      ("s19 hard negatives", (d: org.apache.spark.sql.DataFrame) => S.hardNegatives(d), false),
      ("s20 ivf recall", (d: org.apache.spark.sql.DataFrame) => S.ivfRecall(d), false))
    for ((name, fn, isDocs) <- cases) {
      val base = if (isDocs) docs else emb
      val a = rows(fn(base))
      val b = rows(fn(base.repartition(7)))
      assert(a == b, s"$name changed under repartition(7)")
      assert(a.nonEmpty, s"$name vacuous")
    }
  }

  test("observe() collects pipeline metrics without a second scan") {
    val obs = new org.apache.spark.sql.Observation("curation_metrics")
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val n = docs
      .observe(obs, count(lit(1)).as("n_in"),
        sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"),
        max(length(col("text"))).as("max_len"))
      .filter(col("n_chars") > 100)
      .count()
    val m = obs.get
    assert(m("n_in").asInstanceOf[Long] == 500L)
    assert(m("n_en").asInstanceOf[Long] > 0L && m("max_len").asInstanceOf[Int] > 100)
    assert(n <= 500L)
  }
}
