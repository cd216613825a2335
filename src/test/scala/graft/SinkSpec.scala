package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

/** Output-layout contract for the curated corpus: the write side of a
  * 100 TB pipeline matters as much as the read side — downstream
  * loaders want partition directories they can prune, and files whose
  * row counts are bounded (a dataloader shard must fit in memory).
  */
class SinkSpec extends SparkSpec {

  test("partitioned write: prunable layout, bounded files, lossless read-back") {
    val docs = graft.sources.Tables(spark, "/root/testdata/sf0.001", "documents")
    val out = Files.createTempDirectory("graft_sink").resolve("corpus").toString
    docs.write
      .partitionBy("lang")
      .option("maxRecordsPerFile", 100)
      .mode("overwrite").parquet(out)

    // (a) one directory per language — the pruning unit
    val langDirs = new java.io.File(out).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("lang=")).map(_.getName).sorted
    val langs = docs.select(col("lang")).distinct()
      .collect().map(r => s"lang=${r.getString(0)}").sorted
    assert(langDirs.toSeq == langs.toSeq, s"dirs $langDirs vs langs $langs")

    // (b) no file exceeds the record bound (shard-fits-in-memory contract)
    val back = spark.read.parquet(out)
    val perFile = back
      .select(input_file_name().as("f"))
      .groupBy(col("f")).count().agg(max(col("count"))).head.getLong(0)
    assert(perFile <= 100L, s"a file holds $perFile rows")

    // (c) lossless: same rows, same content fingerprint (order-free)
    assert(back.count() == docs.count())
    // bit_xor, not sum: an int64 sum of hashes overflows under ANSI mode
    def fp(df: org.apache.spark.sql.DataFrame) =
      df.select(xxhash64(col("doc_id"), col("text"), col("lang")).as("h"))
        .agg(expr("bit_xor(h)")).head.getLong(0)
    assert(fp(back) == fp(docs))

    // (d) a lang filter reaches the scan as a PARTITION filter — the
    // read touches one directory, not the corpus
    val plan = back.filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(lang"), plan)
  }
}
