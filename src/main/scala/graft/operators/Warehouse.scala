package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Warehouse-pattern operators: bloom-filter-accelerated semi join,
  * MERGE-style upsert, and a columnar-format interchange roundtrip.
  *
  * These are the three moves a 100 TB lakehouse pipeline leans on that
  * the rest of the catalog doesn't yet exercise directly:
  *
  * - '''Bloom semi join''' — when the probe side is far too large to
  *   shuffle in full and the build side's key set is selective but too
  *   big for a broadcast hash join, ship a bloom filter of the build
  *   keys to every probe task and drop non-members BEFORE the shuffle.
  *   Spark's own runtime row-level filtering (InjectRuntimeFilter,
  *   `spark.sql.optimizer.runtime.bloomFilter.enabled`) injects exactly
  *   this plan automatically when stats justify it; the explicit form
  *   here keeps the decision deterministic and testable. The trailing
  *   exact semi join removes the bloom's false positives, so the result
  *   is exact — the filter only cuts shuffled bytes (by ~the build
  *   side's selectivity), never changes the answer.
  * - '''MERGE upsert''' — the Delta/Iceberg `MERGE INTO` shape
  *   (SCD-style refresh) expressed as one full-outer shuffle join of
  *   snapshot vs. change-set: matched rows update, source-only rows
  *   insert, target-only rows carry over. One shuffle on the merge key,
  *   AQE-coalesced; at 100 TB both sides bucket on the key and the
  *   join is shuffle-free.
  * - '''ORC roundtrip''' — write a projected/filtered slice to ORC and
  *   read it back: the cross-format interchange path (parquet-native
  *   shops still exchange ORC with Hive-era estates), verifying types
  *   (incl. ms timestamps) survive the format boundary losslessly.
  */
object Warehouse {

  /** Exact semi join of `fact` against `dimKeys`, pre-filtered by a
    * bloom filter over the key set built with Spark's OWN runtime-filter
    * expressions (`BloomFilterAggregate` → `BloomFilterMightContain`,
    * the pair `InjectRuntimeFilter` plants): the probe compiles into
    * whole-stage codegen above the fact scan — no per-row UDF
    * dispatch/boxing. `fpp` trades filter size for shuffled false
    * positives: 1% FPP ≈ 9.6 bits/key — 3k keys here, ~120 MB for 100M
    * keys at scale, both fine to ship as a literal/broadcast where a
    * hash set of raw keys would not be. */
  def bloomSemiJoin(fact: DataFrame, factKey: String,
                    dim: DataFrame, dimKey: String,
                    fpp: Double = 0.01): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
    import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
    import org.apache.spark.sql.{graftshim => shim}
    val keys = dim.select(col(dimKey))
    // Sizing needs an item-count estimate; a real deployment reads it
    // from table stats (zero jobs). Counting here keeps the test
    // deterministic and self-contained — one cheap count on the small
    // (build) side only.
    val n = math.max(keys.count(), 1L)
    // optimal bits for target fpp: -n·ln(p)/ln(2)²
    val numBits = math.max(64L,
      math.ceil(-n * math.log(fpp) / (math.log(2) * math.log(2))).toLong)
    // One small job aggregates the filter (same materialization
    // stat.bloomFilter performed); the resulting few-KB..MB binary rides
    // the plan as a literal, which BloomFilterMightContain requires
    // (constant or scalar subquery) and which codegen inlines.
    val bfBytes = keys.agg(shim.column(
        new BloomFilterAggregate(new XxHash64(Seq(shim.expression(col(dimKey)))),
          Literal(n), Literal(numBits)).toAggregateExpression()).as("bf"))
      .head.getAs[Array[Byte]](0)
    val probe = shim.column(BloomFilterMightContain(
      Literal(bfBytes, org.apache.spark.sql.types.BinaryType),
      new XxHash64(Seq(shim.expression(col(factKey))))))
    fact.filter(col(factKey).isNotNull && probe)
      .join(keys.withColumnRenamed(dimKey, factKey), Seq(factKey), "left_semi")
  }

  /** MERGE-style upsert: apply a change-set onto a snapshot keyed by
    * `key`. Matched → update (both payloads present), source-only →
    * insert, target-only → keep. Returns the merged table plus the
    * per-row action taken. */
  def mergeUpsert(target: DataFrame, source: DataFrame, key: String): DataFrame = {
    val t = target.withColumn("_in_t", lit(1))
    val s = source.withColumn("_in_s", lit(1))
    t.join(s, Seq(key), "full_outer")
      .withColumn("action",
        when(col("_in_t").isNotNull && col("_in_s").isNotNull, "update")
          .when(col("_in_s").isNotNull, "insert")
          .otherwise("keep"))
      .drop("_in_t", "_in_s")
  }

  /** SCD2 validity intervals from an event log — the slowly-changing-
    * dimension history build: per key, each CHANGE of the tracked
    * attribute opens a [valid_from, valid_to) interval, closed by the
    * next change (NULL = current). Change detection is `lag`, interval
    * close is `lead` over the change rows only — both windows share one
    * (key, time) shuffle; the post-filter window reuses the partitioning
    * (no second exchange). The dimension-table twin of `q52`'s MERGE:
    * MERGE maintains the snapshot, this derives the full history. */
  def scd2Intervals(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val changes = events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("event_id"),
        col("event_type"))
      .withColumn("prev", lag(col("event_type"), 1).over(byUser))
      .filter(col("prev").isNull || col("prev") =!= col("event_type"))
    changes
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(byUser))
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"),
        col("valid_to_us").isNull.as("is_current"))
  }

  /** Small-files compaction — the lakehouse maintenance op that keeps a
    * streamed-into table scannable (thousands of micro-batch shards →
    * target-sized files): size the target file count from the on-disk
    * byte total, rewrite into a staging dir, then swap via two ATOMIC
    * renames. Each rename is atomic, but the PAIR is not: a reader
    * racing the swap can see the path missing for the instant between
    * them, and a crash there leaves the data under `.compact_old` —
    * the table-format snapshot commit (Delta/Iceberg) is precisely
    * what removes that window; this is its closest plain-filesystem
    * analogue, and the leftover dirs are self-healing (pre-cleaned on
    * the next run). Returns the file count actually written (≤ the
    * computed target — trailing partitions can come up empty).
    *
    * Scale: runs per partition-leaf directory (compact each `lang=xx`
    * independently — embarrassingly parallel, and a leaf is the natural
    * isolation unit); targetFileBytes ≈ 128 MB matches the scan split
    * size so one task reads one file. Content is pinned unchanged by
    * SinkSpec's count + order-free fingerprint. */
  // ------------------------------------------------------ filesystem seam
  // All table IO below runs through org.apache.hadoop.fs via
  // ManifestIo (r13): the SAME commit code serves file:, hdfs:, and
  // object-store schemes, with per-store semantics documented once at
  // the seam. The session's hadoopConfiguration carries connector
  // conf exactly as it does for Spark's own reads/writes.
  private def hconf(spark: SparkSession): org.apache.hadoop.conf.Configuration =
    spark.sparkContext.hadoopConfiguration

  private type HPath = org.apache.hadoop.fs.Path
  private type HFs = org.apache.hadoop.fs.FileSystem

  /** In-process per-table writer lock (the `cachedIndex` pattern,
    * applied to table commits — r13): serializes
    * append/compact/vacuum on the same table within this JVM, so
    * local[*] multi-writer interleavings are mechanically safe
    * (SinkSpec races two appenders). Cross-PROCESS writers are caught
    * by the version CAS in [[commitManifest]] — the first committer
    * wins, the loser throws — see [[appendManifested]]. */
  private val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private def withTableLock[T](root: HPath)(body: => T): T =
    tableLocks.computeIfAbsent(root.toString, _ => new Object)
      .synchronized(body)

  /** The swap-staging siblings for a leaf directory: DOT-PREFIXED, so
    * Spark's file/partition discovery (which skips `.`/`_` names) never
    * sees a non-`k=v` directory inside a partitioned root while a leaf
    * is mid-compaction. */
  private def stagingPaths(root: HPath): (HPath, HPath) = {
    val parent = root.getParent
    (new HPath(parent, s".${root.getName}.compact_tmp"),
      new HPath(parent, s".${root.getName}.compact_old"))
  }

  /** Recover a directory stranded by a crash between [[compact]]'s two
    * renames: the data then lives ONLY under the dot-prefixed
    * `.name.compact_old` sibling — which Spark's discovery and the
    * [[compactPartitioned]] walk both skip — so it MUST be moved back
    * before anything else reads or compacts the tree. Returns true if a
    * restore happened. */
  private def restoreIfStranded(fs: HFs, target: HPath): Boolean = {
    val (_, old) = stagingPaths(target)
    if (!ManifestIo.exists(fs, target) && ManifestIo.isDirectory(fs, old)) {
      ManifestIo.rename(fs, old, target)
      true
    } else false
  }

  def compact(spark: SparkSession, dir: String,
              targetFileBytes: Long = 128L << 20): Int = {
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    val (tmp, old) = stagingPaths(root)
    // self-heal a crash BETWEEN the two renames of a prior run: the data
    // sits only under the hidden old path — restore it (loudly visible
    // in the fact that compact proceeds rather than throwing)
    restoreIfStranded(fs, root)
    if (!ManifestIo.isDirectory(fs, root))
      throw new IllegalArgumentException(
        s"compact: $dir is not a readable directory " +
          s"(a crashed swap leaves the data under $old)")
    val shards = ManifestIo.list(fs, root)
    // LEAF directories only: called on a partitioned root, the top-level
    // *.parquet glob would size bytes = 0 → one giant output file, while
    // spark.read.parquet recursed into every partition — and the swap
    // would flatten the partition columns out of the layout. Fail loud
    // and point at the per-leaf entry point instead.
    shards.find(st => st.isDirectory &&
        !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_")).foreach { sub =>
      throw new IllegalArgumentException(
        s"compact: $dir contains subdirectory ${sub.getPath.getName} — it is a " +
          "partitioned root, not a leaf; use compactPartitioned")
    }
    val bytes = shards
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    // self-heal leftovers from a crashed prior run: mode(overwrite)
    // clears tmp, but a stale old dir would fail the first rename —
    // and that failure must be LOUD, not a silent leak
    if (ManifestIo.exists(fs, old)) {
      ManifestIo.delete(fs, old)
      if (ManifestIo.exists(fs, old))
        throw new IllegalStateException(s"compact: cannot clear stale $old")
    }
    spark.read.parquet(root.toString).repartition(nFiles)
      .write.mode("overwrite").parquet(tmp.toString)
    ManifestIo.rename(fs, root, old)
    ManifestIo.rename(fs, tmp, root)
    ManifestIo.delete(fs, old)
    ManifestIo.list(fs, root)
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
  }

  /** Per-leaf compaction over a partitioned root: walk the `k=v`
    * directory tree to its leaves and [[compact]] each independently.
    * Returns root-relative leaf path → file count written.
    *
    * Each leaf is its own rewrite + atomic swap, so (a) partition
    * values survive untouched — the leaf DIRECTORY name carries them
    * and only its contents are rewritten; (b) a failure mid-run leaves
    * every other leaf intact (the leaf is the isolation unit); (c) at
    * 100 TB the leaves are embarrassingly parallel — this sequential
    * driver loop becomes one job per leaf (or one multi-threaded
    * scheduler pool), because no two leaves share any state. Staging
    * dirs are dot-prefixed siblings, so a concurrent partition-
    * discovering reader never sees a non-`k=v` directory — but the
    * two-rename swap has an instant where the leaf directory itself
    * does not exist, and a reader listing the root in that window
    * silently misses the whole partition. Use this variant only for
    * single-writer, no-concurrent-reader maintenance windows;
    * [[compactManifestedPartitioned]] runs the SAME per-leaf walk
    * through per-leaf `_current` pointer commits, which close that
    * window for readers that consult the manifests
    * ([[readManifestedPartitioned]]) — at every instant, every leaf
    * has a complete resolvable generation. */
  def compactPartitioned(spark: SparkSession, rootDir: String,
                         targetFileBytes: Long = 128L << 20): Map[String, Int] = {
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    require(ManifestIo.isDirectory(fs, root),
      s"compactPartitioned: $rootDir is not a directory")
    // the walk is [[manifestLeaves]] — the same recursion (including
    // the stranded-.compact_old restore) serves both the two-rename
    // and the manifested partitioned schemes
    manifestLeaves(fs, root).map { leaf =>
      relPath(root, leaf) -> compact(spark, leaf.toString, targetFileBytes)
    }.toMap
  }

  /** Root-relative leaf path for the partitioned-compaction report
    * maps (`.` for the root itself). */
  private def relPath(root: HPath, leaf: HPath): String =
    root.toUri.relativize(leaf.toUri).getPath.stripSuffix("/") match {
      case "" => "."
      case p => p
    }

  // ---------------------------------------------- manifested compaction
  /** Manifest-pointer commit — the table-format move (Delta/Iceberg
    * snapshot commit) that CLOSES [[compact]]'s absence window, on a
    * plain filesystem: data files live in dot-prefixed GENERATION
    * directories (`.gen-<n>` — invisible to naive discovery), and the
    * `_current` manifest file holds the live generation list — one
    * name in the compaction steady state, several while streaming
    * appends ([[appendManifested]]) accumulate. A commit
    * writes the new generation in full, claims its `_manifest-v`
    * history file by create-exclusive (the version CAS — see
    * [[commitManifest]]), then atomically replaces `_current`
    * ([[ManifestIo.replace]] — a reader sees the old pointer or the
    * new, never a missing or partial one). [[readManifested]]
    * resolves the pointer per read, so at every instant of a
    * compaction there is a complete generation to read — no absence
    * window, by construction.
    *
    * GC retains the last `retainSnapshots` committed manifests (and
    * every generation they reference) and deletes older ones — at the
    * default 1, a reader that resolved the pointer just before a
    * commit may still be scanning the old generation and gets a full
    * compaction cycle of grace (transient cost ≤ 2× the leaf). The
    * same window bounds [[readManifestedAt]] time travel: raise
    * `retainSnapshots` to keep more history, exactly Iceberg/Delta's
    * count-bounded snapshot retention. ONE logical writer per leaf,
    * like every table format — but violations are now caught, not
    * silent: in-process writers serialize on the per-table lock, and
    * a cross-process compaction whose pointer read was overtaken
    * fails its CAS loudly (the stale fold becomes [[vacuum]] food)
    * rather than burying the interleaved append. */
  def compactManifested(spark: SparkSession, dir: String,
                        targetFileBytes: Long = 128L << 20,
                        retainSnapshots: Int = 1,
                        retainFor: Option[java.time.Duration] = None,
                        clusterBy: Option[String] = None,
                        zorderBy: Seq[String] = Nil,
                        zorderQuantiles: Boolean = false): Int = {
    require(retainSnapshots >= 0,
      s"retainSnapshots must be >= 0, got $retainSnapshots")
    require(retainFor.forall(!_.isNegative),
      s"retainFor must be >= 0, got $retainFor")
    require(clusterBy.isEmpty || zorderBy.isEmpty,
      "compactManifested: pass clusterBy OR zorderBy, not both")
    require(zorderBy.isEmpty || (zorderBy.size >= 2 && zorderBy.size <= 4),
      s"zorderBy interleaves 2 to 4 dimensions (16-bit buckets — more " +
        s"than 4 would overflow the 64-bit Morton key; beyond 4, cluster " +
        s"on the highest-selectivity pair instead), got $zorderBy")
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    withTableLock(root) {
    // LEAF directories only (the compact() convention): a partitioned
    // root's k=v children each get their OWN manifest — adoption here
    // would create an empty generation beside them and readers through
    // the pointer would see an empty table. Fail loud, point at the
    // per-leaf entry point. (.gen-* dirs are dot-prefixed, so a
    // manifested leaf itself still walks as a leaf.)
    ManifestIo.list(fs, root)
      .find(st => st.isDirectory && !st.getPath.getName.startsWith(".") &&
        !st.getPath.getName.startsWith("_")).foreach { sub =>
        throw new IllegalArgumentException(
          s"compactManifested: $dir contains subdirectory ${sub.getPath.getName} — " +
            "it is a partitioned root, not a leaf; use compactManifestedPartitioned")
      }
    val pointer = new HPath(root, "_current")
    // adopt a plain leaf on first contact: its loose parquet files
    // become generation 0 (one-time migration — run it before any
    // concurrent reader exists, like any format conversion). Adoption
    // keys off the HEAD, not the pointer file: a leaf whose pointer is
    // absent but whose trail is not is a crashed pointer swap, and
    // re-adopting it would drop every post-gen-0 generation.
    if (headBody(fs, root).isEmpty) {
      val gen0 = new HPath(root, ".gen-0")
      fs.mkdirs(gen0)
      ManifestIo.list(fs, root)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        .foreach(st => ManifestIo.rename(fs, st.getPath,
          new HPath(gen0, st.getPath.getName)))
      commitManifest(fs, root, pointer, Seq(".gen-0"),
        manifestVersions(fs, root).lastOption.getOrElse(0L),
        stats = collectStats(fs, hconf(spark), root, ".gen-0"))
    }
    // the manifest may list SEVERAL generations (streaming appends via
    // appendManifested) — compaction folds them all into one. The
    // pointer and trail head are read at the SAME point (under the
    // in-process lock); `expected` anchors the version CAS at commit.
    // Txn markers carry through the fold — maintenance must never
    // reset a writer's exactly-once state.
    val head = headBody(fs, root).get
    val cur = parseGens(head)
    val curTxns = parseTxns(head)
    val expected = manifestVersions(fs, root).lastOption.getOrElse(0L)
    val bytes = cur.map(g => ManifestIo.list(fs, new HPath(root, g))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val nextId = cur.map(entryId).max + 1
    val next = s".gen-$nextId"
    // the new generation is invisible until the pointer flips, so it
    // can be written in place — no staging rename needed. The fold
    // reads through [[scanGens]]: schema evolution carries forward
    // (mergeSchema / union-by-name), and any `.del-` tombstones are
    // APPLIED AND RETIRED — the folded generation is the merge-on-read
    // state materialized, so compaction is also the delete-compaction
    // (Iceberg's rewrite-data-files with delete-file cleanup).
    // `clusterBy` range-partitions + sorts the fold on a column (the
    // OPTIMIZE/sort-compaction move): each output file then covers a
    // narrow value range, which is what makes the `#stats:` min/max
    // skipping effective AFTER a fold — a plain hash repartition
    // spreads every value range across every file and no per-file
    // range can exclude anything. `zorderBy` is the two-dimensional
    // form (OPTIMIZE ZORDER, r16): lay the fold out along the Morton
    // curve of both columns, so every file covers a TILE — narrow in
    // BOTH dimensions — and the `#stats:` skipping read prunes on
    // either one (a single-column sort can only ever prune its own).
    val folded = scanGens(spark, root, cur)
    (if (zorderBy.nonEmpty) {
      // Morton key over linearly-bucketed dimensions: one small agg
      // for the (min, max) of each column, then a 16-bit scale —
      // branch-free, codegen'd, O(rows) at write time, nothing at
      // read time. Linear bucketing assumes roughly-uniform value
      // spread; the production upgrade for heavy skew is quantile cut
      // points (range-partitioner sampling per dimension), which
      // slots into the same key expression. 2 dims take the magic-mask
      // binary interleave (32-bit capable, the pinned r16 path); 3–4
      // take the round-robin [[graft.functions.InterleaveBitsN]].
      //
      // Type gate UP FRONT (r17): a dimension whose values cannot be
      // bucketed numerically (a plain string column casts to null)
      // would silently degrade the requested Z-order to an unclustered
      // hash layout — no pruning, no error. Refuse loudly instead.
      zorderBy.foreach { c =>
        val f = folded.schema.find(_.name == c).getOrElse(
          throw new IllegalArgumentException(
            s"compactManifested: zorderBy column '$c' not in schema " +
              s"(columns: ${folded.columns.mkString(", ")})"))
        val ok = f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType] ||
          f.dataType == org.apache.spark.sql.types.TimestampType ||
          f.dataType == org.apache.spark.sql.types.TimestampNTZType
        require(ok, s"compactManifested: zorderBy column '$c' has type " +
          s"${f.dataType.simpleString} — Z-order buckets need a numeric " +
          "or timestamp dimension (a lexical string would bucket as " +
          "null and silently lose the requested layout)")
      }
      val bucketsOpt: Option[Seq[Column]] =
        if (zorderQuantiles) {
          // SKEW-ROBUST bucketing (r18): per-dimension sampled
          // quantile cut points (the range-partitioner move applied
          // to the layout key) instead of the linear min/max scale —
          // a zipfian dimension spreads across the full bucket space
          // by MASS, so tiles stay narrow where the rows actually
          // are and the skipping read keeps pruning. One GK-sketch
          // pass over the fold (approxQuantile on all dims at once);
          // 4,095 cuts × scale 16 fills the same 16-bit space the
          // linear path uses, so the Morton key expression below is
          // shared verbatim. Duplicate cuts (one value heavier than
          // a quantile step) are harmless: the upper-bound search
          // stays monotone and such a value simply owns a wider
          // bucket band — exactly its mass.
          val Q = 4096
          val probs = (1 until Q).map(_.toDouble / Q).toArray
          val qdf = folded.select(
            zorderBy.map(c => col(c).cast("double").as(c)): _*)
          val cuts = qdf.stat.approxQuantile(zorderBy.toArray, probs, 0.001)
          if (cuts.exists(_.isEmpty)) None // an all-null dimension
          else Some(zorderBy.zip(cuts).map { case (c, cu) =>
            graft.functions.BucketByCuts.bucket_by_cuts(
              col(c).cast("double"), cu, 65536 / Q)
          })
        } else {
          val aggs = zorderBy.flatMap(c =>
            Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
          val b = folded.agg(aggs.head, aggs.tail: _*).head
          def bucket(c: String, mn: Double, mx: Double) = {
            val span = math.max(mx - mn, java.lang.Double.MIN_NORMAL)
            least(lit(65535L),
              floor((col(c).cast("double") - lit(mn)) / lit(span) * 65536.0))
              .cast("long")
          }
          if (zorderBy.indices.exists(i => b.isNullAt(2 * i))) None
          else Some(zorderBy.zipWithIndex.map { case (c, i) =>
            bucket(c, b.getDouble(2 * i), b.getDouble(2 * i + 1)) })
        }
      bucketsOpt match {
       case None =>
        // an all-null dimension passes the type gate but carries no
        // range to bucket — fall back, SAYING SO (r17; was silent)
        System.err.println(s"[graft] compactManifested: a zorderBy " +
          s"dimension of $dir (of ${zorderBy.mkString(", ")}) is " +
          "entirely null — falling back to an unclustered " +
          "hash layout (no Z-order pruning for this fold)")
        folded.repartition(nFiles)
       case Some(buckets) =>
        // n = 4 fills bit 63 (the Long SIGN bit — 4 dims × 16 bucket
        // bits), and the engine's range partitioner compares SIGNED:
        // without correction the top half of dim 3 would sort FIRST,
        // splitting its box across the curve. XOR with MinValue makes
        // the signed comparator see the unsigned curve order; for
        // n = 2–3 (≤48 key bits) it is a constant bit flip that
        // changes no relative order. Caught by MortonPropertySpec's
        // locality property; the 4-D SinkSpec pin exercises it E2E.
        val zkey =
          (if (buckets.size == 2)
            graft.functions.InterleaveBits.interleave_bits(buckets(0), buckets(1))
          else graft.functions.InterleaveBits.interleave_bits_n(buckets))
            .bitwiseXOR(lit(Long.MinValue))
        folded.repartitionByRange(nFiles, zkey).sortWithinPartitions(zkey)
      }
    } else clusterBy match {
      case Some(c) => folded.repartitionByRange(nFiles, col(c))
        .sortWithinPartitions(col(c))
      case None => folded.repartition(nFiles)
    }).write.mode("overwrite").parquet(new HPath(root, next).toString)
    // CAS commit: if a cross-process writer advanced the trail since
    // `expected` was read, this THROWS (the fold is stale — it misses
    // that writer's generation) and the folded directory is left as
    // an orphan for [[vacuum]]; the caller re-runs the compaction.
    val v = commitManifest(fs, root, pointer, Seq(next), expected, curTxns,
      collectStats(fs, hconf(spark), root, next))
    // SNAPSHOT RETENTION: a manifest version survives this GC if it is
    // within the COUNT window (the last `retainSnapshots` before this
    // commit) OR within the TIME window (`retainFor`, anchored on the
    // manifest file's commit mtime — on an object store that is the
    // PUT instant, exactly what Delta's log-cleanup clock uses). The
    // count knob is the reader grace window (default 1 = the previous
    // contract: the entire pre-commit manifest survives one compaction
    // cycle); the time knob is the operator-facing "keep 7 days"
    // retention real deployments configure — they compose as a union,
    // like Iceberg's min-snapshots-to-keep + max-snapshot-age pair.
    // Everything outside both windows — manifest files and the
    // generations only expired manifests reference — is deleted.
    // CLOCK-SKEW caveat (shared with the vacuum grace — the same
    // caveat Delta documents for its log-cleanup clock): the cutoff
    // compares THIS writer's wall clock against STORAGE mtimes; skew
    // between the writer host and the store (or between two writers)
    // eats into the window symmetrically. Size retainFor/graceMs with
    // the deployment's worst-case skew as padding — the 1 h default
    // grace is the only thing protecting a live cross-process
    // writer's in-flight commit.
    val timeCutoff = retainFor.map(d => System.currentTimeMillis() - d.toMillis)
    def inTimeWindow(x: Long): Boolean = timeCutoff.exists { c =>
      try fs.getFileStatus(new HPath(root, s"_manifest-$x"))
        .getModificationTime >= c
      catch { case _: java.io.FileNotFoundException => false }
    }
    val allVersions = manifestVersions(fs, root)
    val kept = allVersions
      .filter(x => x >= v - retainSnapshots || inTimeWindow(x))
    val keepGens: Set[String] =
      (kept.flatMap(x => readPointer(fs, new HPath(root, s"_manifest-$x"))) ++
        (if (retainSnapshots >= 1) cur else Seq.empty) :+ next).toSet
    // same in-flight discipline as [[gcLeafRetention]] (r18): a dir no
    // manifest ever referenced may be a cross-process appender's
    // not-yet-committed generation — grace it; expired-manifest
    // references are retention food, deletable now
    val expiredGens: Set[String] = allVersions.filterNot(kept.contains)
      .flatMap(x => readPointer(fs, new HPath(root, s"_manifest-$x"))).toSet
    val graceCutoff = System.currentTimeMillis() - DefaultVacuumGraceMs
    ManifestIo.list(fs, root)
      .filter(st => st.isDirectory &&
        (st.getPath.getName.startsWith(".gen-") ||
          st.getPath.getName.startsWith(".del-")) &&
        !keepGens.contains(st.getPath.getName) &&
        (expiredGens.contains(st.getPath.getName) ||
          st.getModificationTime < graceCutoff))
      .foreach(st => ManifestIo.delete(fs, st.getPath))
    ManifestIo.list(fs, root)
      .filter(st => st.isFile && st.getPath.getName.startsWith("_manifest-") &&
        !kept.contains(st.getPath.getName.stripPrefix("_manifest-").toLong))
      .foreach(st => ManifestIo.delete(fs, st.getPath))
    ManifestIo.list(fs, new HPath(root, next))
      .count(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
    }
  }

  /** Manifest-pointer APPEND — the streaming-ingest commit: `df`
    * becomes ONE new immutable generation directory, and the pointer
    * atomically swaps to the old list PLUS the new name (the manifest
    * is newline-separated generation names; [[readManifested]] scans
    * their union). A reader resolves the old list or the new — either
    * way a complete, committed set of files — so arriving batches
    * never expose a partial table. [[compactManifested]] later folds
    * the accumulated generations back to one, retaining the pre-
    * compaction manifest as the reader grace set. Adopts an empty or
    * fresh directory (first append = generation 0). Returns the
    * committed generation id. Single-writer, like every commit here.
    *
    * `genId` makes the commit IDEMPOTENT for retrying producers (a
    * foreachBatch re-fired after a restart): the caller keys the
    * generation by a stable id (batchId), a re-fire overwrites its own
    * generation with identical deterministic content and the pointer —
    * already listing it — is left untouched, so the retry is a no-op
    * rewrite instead of a duplicate append. The overwrite of an
    * already-visible generation can momentarily remove files under a
    * concurrent scan; that reader class runs [[withManifested]], whose
    * missing-file retry covers exactly this. Without `genId`,
    * generations number monotonically from the current maximum.
    *
    * A plain leaf already holding LOOSE parquet files (no `_current`)
    * is adopted on first contact exactly as [[compactManifested]]
    * adopts it: the loose files become generation 0, THEN the batch
    * appends — never a pointer that silently excludes pre-existing
    * data. A batchId-keyed producer whose first batch would ALSO be
    * generation 0 fails loudly instead of overwriting the adopted
    * data.
    *
    * MULTI-WRITER safety (r13): within one JVM, appenders to the same
    * table serialize through the per-table lock — two interleaved
    * in-process appenders both land, in some order, with no lost
    * generation. ACROSS processes the commit is guarded by the
    * version CAS ([[commitManifest]]: `_manifest-v` is claimed by
    * create-exclusive): a writer whose `expected` version was
    * overtaken gets ConcurrentModificationException at commit and
    * RETRIES here (bounded) — re-reading the pointer, renumbering its
    * generation, rewriting, recommitting — so a committed generation
    * can never be silently dropped from the pointer. The one hazard
    * the CAS cannot close is two UNNUMBERED cross-process appenders
    * racing the same generation NAME before either commits (their
    * data writes can interleave); producers that may race across
    * processes key their batches with `genId` (disjoint deterministic
    * content — the streaming contract above) or coordinate
    * externally, exactly as with every table format's conditional-PUT
    * commit.
    *
    * Schema may EVOLVE additively across generations (a later batch
    * adds a column): [[readManifested]]/[[readManifestedAt]] merge
    * parquet schemas across the scanned generations, so rows from
    * generations written before the column read it as null — the
    * add-a-column lake contract, pinned by SinkSpec. Dropping or
    * retyping a column is NOT supported (parquet merge refuses
    * incompatible types loudly). */
  def appendManifested(spark: SparkSession, dir: String, df: DataFrame,
                       genId: Option[Long] = None): Long = {
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    withTableLock(root) {
    fs.mkdirs(root)
    val pointer = new HPath(root, "_current")
    // first-contact adoption keys off the HEAD: a pointer-less leaf
    // with a live `_manifest-*` trail is a crashed pointer swap (see
    // [[headBody]]) — it must resolve forward, never re-adopt
    if (headBody(fs, root).isEmpty) {
      val loose = ManifestIo.list(fs, root)
        .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      val gen0 = new HPath(root, ".gen-0")
      if (loose.nonEmpty) {
        require(genId.forall(_ != 0L),
          s"appendManifested: $dir holds pre-existing loose parquet " +
            "files, adopted as generation 0 — a genId=0 append would " +
            "overwrite them; key the producer's batches from a nonzero " +
            "id or compactManifested the leaf first")
        fs.mkdirs(gen0)
        loose.foreach(st => ManifestIo.rename(fs, st.getPath,
          new HPath(gen0, st.getPath.getName)))
        commitManifest(fs, root, pointer, Seq(".gen-0"),
          manifestVersions(fs, root).lastOption.getOrElse(0L),
          stats = collectStats(fs, hconf(spark), root, ".gen-0"))
      } else if (ManifestIo.list(fs, gen0)
                   .exists(st => st.isFile && st.getPath.getName.endsWith(".parquet"))) {
        // a crash BETWEEN the adoption move and its pointer commit
        // leaves gen-0 populated with no pointer — without this,
        // the no-genId append below would number itself 0 and
        // OVERWRITE the adopted data. Commit the missing pointer
        // first. (A producer's own stranded genId=0 first batch lands
        // here too, harmlessly: its retry overwrites generation 0
        // with identical deterministic content, pointer unchanged.)
        commitManifest(fs, root, pointer, Seq(".gen-0"),
          manifestVersions(fs, root).lastOption.getOrElse(0L),
          stats = collectStats(fs, hconf(spark), root, ".gen-0"))
      }
    }
    // optimistic-CAS commit loop: in-process writers never collide
    // (the lock serializes them); a cross-process writer that overtook
    // this one surfaces as ConcurrentModificationException from the
    // version CAS, and the retry re-reads the pointer — renumbering an
    // unnumbered generation past the winner's — and rewrites. Bounded:
    // persistent loss means a writer storm the deployment should be
    // coordinating explicitly, and the loop failing loudly beats
    // spinning.
    var attempt = 0
    var committed = -1L
    while (committed < 0) {
      val (gens, txns, carried) = headBody(fs, root) match {
        case Some(b) => (parseGens(b), parseTxns(b), parseStats(b))
        case None => (Seq.empty[String], Map.empty[String, Long], Seq.empty[String])
      }
      val expected = manifestVersions(fs, root).lastOption.getOrElse(0L)
      val nextId = genId.getOrElse(
        gens.map(entryId).foldLeft(-1L)(math.max) + 1)
      val next = s".gen-$nextId"
      df.write.mode("overwrite").parquet(new HPath(root, next).toString)
      if (gens.contains(next)) committed = nextId // idempotent re-fire
      else {
        try {
          commitManifest(fs, root, pointer, gens :+ next, expected, txns,
            statsForGens(carried, gens) ++ collectStats(fs, hconf(spark), root, next))
          committed = nextId
        } catch {
          case e: java.util.ConcurrentModificationException =>
            attempt += 1
            if (attempt >= 5) throw e
        }
      }
    }
    committed
    }
  }

  /** The manifest's generation list (newline-separated; single-line
    * pointers — the compaction steady state — are a 1-element list).
    * Entries are data generations (`.gen-<id>`) or tombstone
    * generations (`.del-<id>`, [[deleteManifested]]); both draw ids
    * from ONE sequence, because the id ORDER is the merge-on-read
    * semantics (a tombstone suppresses only earlier generations).
    * `#`-prefixed lines are METADATA, not generations — today the
    * `#txn:<appId>:<version>` markers of [[upsertManifested]]'s
    * exactly-once contract — and are filtered here so every
    * generation-walking reader (scan, GC, vacuum, history) is
    * oblivious to them. */
  private def readPointer(fs: HFs, pointer: HPath): Seq[String] =
    parseGens(ManifestIo.readString(fs, pointer))

  private def parseGens(body: String): Seq[String] =
    body.trim.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      .filterNot(_.startsWith("#"))

  private def parseTxns(body: String): Map[String, Long] =
    body.trim.split("\n").toSeq.map(_.trim)
      .filter(_.startsWith("#txn:"))
      .map { l =>
        val rest = l.stripPrefix("#txn:")
        val i = rest.lastIndexOf(':')
        rest.substring(0, i) -> rest.substring(i + 1).toLong
      }.toMap

  /** The committed HEAD body of a leaf: `_current` when present; when
    * the pointer is ABSENT but the `_manifest-*` trail is not — the
    * crash window inside a non-atomic pointer replace (the HDFS
    * delete+rename fallback, an object store's copy+delete rename) —
    * ROLL FORWARD to the trail head. The claimed version's data files
    * and its `_manifest-v` are both durable before the swap starts, so
    * the head trailer is a complete committed snapshot; resolving it
    * is the in-doubt-transaction roll-forward. The alternative was a
    * silent catastrophe: a writer that treated the pointer-less leaf
    * as fresh re-adopted `.gen-0` ALONE and committed a pointer that
    * dropped every later generation (r15 fix — every pointer consumer
    * below resolves through here). None = nothing committed at all.
    * The next commit's [[ManifestIo.replace]] heals the pointer. */
  private def headBody(fs: HFs, root: HPath): Option[String] = {
    val direct =
      try Some(ManifestIo.readString(fs, new HPath(root, "_current")))
      catch { case _: java.io.FileNotFoundException => None }
    direct.orElse(manifestVersions(fs, root).lastOption.map { v =>
      ManifestIo.readString(fs, new HPath(root, s"_manifest-$v"))
    })
  }

  /** Does the leaf hold a committed table at all? The [[headBody]]
    * predicate exposed for the streaming bootstrap (CdcApply): a leaf
    * whose `_current` is missing but whose `_manifest-*` trail is not
    * is a CRASHED POINTER SWAP, not a missing leaf — re-bootstrapping
    * it would commit an empty `.gen-0` over the rolled-forward head
    * and silently reset that shard's state. */
  private[graft] def hasCommittedHead(fs: HFs, root: HPath): Boolean =
    headBody(fs, root).isDefined

  /** The head version of the committed `_manifest-*` trail (0 when
    * nothing committed) — what a direct [[commitManifest]] caller
    * anchors its CAS on. */
  private[graft] def headVersion(fs: HFs, root: HPath): Long =
    manifestVersions(fs, root).lastOption.getOrElse(0L)

  /** The `#txn:<appId>:<version>` markers of a committed manifest —
    * one entry per writer application, highest version applied (the
    * Delta `txnAppId`/`txnVersion` idempotent-writes state). Carried
    * forward by EVERY commit path (append, delete, upsert, compaction
    * fold), so the marker survives maintenance exactly like the data:
    * the manifest is a full snapshot, and the txn state is part of it. */
  private def readTxns(fs: HFs, pointer: HPath): Map[String, Long] =
    parseTxns(ManifestIo.readString(fs, pointer))

  /** Serialize a manifest body: generation list, then the `#stats:`
    * file-skipping lines (sorted), then the txn markers (app-sorted) —
    * deterministic bytes, so trail-head == pointer stays a
    * byte-equality invariant. */
  private def manifestBody(gens: Seq[String], txns: Map[String, Long],
                           stats: Seq[String] = Seq.empty): String =
    (gens ++ stats.sorted ++
      txns.toSeq.sortBy(_._1).map { case (a, v) => s"#txn:$a:$v" })
      .mkString("\n")

  // ------------------------------------------------- data skipping (r15)
  // Per-FILE min/max statistics ride the manifest as `#stats:` metadata
  // lines (the same mechanism as the `#txn:` markers — part of the
  // snapshot, carried by every commit path), the Delta add-file-stats /
  // Iceberg manifest-metrics analogue: a point/range predicate on a
  // clustered column opens only the files whose range intersects it,
  // instead of every file of every live generation — the one 100 TB
  // read-path feature partition pruning alone cannot give (a keyed
  // point-read against an unpartitioned 100 TB leaf).
  //
  // Line format (one per file × column):
  //   #stats:<entry>/<file>:<col>:l:<min>:<max>       signed integral
  //   #stats:<entry>/<file>:<col>:d:<min>:<max>       double/float
  //   #stats:<entry>/<file>:<col>:s:<b64min>:<b64max> UTF-8 string
  // Readers that lack a line for (file, column) keep the file —
  // conservative by construction, so legacy manifests, unsupported
  // types and all-null chunks never mis-prune.

  /** Columns per file that get stats lines — the Delta
    * dataSkippingNumIndexedCols analogue; bounds manifest growth to
    * O(files × 16) lines. */
  private val MaxStatsCols = 16

  /** Footer-walk one committed generation directory and emit its
    * `#stats:` lines: per file, per top-level atomic column (capped at
    * [[MaxStatsCols]], schema order), the min/max across that file's
    * row groups — read from the parquet column-chunk statistics the
    * writer already stored, so collection is one footer read per NEW
    * file per commit (the same footers a mergeSchema planning pass
    * reads; carried-forward generations re-use their existing lines as
    * text, never re-read). Skipped (conservatively, no line): nested
    * columns, non-string binary, unsupported physical types, chunks
    * with absent/empty stats, all-null files, NaN-tainted double
    * stats, and column names that would break the line syntax. String
    * min/max are base64 of the UTF-8 bytes; their order is unsigned
    * byte-wise — exactly UTF8String's comparison, so pruning agrees
    * with the engine's own `>=`.
    *
    * Also emits one `#file:<entry>/<file>` line per parquet file
    * (r16): the manifest then IS the generation's file inventory —
    * [[readManifestedRange]] plans the pruned scan from these lines
    * with ZERO per-generation directory lists (the O(files) metadata
    * round-trips that dominate at object-store latencies, the exact
    * cost Delta/Iceberg avoid by making the log the inventory).
    * Stats-less files (all-null, unsupported types) still get their
    * `#file:` line, so the inventory is complete even where skipping
    * cannot prune; legacy manifests without `#file:` lines fall back
    * to listing. */
  private def collectStats(fs: HFs, conf: org.apache.hadoop.conf.Configuration,
                           root: HPath, entry: String): Seq[String] = {
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
    import org.apache.parquet.schema.LogicalTypeAnnotation
    import scala.jdk.CollectionConverters._
    val enc = java.util.Base64.getUrlEncoder.withoutPadding
    val dir = new HPath(root, entry)
    val files = ManifestIo.list(fs, dir)
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName)
    files.toSeq.map(st => s"#file:$entry/${st.getPath.getName}") ++
      files.toSeq.flatMap { st =>
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
      try {
        val md = reader.getFooter
        val blocks = md.getBlocks.asScala.toSeq
        md.getFileMetaData.getSchema.getFields.asScala.toSeq
          .filter(_.isPrimitive).take(MaxStatsCols)
          .flatMap { f =>
            val name = f.getName
            val chunks = blocks.flatMap(_.getColumns.asScala.filter(c =>
              c.getPath.size() == 1 && c.getPath.toDotString == name))
            val stats = chunks.map(_.getStatistics)
            if (name.contains(":") || name.contains("/") || name.contains("\n") ||
                stats.isEmpty ||
                stats.exists(s => s == null || s.isEmpty || !s.hasNonNullValue))
              None
            else {
              val prefix = s"#stats:$entry/${st.getPath.getName}:$name"
              f.asPrimitiveType().getPrimitiveTypeName match {
                case PrimitiveTypeName.INT32 | PrimitiveTypeName.INT64 =>
                  // DATE/TIMESTAMP logical types ride the same signed
                  // integral order (days / micros)
                  val mn = stats.map(_.genericGetMin.asInstanceOf[Number].longValue).min
                  val mx = stats.map(_.genericGetMax.asInstanceOf[Number].longValue).max
                  Some(s"$prefix:l:$mn:$mx")
                case PrimitiveTypeName.DOUBLE | PrimitiveTypeName.FLOAT =>
                  val mn = stats.map(_.genericGetMin.asInstanceOf[Number].doubleValue).min
                  val mx = stats.map(_.genericGetMax.asInstanceOf[Number].doubleValue).max
                  // NaN-initialized stats (first value NaN) are
                  // untrustworthy bounds — skip, keep the file
                  if (mn.isNaN || mx.isNaN) None else Some(s"$prefix:d:$mn:$mx")
                case PrimitiveTypeName.BINARY
                    if f.asPrimitiveType().getLogicalTypeAnnotation ==
                      LogicalTypeAnnotation.stringType() =>
                  val byBytes = Ordering.comparatorToOrdering(
                    java.util.Comparator.comparing(
                      (b: Array[Byte]) => b,
                      (a: Array[Byte], b: Array[Byte]) =>
                        java.util.Arrays.compareUnsigned(a, b)))
                  val mn = stats.map(_.genericGetMin
                    .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes).min(byBytes)
                  val mx = stats.map(_.genericGetMax
                    .asInstanceOf[org.apache.parquet.io.api.Binary].getBytes).max(byBytes)
                  Some(s"$prefix:s:${enc.encodeToString(mn)}:${enc.encodeToString(mx)}")
                case _ => None
              }
            }
          }
      } finally reader.close()
    }
  }

  /** The per-file metadata lines of a manifest body — `#stats:`
    * (min/max skipping) and `#file:` (file inventory) both carry the
    * same `<entry>/<file>` addressing and the same carry-forward
    * lifecycle. */
  private def parseStats(body: String): Seq[String] =
    body.trim.split("\n").toSeq.map(_.trim)
      .filter(l => l.startsWith("#stats:") || l.startsWith("#file:"))

  /** The entry (generation/tombstone name) a per-file metadata line
    * belongs to. */
  private def metaEntry(l: String): String =
    l.substring(l.indexOf(':') + 1).takeWhile(_ != '/')

  /** Carry-forward filter: the stats/file lines whose entry survives
    * into the next commit's generation list (dropped generations take
    * their lines with them; retained ones keep theirs as text — no
    * re-read). */
  private def statsForGens(lines: Seq[String], gens: Seq[String]): Seq[String] = {
    val keep = gens.toSet
    lines.filter(l => keep.contains(metaEntry(l)))
  }

  /** Does the recorded [min, max] intersect the query's [lower, upper]?
    * Bound-type / kind mismatches keep the file (conservative). */
  private def statsOverlap(kind: String, mn: String, mx: String,
                           lower: Any, upper: Any): Boolean = {
    def asLong(v: Any): Option[Long] = v match {
      case n: Byte => Some(n.toLong); case n: Short => Some(n.toLong)
      case n: Int => Some(n.toLong); case n: Long => Some(n)
      case _ => None
    }
    def asDouble(v: Any): Option[Double] = v match {
      case n: Float => Some(n.toDouble); case n: Double => Some(n)
      case other => asLong(other).map(_.toDouble)
    }
    kind match {
      case "l" => (asLong(lower), asLong(upper)) match {
        case (Some(lo), Some(hi)) => !(hi < mn.toLong || lo > mx.toLong)
        case _ => true
      }
      case "d" => (asDouble(lower), asDouble(upper)) match {
        case (Some(lo), Some(hi)) => !(hi < mn.toDouble || lo > mx.toDouble)
        case _ => true
      }
      case "s" => (lower, upper) match {
        case (lo: String, hi: String) =>
          val dec = java.util.Base64.getUrlDecoder
          val mnB = dec.decode(mn)
          val mxB = dec.decode(mx)
          !(java.util.Arrays.compareUnsigned(hi.getBytes("UTF-8"), mnB) < 0 ||
            java.util.Arrays.compareUnsigned(lo.getBytes("UTF-8"), mxB) > 0)
        case _ => true
      }
      case _ => true
    }
  }

  /** The shared id sequence under `.gen-<id>` / `.del-<id>` names. */
  private def entryId(name: String): Long =
    name.substring(name.lastIndexOf('-') + 1).toLong

  /** Scan a committed generation list: the union of the data
    * generations with any `.del-` tombstones applied in ID ORDER — a
    * tombstoned key disappears from every generation committed BEFORE
    * the tombstone and SURVIVES in any committed after (re-insert
    * semantics: delete then append genuinely resurrects the key),
    * exactly the merge-on-read contract of Delta deletion vectors /
    * Iceberg equality deletes, keyed rather than positional.
    *
    * Fast path: no tombstones in the list (the steady state —
    * compaction retires them) reads as ONE multi-path mergeSchema
    * scan, unchanged from pre-delete rounds. With tombstones, each
    * generation is read tagged with its id (union-by-name with
    * null-fill — the same additive-evolution semantics mergeSchema
    * gives) and the suppression is one left_anti join against the
    * tombstone keys with the `tid > gid` ordering predicate; the
    * tombstone side is delete-sized (small), so at scale this is a
    * broadcast anti join over the scan, not a second shuffle. */
  private def scanGens(spark: SparkSession, root: HPath,
                       gens: Seq[String]): DataFrame = {
    val (dels, datas) = gens.partition(_.startsWith(".del-"))
    // not producible by current writers (every commit path lists at
    // least one data generation), but a hand-edited or future-writer
    // manifest must fail loudly here, not as reduceLeft-on-empty
    require(datas.nonEmpty,
      s"scanGens: manifest lists only tombstones: ${gens.mkString(", ")}")
    if (dels.isEmpty)
      spark.read.option("mergeSchema", "true")
        .parquet(datas.map(g => new HPath(root, g).toString): _*)
    else {
      val tagged = datas.map(g =>
        g -> spark.read.parquet(new HPath(root, g).toString))
      requireAdditiveOnly(tagged)
      val data = tagged.map { case (g, df) =>
        df.withColumn("_gid", lit(entryId(g)))
      }.reduceLeft(_.unionByName(_, allowMissingColumns = true))
      applyTombstones(spark, root, dels, data)
    }
  }

  /** Refuse a RETYPED column across generations on the union-by-name
    * (tombstoned) scan path — explicitly, before the union. Without
    * this the union's type coercion could silently CAST a retyped
    * column (e.g. a string column re-committed as bigint widens the
    * old strings, exploding on unparseable rows only — or worse, NOT
    * exploding); the mergeSchema fast path already refuses such merges
    * at the parquet layer, and both paths must hold the same contract:
    * additive evolution only, drop/retype is a loud error. */
  private def requireAdditiveOnly(gens: Seq[(String, DataFrame)]): Unit = {
    val seen = scala.collection.mutable.LinkedHashMap[
      String, (String, org.apache.spark.sql.types.DataType)]()
    gens.foreach { case (g, df) =>
      df.schema.foreach { f =>
        seen.get(f.name) match {
          case Some((g0, t0)) if t0 != f.dataType =>
            throw new IllegalArgumentException(
              s"scanGens: column '${f.name}' is retyped across " +
                s"generations ($g0: $t0 vs $g: ${f.dataType}) — schema " +
                "evolution is additive only; retyping/dropping is not " +
                "supported")
          case None => seen(f.name) = (g, f.dataType)
          case _ =>
        }
      }
    }
  }

  /** Apply `.del-` tombstones to `_gid`-tagged data rows — the shared
    * merge-on-read suppression of [[scanGens]] and the pruned
    * [[readManifestedRange]] path: one left_anti join against the
    * (delete-sized, broadcast) tombstone keys with the `tid > gid`
    * ordering predicate. Every tombstone carries ONE column whose NAME
    * is the table's key column ([[deleteManifested]] enforces it at
    * write time). */
  private def applyTombstones(spark: SparkSession, root: HPath,
                              dels: Seq[String], data: DataFrame): DataFrame = {
    val keyCols = dels.map(g =>
      spark.read.parquet(new HPath(root, g).toString).columns.toSeq).distinct
    require(keyCols.size == 1 && keyCols.head.size == 1,
      s"scanGens: tombstones disagree on the key column: $keyCols")
    val key = keyCols.head.head
    val tomb = dels.map { g =>
      spark.read.parquet(new HPath(root, g).toString)
        .select(col(key).as("_tkey")).withColumn("_tid", lit(entryId(g)))
    }.reduceLeft(_.unionByName(_))
    data.join(broadcast(tomb),
        data(key) === tomb("_tkey") && tomb("_tid") > data("_gid"),
        "left_anti")
      .drop("_gid")
  }

  /** DATA-SKIPPING READ: [[readManifested]] restricted to `lower <=
    * column <= upper`, opening ONLY the files whose manifest-recorded
    * min/max range intersects the predicate (plus any file with no
    * recorded stats — conservative). Semantically identical to
    * `readManifested(...).filter(col >= lower && col <= upper)` — the
    * predicate is re-applied on the surviving files, so skipping can
    * only cut IO, never change the answer. The 100 TB shape: a keyed
    * point-read (`lower == upper`) against a table whose layout is
    * clustered on `column` (time-ordered ingest, or a
    * [[compactManifested]] fold with `clusterBy`) opens O(trail
    * depth) files instead of all of them. Bounds: integral, double or
    * string, matching the column's type (a mismatched bound reads
    * everything, still correct). Tombstones are always read in full —
    * they are delete-sized — and apply exactly as in [[scanGens]]. */
  def readManifestedRange(spark: SparkSession, dir: String, column: String,
                          lower: Any, upper: Any): DataFrame = {
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    def resolveDf(): DataFrame = {
      val body = headBody(fs, root).getOrElse(
        throw new java.io.FileNotFoundException(
          s"readManifestedRange: $dir has no committed table"))
      val gens = parseGens(body)
      val meta = parseStats(body)
      val ranges: Map[(String, String), (String, String, String)] =
        meta.filter(_.startsWith("#stats:")).flatMap { l =>
          // #stats:<entry>/<file>:<col>:<kind>:<min>:<max>
          l.stripPrefix("#stats:").split(":", 5) match {
            case Array(entryFile, c, kind, mn, mx) if c == column =>
              val slash = entryFile.indexOf('/')
              Some((entryFile.take(slash), entryFile.drop(slash + 1)) ->
                (kind, mn, mx))
            case _ => None
          }
        }.toMap
      // the manifest as file INVENTORY (r16): a generation with
      // `#file:` lines plans from them — zero directory lists on the
      // read path; a legacy generation (no lines) falls back to one
      // list. Inventory presence is judged per generation, so mixed
      // trails (old generations carried into new manifests) stay
      // correct.
      val inventory: Map[String, Seq[String]] =
        meta.filter(_.startsWith("#file:"))
          .map(_.stripPrefix("#file:")).map { ef =>
            val slash = ef.indexOf('/')
            ef.take(slash) -> ef.drop(slash + 1)
          }.groupBy(_._1).map { case (g, xs) => g -> xs.map(_._2) }
      def filesOf(g: String): Seq[HPath] = inventory.get(g) match {
        case Some(names) =>
          val d = new HPath(root, g)
          names.map(n => new HPath(d, n))
        case None => ManifestIo.list(fs, new HPath(root, g))
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(_.getPath).toSeq
      }
      val (dels, datas) = gens.partition(_.startsWith(".del-"))
      require(datas.nonEmpty,
        s"readManifestedRange: manifest lists only tombstones: $gens")
      // (generation, all files, files surviving the stats prune)
      val selected: Seq[(String, Seq[HPath], Seq[HPath])] = datas.map { g =>
        val all = filesOf(g)
        (g, all, all.filter(f => ranges.get((g, f.getName)) match {
          case Some((kind, mn, mx)) => statsOverlap(kind, mn, mx, lower, upper)
          case None => true
        }))
      }
      val pred = col(column) >= lit(lower) && col(column) <= lit(upper)
      val live = selected.filter(_._3.nonEmpty)
      // a generation whose files ALL pruned still contributes its
      // SCHEMA (one footer via a limit(0) branch): the pruned read
      // must stay semantically identical to readManifested().filter()
      // — columns added by that generation survive (null-filled), and
      // a retyped column still refuses loudly instead of escaping
      // requireAdditiveOnly through the prune
      val prunedOut = selected.filter(s => s._3.isEmpty && s._2.nonEmpty)
      if (live.isEmpty)
        // every file excluded — plan the ordinary scan only for its
        // schema; the predicate returns zero rows through it
        scanGens(spark, root, gens).filter(pred)
      else if (dels.isEmpty && prunedOut.isEmpty)
        spark.read.option("mergeSchema", "true")
          .parquet(live.flatMap(_._3).map(_.toString): _*)
          .filter(pred)
      else {
        val tagged = selected.collect {
          case (g, _, fl) if fl.nonEmpty =>
            g -> spark.read.parquet(fl.map(_.toString): _*)
          case (g, all, _) if all.nonEmpty =>
            g -> spark.read.parquet(all.head.toString).limit(0)
        }
        requireAdditiveOnly(tagged)
        val data = tagged.map { case (g, df) =>
          df.withColumn("_gid", lit(entryId(g)))
        }.reduceLeft(_.unionByName(_, allowMissingColumns = true))
        val undeleted =
          if (dels.isEmpty) data.drop("_gid")
          else applyTombstones(spark, root, dels, data)
        undeleted.filter(pred)
      }
    }
    try resolveDf()
    catch {
      case _: org.apache.spark.sql.AnalysisException => resolveDf()
      case _: java.io.FileNotFoundException => resolveDf()
    }
  }

  /** ROW-LEVEL DELETE as a tombstone commit — the merge-on-read
    * delete (Delta deletion vectors / Iceberg equality-delete files,
    * keyed): `keys` (exactly one column, named the table's key
    * column) becomes an immutable `.del-<id>` generation and the
    * pointer swaps to the old list plus the tombstone — one O(delete
    * set) write and one pointer commit, NEVER a rewrite of the data
    * (the delete-a-few-rows-from-100 TB operation). Readers apply it
    * ordered (see [[scanGens]]): earlier generations lose the keys,
    * a LATER append legitimately re-inserts them. Compaction
    * materializes the suppression and retires the tombstone; GC,
    * retention, time travel ([[readManifestedAt]] resolves a
    * pre-delete snapshot WITH its rows — deletion is versioned like
    * any commit), vacuum, and the multi-writer CAS all treat `.del-`
    * entries as ordinary generations. NULL keys never match (SQL
    * equality — the Iceberg equality-delete contract): a null-keyed
    * row cannot be tombstoned; route such rows through compaction
    * with a filter instead. Returns the tombstone's id, or -1 when
    * `txn` marks the call as an already-applied replay (the
    * [[upsertManifested]] exactly-once contract, same marker
    * namespace — a delete and an upsert from one producer share its
    * monotone version sequence). */
  def deleteManifested(spark: SparkSession, dir: String,
                       keys: DataFrame,
                       txn: Option[(String, Long)] = None): Long = {
    require(keys.columns.length == 1,
      s"deleteManifested: keys must be exactly the key column, got " +
        keys.columns.mkString(", "))
    require(txn.forall(t => !t._1.contains("\n") && !t._1.contains(":")),
      s"deleteManifested: txn appId must not contain ':' or newline: $txn")
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    withTableLock(root) {
      val pointer = new HPath(root, "_current")
      val head = headBody(fs, root).getOrElse(throw new IllegalArgumentException(
        s"deleteManifested: $dir has no committed table"))
      val gens = parseGens(head)
      val txns = parseTxns(head)
      val expected = manifestVersions(fs, root).lastOption.getOrElse(0L)
      val alreadyApplied =
        txn.exists { case (app, ver) => txns.get(app).exists(_ >= ver) }
      if (alreadyApplied) -1L
      else {
        // refuse an unknown key column AT COMMIT TIME (footer-only schema
        // probe of one data generation) — otherwise the mistake would
        // surface later, as a reader's resolution error
        val key = keys.columns.head
        gens.find(!_.startsWith(".del-")).foreach { g =>
          val cols = spark.read.parquet(new HPath(root, g).toString).columns
          require(cols.contains(key),
            s"deleteManifested: $dir has no column '$key' " +
              s"(columns: ${cols.mkString(", ")})")
        }
        val nextId = gens.map(entryId).foldLeft(-1L)(math.max) + 1
        val next = s".del-$nextId"
        keys.distinct().write.mode("overwrite")
          .parquet(new HPath(root, next).toString)
        // tombstones carry no stats of their own (they are read in
        // full — delete-sized); the data generations' lines carry
        commitManifest(fs, root, pointer, gens :+ next, expected,
          txn.fold(txns) { case (app, ver) => txns + (app -> ver) },
          statsForGens(parseStats(head), gens))
        nextId
      }
    }
  }

  /** Commit manifest VERSION `expectedVersion + 1`: claim the
    * immutable history file `_manifest-<v>` by CREATE-EXCLUSIVE (the
    * Delta `_delta_log/N.json` analogue — one file per commit, and
    * put-if-absent on its name IS the concurrency control: r13), then
    * swap `_current` to the same content. A writer whose
    * `expectedVersion` was overtaken — another process committed
    * since it read the pointer — fails the claim and gets
    * ConcurrentModificationException BEFORE anything becomes visible:
    * a committed generation can never be silently dropped by a stale
    * writer's pointer swap. `_current` stays the single reader entry
    * point ([[readManifested]] — no history scan on the hot path);
    * the `_manifest-*` trail is what [[readManifestedAt]]
    * time-travels through. A crash between the claim and the pointer
    * swap strands `_manifest-<v>` as an uncommitted trailer —
    * [[vacuum]] removes it; the next writer (anchored on the POINTER,
    * and claiming max-trail-version + 1) simply commits past it.
    * Returns the committed version id. */
  private[graft] def commitManifest(fs: HFs, root: HPath, pointer: HPath,
                             gens: Seq[String], expectedVersion: Long,
                             txns: Map[String, Long] = Map.empty,
                             stats: Seq[String] = Seq.empty): Long = {
    val v = expectedVersion + 1
    val body = manifestBody(gens, txns, stats)
    if (!ManifestIo.putIfAbsent(fs, new HPath(root, s"_manifest-$v"), body))
      throw new java.util.ConcurrentModificationException(
        s"commit of $root at version $v lost the race: another writer " +
          "committed after this writer read the pointer (version CAS " +
          "on the _manifest trail) — re-read and retry, or key batches " +
          "by genId / coordinate writers")
    ManifestIo.replace(fs, pointer, body)
    v
  }

  /** The committed snapshot versions of a manifested leaf, ascending
    * (the surviving `_manifest-*` trail — older versions disappear as
    * [[compactManifested]]'s retention window GCs them). Resolves the
    * filesystem through the active session's Hadoop conf when one
    * exists (connector conf applies), else the default. */
  def snapshots(dir: String): Seq[Long] = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val (fs, root) = ManifestIo.resolve(dir, conf)
    manifestVersions(fs, root)
  }

  private def manifestVersions(fs: HFs, root: HPath): Seq[Long] =
    ManifestIo.list(fs, root)
      .filter(st => st.isFile && st.getPath.getName.startsWith("_manifest-"))
      .map(_.getPath.getName.stripPrefix("_manifest-").toLong)
      .sorted.toSeq

  /** SNAPSHOT READ (time travel): scan the table exactly as committed
    * by manifest version `version` — the Iceberg `VERSION AS OF` /
    * Delta `versionAsOf` analogue for the audit/debug read the CDC and
    * streaming-ingest paths need. Fails LOUDLY, never silently-
    * partially: an unknown version (never committed, or its manifest
    * file already GC'd) is an IllegalArgumentException listing what IS
    * retained; a version whose manifest survives but whose generation
    * directories were GC'd (the retention window moved past it between
    * the list and now) is an IllegalStateException naming the missing
    * generation. Retention is [[compactManifested]]'s
    * `retainSnapshots` knob — the local analogue of Iceberg/Delta
    * snapshot-retention config. */
  def readManifestedAt(spark: SparkSession, dir: String,
                       version: Long): DataFrame = {
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    val hist = new HPath(root, s"_manifest-$version")
    if (!ManifestIo.exists(fs, hist))
      throw new IllegalArgumentException(
        s"readManifestedAt: snapshot $version of $dir is not retained " +
          s"(available: ${manifestVersions(fs, root).mkString(", ")})")
    val gens = readPointer(fs, hist)
    gens.find(g => !ManifestIo.isDirectory(fs, new HPath(root, g))).foreach { g =>
      throw new IllegalStateException(
        s"readManifestedAt: snapshot $version of $dir lists $g, which " +
          "has been garbage-collected (retention window moved past it)")
    }
    // scanGens: a snapshot taken BEFORE a delete reads with its rows;
    // one taken after applies the tombstone — deletes are versioned
    // like any commit
    scanGens(spark, root, gens)
  }

  // The pointer swap itself — synced tmp write, atomic rename, parent
  // sync — lives at [[ManifestIo.replace]], with the per-scheme
  // semantics (POSIX rename on file:, delete+rename fallback on HDFS,
  // conditional-PUT note for object stores) documented there. Scope
  // of the durability claim is unchanged from the java.nio era: the
  // POINTER commit is durable where the store can make it so; the
  // generation's DATA files are written by Spark's parquet committer,
  // whose durability is the filesystem/object store's contract.
  // Reader-visibility atomicity needs none of this: a reader sees the
  // old pointer or the new, never a partial one.

  /** Read a [[compactManifested]] leaf through its manifest: resolve
    * `_current`, scan that generation. `spark.read.parquet` lists the
    * generation eagerly, so a stale pointer usually surfaces here (not
    * at some later action) and the one retry re-resolves it — that
    * race is possible only when the resolve races TWO commits back to
    * back (the one-generation retention grace has run out). A reader
    * that resolved fine but is MID-SCAN (count/collect in flight) when
    * its generation is GC'd two commits later fails at the ACTION, not
    * here — run such actions through [[withManifested]], which retries
    * that class too. */
  def readManifested(spark: SparkSession, dir: String): DataFrame = {
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    def resolveDf(): DataFrame = {
      val gens = parseGens(headBody(fs, root).getOrElse(
        throw new java.io.FileNotFoundException(
          s"readManifested: $dir has no committed table")))
      // scanGens: additive schema evolution carries (mergeSchema /
      // union-by-name null-fill — cost is one footer read per file at
      // planning, paid only while the manifest lists >1 generation),
      // and `.del-` tombstones apply in id order (merge-on-read; the
      // tombstone-free steady state is the same single multi-path
      // scan as always).
      scanGens(spark, root, gens)
    }
    // one retry covers BOTH stale-resolve shapes: a GC'd generation
    // surfaces as AnalysisException from the eager listing, and a
    // pointer mid-replace on a scheme whose rename refuses an existing
    // destination (the HDFS delete+rename fallback — see
    // [[ManifestIo.replace]]) surfaces as FileNotFoundException from
    // the `_current` open itself. Direct callers (CdcApply, Quality)
    // get the documented one-retry contract without withManifested.
    try resolveDf()
    catch {
      case _: org.apache.spark.sql.AnalysisException => resolveDf()
      case _: java.io.FileNotFoundException => resolveDf()
    }
  }

  /** [[compactManifested]] over a partitioned root: walk the `k=v`
    * tree to its leaves (the [[compactPartitioned]] walk, including
    * the stranded-`.compact_old` restore for trees migrating from the
    * two-rename scheme) and give each leaf its OWN `_current` manifest
    * commit. Returns root-relative leaf path → file count written.
    *
    * This closes the one hole the two-rename per-leaf swap left: a
    * reader listing the root during a leaf's swap could silently miss
    * that whole partition for an instant. With a per-leaf pointer
    * there is — by the same construction as the single-leaf argument —
    * a complete generation resolvable in every leaf at every instant;
    * [[readManifestedPartitioned]] is the reader that consults them.
    * Contract stays single-WRITER per leaf (writers to different
    * leaves are independent, exactly like every table format's
    * partition-level commit). */
  def compactManifestedPartitioned(spark: SparkSession, rootDir: String,
                                   targetFileBytes: Long = 128L << 20,
                                   retainSnapshots: Int = 1,
                                   retainFor: Option[java.time.Duration] = None,
                                   clusterBy: Option[String] = None,
                                   zorderBy: Seq[String] = Nil,
                                   zorderQuantiles: Boolean = false): Map[String, Int] = {
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    require(ManifestIo.isDirectory(fs, root),
      s"compactManifestedPartitioned: $rootDir is not a directory")
    val leaves = manifestLeaves(fs, root)
    // compaction has no txn identity; a crashed run's claim is taken
    // over once aged (beginRootTransition) — content-safe, since
    // compaction is content-preserving per leaf and the next map
    // records actual heads
    // contentPreserving: compaction may TAKE OVER an aged crashed
    // legacy (pre-map) mid-transition — folding each leaf at its
    // actual head and publishing the first version map (r17)
    val st = beginRootTransition(fs, root, leaves, None,
      "compactManifestedPartitioned", contentPreserving = true)
    // Phase 1 — STEADY-STATE SKIP, on the bounded pool (r16/r17): a
    // leaf already folded to one data generation (no tombstone trail,
    // no re-layout requested) needs no fold and COMMITS NOTHING —
    // under the version map untouched leaves are simply recorded at
    // their current head, so the periodic compaction under a sharded
    // CDC stream costs O(touched shards), like the merges it folds.
    // The skip still honors the caller's retention knobs (r17): the
    // no-commit [[gcLeafRetention]] ages out manifests/generations a
    // prior fold retained under wider knobs — without it a steady
    // leaf kept one permanently stale snapshot's worth of storage that
    // retainFor/retainSnapshots=0 could never reclaim. Steady checks
    // and the GC are pure FS metadata (head read + list + deletes, no
    // Spark job), independent across leaves — pooled, the walk over
    // thousands of steady shards pays leaves/16 × RTT, not leaves ×.
    val checked = parCommitLeaves(leaves,
      refresh = () => refreshClaim(fs, st, root, None)) { leaf =>
      val rel = relPath(root, leaf)
      val body = headBody(fs, leaf)
      val gens = body.map(parseGens).getOrElse(Seq.empty)
      val steady = gens.size == 1 && gens.head.startsWith(".gen-") &&
        clusterBy.isEmpty && zorderBy.isEmpty
      if (steady) {
        val inv = parseStats(body.get).count(l => l.startsWith("#file:") &&
          metaEntry(l) == gens.head)
        val n =
          if (inv > 0) inv
          else ManifestIo.list(fs, new HPath(leaf, gens.head))
            .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
        val v = withTableLock(leaf) {
          gcLeafRetention(fs, leaf, retainSnapshots, retainFor)
        }
        Some(rel -> (n, st.prior.getOrElse(rel, v)))
      } else None
    }
    // Phase 2 — folds, sequential: each is a Spark job (scan + write)
    val out = leaves.zip(checked).map {
      case (_, Some(r)) => r
      case (leaf, None) =>
        val rel = relPath(root, leaf)
        val n = compactManifested(spark, leaf.toString, targetFileBytes,
          retainSnapshots, retainFor, clusterBy, zorderBy, zorderQuantiles)
        refreshClaim(fs, st, root, None)
        rel -> (n, headVersion(fs, leaf))
    }
    val map = out.map { case (r, (_, v)) => r -> v }.toMap
    // a fully-steady walk (every leaf skipped, heads unchanged) spends
    // NO root version: periodic maintenance under a live stream must
    // be free when there is nothing to fold — release the claim only
    val skipped = map == st.prior && rootVersions(fs, root).nonEmpty
    if (skipped) ManifestIo.delete(fs, st.claimPath(root))
    else commitRootManifest(fs, root, st, map, None)
    // root-manifest retention mirrors the per-leaf knobs as the SAME
    // union — count window OR time window (r17): a map-managed root
    // refuses any version without a surviving map, so GC'ing a root
    // manifest inside `retainFor` would silently collapse root-level
    // time travel to the count window even while every leaf snapshot
    // it references is still retained. mtime is the commit instant
    // (the PUT instant on an object store), the per-leaf clock. Runs
    // on BOTH paths — a fully-steady walk spends no version but still
    // ages maps out, or a steady table's "retain 0" would never
    // reclaim them (the same storage leak the leaf-side
    // [[gcLeafRetention]] closes).
    val rootHead =
      if (skipped) rootVersions(fs, root).lastOption.getOrElse(0L) else st.next
    val rootTimeCutoff =
      retainFor.map(d => System.currentTimeMillis() - d.toMillis)
    def rootInTimeWindow(v: Long): Boolean = rootTimeCutoff.exists { c =>
      try fs.getFileStatus(new HPath(root, s"_root-manifest-$v"))
        .getModificationTime >= c
      catch { case _: java.io.FileNotFoundException => false }
    }
    rootVersions(fs, root)
      .filter(v => v < rootHead - retainSnapshots && !rootInTimeWindow(v))
      .foreach(v =>
        ManifestIo.delete(fs, new HPath(root, s"_root-manifest-$v")))
    out.map { case (r, (n, _)) => r -> n }.toMap
  }

  /** Retention GC for a leaf WITHOUT a new fold commit — the steady-
    * skip companion (r17). Applies [[compactManifested]]'s retention
    * union relative to the CURRENT head `h` instead of a new commit:
    * a manifest survives inside the count window (`x >= h -
    * retainSnapshots` — exactly the shape a fold at `h` left behind,
    * so a freshly-folded leaf is a no-op) or the time window
    * (`retainFor` against the manifest's commit mtime); expired
    * manifests and the generation/tombstone dirs only they reference
    * are deleted. Pure FS metadata work — no Spark job, no manifest
    * version spent, the head untouched. Returns the head version.
    * Caller holds the table lock; the same single-maintainer
    * discipline as the fold GC applies across processes. */
  private def gcLeafRetention(fs: HFs, leaf: HPath, retainSnapshots: Int,
                              retainFor: Option[java.time.Duration]): Long = {
    val vs = manifestVersions(fs, leaf)
    val h = vs.lastOption.getOrElse(0L)
    val timeCutoff = retainFor.map(d => System.currentTimeMillis() - d.toMillis)
    def inTime(x: Long): Boolean = timeCutoff.exists { c =>
      try fs.getFileStatus(new HPath(leaf, s"_manifest-$x"))
        .getModificationTime >= c
      catch { case _: java.io.FileNotFoundException => false }
    }
    val kept = vs.filter(x => x >= h - retainSnapshots || inTime(x))
    if (kept.size != vs.size) {
      val keepGens: Set[String] = kept
        .flatMap(x => readPointer(fs, new HPath(leaf, s"_manifest-$x"))).toSet
      // a dir referenced ONLY by expired manifests was committed once
      // and is plain retention food — deletable now; a dir referenced
      // by NO manifest at all may be a live cross-process appender's
      // in-flight (not-yet-committed) generation on this steady leaf,
      // so it gets the vacuum mtime grace instead of an instant delete
      // (r18 — the fold GC's documented in-flight protection applied
      // here too; an aged true orphan falls to the next pass/vacuum)
      val expiredGens: Set[String] = vs.filterNot(kept.contains)
        .flatMap(x => readPointer(fs, new HPath(leaf, s"_manifest-$x"))).toSet
      val graceCutoff = System.currentTimeMillis() - DefaultVacuumGraceMs
      ManifestIo.list(fs, leaf)
        .filter(st => st.isDirectory &&
          (st.getPath.getName.startsWith(".gen-") ||
            st.getPath.getName.startsWith(".del-")) &&
          !keepGens.contains(st.getPath.getName) &&
          (expiredGens.contains(st.getPath.getName) ||
            st.getModificationTime < graceCutoff))
        .foreach(st => ManifestIo.delete(fs, st.getPath))
      vs.filterNot(kept.contains).foreach(x =>
        ManifestIo.delete(fs, new HPath(leaf, s"_manifest-$x")))
    }
    h
  }

  /** The `k=v` leaf walk shared by the manifested-partitioned compact
    * and read paths: recurse into visible directories, restoring any
    * child stranded mid-swap by a crashed two-rename run first (the
    * [[compactPartitioned]] self-heal — a tree migrating to manifests
    * may carry that debris). A manifested leaf's `.gen-*`/`_current`
    * entries are dot/underscore-prefixed, so it walks as a leaf. */
  private def manifestLeaves(fs: HFs, d: HPath): Seq[HPath] = {
    // breadth-first on ONE bounded pool per LEVEL (r18): each frontier
    // directory's walk step is one independent LIST, and the whole
    // level lists in a single parCommitLeaves call from THIS thread —
    // at thousands of shards the walk pays leaves/16 × RTT instead of
    // leaves × RTT. (The r17 form recursed parCommitLeaves from inside
    // pool workers: correct for single-level k=v trees, but a 2–3
    // level tree nested a fresh 16-thread pool per non-leaf child —
    // ~16^depth threads, outer workers blocked on inner pools.)
    def step(dir: HPath): Either[HPath, Seq[HPath]] = {
      ManifestIo.list(fs, dir)
        .filter(st => st.isDirectory && st.getPath.getName.startsWith(".") &&
          st.getPath.getName.endsWith(".compact_old"))
        .foreach { o =>
          val target = new HPath(dir,
            o.getPath.getName.stripPrefix(".").stripSuffix(".compact_old"))
          restoreIfStranded(fs, target)
        }
      val sub = ManifestIo.list(fs, dir)
        .filter(st => st.isDirectory &&
          !st.getPath.getName.startsWith(".") &&
          !st.getPath.getName.startsWith("_"))
      if (sub.isEmpty) Left(dir)
      else Right(sub.toSeq.sortBy(_.getPath.getName).map(_.getPath))
    }
    val leaves = Seq.newBuilder[HPath]
    var frontier: Seq[HPath] = Seq(d)
    while (frontier.nonEmpty) {
      val stepped = parCommitLeaves(frontier)(step)
      leaves ++= stepped.collect { case Left(leaf) => leaf }
      frontier = stepped.collect { case Right(kids) => kids }.flatten
    }
    // depth-first lexical order, as before: every consumer zips or
    // maps over this seq, so keep the ordering deterministic and
    // path-sorted regardless of which level a leaf surfaced at
    leaves.result().sortBy(_.toString)
  }

  /** Read a [[compactManifestedPartitioned]] tree: every leaf resolves
    * through its own `_current` (so a compaction in one leaf is
    * invisible to reads of another, and no leaf is ever absent), with
    * the `k=v` partition values re-attached from the directory names
    * as literal columns — the same VALUES a partition-discovering scan
    * would surface (unescaped with Spark's own path-escaping inverse,
    * so values Spark escaped on write — `%`, `:`, control chars —
    * round-trip, and a literal `+` stays `+`). One CONTRACT
    * difference from a discovering scan, by design: re-attached
    * partition columns are STRING-typed (a discovering scan
    * type-infers `k=7` as int by default) — the stable-schema choice
    * for a reader that unions leaves; cast at the call site when a
    * numeric partition key is wanted. Leaf unions are by name: each
    * leaf carries the same data schema (one writer produced them), and
    * the partition columns are appended uniformly. */
  def readManifestedPartitioned(spark: SparkSession, rootDir: String): DataFrame = {
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    unionLeaves(fs, root, leaf => readManifested(spark, leaf.toString))
  }

  /** [[readManifestedRange]] over a partitioned root: every leaf
    * opens only the files whose recorded min/max admits the
    * predicate, with the `k=v` partition values re-attached as in
    * [[readManifestedPartitioned]] — composing the two pruning axes a
    * 100 TB read needs: a partition predicate on the returned frame
    * prunes whole leaves out of the plan (the PlanSpec-pinned union-
    * branch elimination), and the manifest stats prune files inside
    * every surviving leaf. */
  def readManifestedPartitionedRange(spark: SparkSession, rootDir: String,
                                     column: String, lower: Any,
                                     upper: Any): DataFrame = {
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    unionLeaves(fs, root, leaf =>
      readManifestedRange(spark, leaf.toString, column, lower, upper))
  }

  /** [[readManifestedAt]] over a partitioned root. Resolution rule
    * (r16): `version` is a ROOT version — the `_root-manifest-
    * <version>` map names each leaf's recorded manifest version and
    * every leaf reads exactly there (the leaf SET is the map's: a
    * partition added after the snapshot is correctly absent from it).
    * A root never touched by a root-level op has no maps; it falls
    * back to the legacy lockstep rule — every leaf at the SAME leaf
    * version, failing loudly on the first leaf missing it. A
    * map-managed root asked for a version with no surviving map
    * refuses with the retained root versions — never a silently
    * partial or mis-aligned union. */
  def readManifestedPartitionedAt(spark: SparkSession, rootDir: String,
                                  version: Long): DataFrame = {
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    val rvs = rootVersions(fs, root)
    if (rvs.isEmpty)
      unionLeaves(fs, root, leaf => readManifestedAt(spark, leaf.toString, version))
    else if (!rvs.contains(version))
      throw new IllegalArgumentException(
        s"readManifestedPartitionedAt: root snapshot $version of $rootDir " +
          s"is not retained (available: ${rvs.mkString(", ")})")
    else {
      val map = parseRootMap(ManifestIo.readString(fs,
        new HPath(root, s"_root-manifest-$version")))
      // per-leaf PLAN construction on the bounded pool (r17) — the
      // same O(leaves) sequential driver term unionLeaves shed for
      // live reads applies to the snapshot read's resolution walk
      parCommitLeaves(map.toSeq.sortBy(_._1)) { case (rel, v) =>
        val leaf = new HPath(root, rel)
        leafKvs(root, leaf).foldLeft(readManifestedAt(spark, leaf.toString, v)) {
          case (df, (k, vv)) => df.withColumn(k, lit(vv))
        }
      }.reduceLeft(_.unionByName(_))
    }
  }

  /** The shared partitioned-read shape: per-leaf resolve via `read`,
    * `k=v` partition values re-attached from the directory names (see
    * [[readManifestedPartitioned]] for the unescaping + string-typing
    * contract), leaves unioned by name. Per-leaf PLAN construction
    * (pointer read + file listing + footer schema) runs on the
    * bounded pool (r16): it is metadata IO, independent across
    * leaves, and sequential it is the dominant driver cost of a read
    * over a many-leaf root — leaves/16 × RTT instead of leaves × RTT. */
  private def unionLeaves(fs: HFs, root: HPath,
                          read: HPath => DataFrame): DataFrame = {
    val parts = parCommitLeaves(manifestLeaves(fs, root)) { leaf =>
      leafKvs(root, leaf).foldLeft(read(leaf)) {
        case (df, (k, v)) => df.withColumn(k, lit(v))
      }
    }
    parts.reduceLeft(_.unionByName(_))
  }

  /** The `k=v` partition (column, value) pairs a leaf's root-relative
    * path carries, unescaped with Spark's own path-escaping inverse
    * (the [[readManifestedPartitioned]] contract: values are STRINGs). */
  private def leafKvs(root: HPath, leaf: HPath): Seq[(String, String)] =
    root.toUri.relativize(leaf.toUri).getPath.stripSuffix("/")
      .split('/').toSeq.filter(_.contains('='))
      .map { seg =>
        val Array(k, v) = seg.split("=", 2)
        k -> org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
          .unescapePathName(v)
      }

  /** Run `action` against the current generation with the FULL retry:
    * resolve-time staleness (AnalysisException, already covered inside
    * [[readManifested]]) AND mid-action expiry — a scan that resolved a
    * generation, then lost it to GC when two commits landed back to
    * back, surfaces as a FileNotFoundException (possibly wrapped in a
    * SparkException task failure); re-resolving and re-running the
    * action once lands on the new live generation. One retry is the
    * right budget: a second consecutive loss would mean the reader is
    * persistently two commits behind per attempt — a pathological
    * writer, not a race. */
  def withManifested[T](spark: SparkSession, dir: String)(
      action: DataFrame => T): T =
    retryOnMissingFile(action(readManifested(spark, dir)))

  /** [[withManifested]] over a partitioned root: the action re-resolves
    * EVERY leaf pointer and re-runs once if any leaf's generation
    * expired mid-action (same retry budget, same reasoning — per leaf
    * now, since each leaf commits independently). */
  def withManifestedPartitioned[T](spark: SparkSession, rootDir: String)(
      action: DataFrame => T): T =
    retryOnMissingFile(action(readManifestedPartitioned(spark, rootDir)))

  private def retryOnMissingFile[T](attempt: => T): T = {
    def missingFile(e: Throwable, depth: Int = 0): Boolean =
      e != null && depth < 16 && (e.isInstanceOf[java.io.FileNotFoundException] ||
        (e.getCause ne e) && missingFile(e.getCause, depth + 1))
    try attempt
    catch { case e: Throwable if missingFile(e) => attempt }
  }

  /** MERGE INTO the manifested table — the batch upsert (`WHEN
    * MATCHED UPDATE SET * / WHEN NOT MATCHED INSERT *`, the most-used
    * lakehouse write): every source row REPLACES the target rows
    * carrying its key, or inserts if none exist. ONE atomic commit:
    * the key tombstone (`.del-<v>`) and the source data (`.gen-<v+1>`)
    * are staged invisibly and enter the manifest in a single pointer
    * swap — a reader sees the table before the merge or after it,
    * never the deleted-but-not-yet-inserted middle (which a
    * delete-then-append pair would expose between its two commits).
    * The tombstone's LOWER id suppresses only the pre-merge
    * generations; the new data generation rides above it — the
    * [[scanGens]] ordering doing the MERGE semantics. O(source +
    * delete set) written, never a data rewrite; compaction later
    * materializes and retires, like any tombstone. Returns the
    * committed manifest version.
    *
    * EXACTLY-ONCE for retrying producers (r14 — the Delta
    * `txnAppId`/`txnVersion` idempotent-writes contract): pass
    * `txn = Some((appId, version))` with a version that is
    * MONOTONICALLY INCREASING per application (a foreachBatch
    * producer passes its checkpoint-tracked batchId). The committed
    * manifest then carries a `#txn:<appId>:<version>` marker — part
    * of the snapshot, so every commit path (append, delete,
    * compaction fold) carries it forward — and a replayed call whose
    * version is ≤ the recorded one returns the CURRENT head version
    * as a true NO-OP: no tombstone, no generation, no pointer swap.
    * Without `txn` a replay is still content-idempotent (re-merging
    * produces byte-identical rows) but spends one more version —
    * the pre-r14 contract. Markers are per-app: two producers with
    * different appIds never suppress each other. */
  def upsertManifested(spark: SparkSession, dir: String,
                       source: DataFrame, keyCol: String,
                       txn: Option[(String, Long)] = None): Long = {
    require(source.columns.contains(keyCol),
      s"upsertManifested: source has no column '$keyCol' " +
        s"(columns: ${source.columns.mkString(", ")})")
    require(txn.forall(t => !t._1.contains("\n") && !t._1.contains(":")),
      s"upsertManifested: txn appId must not contain ':' or newline: $txn")
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    withTableLock(root) {
      val pointer = new HPath(root, "_current")
      val head = headBody(fs, root).getOrElse(throw new IllegalArgumentException(
        s"upsertManifested: $dir has no committed table " +
          "(appendManifested creates one)"))
      val gens = parseGens(head)
      val txns = parseTxns(head)
      val expected = manifestVersions(fs, root).lastOption.getOrElse(0L)
      // the exactly-once gate: this (appId, version) already applied —
      // a foreachBatch replay after a crash — so the whole call is a
      // no-op; the caller observes the same post-state it would have
      val alreadyApplied =
        txn.exists { case (app, ver) => txns.get(app).exists(_ >= ver) }
      if (alreadyApplied) expected
      else {
        gens.find(!_.startsWith(".del-")).foreach { g =>
          val cols = spark.read.parquet(new HPath(root, g).toString).columns
          require(cols.contains(keyCol),
            s"upsertManifested: $dir has no column '$keyCol' " +
              s"(columns: ${cols.mkString(", ")})")
        }
        val base = gens.map(entryId).foldLeft(-1L)(math.max) + 1
        val del = s".del-$base"
        val gen = s".gen-${base + 1}"
        source.select(col(keyCol)).distinct().write.mode("overwrite")
          .parquet(new HPath(root, del).toString)
        source.write.mode("overwrite").parquet(new HPath(root, gen).toString)
        commitManifest(fs, root, pointer, gens :+ del :+ gen, expected,
          txn.fold(txns) { case (app, ver) => txns + (app -> ver) },
          statsForGens(parseStats(head), gens) ++
            collectStats(fs, hconf(spark), root, gen))
      }
    }
  }

  /** DESCRIBE HISTORY for a manifested leaf — the Delta `DESCRIBE
    * HISTORY` / Iceberg snapshots-table analogue: one row per RETAINED
    * manifest version (ascending), with the committed entry list, the
    * generation/tombstone split, and whether this version is the
    * current pointer. Table metadata is manifest-sized by design, so
    * this is a driver-side listing materialized as a local DataFrame —
    * the audit/debug companion to [[readManifestedAt]] (its `version`
    * column is exactly what that call accepts). */
  def history(spark: SparkSession, dir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    val cur = headBody(fs, root).map(parseGens).getOrElse(Seq.empty)
    // a concurrent compaction may GC a manifest between the listing
    // and the per-version reads — skip versions that vanish mid-walk
    // (the same FNFE tolerance inTimeWindow/aged use) instead of
    // letting DESCRIBE HISTORY throw on an expired version
    val rows = manifestVersions(fs, root).flatMap { v =>
      val mf = new HPath(root, s"_manifest-$v")
      // commit_ts = the manifest file's mtime: the create-exclusive
      // claim instant locally/HDFS, the PUT instant on an object store
      // — the same clock retainFor and the vacuum grace run on.
      // txns = the exactly-once markers AS OF this version (app:ver,
      // app-sorted) — the debugging surface for "which batch applied".
      try {
        val gens = readPointer(fs, mf)
        Some(org.apache.spark.sql.Row(v,
          gens.mkString(","),
          gens.count(!_.startsWith(".del-")).toLong,
          gens.count(_.startsWith(".del-")).toLong,
          gens == cur,
          new java.sql.Timestamp(fs.getFileStatus(mf).getModificationTime),
          readTxns(fs, mf).toSeq.sortBy(_._1)
            .map { case (a, x) => s"$a:$x" }.mkString(",")))
      } catch { case _: java.io.FileNotFoundException => None }
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "version BIGINT, entries STRING, n_data_gens BIGINT, " +
          "n_tombstones BIGINT, is_current BOOLEAN, commit_ts TIMESTAMP, " +
          "txns STRING"))
  }

  // ---------------------- root-level version map + transition claim
  // (r16 — supersedes the r15 per-batch LOCKSTEP) Every root-level op
  // (partitioned upsert / delete / compaction) commits per-leaf ONLY
  // in the leaves it touches, then publishes ONE immutable root
  // manifest `_root-manifest-<T>` — a VERSION MAP of `<leafRelPath>:
  // <leafHeadVersion>` lines plus `#txn:` markers, claimed by the same
  // create-exclusive CAS as the per-leaf `_manifest-v` trail. The map
  // replaces lockstep numbering as [[readManifestedPartitionedAt]]'s
  // resolution rule: snapshot T reads every leaf at its RECORDED
  // version, so untouched leaves need no commit at all. That breaks
  // the r15 O(total shards) per-batch commit floor (§6.1o: 0.23
  // s/shard/batch even when a batch touched 3 of 64) — per-batch cost
  // is now O(touched shards) + one root commit, which at the
  // thousands of shards a 100 TB keyed state table carries is the
  // difference between micro-batch latency and minutes of pure commit
  // fan-out. Writer serialization is unchanged in spirit: the
  // transition T+1 is claimed via `_root-claim-(T+1)` BEFORE any leaf
  // commit, so racing root ops serialize as one of the serial orders
  // or refuse loudly; the root-manifest putIfAbsent is the commit
  // point (a crash before it leaves the table AT root version T —
  // the op becomes atomic at the root, which per-batch lockstep never
  // was).

  /** The committed root-manifest versions of a partitioned root,
    * ascending — the root-level [[snapshots]] (empty for a legacy /
    * never-root-committed tree, whose snapshots still resolve by the
    * per-leaf lockstep rule). */
  def rootSnapshots(dir: String): Seq[Long] = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())
    val (fs, root) = ManifestIo.resolve(dir, conf)
    rootVersions(fs, root)
  }

  private def rootVersions(fs: HFs, root: HPath): Seq[Long] =
    ManifestIo.list(fs, root)
      .filter(st => st.isFile && st.getPath.getName.startsWith("_root-manifest-"))
      .map(_.getPath.getName.stripPrefix("_root-manifest-").toLong)
      .sorted.toSeq

  /** `<leafRelPath>:<leafVersion>` lines of a root manifest (rel paths
    * are the on-disk escaped form, which never contains a raw ':'). */
  /** Root-relative leaf paths recorded by the LAST root version map —
    * None when the root carries no maps yet. The O(1) committed-leaf
    * inventory a sharded-CDC batch reads instead of probing every
    * leaf's head (the same metadata discipline as the `#file:` file
    * inventory: the log IS the listing). A map GC'd between the
    * version list and the read (a concurrent compaction's retention)
    * degrades to None — the caller's per-leaf probe fallback. */
  private[graft] def lastRootMapRels(fs: HFs, root: HPath): Option[Set[String]] =
    rootVersions(fs, root).lastOption.flatMap { v =>
      try Some(parseRootMap(ManifestIo.readString(fs,
        new HPath(root, s"_root-manifest-$v"))).keySet)
      catch { case _: java.io.FileNotFoundException => None }
    }

  private def parseRootMap(body: String): Map[String, Long] =
    body.trim.split("\n").toSeq.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .map { l =>
        val i = l.lastIndexOf(':')
        l.substring(0, i) -> l.substring(i + 1).toLong
      }.toMap

  private def rootManifestBody(map: Map[String, Long],
                               txns: Map[String, Long]): String =
    (map.toSeq.sortBy(_._1).map { case (l, v) => s"$l:$v" } ++
      txns.toSeq.sortBy(_._1).map { case (a, v) => s"#txn:$a:$v" })
      .mkString("\n")

  /** The state a root-level op carries between its claim and its
    * commit: the transition version to publish, the PRIOR version map
    * (what untouched leaves are recorded at), the root-level txn
    * markers to carry forward, and whether the whole op is a
    * completed replay (commit nothing). */
  private case class RootTransition(next: Long, prior: Map[String, Long],
                                    txns: Map[String, Long],
                                    fullReplay: Boolean) {
    def claimPath(root: HPath): HPath = new HPath(root, s"_root-claim-$next")
  }

  /** Begin a root-level transition: resolve the root head, detect
    * replays, claim `T+1`. Map-managed roots need ONE root-manifest
    * read — no per-leaf listing (the O(touched) contract). A root with
    * no root manifest yet MIGRATES: its leaves must be lockstep (the
    * r15 contract it is leaving), their common head anchors the root
    * version line, and — so pre-migration snapshots stay addressable —
    * an ANCHOR manifest `_root-manifest-T0` recording the walked heads
    * is committed when T0 ≥ 1. Crashed-op recovery:
    *
    *  - our own txn's claim → resume (per-leaf markers no-op the
    *    committed leaves; the root manifest then records actuals).
    *  - a FRESH foreign claim → ConcurrentModificationException before
    *    any leaf commit.
    *  - an AGED foreign claim (older than `takeoverGraceMs`) → TAKE
    *    OVER: delete + re-claim (r16 — a crashed no-txn root op no
    *    longer blocks until a manual vacuum; content safety holds
    *    because the next map records actual leaf heads, and a LIVE op
    *    refreshes its claim's mtime per leaf commit, so only true
    *    corpses age).
    *  - a claim whose transition already committed (we raced a winner
    *    that deleted its claim after publishing) → re-checked after
    *    the claim succeeds: the root head moved past our anchor, so
    *    release and refuse — never leaf-commit under a stale claim. */
  private def beginRootTransition(fs: HFs, root: HPath, leaves: Seq[HPath],
                                  txn: Option[(String, Long)], op: String,
                                  takeoverGraceMs: Long = DefaultVacuumGraceMs,
                                  contentPreserving: Boolean = false): RootTransition = {
    val mine = txn.map { case (a, v) => s"$a:$v" }
    def claim(next: Long): Unit = {
      val c = new HPath(root, s"_root-claim-$next")
      def refuse(owner: String): Nothing =
        throw new java.util.ConcurrentModificationException(
          s"$op: transition to version $next of $root is claimed by " +
            s"'$owner' — a concurrent root-level writer; retry after it " +
            "completes (an aged crashed claim is taken over automatically)")
      if (!ManifestIo.putIfAbsent(fs, c, mine.getOrElse("-"))) {
        val owner =
          try Some(ManifestIo.readString(fs, c))
          catch { case _: java.io.FileNotFoundException => None }
        if (owner.isDefined && mine.isDefined && owner == mine) ()
        else {
          val aged = owner.isEmpty || {
            try fs.getFileStatus(c).getModificationTime <
              System.currentTimeMillis() - takeoverGraceMs
            catch { case _: java.io.FileNotFoundException => true }
          }
          if (!aged) refuse(owner.getOrElse("?"))
          ManifestIo.delete(fs, c)
          if (!ManifestIo.putIfAbsent(fs, c, mine.getOrElse("-")))
            refuse(try ManifestIo.readString(fs, c)
              catch { case _: java.io.FileNotFoundException => "?" })
        }
      }
      // stale-anchor re-check: a winner that already PUBLISHED next
      // deletes its claim, so our create-exclusive can succeed for a
      // transition that is history — verify the head is still behind
      // the claim before any leaf commit
      if (rootVersions(fs, root).lastOption.exists(_ >= next)) {
        ManifestIo.delete(fs, c)
        throw new java.util.ConcurrentModificationException(
          s"$op: transition $next of $root already committed by a " +
            "concurrent writer — re-read and retry")
      }
    }
    rootVersions(fs, root).lastOption match {
      case Some(t) =>
        val body = ManifestIo.readString(fs, new HPath(root, s"_root-manifest-$t"))
        val prior = parseRootMap(body)
        val txns = parseTxns(body)
        val fullReplay =
          txn.exists { case (app, ver) => txns.get(app).exists(_ >= ver) }
        if (!fullReplay) claim(t + 1)
        RootTransition(t + 1, prior, txns, fullReplay)
      case None =>
        // migration from the lockstep scheme: one per-leaf walk (only
        // ever paid once per root)
        val heads = leaves.map(l => l -> headVersion(fs, l))
        val headMap = heads.map { case (l, v) => relPath(root, l) -> v }.toMap
        val vMin = heads.map(_._2).min
        val vMax = heads.map(_._2).max
        val fullReplay = txn.exists { case (app, ver) =>
          leaves.forall(l => headBody(fs, l).exists(b =>
            parseTxns(b).get(app).exists(_ >= ver)))
        }
        if (fullReplay) RootTransition(vMax, headMap, Map.empty, fullReplay = true)
        else if (vMax == vMin) {
          if (vMin >= 1) {
            // the anchor: pre-migration lockstep state, root-addressable
            ManifestIo.putIfAbsent(fs, new HPath(root, s"_root-manifest-$vMin"),
              rootManifestBody(headMap, Map.empty))
            ()
          }
          claim(vMin + 1)
          RootTransition(vMin + 1, headMap, Map.empty, fullReplay = false)
        } else if (vMax == vMin + 1) {
          // a crashed r15-era (or crashed migrating) op: resumable by
          // the owning txn (the pre-map rule), or — r17 — taken over
          // by a CONTENT-PRESERVING no-txn op (compaction) once the
          // crashed claim has aged, the same grace discipline as the
          // map-managed takeover above. The takeover freezes the
          // crashed op's half-applied state into the first root
          // version map (each leaf at its ACTUAL head) — honest for
          // an op that carried no replay identity: nobody can ever
          // resume it, and without the takeover the root refused
          // every non-owning writer forever. A FRESH claim still
          // refuses (a live migrating op), and a txn-carrying op
          // (delete/upsert — they ADD content, a takeover would
          // publish someone else's torn write as theirs) still
          // requires ownership.
          val c = new HPath(root, s"_root-claim-$vMax")
          val owner =
            try Some(ManifestIo.readString(fs, c))
            catch { case _: java.io.FileNotFoundException => None }
          if (mine.isDefined && owner == mine)
            RootTransition(vMax, headMap, Map.empty, fullReplay = false)
          else if (contentPreserving && mine.isEmpty) {
            claim(vMax) // absent/aged → takeover; fresh → refuse (CME)
            RootTransition(vMax, headMap, Map.empty, fullReplay = false)
          } else
            throw new IllegalStateException(
              s"$op: $root is mid-transition to version $vMax (leaves " +
                s"span $vMin..$vMax; claim ${owner.getOrElse("missing")}) — " +
                "only the owning txn may resume it; once the claim ages " +
                "past the takeover grace, compactManifestedPartitioned " +
                "migrates the root to a version map at the leaves' " +
                "actual heads")
        } else if (contentPreserving && mine.isEmpty) {
          // arbitrary legacy drift (leaves bumped by out-of-band
          // per-leaf writers, never a root op): under the version map
          // this state is REPRESENTABLE, not broken — a content-
          // preserving op migrates it by recording each leaf at its
          // ACTUAL head (r17; the same stance the mapped path takes
          // when a leaf-level writer bumps one leaf between root ops).
          // claim() still refuses a FRESH rival and takes over only
          // aged corpses. Txn ops keep refusing below: there is no
          // lockstep history for their replay rule to anchor on.
          claim(vMax)
          RootTransition(vMax, headMap, Map.empty, fullReplay = false)
        } else
          throw new IllegalStateException(
            s"$op: legacy leaves of $root drifted off lockstep (versions " +
              s"$vMin..$vMax) with no root manifest to anchor a migration — " +
              "run compactManifestedPartitioned (content-preserving: it " +
              "migrates the root to a version map at the leaves' actual " +
              "heads), or commit a root manifest by hand")
    }
  }

  /** Run `f` over the leaves a root op touches with a BOUNDED driver-
    * side pool (r16): per-leaf commits are pure filesystem sequences
    * (renames + create-exclusive CAS + pointer swap — no Spark jobs),
    * independent across leaves (separate locks, separate `_current`
    * tmp files), so they parallelize trivially; at object-store
    * latencies this is the difference between `touched × RTT` and
    * `touched/16 × RTT` per batch. Work runs in CHUNKS with the claim
    * heartbeat refreshed between chunks (the refresh rewrites one
    * shared root-level tmp, so it stays on the coordinating thread).
    * Failures propagate with their original exception (CME from a
    * lost CAS included); the chunk boundary bounds how much work can
    * follow a failure. */
  private[graft] def parCommitLeaves[A, B](xs: Seq[A], parallelism: Int = 16,
                                    chunk: Int = 64,
                                    refresh: () => Unit = () => ())(f: A => B): Seq[B] =
    if (xs.size <= 1) xs.map(f)
    else {
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(parallelism, xs.size))
      try {
        xs.grouped(chunk).flatMap { grp =>
          val fs = grp.map(x => pool.submit(
            new java.util.concurrent.Callable[B] { def call(): B = f(x) }))
          val out = fs.map { fu =>
            try fu.get()
            catch {
              case e: java.util.concurrent.ExecutionException =>
                throw e.getCause
            }
          }
          refresh()
          out
        }.toSeq
      } finally pool.shutdown()
    }

  /** Refresh the claim's mtime — the liveness heartbeat a long root
    * op emits per chunk of leaf commits, so the aged-claim takeover
    * and [[vacuumPartitioned]]'s grace only ever fire on true
    * corpses, never on a live walk that outlives the grace (a
    * partitioned op over thousands of shards legitimately does).
    * Deliberately `setTimes`, NOT a rewrite: a delete+rename rewrite
    * has a claim-ABSENT window on hdfs/object-store schemes in which
    * a rival's create-exclusive could steal a LIVE claim. A store
    * that ignores setTimes simply doesn't heartbeat — size
    * `takeoverGraceMs` above the longest expected walk there (the
    * race endpoint stays LOUD either way: two writers at one
    * transition collide on the root-manifest CAS with different
    * content). */
  private def refreshClaim(fs: HFs, st: RootTransition, root: HPath,
                           txn: Option[(String, Long)]): Unit =
    if (!st.fullReplay)
      try { fs.setTimes(st.claimPath(root), System.currentTimeMillis(), -1); () }
      catch { case _: java.io.IOException | _: UnsupportedOperationException => }

  /** Publish the transition: putIfAbsent `_root-manifest-<next>` (the
    * commit point — a reader of [[readManifestedPartitionedAt]] sees
    * the table at T or at T+1, never a half-applied map), then drop
    * the claim. A lost putIfAbsent with IDENTICAL body is our own
    * completed replay (benign); different content under our claim is
    * a broken invariant and refuses loudly. */
  private def commitRootManifest(fs: HFs, root: HPath, st: RootTransition,
                                 map: Map[String, Long],
                                 txn: Option[(String, Long)]): Unit = {
    val txns = txn.fold(st.txns) { case (a, v) => st.txns + (a -> v) }
    val body = rootManifestBody(map, txns)
    val p = new HPath(root, s"_root-manifest-${st.next}")
    if (!ManifestIo.putIfAbsent(fs, p, body) &&
        ManifestIo.readString(fs, p) != body)
      throw new java.util.ConcurrentModificationException(
        s"root manifest ${st.next} of $root was committed with different " +
          "content under this writer's claim — claim discipline violated")
    ManifestIo.delete(fs, st.claimPath(root))
  }

  // ------------------------------- partitioned row-level ops (r14/r16)
  // The row-level commits above are leaf-scoped; a 100 TB table is a
  // PARTITIONED root, and "delete these keys" must not require hand-
  // iterating leaves. Each op below claims its root transition, walks
  // [[manifestLeaves]] committing ONLY where it has work (each leaf's
  // commit the same CAS-guarded atomic pointer swap as its leaf-scoped
  // form), and publishes one root version map. At 100 TB the per-leaf
  // commits are embarrassingly parallel (no two leaves share state —
  // the sequential walk here becomes a foreachPartition over leaf
  // names running the same rename+CAS sequence; they are pure FS ops,
  // no Spark jobs).

  /** [[deleteManifested]] over a partitioned root: ONE tombstone
    * commit per leaf, all carrying the same key set — a key lives in
    * whichever leaf its row was routed to, so the tombstone must reach
    * every leaf (the delete set is O(keys) per leaf, never a data
    * rewrite). The key set is WRITTEN ONCE to a root-local staging dir
    * (one Spark job) and FS-copied into each leaf's `.del-<id>` — per
    * delete the Spark-job count is O(1) and per-leaf cost is pure
    * filesystem ops, the same write-once shape as the partitioned
    * MERGE. The transition publishes one root version map (r16);
    * returns root-relative leaf path → the leaf's committed tombstone
    * id (-1 = replay no-op on that leaf). With `txn` a crashed
    * partitioned delete is RESUMABLE: the replay no-ops the leaves
    * whose marker already records it and tombstones the rest. */
  def deleteManifestedPartitioned(spark: SparkSession, rootDir: String,
                                  keys: DataFrame,
                                  txn: Option[(String, Long)] = None): Map[String, Long] = {
    require(keys.columns.length == 1,
      s"deleteManifestedPartitioned: keys must be exactly the key " +
        s"column, got ${keys.columns.mkString(", ")}")
    require(txn.forall(t => !t._1.contains("\n") && !t._1.contains(":")),
      s"deleteManifestedPartitioned: txn appId must not contain ':' or " +
        s"newline: $txn")
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    require(ManifestIo.isDirectory(fs, root),
      s"deleteManifestedPartitioned: $rootDir is not a directory")
    val leaves = manifestLeaves(fs, root)
    val key = keys.columns.head
    // key probe BEFORE the root claim (r17), once per ROOT (leaves
    // share one schema): a typo'd key column must throw while nothing
    // is claimed — probing after would strand `_root-claim-(T+1)` and
    // block every root op on the table until the takeover grace
    leaves.headOption.foreach { leaf =>
      parseGens(headBody(fs, leaf).getOrElse(throw new IllegalArgumentException(
        s"deleteManifestedPartitioned: $leaf has no committed table")))
        .find(!_.startsWith(".del-")).foreach { g =>
          val cols = spark.read.parquet(new HPath(leaf, g).toString).columns
          require(cols.contains(key),
            s"deleteManifestedPartitioned: $rootDir has no column '$key' " +
              s"(columns: ${cols.mkString(", ")})")
        }
    }
    val st = beginRootTransition(fs, root, leaves, txn,
      "deleteManifestedPartitioned")
    if (st.fullReplay) return leaves.map(l => relPath(root, l) -> -1L).toMap
    // stage the key set once; per-leaf commits copy its files
    val stage = new HPath(root,
      s".delete-stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    keys.distinct().write.mode("overwrite").parquet(stage.toString)
    val parts = ManifestIo.list(fs, stage)
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).toSeq
    val out = parCommitLeaves(leaves,
      refresh = () => refreshClaim(fs, st, root, txn)) { leaf =>
      val rel = relPath(root, leaf)
      val r = withTableLock(leaf) {
        val pointer = new HPath(leaf, "_current")
        val head = headBody(fs, leaf).getOrElse(
          throw new IllegalArgumentException(
            s"deleteManifestedPartitioned: $leaf has no committed table"))
        val gens = parseGens(head)
        val txns = parseTxns(head)
        val expected = manifestVersions(fs, leaf).lastOption.getOrElse(0L)
        val alreadyApplied =
          txn.exists { case (app, ver) => txns.get(app).exists(_ >= ver) }
        if (alreadyApplied) (-1L, expected)
        else {
          val nextId = gens.map(entryId).foldLeft(-1L)(math.max) + 1
          val del = new HPath(leaf, s".del-$nextId")
          if (ManifestIo.exists(fs, del)) ManifestIo.delete(fs, del)
          fs.mkdirs(del)
          parts.foreach(p => org.apache.hadoop.fs.FileUtil.copy(fs, p, fs,
            new HPath(del, p.getName), false, hconf(spark)))
          val v = commitManifest(fs, leaf, pointer, gens :+ s".del-$nextId",
            expected,
            txn.fold(txns) { case (app, ver) => txns + (app -> ver) },
            statsForGens(parseStats(head), gens))
          (nextId, v)
        }
      }
      rel -> r
    }
    commitRootManifest(fs, root, st,
      out.map { case (r, (_, v)) => r -> v }.toMap, txn)
    ManifestIo.delete(fs, stage)
    out.map { case (r, (id, _)) => r -> id }.toMap
  }

  /** [[upsertManifested]] over a partitioned root — MERGE INTO the
    * partitioned table: `source` carries the partition column(s) (the
    * `k=v` names of the leaf directories) plus the leaf schema; rows
    * route to their leaf by partition value (string-compared — the
    * [[readManifestedPartitioned]] typing contract) and each TOUCHED
    * leaf gets one atomic tombstone+generation commit for its slice.
    * Untouched leaves commit NOTHING (r16): the published root
    * version map records them at their prior head, which is what
    * keeps [[readManifestedPartitionedAt]] resolvable at every root
    * version while per-batch commit cost stays O(touched shards) —
    * the r15 lockstep scheme paid an empty tombstone+generation pair
    * in every untouched leaf, the measured O(total shards) floor.
    *
    * A source partition value with NO existing leaf CREATES it (r17 —
    * partition adoption, what a real MERGE does when a new `lang=`
    * value arrives in a CDC feed): the missing leaves are
    * bootstrapped from one schema-bearing empty template (one Spark
    * job total, then pure-FS copy + v1 commit per leaf on the bounded
    * pool) UNDER THE SAME ROOT CLAIM as the data commits, so creation
    * and first data land in ONE root version — a reader at T-1 never
    * sees the partition, a reader at T sees it with its rows. Two
    * concurrent writers introducing the same new partition serialize
    * at the root claim; the loser's retry finds the leaf committed
    * and its creation no-ops on the v1 CAS. A missing key/partition
    * column refuses loudly BEFORE the claim. One documented
    * non-contract: a key whose PARTITION VALUE changed is an insert
    * into the new leaf only — the old leaf's copy survives, because
    * the tombstone for a slice carries only that slice's keys (the
    * identity-partitioning contract of every partitioned table format;
    * migrate keys with [[deleteManifestedPartitioned]] + upsert).
    * Returns root-relative leaf path → the leaf's committed version.
    *
    * With `txn` (the [[upsertManifested]] exactly-once contract,
    * applied per leaf) a partitioned merge is also RESUMABLE: a crash
    * after some leaves committed leaves the root claim held and no
    * root manifest published, and the replay no-ops exactly the
    * leaves that already carry the marker while applying the rest —
    * then publishes the map once, never double-applying a leaf. */
  def upsertManifestedPartitioned(spark: SparkSession, rootDir: String,
                                  source: DataFrame, keyCol: String,
                                  txn: Option[(String, Long)] = None): Map[String, Long] = {
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    require(ManifestIo.isDirectory(fs, root),
      s"upsertManifestedPartitioned: $rootDir is not a directory")
    val leaves = manifestLeaves(fs, root).map(l => l -> leafKvs(root, l))
    val colSets = leaves.map(_._2.map(_._1)).distinct
    require(colSets.size == 1,
      s"upsertManifestedPartitioned: leaves disagree on partition " +
        s"columns: $colSets")
    val pcols = colSets.head
    require(pcols.nonEmpty,
      s"upsertManifestedPartitioned: $rootDir has no k=v leaves — " +
        "it is a plain leaf; use upsertManifested")
    (pcols :+ keyCol).foreach(c => require(source.columns.contains(c),
      s"upsertManifestedPartitioned: source has no column '$c' " +
        s"(columns: ${source.columns.mkString(", ")})"))
    // key probe BEFORE the root claim (r17), once per ROOT (leaves
    // share one schema — the uniform-writer contract): a typo'd key
    // column must throw while nothing is claimed — probing after
    // would strand `_root-claim-(T+1)` and block every root op on
    // the table until the takeover grace passes
    leaves.headOption.foreach { case (leaf, _) =>
      parseGens(headBody(fs, leaf).getOrElse(""))
        .find(!_.startsWith(".del-")).foreach { g =>
          val cols = spark.read.parquet(new HPath(leaf, g).toString).columns
          require(cols.contains(keyCol),
            s"upsertManifestedPartitioned: $rootDir has no column " +
              s"'$keyCol' (columns: ${cols.mkString(", ")})")
        }
    }
    // one materialization of the source; every leaf's two writes
    // (tombstone keys + data) filter the cut, not the original plan
    val cut = eagerCut(source)
    // routing: the distinct partition combos are touched-leaf-bounded
    // (the same cardinality as the walk itself), so this collect is
    // as bounded as listing the directories was. A NULL or EMPTY
    // partition value maps to the Hive default-partition sentinel
    // (r18) — the SAME name the staging `partitionBy` writes such
    // rows under — so the adoption probe, leaf routing and the staged
    // tree agree on one directory instead of the probe NPE-ing on
    // escapePathName(null) while the stage files the row elsewhere.
    val defaultPart = org.apache.spark.sql.catalyst.catalog
      .ExternalCatalogUtils.DEFAULT_PARTITION_NAME
    val combos = cut.select(pcols.map(c => col(c).cast("string")): _*)
      .distinct().collect()
      .map(r => pcols.indices.map { i =>
        val v = r.getString(i)
        if (v == null || v.isEmpty) defaultPart else v
      }.toSeq).toSeq
      .distinct // null and '' fold to ONE sentinel combo, not two
    def leafFor(combo: Seq[String]): HPath =
      pcols.zip(combo).foldLeft(root) { case (acc, (k, v)) =>
        val dir = if (v == defaultPart) v
          else org.apache.spark.sql.catalyst.catalog
            .ExternalCatalogUtils.escapePathName(v)
        new HPath(acc, s"$k=$dir")
      }
    // adoption probe: a combo needs creation when its leaf holds NO
    // COMMITTED HEAD — head-probed, not directory-probed, because a
    // crashed prior adoption leaves the directory without a commit
    // and re-creating it must converge (the CDC-bootstrap predicate).
    // O(touched) pointer reads, on the pool.
    val toCreate = parCommitLeaves(combos) { c =>
      c -> hasCommittedHead(fs, leafFor(c))
    }.collect { case (c, committed) if !committed => c }
    val st = beginRootTransition(fs, root, leaves.map(_._1), txn,
      "upsertManifestedPartitioned")
    if (st.fullReplay)
      return leaves.map { case (leaf, _) =>
        val rel = relPath(root, leaf)
        rel -> st.prior.getOrElse(rel, headVersion(fs, leaf))
      }.toMap
    // PARTITION ADOPTION (r17): create the missing leaves under THIS
    // claim — one schema-bearing empty template (the leaf schema =
    // source minus partition columns; limit(0).repartition(1) writes
    // exactly one empty part file carrying it), then per missing leaf
    // a pure-FS copy + a v1 commit CAS-ANCHORED AT 0, re-probing the
    // head first: any interim commit (our crashed prior attempt) owns
    // `_manifest-1` and the creation no-ops instead of resetting the
    // leaf. Creation and the slice's data commit land in ONE root
    // version below.
    val adopted: Seq[(HPath, Seq[(String, String)])] =
      if (toCreate.isEmpty) Seq.empty
      else {
        val tmpl = new HPath(root,
          s".adopt-template-${ProcessHandle.current().pid()}-${System.nanoTime()}")
        cut.limit(0).drop(pcols: _*).repartition(1).write
          .mode("overwrite").parquet(tmpl.toString)
        val part = ManifestIo.list(fs, tmpl)
          .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
          .head.getPath
        val created = parCommitLeaves(toCreate,
          refresh = () => refreshClaim(fs, st, root, txn)) { combo =>
          val leaf = leafFor(combo)
          if (!hasCommittedHead(fs, leaf)) {
            val gen0 = new HPath(leaf, ".gen-0")
            fs.mkdirs(gen0)
            // ADOPT, never reset (r18): a headless leaf is not always
            // empty — loose parquet files are a partitioned write
            // awaiting first contact (the [[appendManifested]]/
            // [[compactManifested]] adoption contract), and a
            // non-empty `.gen-0` is a crashed prior adoption's
            // half-moved state. Both become generation 0: loose files
            // rename INTO `.gen-0` (idempotent — a replay moves the
            // remainder and converges), existing `.gen-0` contents are
            // KEPT; only a leaf with no data at all gets the empty
            // schema template. (r17 deleted `.gen-0` and committed the
            // template unconditionally — silent data loss on exactly
            // the crashed-adoption state the head probe exists to
            // converge.)
            ManifestIo.list(fs, leaf)
              .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
              .foreach(s => ManifestIo.rename(fs, s.getPath,
                new HPath(gen0, s.getPath.getName)))
            val hasData = ManifestIo.list(fs, gen0)
              .exists(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
            if (!hasData)
              org.apache.hadoop.fs.FileUtil.copy(fs, part, fs,
                new HPath(gen0, part.getName), false, hconf(spark))
            try { commitManifest(fs, leaf, new HPath(leaf, "_current"),
              Seq(".gen-0"), 0L,
              stats = collectStats(fs, hconf(spark), leaf, ".gen-0")); () }
            catch { case _: java.util.ConcurrentModificationException => () }
          }
          leaf -> pcols.zip(combo)
        }
        ManifestIo.delete(fs, tmpl)
        created
      }
    // the commit walk covers walked + adopted leaves exactly once (a
    // half-created directory appears in both — the adopted entry wins)
    val allLeaves = {
      val createdPaths = adopted.map(_._1.toString).toSet
      leaves.filterNot { case (l, _) => createdPaths.contains(l.toString) } ++
        adopted
    }
    // STAGE ONCE, MOVE PER TOUCHED LEAF (r15/r16): two partitionBy
    // jobs write every NON-EMPTY slice's data and tombstone key set
    // under a root-local dot-prefixed staging dir (invisible to
    // discovery and the leaf walk). Each touched leaf's commit is two
    // renames + one CAS'd pointer swap; an UNTOUCHED leaf commits
    // NOTHING — the root version map records it at its prior head
    // (r16; the r15 lockstep scheme committed an empty tombstone +
    // generation pair to every one of them, the measured O(total
    // shards) per-batch floor of §6.1o). Per-merge Spark jobs are
    // O(1) and per-batch commit cost O(touched shards) + one root
    // manifest. A crash mid-walk strands only the staging dir (aged
    // `.upsert-stage-*` is vacuumPartitioned food) and partially-
    // committed leaves that the txn replay converges.
    val stage = new HPath(root,
      s".upsert-stage-${ProcessHandle.current().pid()}-${System.nanoTime()}")
    val dataStage = new HPath(stage, "data")
    val keyStage = new HPath(stage, "keys")
    cut.write.partitionBy(pcols: _*).mode("overwrite")
      .parquet(dataStage.toString)
    cut.select((pcols :+ keyCol).map(c => col(c)): _*).distinct()
      .write.partitionBy(pcols: _*).mode("overwrite")
      .parquet(keyStage.toString)
    def staged(stageRoot: HPath, kvs: Seq[(String, String)]): HPath =
      kvs.foldLeft(stageRoot) { case (acc, (k, v)) =>
        new HPath(acc, s"$k=${org.apache.spark.sql.catalyst.catalog
          .ExternalCatalogUtils.escapePathName(v)}")
      }
    // the TOUCHED slice set from ONE staging walk (r17): per-leaf
    // existence stats against the stage were the last O(all leaves)
    // FS term per merge batch — the staged tree holds exactly the
    // non-empty slices, and its dir names carry the same partitionBy
    // escaping as the leaf walk, so the rel paths compare directly
    val touched: Set[String] =
      manifestLeaves(fs, dataStage).filter(_ != dataStage)
        .map(l => relPath(dataStage, l)).toSet
    val out = parCommitLeaves(allLeaves,
      refresh = () => refreshClaim(fs, st, root, txn)) { case (leaf, kvs) =>
      val rel = relPath(root, leaf)
      if (!touched.contains(rel))
        rel -> st.prior.getOrElse(rel, headVersion(fs, leaf))
      else
        rel -> upsertManifestedStagedMove(spark, fs, leaf,
          staged(keyStage, kvs), staged(dataStage, kvs), keyCol, txn)
    }.toMap
    commitRootManifest(fs, root, st, out, txn)
    ManifestIo.delete(fs, stage)
    out
  }

  /** [[upsertManifested]] from PRE-STAGED directories — the
    * write-once path under [[upsertManifestedPartitioned]]: the
    * staged tombstone-key and data-slice dirs are MOVED into the leaf
    * as `.del-v` / `.gen-(v+1)` (two renames, zero Spark jobs) and
    * committed atomically under the same txn gate, key probe, stats
    * collection and carry as the rewrite form. Orphan dirs under the
    * same target names (a crashed prior attempt — `base` is
    * head-derived, so a replay recomputes the same ids) are cleared
    * before the move, never silently merged into. */
  private def upsertManifestedStagedMove(spark: SparkSession, fs: HFs,
      leaf: HPath, stagedDel: HPath, stagedGen: HPath, keyCol: String,
      txn: Option[(String, Long)]): Long =
    withTableLock(leaf) {
      val pointer = new HPath(leaf, "_current")
      val head = headBody(fs, leaf).getOrElse(
        throw new IllegalArgumentException(
          s"upsertManifestedPartitioned: $leaf has no committed table"))
      val gens = parseGens(head)
      val txns = parseTxns(head)
      val expected = manifestVersions(fs, leaf).lastOption.getOrElse(0L)
      val alreadyApplied =
        txn.exists { case (app, ver) => txns.get(app).exists(_ >= ver) }
      if (alreadyApplied) expected
      else {
        // key-column presence is probed ONCE per root (the leaves of
        // one partitioned table share a writer and a schema) — a
        // per-leaf footer probe would re-plan a scan per leaf per
        // batch, O(leaves) driver work for one fact
        val base = gens.map(entryId).foldLeft(-1L)(math.max) + 1
        val del = s".del-$base"
        val gen = s".gen-${base + 1}"
        Seq(del, gen).foreach { d =>
          val p = new HPath(leaf, d)
          if (ManifestIo.exists(fs, p)) ManifestIo.delete(fs, p)
        }
        ManifestIo.rename(fs, stagedDel, new HPath(leaf, del))
        ManifestIo.rename(fs, stagedGen, new HPath(leaf, gen))
        commitManifest(fs, leaf, pointer, gens :+ del :+ gen, expected,
          txn.fold(txns) { case (app, ver) => txns + (app -> ver) },
          statsForGens(parseStats(head), gens) ++
            collectStats(fs, hconf(spark), leaf, gen))
      }
    }

  /** DESCRIBE HISTORY of the ROOT version-map line (r16): one row per
    * retained `_root-manifest-<T>` — the map entries, how many leaves
    * the transition actually touched (vs the prior map), the commit
    * instant, and the root-level txn markers. The audit companion to
    * [[readManifestedPartitionedAt]]: its `version` column is exactly
    * what that call accepts; `n_touched` is the O(touched) contract
    * made visible per commit. Root metadata is map-sized by design —
    * a driver-side listing, like [[history]]. */
  def rootHistory(spark: SparkSession, rootDir: String): DataFrame = {
    import scala.jdk.CollectionConverters._
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    val versions = rootVersions(fs, root)
    val bodies = versions.flatMap { v =>
      val p = new HPath(root, s"_root-manifest-$v")
      try Some((v, ManifestIo.readString(fs, p),
        fs.getFileStatus(p).getModificationTime))
      catch { case _: java.io.FileNotFoundException => None }
    }
    val rows = bodies.zipWithIndex.map { case ((v, body, mtime), i) =>
      val map = parseRootMap(body)
      val prior = if (i == 0) Map.empty[String, Long]
        else parseRootMap(bodies(i - 1)._2)
      val touched = map.count { case (l, x) => !prior.get(l).contains(x) }
      org.apache.spark.sql.Row(v,
        map.toSeq.sortBy(_._1).map { case (l, x) => s"$l:$x" }.mkString(","),
        map.size.toLong, touched.toLong,
        new java.sql.Timestamp(mtime),
        parseTxns(body).toSeq.sortBy(_._1)
          .map { case (a, x) => s"$a:$x" }.mkString(","))
    }
    spark.createDataFrame(rows.asJava,
      org.apache.spark.sql.types.StructType.fromDDL(
        "version BIGINT, leaf_versions STRING, n_leaves BIGINT, " +
          "n_touched BIGINT, commit_ts TIMESTAMP, txns STRING"))
  }

  /** [[history]] over a partitioned root: the per-leaf DESCRIBE
    * HISTORY rows with the root-relative leaf path prepended — the
    * audit view of O(touched) commits (a leaf untouched by recent
    * root ops shows a shorter trail; the root version maps record
    * where each snapshot reads it). */
  def historyPartitioned(spark: SparkSession, rootDir: String): DataFrame = {
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    require(ManifestIo.isDirectory(fs, root),
      s"historyPartitioned: $rootDir is not a directory")
    parCommitLeaves(manifestLeaves(fs, root)) { leaf =>
      history(spark, leaf.toString)
        .select(lit(relPath(root, leaf)).as("leaf"), col("*"))
    }.reduceLeft(_.unionByName(_))
  }

  /** What [[vacuum]] removed from a manifested leaf. */
  case class VacuumReport(removedGenerations: Seq[String],
                          removedManifests: Seq[Long],
                          removedPointerTmp: Boolean)

  /** GC the debris an ABORTED commit strands in a manifested leaf —
    * the maintenance op (Delta VACUUM / Iceberg remove-orphan-files)
    * that the retention GC inside [[compactManifested]] cannot cover,
    * because that GC only walks REFERENCED generations. Three debris
    * classes, each from a specific crash window:
    *
    *  - '''orphan generation directories''' — a crash after the
    *    generation's data write but before its manifest commit
    *    (append or compaction fold), or a compaction whose CAS lost;
    *    referenced by no retained manifest and not by `_current`.
    *  - '''uncommitted manifest trailers''' — a crash between the
    *    `_manifest-v` claim and the `_current` swap: versions ABOVE
    *    the committed head (the highest version whose content equals
    *    `_current`'s). Removing them keeps [[readManifestedAt]]'s
    *    contract honest — only snapshots a reader could ever have
    *    resolved remain in the trail.
    *  - '''pointer tmp''' — `._current.tmp` from a crash inside the
    *    swap itself.
    *
    * The RETENTION window is honored by construction: liveness is
    * anchored on the surviving `_manifest-*` trail ∪ `_current`, so
    * every generation any retained snapshot references stays readable
    * via [[readManifestedAt]] afterwards. Conservative by design: a
    * pointer matching NO manifest (a legacy or hand-edited leaf)
    * anchors every manifest as live and vacuums only truly
    * unreferenced generations; a leaf with no `_current` at all is
    * left untouched (nothing committed to anchor liveness — e.g. a
    * crash mid-adoption, which the next append self-heals). Runs
    * under the per-table lock; at 100 TB this is the same listing +
    * bounded-delete pass per leaf, embarrassingly parallel across
    * leaves.
    *
    * CROSS-PROCESS writers (r14): crash debris and a live foreign
    * writer mid-commit are indistinguishable by layout alone — every
    * append/compaction has a window where its generation is written
    * (or its `_manifest-v` trailer claimed) but the pointer not yet
    * swapped, and vacuuming that writer's files would break its
    * in-flight commit. The AGE GRACE closes it, the Delta VACUUM /
    * Iceberg remove-orphan-files convention: only debris whose
    * modification time is older than `graceMs` (default 1 h) is
    * deleted — a live writer's files are by construction younger than
    * its commit window, while true crash debris only ages. Pass
    * `graceMs = 0` only when no concurrent cross-process writer can
    * exist (single-writer maintenance windows, tests). The in-process
    * lock already serializes same-JVM writers regardless. The grace
    * compares this host's wall clock against storage mtimes — pad it
    * by the deployment's worst-case clock skew (the Delta VACUUM
    * clock caveat; see the retention note in [[compactManifested]]). */
  val DefaultVacuumGraceMs: Long = 60L * 60 * 1000

  /** [[vacuum]] over a partitioned root: the [[manifestLeaves]] walk,
    * one vacuum per leaf (each under its own table lock — leaves are
    * independent, exactly like their commits). Returns root-relative
    * leaf path → report, reporting only leaves where anything was
    * removed. Also GCs the `_root-claim-*` transition files of
    * [[beginRootTransition]]: claims at/below the committed ROOT head
    * (or, on a legacy root with no root manifests, the min leaf head)
    * are completed transitions — safe immediately — and AGED claims
    * above it are crashed root ops (the same age-grace argument as
    * leaf debris; live walks refresh their claim's mtime per leaf
    * commit, so a long op never ages into this). Reported under the
    * `"."` key with the claim versions in `removedManifests`. */
  def vacuumPartitioned(spark: SparkSession, rootDir: String,
                        graceMs: Long = DefaultVacuumGraceMs): Map[String, VacuumReport] = {
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    require(ManifestIo.isDirectory(fs, root),
      s"vacuumPartitioned: $rootDir is not a directory")
    val leaves = manifestLeaves(fs, root)
    // per-leaf vacuums are pure FS passes under independent locks —
    // pooled like every other per-leaf walk (r17)
    val leafReports = parCommitLeaves(leaves) { leaf =>
      relPath(root, leaf) -> vacuum(spark, leaf.toString, graceMs)
    }.filter { case (_, r) =>
      r.removedGenerations.nonEmpty || r.removedManifests.nonEmpty ||
        r.removedPointerTmp
    }.toMap
    val completedHead = rootVersions(fs, root).lastOption.getOrElse {
      val heads = leaves.map(l => manifestVersions(fs, l).lastOption.getOrElse(0L))
      if (heads.isEmpty) 0L else heads.min
    }
    val cutoff = System.currentTimeMillis() - graceMs
    val claims = ManifestIo.list(fs, root)
      .filter(st => st.isFile && st.getPath.getName.startsWith("_root-claim-"))
      .filter { st =>
        val v = st.getPath.getName.stripPrefix("_root-claim-").toLong
        v <= completedHead || st.getModificationTime < cutoff
      }.map(_.getPath).toSeq
    claims.foreach(p => ManifestIo.delete(fs, p))
    // staging debris of a crashed partitioned MERGE/DELETE/adoption
    // (the dirs a completed op deletes itself) — aged only, the same
    // grace
    ManifestIo.list(fs, root)
      .filter(st => st.isDirectory &&
        (st.getPath.getName.startsWith(".upsert-stage-") ||
          st.getPath.getName.startsWith(".delete-stage-") ||
          st.getPath.getName.startsWith(".adopt-template-") ||
          st.getPath.getName == ".bootstrap-template") &&
        st.getModificationTime < cutoff)
      .foreach(st => ManifestIo.delete(fs, st.getPath))
    if (claims.isEmpty) leafReports
    else leafReports + ("." -> VacuumReport(Nil,
      claims.map(_.getName.stripPrefix("_root-claim-").toLong).sorted, false))
  }

  def vacuum(spark: SparkSession, dir: String,
             graceMs: Long = DefaultVacuumGraceMs): VacuumReport = {
    require(graceMs >= 0, s"graceMs must be >= 0, got $graceMs")
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    withTableLock(root) {
      headBody(fs, root) match {
      case None => VacuumReport(Nil, Nil, false)
      case Some(liveHead) =>
        // the grace clock: anything modified at/after this instant may
        // be a live cross-process writer's in-flight commit — skip it
        val cutoff = System.currentTimeMillis() - graceMs
        def aged(p: HPath): Boolean =
          try fs.getFileStatus(p).getModificationTime < cutoff
          catch { case _: java.io.FileNotFoundException => false }
        val cur = parseGens(liveHead)
        val curBody = cur.mkString("\n")
        val versions = manifestVersions(fs, root)
        val bodies = versions
          .map(v => v -> readPointer(fs, new HPath(root, s"_manifest-$v")))
          .toMap
        val head = versions.filter(v => bodies(v).mkString("\n") == curBody)
          .lastOption
        val crashed = head.map(h => versions.filter(_ > h)).getOrElse(Seq.empty)
          .filter(v => aged(new HPath(root, s"_manifest-$v")))
        // liveness anchors on every NON-vacuumed manifest: a young
        // trailer (possibly a live writer about to swap the pointer)
        // keeps both itself and the generations it references safe
        val referenced: Set[String] =
          (versions.filterNot(crashed.contains).flatMap(bodies) ++ cur).toSet
        val orphans = ManifestIo.list(fs, root)
          .filter(st => st.isDirectory &&
            (st.getPath.getName.startsWith(".gen-") ||
              st.getPath.getName.startsWith(".del-")) &&
            !referenced.contains(st.getPath.getName) &&
            st.getModificationTime < cutoff)
          .map(_.getPath).toSeq
        orphans.foreach(p => ManifestIo.delete(fs, p))
        crashed.foreach(v =>
          ManifestIo.delete(fs, new HPath(root, s"_manifest-$v")))
        val tmp = new HPath(root, "._current.tmp")
        val hadTmp = ManifestIo.exists(fs, tmp) && aged(tmp)
        if (hadTmp) ManifestIo.delete(fs, tmp)
        VacuumReport(orphans.map(_.getName).sorted, crashed, hadTmp)
      }
    }
  }

  /** The ONE interchange-roundtrip kernel behind q53/q69/q71: the same
    * lineitem slice through a format's write→read cycle, then the same
    * decimal-exact aggregate — so the three format pins can never
    * desynchronize (they share this slice, this aggregate, and ONE
    * oracle text). Per-(process, dataset) output path + overwrite:
    * repeated runs within one JVM rewrite one slice instead of leaking
    * temp dirs; the pid keeps concurrent graft JVMs off each other's
    * slice; the sf suffix keeps a second scale factor in the SAME JVM
    * from clobbering files under a not-yet-collected first DataFrame. */
  private def formatRoundtrip(s: SparkSession, d: String, fmt: String,
      write: (DataFrame, String) => Unit,
      read: (org.apache.spark.sql.types.StructType, String) => DataFrame): DataFrame = {
    val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
      s"graft_${fmt}_slice_${ProcessHandle.current().pid()}_" +
        java.nio.file.Paths.get(d).getFileName).toString
    val slice = t(s, d, "lineitem")
      .filter(col("l_quantity") >= 25)
      .select(col("l_orderkey"), col("l_linestatus"), col("l_quantity"),
        col("l_extendedprice"), col("l_shipdate"))
    write(slice, out)
    read(slice.schema, out)
      .groupBy(col("l_linestatus"))
      .agg(count(lit(1)).as("n_items"),
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_price"),
        max(col("l_shipdate")).as("last_ship"))
      .orderBy(col("l_linestatus"))
  }

  /** The roundtrip oracle — aggregates the q53/q69/q71 slice straight
    * from parquet, so any format lossiness breaks the hash; shared by
    * all three so the contract is literally one text. */
  private val RoundtripOracleSql =
    """SELECT l_linestatus, count(*) AS n_items,
       CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price,
       max(l_shipdate) AS last_ship
       FROM lineitem WHERE l_quantity >= 25
       GROUP BY l_linestatus ORDER BY l_linestatus"""

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_scd2_intervals" -> ((s, d) =>
      scd2Intervals(t(s, d, "events"))
        .orderBy(col("user_id"), col("valid_from_us"), col("event_id"))
        .drop("event_id")),
    // Bloom-prefiltered exact semi join: urgent orders' keys → bloom →
    // lineitem map-side prefilter → exact semi join → aggregate.
    "q51_bloom_semi_join" -> ((s, d) => {
      val urgent = t(s, d, "orders")
        .filter(col("o_orderpriority") === "1-URGENT")
      bloomSemiJoin(t(s, d, "lineitem"), "l_orderkey", urgent, "o_orderkey")
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_items"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy(col("l_returnflag"))
    }),
    // MERGE of order-derived stats into a stale customer snapshot
    // (snapshot deliberately missing custkey % 5 == 0 → real inserts).
    // new_bal = one double add of two exactly-summed operands —
    // bit-identical cross-engine (see package scaladoc).
    "q52_merge_upsert" -> ((s, d) => {
      val snapshot = t(s, d, "customer")
        .filter(col("c_custkey") % 5 =!= 0)
        .select(col("c_custkey").as("custkey"), col("c_name"), col("c_acctbal"))
      val changes = t(s, d, "orders")
        .groupBy(col("o_custkey").as("custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("total_spend"))
      mergeUpsert(snapshot, changes, "custkey")
        .select(col("custkey"),
          coalesce(col("c_name"), lit("(new)")).as("name"),
          coalesce(col("c_acctbal"), lit(0.0)).as("old_bal"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"),
          coalesce(col("total_spend"), lit(0.0)).as("total_spend"),
          (coalesce(col("c_acctbal"), lit(0.0)) +
            coalesce(col("total_spend"), lit(0.0))).as("new_bal"),
          col("action"))
        .orderBy(col("custkey"))
    }),
    // ORC interchange: filtered+projected lineitem slice → ORC on disk
    // → read back → aggregate. Oracle aggregates the same slice straight
    // from parquet, so any roundtrip lossiness (types, ms timestamps,
    // nulls) breaks the hash match.
    "q53_orc_roundtrip" -> ((s, d) =>
      formatRoundtrip(s, d, "orc",
        (df, out) => df.write.mode("overwrite").orc(out),
        (_, out) => s.read.orc(out))),
    // incremental materialized-view maintenance: a standing aggregate
    // updated from a delta batch by MERGING PARTIALS (counts add,
    // exact-decimal sums add — both order-independent), never
    // re-scanning the base. The oracle is the full recompute over the
    // whole table, so a PASS proves incremental ≡ full — the contract
    // that makes nightly-snapshot + streaming-delta rollups sound. At
    // 100 TB the base partials are the stored MV (group-count rows);
    // only the delta is scanned per refresh
    "q70_incremental_agg" -> ((s, d) => {
      val orders = t(s, d, "orders")
      def partials(df: DataFrame) = df
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 4))).as("sp"))
      val snapshot = partials(orders.filter(col("o_orderkey") % 10 =!= 0))
      val delta = partials(orders.filter(col("o_orderkey") % 10 === 0))
      snapshot.unionByName(delta)
        .groupBy(col("o_orderstatus"))
        .agg(sum(col("n")).as("n_orders"),
          sum(col("sp")).cast("double").as("sum_price"))
        .orderBy(col("o_orderstatus"))
    }),
    // the text-format twin of q53: CSV is the messy interchange format
    // a lake ingests at the edge. Java's Double.toString is shortest-
    // round-trip, so doubles survive the text roundtrip bit-exactly and
    // the decimal-cast aggregate stays oracle-identical; the read-back
    // uses the writer's own schema (no inference — a schema drift there
    // is a silent-corruption source at scale)
    "q69_csv_roundtrip" -> ((s, d) =>
      formatRoundtrip(s, d, "csv",
        (df, out) => df.write.mode("overwrite").option("header", "true").csv(out),
        (schema, out) => s.read.schema(schema).option("header", "true").csv(out))),
    // JSON-lines interchange, the third format twin (q53 ORC, q69 CSV):
    // the at-the-edge ingestion format for event feeds. Jackson writes
    // doubles shortest-roundtrip and dates as ISO strings; the explicit
    // read-back schema is doubly load-bearing here, since JSON inference
    // would silently widen fields to string
    "q71_json_roundtrip" -> ((s, d) =>
      formatRoundtrip(s, d, "json",
        (df, out) => df.write.mode("overwrite").json(out),
        (schema, out) => s.read.schema(schema).json(out))),
    // Z-order layout key: morton-interleave two filter dimensions into
    // one clustering key (native codegen'd expression — see
    // functions/InterleaveBits.scala). `tile` = the 10-bit-coarse z
    // prefix, i.e. the file group a range-partitioned Z-ordered write
    // would put the row in: a predicate on EITHER dimension selects a
    // bounded set of tiles, which is the multi-dim pruning story a
    // single-column partition layout (SinkSpec) cannot give.
    "q58_zorder_key" -> ((s, d) =>
      t(s, d, "orders").select(col("o_orderkey"),
        (col("o_custkey") % 256).as("x"),
        (col("o_orderkey") % 256).as("y"))
        .withColumn("zkey",
          graft.functions.InterleaveBits.interleave_bits(col("x"), col("y")))
        .withColumn("tile", shiftright(col("zkey"), 10).cast("long"))
        .orderBy(col("zkey"), col("o_orderkey")))
  )

  def oracleSql: Map[String, String] = Map(
    "q58_zorder_key" -> {
      val z = graft.functions.InterleaveBits.mortonSql("x", "y", 8)
      s"""WITH xy AS (
           SELECT o_orderkey, o_custkey % 256 AS x, o_orderkey % 256 AS y
           FROM orders)
         SELECT o_orderkey, x, y, CAST($z AS BIGINT) AS zkey,
           CAST($z >> 10 AS BIGINT) AS tile
         FROM xy ORDER BY zkey, o_orderkey"""
    },
    "q54_scd2_intervals" ->
      """WITH ev AS (
           SELECT user_id, (epoch_ns(ts) // 1000) AS ts_us, event_id, event_type
           FROM events),
         marked AS (
           SELECT *, lag(event_type, 1) OVER (
             PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
           FROM ev),
         changes AS (
           SELECT user_id, ts_us, event_id, event_type FROM marked
           WHERE prev IS NULL OR prev <> event_type)
         SELECT user_id, event_type, ts_us AS valid_from_us,
           lead(ts_us, 1) OVER w AS valid_to_us,
           lead(ts_us, 1) OVER w IS NULL AS is_current
         FROM changes
         WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
         ORDER BY user_id, valid_from_us, event_id""",
    "q51_bloom_semi_join" ->
      """SELECT l_returnflag, count(*) AS n_items,
         CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
         FROM lineitem
         WHERE l_orderkey IN (
           SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q52_merge_upsert" ->
      """WITH snapshot AS (
           SELECT c_custkey AS custkey, c_name, c_acctbal
           FROM customer WHERE c_custkey % 5 <> 0),
         changes AS (
           SELECT o_custkey AS custkey, count(*) AS n_orders,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_spend
           FROM orders GROUP BY o_custkey)
         SELECT COALESCE(t.custkey, s.custkey) AS custkey,
           COALESCE(t.c_name, '(new)') AS name,
           COALESCE(t.c_acctbal, 0.0) AS old_bal,
           COALESCE(s.n_orders, 0) AS n_orders,
           COALESCE(s.total_spend, 0.0) AS total_spend,
           COALESCE(t.c_acctbal, 0.0) + COALESCE(s.total_spend, 0.0) AS new_bal,
           CASE WHEN t.custkey IS NOT NULL AND s.custkey IS NOT NULL THEN 'update'
                WHEN s.custkey IS NOT NULL THEN 'insert'
                ELSE 'keep' END AS action
         FROM snapshot t FULL OUTER JOIN changes s ON t.custkey = s.custkey
         ORDER BY custkey""",
    "q53_orc_roundtrip" -> RoundtripOracleSql,
    // the full recompute — hash-equality against it IS the
    // incremental-maintenance correctness claim
    "q70_incremental_agg" ->
      """SELECT o_orderstatus, count(*) AS n_orders,
         CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    // identical aggregate contract to q53 — the format under test is
    // the only difference, so the SAME oracle text pins all roundtrips
    "q69_csv_roundtrip" -> RoundtripOracleSql,
    "q71_json_roundtrip" -> RoundtripOracleSql
  )
}
