package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Single-leaf table lifecycle — internal module of [[Warehouse]]
  * (r18 split, same public API): compaction (incl. Z-order layout),
  * streaming append, tombstone delete, MERGE upsert, snapshot reads
  * and time travel, history. */
trait WarehouseLeaf { this: Warehouse.type =>

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
    * rather than burying the interleaved append.
    *
    * `alsoRetainVersions` (r19): snapshot versions pinned from this
    * fold's GC regardless of the count/time windows — the partitioned
    * walk passes the versions its retained root maps still reference
    * (an out-of-band leaf fold can put those below the count window);
    * a deployment can pin a version a downstream consumer holds. */
  def compactManifested(spark: SparkSession, dir: String,
                        targetFileBytes: Long = 128L << 20,
                        retainSnapshots: Int = 1,
                        retainFor: Option[java.time.Duration] = None,
                        clusterBy: Option[String] = None,
                        zorderBy: Seq[String] = Nil,
                        zorderQuantiles: Boolean = false,
                        alsoRetainVersions: Set[Long] = Set.empty): Int = {
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
    val curRefs = parseRefs(head)
    val expected = manifestVersions(fs, root).lastOption.getOrElse(0L)
    val bytes = cur.map(g => ManifestIo.list(fs, entryPath(root, curRefs, g))
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val nextId = nextEntryId(fs, root, cur)
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
    // a shallow clone's `#ref:` entries resolve to the source here
    // and the fold WRITES LOCALLY — compaction doubles as "materialize
    // the clone" (the refs retire with the entries they annotated)
    val folded = scanGens(spark, root, cur, curRefs)
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
    // CHECK constraint lines carry through the fold — compaction is
    // content-preserving, so the invariant they state still holds
    val v = commitManifest(fs, root, pointer, Seq(next), expected, curTxns,
      constraintLines(head) ++ collectStats(fs, hconf(spark), root, next))
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
      .filter(x => x >= v - retainSnapshots || inTimeWindow(x) ||
        alsoRetainVersions.contains(x))
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
    //
    // CHECK constraints gate the incoming batch BEFORE anything is
    // written (one O(batch) job, zero when unconstrained) and are
    // RE-validated inside the loop whenever the re-read head's
    // constraint set differs from the one last validated (r20 ADVICE):
    // a retry whose CAS was lost to a cross-process addCheckConstraint
    // must not commit rows that add's whole-table scan never saw —
    // that scan ran before this batch's data existed and this batch
    // validated against the pre-constraint head, so without the
    // re-check BOTH gates would miss. Steady state re-parses the same
    // head and spends no extra job.
    var attempt = 0
    var committed = -1L
    var validatedCons: Option[Map[String, String]] = None
    while (committed < 0) {
      val hb = headBody(fs, root)
      val (gens, txns, carried) = hb match {
        case Some(b) => (parseGens(b), parseTxns(b), parseStats(b))
        case None => (Seq.empty[String], Map.empty[String, Long], Seq.empty[String])
      }
      val liveCons = hb.map(parseConstraints).getOrElse(Map.empty)
      if (!validatedCons.contains(liveCons)) {
        requireConstraints(hb, df, "appendManifested",
          readManifested(spark, dir).schema)
        validatedCons = Some(liveCons)
      }
      val expected = manifestVersions(fs, root).lastOption.getOrElse(0L)
      val nextId = genId.getOrElse(nextEntryId(fs, root, gens))
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
  private[operators] def scanGens(spark: SparkSession, root: HPath,
                       gens: Seq[String],
                       refs: Map[String, String] = Map.empty): DataFrame = {
    val (dels, datas) = gens.partition(_.startsWith(".del-"))
    // not producible by current writers (every commit path lists at
    // least one data generation), but a hand-edited or future-writer
    // manifest must fail loudly here, not as reduceLeft-on-empty
    require(datas.nonEmpty,
      s"scanGens: manifest lists only tombstones: ${gens.mkString(", ")}")
    if (dels.isEmpty)
      spark.read.option("mergeSchema", "true")
        .parquet(datas.map(g => entryPath(root, refs, g).toString): _*)
    else {
      val tagged = datas.map(g =>
        g -> spark.read.parquet(entryPath(root, refs, g).toString))
      requireAdditiveOnly(tagged)
      val data = tagged.map { case (g, df) =>
        df.withColumn("_gid", lit(entryId(g)))
      }.reduceLeft(_.unionByName(_, allowMissingColumns = true))
      applyTombstones(spark, root, dels, data, refs)
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
  private[operators] def requireAdditiveOnly(gens: Seq[(String, DataFrame)]): Unit = {
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
  private[operators] def applyTombstones(spark: SparkSession, root: HPath,
                              dels: Seq[String], data: DataFrame,
                              refs: Map[String, String] = Map.empty): DataFrame = {
    val keyCols = dels.map(g =>
      spark.read.parquet(entryPath(root, refs, g).toString).columns.toSeq).distinct
    require(keyCols.size == 1 && keyCols.head.size == 1,
      s"scanGens: tombstones disagree on the key column: $keyCols")
    val key = keyCols.head.head
    val tomb = dels.map { g =>
      spark.read.parquet(entryPath(root, refs, g).toString)
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
                          lower: Any, upper: Any): DataFrame =
    readManifestedSkipping(spark, dir, "readManifestedRange",
      col(column) >= lit(lower) && col(column) <= lit(upper)) { meta =>
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
      (g, f) => ranges.get((g, f)) match {
        case Some((kind, mn, mx)) => statsOverlap(kind, mn, mx, lower, upper)
        case None => true
      }
    }

  /** NULL-SKIPPING READ (r20): [[readManifested]] restricted to
    * `column IS NULL` (`wantNull = true`) or `IS NOT NULL`, opening
    * only the files whose manifest-recorded `#nulls:` count says they
    * can contain a qualifying row — an IS NULL audit scan (the v03
    * shape) over a mostly-complete column opens O(files with any
    * null) instead of all of them, and an IS NOT NULL scan skips
    * all-null files. Same contract as [[readManifestedRange]]:
    * semantically identical to `readManifested(...).filter(...)`
    * (the predicate is re-applied), conservative on legacy manifests
    * — a file without a recorded null count is always read. */
  def readManifestedNull(spark: SparkSession, dir: String, column: String,
                         wantNull: Boolean): DataFrame =
    readManifestedSkipping(spark, dir, "readManifestedNull",
      if (wantNull) col(column).isNull else col(column).isNotNull) { meta =>
      val nulls: Map[(String, String), (Long, Long)] =
        meta.filter(_.startsWith("#nulls:")).flatMap { l =>
          // #nulls:<entry>/<file>:<col>:<nullCount>:<numRows>
          l.stripPrefix("#nulls:").split(":", 4) match {
            case Array(entryFile, c, nn, nr) if c == column =>
              val slash = entryFile.indexOf('/')
              try Some((entryFile.take(slash), entryFile.drop(slash + 1)) ->
                (nn.toLong, nr.toLong))
              catch { case _: NumberFormatException => None }
            case _ => None
          }
        }.toMap
      (g, f) => nulls.get((g, f)) match {
        case Some((nn, nr)) => if (wantNull) nn > 0L else nn < nr
        case None => true
      }
    }

  /** The shared manifest-metadata pruned scan behind
    * [[readManifestedRange]] and [[readManifestedNull]]: plan the
    * scan from the manifest's `#file:` inventory, keep only the files
    * `keepOf(meta)` admits (no metadata line ⇒ keep — conservative by
    * construction), re-apply `pred` on the survivors so pruning can
    * only cut IO, never change the answer. */
  private def readManifestedSkipping(spark: SparkSession, dir: String,
      op: String, pred: Column)(
      keepOf: Seq[String] => (String, String) => Boolean): DataFrame = {
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    def resolveDf(): DataFrame = {
      val body = headBody(fs, root).getOrElse(
        throw new java.io.FileNotFoundException(
          s"$op: $dir has no committed table"))
      val gens = parseGens(body)
      val meta = parseStats(body)
      val refs = parseRefs(body)
      val keep = keepOf(meta)
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
          val d = entryPath(root, refs, g)
          names.map(n => new HPath(d, n))
        case None => ManifestIo.list(fs, entryPath(root, refs, g))
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
          .map(_.getPath).toSeq
      }
      val (dels, datas) = gens.partition(_.startsWith(".del-"))
      require(datas.nonEmpty,
        s"$op: manifest lists only tombstones: $gens")
      // (generation, all files, files surviving the stats prune)
      val selected: Seq[(String, Seq[HPath], Seq[HPath])] = datas.map { g =>
        val all = filesOf(g)
        (g, all, all.filter(f => keep(g, f.getName)))
      }
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
        scanGens(spark, root, gens, refs).filter(pred)
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
          else applyTombstones(spark, root, dels, data, refs)
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
        // resolve #ref: entries (unmaterialized shallow clones) — the
        // probed generation may live in the SOURCE table's directory
        // (the upsertManifested schema probe got the same fix)
        val delRefs = parseRefs(head)
        gens.find(!_.startsWith(".del-")).foreach { g =>
          val cols = spark.read.parquet(entryPath(root, delRefs, g).toString).columns
          require(cols.contains(key),
            s"deleteManifested: $dir has no column '$key' " +
              s"(columns: ${cols.mkString(", ")})")
        }
        val nextId = nextEntryId(fs, root, gens)
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
    val histBody = ManifestIo.readString(fs, hist)
    val gens = parseGens(histBody)
    val refs = parseRefs(histBody)
    gens.find(g => !ManifestIo.isDirectory(fs, entryPath(root, refs, g))).foreach { g =>
      throw new IllegalStateException(
        s"readManifestedAt: snapshot $version of $dir lists $g, which " +
          "has been garbage-collected (retention window moved past it)")
    }
    // scanGens: a snapshot taken BEFORE a delete reads with its rows;
    // one taken after applies the tombstone — deletes are versioned
    // like any commit
    scanGens(spark, root, gens, refs)
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
      // "no committed table" is a MOMENTOUS conclusion for a reader —
      // downstream it means bootstrap/empty, so a transient resolution
      // failure (an fd-starved stat reading as absence, an object
      // store's transient list inconsistency) must not reach it on
      // first sight: verify once after a short pause before concluding
      // (r19; costs 50 ms only on the genuinely-nothing-there path)
      val head = headBody(fs, root).orElse {
        Thread.sleep(50)
        headBody(fs, root)
      }
      val gens = parseGens(head.getOrElse(
        throw new java.io.FileNotFoundException(
          s"readManifested: $dir has no committed table")))
      // scanGens: additive schema evolution carries (mergeSchema /
      // union-by-name null-fill — cost is one footer read per file at
      // planning, paid only while the manifest lists >1 generation),
      // and `.del-` tombstones apply in id order (merge-on-read; the
      // tombstone-free steady state is the same single multi-path
      // scan as always). Shallow-clone `#ref:` entries resolve to
      // their recorded source directories.
      scanGens(spark, root, gens, head.map(parseRefs).getOrElse(Map.empty))
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
          val cols = spark.read
            .parquet(entryPath(root, parseRefs(head), g).toString).columns
          require(cols.contains(keyCol),
            s"upsertManifested: $dir has no column '$keyCol' " +
              s"(columns: ${cols.mkString(", ")})")
        }
        // CHECK constraints gate the incoming rows before either of
        // the two writes below (one O(batch) job; replays above never
        // pay it)
        requireConstraints(Some(head), source, "upsertManifested",
          readManifested(spark, dir).schema)
        val base = nextEntryId(fs, root, gens)
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
}
