package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Manifest IO and parsing — internal module of [[Warehouse]] (r18
  * split, same public API): the filesystem seam, per-table lock,
  * pointer/trail read+parse+roll-forward, `#stats:` data-skipping
  * metadata, the version-CAS commit, and the bounded commit pool. */
trait WarehouseManifest { this: Warehouse.type =>

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
  private[operators] def hconf(spark: SparkSession): org.apache.hadoop.conf.Configuration =
    spark.sparkContext.hadoopConfiguration

  /** In-process per-table writer lock (the `cachedIndex` pattern,
    * applied to table commits — r13): serializes
    * append/compact/vacuum on the same table within this JVM, so
    * local[*] multi-writer interleavings are mechanically safe
    * (SinkSpec races two appenders). Cross-PROCESS writers are caught
    * by the version CAS in [[commitManifest]] — the first committer
    * wins, the loser throws — see [[appendManifested]]. */
  private[operators] val tableLocks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  private[operators] def withTableLock[T](root: HPath)(body: => T): T =
    tableLocks.computeIfAbsent(root.toString, _ => new Object)
      .synchronized(body)

  /** The swap-staging siblings for a leaf directory: DOT-PREFIXED, so
    * Spark's file/partition discovery (which skips `.`/`_` names) never
    * sees a non-`k=v` directory inside a partitioned root while a leaf
    * is mid-compaction. */
  private[operators] def stagingPaths(root: HPath): (HPath, HPath) = {
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
  private[operators] def restoreIfStranded(fs: HFs, target: HPath): Boolean = {
    val (_, old) = stagingPaths(target)
    if (!ManifestIo.exists(fs, target) && ManifestIo.isDirectory(fs, old)) {
      ManifestIo.rename(fs, old, target)
      true
    } else false
  }

  /** Root-relative leaf path for the partitioned-compaction report
    * maps (`.` for the root itself). */
  private[operators] def relPath(root: HPath, leaf: HPath): String =
    root.toUri.relativize(leaf.toUri).getPath.stripSuffix("/") match {
      case "" => "."
      case p => p
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
  private[operators] def readPointer(fs: HFs, pointer: HPath): Seq[String] =
    parseGens(ManifestIo.readString(fs, pointer))

  private[operators] def parseGens(body: String): Seq[String] =
    body.trim.split("\n").toSeq.map(_.trim).filter(_.nonEmpty)
      .filterNot(_.startsWith("#"))

  private[operators] def parseTxns(body: String): Map[String, Long] =
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
    * The next commit's [[ManifestIo.replace]] heals the pointer.
    *
    * A BLANK body is never a committed head (r19): every commit path
    * serializes at least one generation line, so an empty/whitespace
    * trail head is a claimed-but-unwritten `_manifest-v` — the window
    * between a store's create-exclusive and its body write (closed on
    * `file:` by [[ManifestIo.putIfAbsent]]'s link(2) staging, still
    * real on HDFS-contract stores). The roll-forward walks DOWN the
    * trail past blank claims to the newest complete snapshot instead
    * of resolving an in-flight claim as an empty table; a blank
    * `_current` (torn non-atomic pointer swap) falls through to the
    * same walk. */
  private[operators] def headBody(fs: HFs, root: HPath): Option[String] = {
    val direct =
      try Some(ManifestIo.readString(fs, new HPath(root, "_current")))
      catch { case _: java.io.FileNotFoundException => None }
    // a listed version GC'd between the list and the read propagates
    // as FileNotFoundException — the caller's one-retry contract
    // re-resolves from a fresh listing (walking past it here could
    // resolve a STALE retained snapshot as the head)
    direct.filter(_.trim.nonEmpty).orElse(
      manifestVersions(fs, root).reverseIterator
        .map(v => ManifestIo.readString(fs, new HPath(root, s"_manifest-$v")))
        .find(_.trim.nonEmpty))
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
  private[operators] def readTxns(fs: HFs, pointer: HPath): Map[String, Long] =
    parseTxns(ManifestIo.readString(fs, pointer))

  /** Serialize a manifest body: generation list, then the `#stats:`
    * file-skipping lines (sorted), then the txn markers (app-sorted) —
    * deterministic bytes, so trail-head == pointer stays a
    * byte-equality invariant. */
  private[operators] def manifestBody(gens: Seq[String], txns: Map[String, Long],
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
  private[operators] val MaxStatsCols = 16

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
  private[operators] def collectStats(fs: HFs, conf: org.apache.hadoop.conf.Configuration,
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
            // `#nulls:<entry>/<file>:<col>:<nullCount>:<numRows>` (r20)
            // — per-file null counts alongside min/max, same footer
            // pass (Delta records nullCount for the same reason): lets
            // IS NULL / IS NOT NULL reads skip files. Type-agnostic,
            // so it emits even where min/max is unsupported (binary,
            // all-null files); conservative — any chunk without a
            // recorded null count suppresses the line, and no line
            // means "keep the file".
            val nullsLine =
              if (name.contains(":") || name.contains("/") ||
                  name.contains("\n") || chunks.isEmpty ||
                  stats.exists(s => s == null || !s.isNumNullsSet ||
                    s.getNumNulls < 0))
                None
              else {
                val rows = blocks.map(_.getRowCount).sum
                Some(s"#nulls:$entry/${st.getPath.getName}:$name:" +
                  s"${stats.map(_.getNumNulls).sum}:$rows")
              }
            val minmaxLine =
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
            nullsLine.toSeq ++ minmaxLine.toSeq
          }
      } finally reader.close()
    }
  }

  /** The carried metadata lines of a manifest body — `#stats:`
    * (min/max skipping) and `#file:` (file inventory), both
    * `<entry>/<file>`-addressed with the entry-keyed carry-forward
    * lifecycle, plus `#constraint:` (table CHECK constraints,
    * [[WarehouseConstraints]]) which carries UNCONDITIONALLY — a
    * constraint is table state, not per-entry state. Every consumer
    * of these lines filters by its own prefix. */
  private[operators] def parseStats(body: String): Seq[String] =
    body.trim.split("\n").toSeq.map(_.trim)
      .filter(l => l.startsWith("#stats:") || l.startsWith("#file:") ||
        l.startsWith("#constraint:") || l.startsWith("#nulls:") ||
        l.startsWith("#ref:"))

  /** The entry (generation/tombstone name) a per-file metadata line
    * belongs to. */
  private[operators] def metaEntry(l: String): String =
    l.substring(l.indexOf(':') + 1).takeWhile(_ != '/')

  /** Carry-forward filter: the stats/file lines whose entry survives
    * into the next commit's generation list (dropped generations take
    * their lines with them; retained ones keep theirs as text — no
    * re-read). `#constraint:` lines carry unconditionally — table
    * state, not entry state. */
  private[operators] def statsForGens(lines: Seq[String], gens: Seq[String]): Seq[String] = {
    val keep = gens.toSet
    lines.filter(l => l.startsWith("#constraint:") ||
      keep.contains(metaEntry(l)))
  }

  /** SHALLOW-CLONE entry references (r20 — Delta `SHALLOW CLONE`
    * parity): `#ref:<entry>/<base64url(absolute-dir-uri)>` records
    * that a manifest entry's data lives in ANOTHER table's directory
    * — the clone copied metadata only. Entry-keyed like `#stats:`
    * (the `/` separator keeps [[metaEntry]]'s carry-forward contract;
    * base64url never contains '/' or ':'), so compaction's fold —
    * which rewrites the data LOCALLY — retires the reference with the
    * entry it replaces: OPTIMIZE is also "materialize the clone". */
  private[operators] def refLine(entry: String, absDir: String): String =
    "#ref:" + entry + "/" + java.util.Base64.getUrlEncoder.withoutPadding
      .encodeToString(absDir.getBytes("UTF-8"))

  private[operators] def parseRefs(body: String): Map[String, String] =
    body.trim.split("\n").toSeq.map(_.trim)
      .filter(_.startsWith("#ref:")).map { l =>
        val rest = l.stripPrefix("#ref:")
        val slash = rest.indexOf('/')
        rest.take(slash) -> new String(
          java.util.Base64.getUrlDecoder.decode(rest.drop(slash + 1)), "UTF-8")
      }.toMap

  /** Where a manifest entry's data directory actually lives: the
    * local child for an ordinary entry, the recorded absolute source
    * directory for a shallow-clone reference. Every data-reading
    * consumer of a generation list resolves through this. */
  private[operators] def entryPath(root: HPath, refs: Map[String, String],
                                   g: String): HPath =
    refs.get(g).map(new HPath(_)).getOrElse(new HPath(root, g))

  /** Does the recorded [min, max] intersect the query's [lower, upper]?
    * Bound-type / kind mismatches keep the file (conservative). */
  private[operators] def statsOverlap(kind: String, mn: String, mx: String,
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
  private[operators] def entryId(name: String): Long =
    name.substring(name.lastIndexOf('-') + 1).toLong

  /** The next free entry id for a new commit: one past every id the
    * HEAD references OR the directory holds (r19). The head's max id
    * alone became insufficient with [[restoreManifested]]: a restore's
    * head lists an OLD snapshot's entries while the rolled-past
    * versions keep their directories on disk as retained history — a
    * head-anchored id would re-issue one of their ids and the new
    * generation's overwrite-write would destroy a retained snapshot's
    * data. Scanning the directory also steps past crashed writers'
    * orphan generations (ids simply skip; the orphans stay vacuum
    * food). Cost: one LIST per commit, beside the one
    * [[manifestVersions]] already pays. Callers that key their
    * generation explicitly (`genId` — the streaming exactly-once
    * contract) bypass this on purpose: overwriting their OWN prior
    * generation is that contract. */
  private[operators] def nextEntryId(fs: HFs, root: HPath, gens: Seq[String]): Long = {
    val onDisk = ManifestIo.list(fs, root)
      .filter(st => st.isDirectory &&
        st.getPath.getName.matches("""\.(gen|del)-\d+"""))
      .map(st => entryId(st.getPath.getName)).toSeq
    (gens.map(entryId) ++ onDisk).foldLeft(-1L)(math.max) + 1
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
    val (fs, root) = ManifestIo.resolve(dir, sessionHconf())
    manifestVersions(fs, root)
  }

  /** The session's Hadoop conf for the no-SparkSession-argument entry
    * points: `getActiveSession` is THREAD-LOCAL, so a raw consumer
    * thread (the CDF consumer's poll loop) would otherwise silently
    * fall back to a bare Configuration and lose user-set Hadoop conf
    * (object-store credentials, custom fs impls) — fall through to the
    * process-wide default session before giving up. */
  private def sessionHconf(): org.apache.hadoop.conf.Configuration =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new org.apache.hadoop.conf.Configuration())

  /** The exactly-once `#txn:` markers committed at the table's HEAD —
    * appId → highest applied version (the Delta txnAppId/txnVersion
    * surface). Empty for an uncommitted table. This is the durable
    * CURSOR a restarted idempotent producer or change-feed consumer
    * resumes from — the markers ride the snapshot, so they survive
    * crashes, folds and RESTORE exactly like the data they gate. */
  def committedTxns(dir: String): Map[String, Long] = {
    val (fs, root) = ManifestIo.resolve(dir, sessionHconf())
    headBody(fs, root).map(parseTxns).getOrElse(Map.empty)
  }

  private[operators] def manifestVersions(fs: HFs, root: HPath): Seq[Long] =
    ManifestIo.list(fs, root)
      .filter(st => st.isFile && st.getPath.getName.startsWith("_manifest-"))
      .map(_.getPath.getName.stripPrefix("_manifest-").toLong)
      .sorted.toSeq

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

  private[operators] def retryOnMissingFile[T](attempt: => T): T = {
    def missingFile(e: Throwable, depth: Int = 0): Boolean =
      e != null && depth < 16 && (e.isInstanceOf[java.io.FileNotFoundException] ||
        (e.getCause ne e) && missingFile(e.getCause, depth + 1))
    try attempt
    catch { case e: Throwable if missingFile(e) => attempt }
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
}
