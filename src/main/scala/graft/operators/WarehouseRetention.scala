package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Retention and vacuum — internal module of [[Warehouse]] (r18
  * split, same public API): the steady-path retention GC and the
  * leaf/root vacuum passes with their in-flight grace discipline. */
trait WarehouseRetention { this: Warehouse.type =>

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
    * discipline as the fold GC applies across processes.
    *
    * `alsoRetain` (r19): leaf versions referenced by RETAINED root
    * version maps — an out-of-band leaf-level fold can advance a leaf
    * several versions inside one root window, putting a root-map-
    * referenced version below `h - retainSnapshots`; GC'ing it would
    * leave a retained root snapshot resolving to a deleted leaf
    * manifest ([[readManifestedPartitionedAt]] throws). The
    * partitioned walk passes the union of its surviving maps' entries
    * for this leaf. */
  private[operators] def gcLeafRetention(fs: HFs, leaf: HPath, retainSnapshots: Int,
                              retainFor: Option[java.time.Duration],
                              alsoRetain: Set[Long] = Set.empty): Long = {
    val vs = manifestVersions(fs, leaf)
    val h = vs.lastOption.getOrElse(0L)
    val timeCutoff = retainFor.map(d => System.currentTimeMillis() - d.toMillis)
    def inTime(x: Long): Boolean = timeCutoff.exists { c =>
      try fs.getFileStatus(new HPath(leaf, s"_manifest-$x"))
        .getModificationTime >= c
      catch { case _: java.io.FileNotFoundException => false }
    }
    val kept = vs.filter(x =>
      x >= h - retainSnapshots || inTime(x) || alsoRetain.contains(x))
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
    // a crashed claim takeover strands its renamed-aside corpse file
    // (r19 — the rename-based takeover's only debris); aged only
    ManifestIo.list(fs, root)
      .filter(st => st.isFile &&
        st.getPath.getName.startsWith(".claim-corpse-") &&
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
}
