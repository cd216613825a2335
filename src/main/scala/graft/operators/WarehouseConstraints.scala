package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CHECK constraints on manifested tables — Delta's `ALTER TABLE ADD
  * CONSTRAINT ... CHECK (...)` (NOT NULL is the special case
  * `col IS NOT NULL`): a named SQL predicate rides the manifest as a
  * `#constraint:` metadata line and every data-adding commit
  * VALIDATES its incoming rows against all live constraints before
  * anything is written — the writer-side data-quality gate a training
  * corpus table needs (no empty documents, no null languages, scores
  * in range) enforced where the data lands, not hoped for downstream.
  *
  * Semantics are SQL CHECK: a row violates only when the predicate
  * evaluates to FALSE — NULL (unknown) passes, which also gives the
  * right additive-evolution behavior for free (rows written before a
  * constrained column existed read it as null and pass). Validation
  * costs ONE Spark job over the INCOMING batch per commit — O(delta),
  * never a table scan — and zero when the table has no constraints.
  * `addCheckConstraint` validates the EXISTING table once at add time
  * (the Delta convention), so a committed constraint is an invariant
  * of the whole table, not just of later batches.
  *
  * Lifecycle: the lines are versioned manifest metadata, so
  * constraint state TIME-TRAVELS with the data — RESTORE rolls it
  * back, clone carries it, compaction carries it through the fold,
  * and `readManifestedAt` of a pre-constraint snapshot is naturally
  * unconstrained. Line format `#constraint:<name>:<base64(pred)>` —
  * the predicate is base64-coded so arbitrary SQL (colons, quotes,
  * newlines) survives the line-oriented manifest format with
  * deterministic bytes (the trail-head == pointer byte-equality
  * invariant).
  *
  * Partitioned roots: [[addCheckConstraintPartitioned]] /
  * [[dropCheckConstraintPartitioned]] manage the constraint as TABLE
  * state — existing data validated once across all leaves (pooled
  * reads, one Spark job), then the line committed to EVERY leaf under
  * ONE root claim/version, so readers never observe a half-constrained
  * root. [[WarehouseRoot.upsertManifestedPartitioned]] validates its
  * source against every DISTINCT constraint set found across the
  * leaves (steady state: one set, one O(batch) job), so a root whose
  * leaves drifted (a hand-managed leaf that missed an add) still
  * refuses rows violating ANY leaf's constraint instead of trusting
  * directory-listing order.
  */
trait WarehouseConstraints { this: Warehouse.type =>

  private val ConstraintPrefix = "#constraint:"

  private[operators] def constraintLines(body: String): Seq[String] =
    body.trim.split("\n").toSeq.map(_.trim)
      .filter(_.startsWith(ConstraintPrefix))

  /** Decode the committed constraints of a manifest body:
    * name -> predicate SQL. */
  private[operators] def parseConstraints(body: String): Map[String, String] =
    constraintLines(body).map { l =>
      val rest = l.stripPrefix(ConstraintPrefix)
      val i = rest.indexOf(':')
      rest.take(i) -> new String(
        java.util.Base64.getDecoder.decode(rest.drop(i + 1)), "UTF-8")
    }.toMap

  private def constraintLine(name: String, predicate: String): String =
    ConstraintPrefix + name + ":" +
      java.util.Base64.getEncoder.encodeToString(predicate.getBytes("UTF-8"))

  /** The live CHECK constraints of a committed table. */
  def checkConstraints(spark: SparkSession, dir: String): Map[String, String] = {
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    headBody(fs, root).map(parseConstraints).getOrElse(Map.empty)
  }

  /** Validate `df` against the constraints committed in `head` —
    * the shared writer-side gate. ONE job: rows are tagged with the
    * names of every constraint whose predicate is FALSE for them, the
    * first few violators are collected and the refusal names them.
    * No-op (no job) when the head carries no constraints.
    *
    * A legal additive-evolution batch may OMIT a constrained column —
    * the committed scan null-fills it (mergeSchema/unionByName), so
    * the CHECK must see NULL → pass, the SQL semantics documented
    * above, not an unresolved-column refusal. Resolution is probed
    * against the raw batch first; only on a miss is `tableSchema`
    * (by-name — typically one parquet-footer schema read) consulted
    * to null-fill the batch's missing TABLE columns. A predicate
    * referencing a column in neither the batch nor the table still
    * fails loudly. */
  private[operators] def requireConstraints(head: Option[String],
                                            df: DataFrame, op: String,
                                            tableSchema: => org.apache.spark.sql.types.StructType =
                                              org.apache.spark.sql.types.StructType(Nil)): Unit = {
    val cons = head.map(parseConstraints).getOrElse(Map.empty)
    if (cons.isEmpty) return
    val resolvesOnBatch = cons.values.forall { p =>
      try { df.select(expr(p)); true }
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    }
    val target =
      if (resolvesOnBatch) df
      else {
        val have = df.columns.map(_.toLowerCase).toSet
        tableSchema.fields.filterNot(f => have(f.name.toLowerCase))
          .foldLeft(df)((d, f) =>
            d.withColumn(f.name, lit(null).cast(f.dataType)))
      }
    val tags = cons.toSeq.sortBy(_._1).map { case (n, p) =>
      when(coalesce(expr(p), lit(true)) === lit(false), lit(n))
    }
    val bad = target
      .withColumn("_violated",
        filter(array(tags: _*), x => x.isNotNull))
      .filter(size(col("_violated")) > 0)
      .limit(3).collect()
    if (bad.nonEmpty) {
      val sample = bad.map { r =>
        val names = r.getSeq[String](r.fieldIndex("_violated")).mkString(",")
        s"[$names] ${r.mkString(", ")}"
      }.mkString("; ")
      throw new IllegalArgumentException(
        s"$op: incoming rows violate CHECK constraint(s) — nothing was " +
          s"committed. First violators: $sample. Constraints: " +
          cons.toSeq.sortBy(_._1)
            .map { case (n, p) => s"$n CHECK ($p)" }.mkString("; "))
    }
  }

  /** ADD CONSTRAINT: validate the EXISTING table against `predicate`
    * (one scan — a constraint is a whole-table invariant from the
    * moment it commits), then commit a METADATA-ONLY version whose
    * line set adds `#constraint:name`. Refuses a duplicate name, a
    * name with ':'/newline, a predicate referencing no committed
    * column (the expr resolution fails loudly in the validation
    * scan), and a table whose current rows violate it. Returns the
    * committed version. */
  def addCheckConstraint(spark: SparkSession, dir: String, name: String,
                         predicate: String): Long = {
    require(!name.contains(":") && !name.contains("\n") && name.nonEmpty,
      s"addCheckConstraint: constraint name must be nonempty without " +
        s"':' or newline, got '$name'")
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    withTableLock(root) {
      // bounded CAS loop, expected version captured WITH the head and
      // BEFORE the validation scan: a cross-process write landing
      // during the scan would otherwise commit rows the scan never saw
      // under the new constraint (and the late expected-read could
      // even drop its generation from the pointer) — with the early
      // capture that write surfaces as a version-CAS loss here and the
      // retry re-reads AND re-scans, so the committed constraint is a
      // whole-table invariant including last-instant arrivals.
      var attempt = 0
      var out = -1L
      while (out < 0) {
        val head = headBody(fs, root).getOrElse(
          throw new IllegalArgumentException(
            s"addCheckConstraint: $dir has no committed table"))
        val expected = manifestVersions(fs, root).lastOption.getOrElse(0L)
        val existing = parseConstraints(head)
        require(!existing.contains(name),
          s"addCheckConstraint: $dir already has constraint '$name' " +
            s"CHECK (${existing(name)}) — drop it first to replace")
        // the whole-table validation: the one table scan this op costs
        requireConstraints(
          Some(manifestBody(Seq.empty, Map.empty,
            Seq(constraintLine(name, predicate)))),
          readManifested(spark, dir), "addCheckConstraint")
        try out = commitManifest(fs, root, new HPath(root, "_current"),
          parseGens(head), expected, parseTxns(head),
          parseStats(head) :+ constraintLine(name, predicate))
        catch {
          case e: java.util.ConcurrentModificationException =>
            attempt += 1
            if (attempt >= 5) throw e
        }
      }
      out
    }
  }

  /** DROP CONSTRAINT: metadata-only commit removing the line.
    * Refuses an unknown name. Returns the committed version. */
  def dropCheckConstraint(spark: SparkSession, dir: String,
                          name: String): Long = {
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    withTableLock(root) {
      var attempt = 0
      var out = -1L
      while (out < 0) {
        val head = headBody(fs, root).getOrElse(
          throw new IllegalArgumentException(
            s"dropCheckConstraint: $dir has no committed table"))
        val expected = manifestVersions(fs, root).lastOption.getOrElse(0L)
        val line = constraintLines(head)
          .find(_.startsWith(ConstraintPrefix + name + ":")).getOrElse(
            throw new IllegalArgumentException(
              s"dropCheckConstraint: $dir has no constraint '$name' " +
                s"(live: ${parseConstraints(head).keys.toSeq.sorted
                  .mkString(", ")})"))
        try out = commitManifest(fs, root, new HPath(root, "_current"),
          parseGens(head), expected, parseTxns(head),
          parseStats(head).filterNot(_ == line))
        catch {
          case e: java.util.ConcurrentModificationException =>
            attempt += 1
            if (attempt >= 5) throw e
        }
      }
      out
    }
  }

  /** ADD CONSTRAINT across a PARTITIONED root — the table-level DDL
    * (Delta constraints are table state; the per-leaf surface alone
    * lets a root drift half-constrained): validate the EXISTING data
    * of ALL leaves in one partitioned scan (so the predicate may also
    * reference the partition columns), then — under ONE root claim —
    * commit the `#constraint:` line to every leaf and publish one
    * root version recording the new heads. Readers therefore see the
    * root unconstrained or fully constrained, never in between, and a
    * validation refusal happens BEFORE the claim — it leaves no trace
    * in any manifest.
    *
    * CONVERGENT for a crashed prior attempt: a leaf already carrying
    * this exact (name, predicate) line skips (its head is recorded
    * as-is); the same name with a DIFFERENT predicate refuses loudly.
    * A cross-process write racing a leaf's metadata commit surfaces
    * as that leaf's version CAS loss; the bounded retry re-validates
    * that LEAF's current rows (leaf-sized scan, not the root scan)
    * before recommitting, so last-instant arrivals are covered
    * exactly as in [[addCheckConstraint]]. Returns the published root
    * version. */
  def addCheckConstraintPartitioned(spark: SparkSession, rootDir: String,
                                    name: String, predicate: String): Long = {
    require(!name.contains(":") && !name.contains("\n") && name.nonEmpty,
      s"addCheckConstraintPartitioned: constraint name must be nonempty " +
        s"without ':' or newline, got '$name'")
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    val leaves = manifestLeaves(fs, root)
    require(leaves.nonEmpty && leaves.forall(l => leafKvs(root, l).nonEmpty),
      s"addCheckConstraintPartitioned: $rootDir has no k=v leaves — " +
        "it is a plain leaf; use addCheckConstraint")
    val line = constraintLine(name, predicate)
    // duplicate probe + head/version SNAPSHOT of every leaf, taken
    // BEFORE the root-wide validation scan: the first CAS attempt per
    // leaf uses these as its expected values, so a write landing DURING
    // the scan (a concurrent upsert that claims the root only at commit
    // time, or a direct leaf append) surfaces as a CAS loss and takes
    // the leaf re-validation path below — the same early-capture rule
    // the non-partitioned addCheckConstraint applies. Refusals (dup
    // name with different predicate, headless leaf) happen here,
    // before the claim — they leave nothing behind. Convergence rule
    // per leaf: same line → crashed prior attempt, fine.
    val pre: Map[String, (String, Long)] = parCommitLeaves(leaves) { leaf =>
      val rel = relPath(root, leaf)
      val h = headBody(fs, leaf).getOrElse(
        throw new IllegalArgumentException(
          s"addCheckConstraintPartitioned: leaf $rel has no " +
            "committed table"))
      parseConstraints(h).get(name).foreach { p =>
        require(p == predicate,
          s"addCheckConstraintPartitioned: leaf $rel " +
            s"already has constraint '$name' CHECK ($p) — drop it " +
            "first to replace")
      }
      rel -> ((h, manifestVersions(fs, leaf).lastOption.getOrElse(0L)))
    }.toMap
    requireConstraints(
      Some(manifestBody(Seq.empty, Map.empty, Seq(line))),
      readManifestedPartitioned(spark, rootDir),
      "addCheckConstraintPartitioned")
    val st = beginRootTransition(fs, root, leaves, None,
      "addCheckConstraintPartitioned")
    val map = parCommitLeaves(leaves,
      refresh = () => refreshClaim(fs, st, root, None)) { leaf =>
      val rel = relPath(root, leaf)
      rel -> withTableLock(leaf) {
        var attempt = 0
        var v = -1L
        // pre-scan snapshot — any intervening write fails this CAS
        var (head, expected) = pre(rel)
        while (v < 0) {
          if (constraintLines(head).contains(line)) v = expected // converged
          else {
            try v = commitManifest(fs, leaf, new HPath(leaf, "_current"),
              parseGens(head), expected, parseTxns(head),
              parseStats(head) :+ line)
            catch {
              case e: java.util.ConcurrentModificationException =>
                attempt += 1
                if (attempt >= 5) throw e
                // a write overtook the pre-scan snapshot — re-read the
                // head and re-validate the leaf's CURRENT rows before
                // recommitting (leaf-sized scan, not the root scan)
                head = headBody(fs, leaf).getOrElse(
                  throw new IllegalArgumentException(
                    s"addCheckConstraintPartitioned: leaf $rel has no " +
                      "committed table"))
                expected =
                  manifestVersions(fs, leaf).lastOption.getOrElse(0L)
                requireConstraints(
                  Some(manifestBody(Seq.empty, Map.empty, Seq(line))),
                  readManifested(spark, leaf.toString),
                  "addCheckConstraintPartitioned")
            }
          }
        }
        v
      }
    }.toMap
    commitRootManifest(fs, root, st, map, None)
    st.next
  }

  /** DROP CONSTRAINT across a partitioned root: the line is removed
    * from every leaf under one root claim/version. A leaf already
    * missing the name skips (a crashed prior drop converges); a root
    * where NO leaf carries it refuses. Returns the published root
    * version. */
  def dropCheckConstraintPartitioned(spark: SparkSession, rootDir: String,
                                     name: String): Long = {
    val (fs, root) = ManifestIo.resolve(rootDir, hconf(spark))
    val leaves = manifestLeaves(fs, root)
    require(leaves.nonEmpty && leaves.forall(l => leafKvs(root, l).nonEmpty),
      s"dropCheckConstraintPartitioned: $rootDir has no k=v leaves — " +
        "it is a plain leaf; use dropCheckConstraint")
    val anywhere = parCommitLeaves(leaves) { leaf =>
      headBody(fs, leaf).exists(h =>
        parseConstraints(h).contains(name))
    }
    require(anywhere.contains(true),
      s"dropCheckConstraintPartitioned: no leaf of $rootDir has " +
        s"constraint '$name'")
    val st = beginRootTransition(fs, root, leaves, None,
      "dropCheckConstraintPartitioned")
    val map = parCommitLeaves(leaves,
      refresh = () => refreshClaim(fs, st, root, None)) { leaf =>
      val rel = relPath(root, leaf)
      rel -> withTableLock(leaf) {
        var attempt = 0
        var v = -1L
        while (v < 0) {
          val head = headBody(fs, leaf).getOrElse(
            throw new IllegalArgumentException(
              s"dropCheckConstraintPartitioned: leaf $rel has no " +
                "committed table"))
          val expected = manifestVersions(fs, leaf).lastOption.getOrElse(0L)
          constraintLines(head)
            .find(_.startsWith(ConstraintPrefix + name + ":")) match {
            case None => v = expected // converged (or never had it)
            case Some(l) =>
              try v = commitManifest(fs, leaf, new HPath(leaf, "_current"),
                parseGens(head), expected, parseTxns(head),
                parseStats(head).filterNot(_ == l))
              catch {
                case e: java.util.ConcurrentModificationException =>
                  attempt += 1
                  if (attempt >= 5) throw e
              }
          }
        }
        v
      }
    }.toMap
    commitRootManifest(fs, root, st, map, None)
    st.next
  }
}
