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
  * Partitioned roots: leaves share one schema and one writer
  * discipline (the uniform-writer contract every root op assumes), so
  * [[WarehouseRoot.upsertManifestedPartitioned]] validates its source
  * ONCE against the FIRST leaf's constraints before staging — add
  * constraints to every leaf of a root (walk its leaves) or manage
  * the root through one writer.
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
    * No-op (no job) when the head carries no constraints. */
  private[operators] def requireConstraints(head: Option[String],
                                            df: DataFrame, op: String): Unit = {
    val cons = head.map(parseConstraints).getOrElse(Map.empty)
    if (cons.isEmpty) return
    val tags = cons.toSeq.sortBy(_._1).map { case (n, p) =>
      when(coalesce(expr(p), lit(true)) === lit(false), lit(n))
    }
    val bad = df
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
      val head = headBody(fs, root).getOrElse(
        throw new IllegalArgumentException(
          s"addCheckConstraint: $dir has no committed table"))
      val existing = parseConstraints(head)
      require(!existing.contains(name),
        s"addCheckConstraint: $dir already has constraint '$name' " +
          s"CHECK (${existing(name)}) — drop it first to replace")
      // the whole-table validation: the one table scan this op costs
      requireConstraints(
        Some(manifestBody(Seq.empty, Map.empty,
          Seq(constraintLine(name, predicate)))),
        readManifested(spark, dir), "addCheckConstraint")
      commitManifest(fs, root, new HPath(root, "_current"),
        parseGens(head),
        manifestVersions(fs, root).lastOption.getOrElse(0L),
        parseTxns(head),
        parseStats(head) :+ constraintLine(name, predicate))
    }
  }

  /** DROP CONSTRAINT: metadata-only commit removing the line.
    * Refuses an unknown name. Returns the committed version. */
  def dropCheckConstraint(spark: SparkSession, dir: String,
                          name: String): Long = {
    val (fs, root) = ManifestIo.resolve(dir, hconf(spark))
    withTableLock(root) {
      val head = headBody(fs, root).getOrElse(
        throw new IllegalArgumentException(
          s"dropCheckConstraint: $dir has no committed table"))
      val line = constraintLines(head)
        .find(_.startsWith(ConstraintPrefix + name + ":")).getOrElse(
          throw new IllegalArgumentException(
            s"dropCheckConstraint: $dir has no constraint '$name' " +
              s"(live: ${parseConstraints(head).keys.toSeq.sorted
                .mkString(", ")})"))
      commitManifest(fs, root, new HPath(root, "_current"),
        parseGens(head),
        manifestVersions(fs, root).lastOption.getOrElse(0L),
        parseTxns(head),
        parseStats(head).filterNot(_ == line))
    }
  }
}
