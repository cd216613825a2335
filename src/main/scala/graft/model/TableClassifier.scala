package graft.model

import org.apache.spark.sql.DataFrame

/** Schema-driven table classification — the Spark analogue of the
  * reference's catalog discovery (`OMTZHModifier.java:45-77`): a table is
  * enrichable iff it has `name` + `tags` plus an id column, where `id`
  * takes precedence over `osm_id` when both exist (the `if/else if` at
  * `OMT:69-73`).
  */
object TableClassifier {

  sealed trait Classification
  /** Enrichable; `idCol` is "id" or "osm_id". */
  final case class Enrichable(idCol: String) extends Classification
  case object Skipped extends Classification

  def classify(df: DataFrame): Classification = {
    val fields = df.schema.fieldNames.toSet
    val hasMarkers = fields("name") && fields("tags")
    if (hasMarkers && fields("id")) Enrichable("id")
    else if (hasMarkers && fields("osm_id")) Enrichable("osm_id")
    else Skipped
  }

  /** Partition a named-table registry into enrichable (with id column)
    * and skipped — mirrors the two lists built at `OMT:48-74`. */
  def classifyAll(tables: Map[String, DataFrame]): (Map[String, String], Seq[String]) = {
    val classified = tables.map { case (n, df) => (n, classify(df)) }
    val enrichable = classified.collect { case (n, Enrichable(id)) => (n, id) }
    val skipped = classified.collect { case (n, Skipped) => n }.toSeq
    (enrichable, skipped)
  }
}
