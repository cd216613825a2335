package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** Deterministic reference-shaped fixture (FIXTURES.md §A): the table
  * shape the reference discovers and mutates (`OMTZHModifier.java:48-74`)
  * — testdata has no map column, so this is generated in-code. One row
  * per branch of `processRecord` (`OMT:196-245`). */
object OsmFixture {
  def apply(spark: SparkSession, idName: String = "id"): DataFrame = {
    val schema = StructType(Seq(
      StructField(idName, LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("tags", MapType(StringType, StringType, valueContainsNull = true), nullable = true),
      StructField("geometry", StringType, nullable = true)))
    val rows = Seq(
      Row(1L, "北京市", Map.empty[String, String], "g1"),
      Row(2L, "Springfield", Map.empty[String, String], "g2"),
      Row(3L, "成田 Airport", Map.empty[String, String], "g3"),
      Row(4L, null, Map("name:zh" -> "萬國碼"), "g4"),
      Row(5L, null, Map.empty[String, String], "g5"),
      Row(6L, "", Map.empty[String, String], "g6"),
      Row(7L, "头发", Map("name:zh-Hans" -> "头发"), "g7"),
      Row(8L, "頭髮", Map("name:zh-Hant" -> "頭髮"), "g8"),
      Row(9L, "東京", Map("name:zh-Hans" -> "东京", "name:zh-Hant" -> "東京"), "g9"),
      Row(10L, "上海", Map("name:zh-Hans" -> ""), "g10"),
      Row(11L, "广州", Map("amenity" -> "cafe"), "g11"))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
  }
}
