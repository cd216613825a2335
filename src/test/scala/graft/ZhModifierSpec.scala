package graft

import org.apache.spark.sql.functions._
import graft.operators.ZhModifier
import graft.sources.{OsmFixture, Tables}

/** The composed whole-program flow (discover → classify → enrich),
  * mirroring the reference's `main` over a mixed registry. */
class ZhModifierSpec extends SparkSpec {

  test("enrichAll: enriches id- and osm_id-keyed tables, passes others through") {
    val registry = Map(
      "features_id" -> OsmFixture(spark),              // id-keyed
      "features_osm" -> OsmFixture(spark, "osm_id"),   // osm_id-keyed
      "orders" -> Tables(spark, "/root/testdata/sf0.001", "orders")) // no markers

    val (out, enriched, skipped) = ZhModifier.enrichAll(registry)

    assert(enriched == Map("features_id" -> "id", "features_osm" -> "osm_id"))
    assert(skipped == Seq("orders"))
    // untouched table is the same plan
    assert(out("orders") eq registry("orders"))

    // both enrichable tables got the derived keys (row 1: 北京市 from name)
    Seq("features_id" -> "id", "features_osm" -> "osm_id").foreach { case (t, idCol) =>
      val r1 = out(t).filter(col(idCol) === 1L)
        .select(element_at(col("tags"), "name:zh-Hans"),
          element_at(col("tags"), "name:zh-Hant")).collect().head
      assert(r1.getString(0) == "北京市" && r1.getString(1) == "北京市", s"table $t")
    }

    // idempotence of the whole program: a second pass changes nothing
    // (maps projected out — set ops reject MapType columns)
    val (out2, _, _) = ZhModifier.enrichAll(out)
    def flat(df: org.apache.spark.sql.DataFrame, idCol: String) = df.select(
      col(idCol), col("name"),
      element_at(col("tags"), "name:zh-Hans"), element_at(col("tags"), "name:zh-Hant"),
      element_at(col("tags"), "name:zh"), element_at(col("tags"), "amenity"))
    Seq("features_id" -> "id", "features_osm" -> "osm_id").foreach { case (t, idCol) =>
      val (a, b) = (flat(out(t), idCol), flat(out2(t), idCol))
      assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        s"second pass modified $t")
    }
  }
}
