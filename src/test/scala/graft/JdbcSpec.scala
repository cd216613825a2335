package graft

import java.sql.DriverManager
import org.apache.spark.sql.functions._
import graft.sources.Jdbc
import graft.sinks.JdbcUpdateSink
import graft.functions.Zh

/** End-to-end JDBC flow against in-memory Derby — the reference's whole
  * lifecycle (discover → classify → partitioned scan → derive → batched
  * update write-back → idempotent re-run) on a real database. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def seed(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      try st.execute("DROP TABLE osm_features") catch { case _: Exception => }
      st.execute(
        """CREATE TABLE osm_features (
           id BIGINT PRIMARY KEY, name VARCHAR(128),
           hans VARCHAR(128), hant VARCHAR(128))""")
      val ins = conn.prepareStatement("INSERT INTO osm_features VALUES (?, ?, ?, ?)")
      Seq(
        (1L, "北京市", null, null),
        (2L, "Berlin", null, null),
        (3L, "臺北市", null, null),
        (4L, "头发广场", null, null),
        (5L, null, null, null)
      ).foreach { case (id, name, _, _) =>
        ins.setLong(1, id); ins.setString(2, name)
        ins.setString(3, null); ins.setString(4, null)
        ins.addBatch()
      }
      ins.executeBatch()
    } finally conn.close()
  }

  test("discover → partitioned read → derive → batched update → idempotent") {
    seed()
    // S2 discovery
    assert(Jdbc.discoverTables(url).map(_.toLowerCase).contains("osm_features"))

    // S5 partitioned scan (3 partitions over [1, 5])
    val df = Jdbc.readPartitioned(spark, url, "osm_features", "ID", 3)
    assert(df.rdd.getNumPartitions == 3 && df.count() == 5)

    // derive (X3/X5/X6 essence: Han-named rows missing a target)
    def derive(t: org.apache.spark.sql.DataFrame) = t
      .filter(Zh.contains_han(col("NAME")) && (col("HANS").isNull || col("HANT").isNull))
      .select(col("ID"),
        Zh.zh_to_simplified(col("NAME")).as("HANS"),
        Zh.zh_to_traditional(col("NAME")).as("HANT"))
    val updates = derive(df)
    assert(updates.count() == 3) // rows 1, 3, 4

    // S6 batched write-back
    JdbcUpdateSink.applyUpdates(updates, url, "osm_features", "ID", Seq("HANS", "HANT"))

    val after = Jdbc.readPartitioned(spark, url, "osm_features", "ID", 3)
      .orderBy("ID").collect()
    assert(after(0).getString(2) == "北京市") // already simplified
    assert(after(2).getString(2) == "台北市") // simplified form derived
    assert(after(3).getString(3) == "頭髮廣場") // traditional form derived
    assert(after(1).isNullAt(2) && after(4).isNullAt(2)) // untouched

    // idempotence: second pass selects nothing (reference invariant F2)
    assert(derive(Jdbc.readPartitioned(spark, url, "osm_features", "ID", 3)).count() == 0)
  }
}
