package graft.sources

import java.sql.DriverManager
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** JDBC source surface — the reference's native habitat, Spark-first.
  *
  * The reference opens one connection and hand-chunks scans with
  * `BETWEEN` ranges driven by `max(id)` (`OMTZHModifier.java:107-146`);
  * here the same access path is a partitioned JDBC read whose bounds
  * come from one min/max query — which also fixes the reference's two
  * scan holes (negative ids never scanned; `id == maxID` dropped when
  * the chunk size divides it exactly, `OMT:130`).
  */
object Jdbc {

  /** S2 catalog scan: list user tables via DatabaseMetaData — the exact
    * discovery call the reference makes (`OMT:36-43`). */
  def discoverTables(url: String): Seq[String] = {
    val conn = DriverManager.getConnection(url)
    try {
      val rs = conn.getMetaData.getTables(null, null, "%", Array("TABLE"))
      val out = Seq.newBuilder[String]
      while (rs.next()) out += rs.getString("TABLE_NAME")
      out.result()
    } finally conn.close()
  }

  /** S5 partitioned range scan: numPartitions parallel readers over
    * [min(id), max(id)] — no holes, no driver-side chunk loop. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
                      idCol: String, numPartitions: Int = 4): DataFrame = {
    val bounds = spark.read.format("jdbc")
      .option("url", url)
      .option("query", s"SELECT MIN($idCol) AS lo, MAX($idCol) AS hi FROM $table")
      .load().first()
    if (bounds.isNullAt(0)) // empty table: plain (single-partition) read
      spark.read.format("jdbc").option("url", url).option("dbtable", table).load()
    else spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", idCol)
      // MIN/MAX come back as whatever integral/decimal type the dialect
      // maps — go through Number, not getLong
      .option("lowerBound", bounds.getAs[Number](0).longValue)
      .option("upperBound", bounds.getAs[Number](1).longValue + 1) // exclusive
      .option("numPartitions", numPartitions)
      .load()
  }
}
