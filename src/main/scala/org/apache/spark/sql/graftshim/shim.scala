package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Visibility shim: `ExpressionUtils` (Column ⇄ Expression bridge) and
  * `AbstractDataType` are `private[sql]` in Spark 4; extension libraries
  * conventionally re-export them from an `org.apache.spark.sql`
  * subpackage. Nothing here adds behavior.
  */
package object graftshim {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType

  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** `Dataset.ofRows` is private[sql]: the documented way to wrap a
    * custom LogicalPlan node into a user-facing DataFrame. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `internalCreateDataFrame` is private[sql]: wraps an InternalRow RDD
    * as a LogicalRDD-rooted DataFrame — a logical-plan cut without the
    * extra eager-materialization job `localCheckpoint` runs. */
  def wrapInternalRdd(spark: SparkSession,
                      rdd: org.apache.spark.rdd.RDD[org.apache.spark.sql.catalyst.InternalRow],
                      schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.asInstanceOf[classic.SparkSession].internalCreateDataFrame(rdd, schema)

  /** The InternalRow RDD behind a LogicalRDD-rooted plan — what
    * `Dataset.localCheckpoint` leaves as the root. This is the handle an
    * iterative/two-pass operator needs to `unpersist` its checkpoint
    * blocks deterministically at operator end instead of leaving them to
    * the async ContextCleaner (where they bleed into the next queries'
    * storage readings). None when the root is something else. */
  def checkpointRdd(ds: Dataset[_]): Option[org.apache.spark.rdd.RDD[_]] =
    ds.queryExecution.analyzed match {
      case r: execution.LogicalRDD => Some(r.rdd)
      case _ => None
    }
}
