package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** One-method bridge to `classic.Dataset.ofRows` (a `private[sql]`
  * constructor every Spark extension that executes analyzed plans from
  * a command needs — the same package-shim pattern the public Delta and
  * Iceberg connectors use). Used by [[graft.plans.TxLogDml]] to run the
  * MERGE source plan the analyzer already resolved. */
object GraftSqlShims {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
