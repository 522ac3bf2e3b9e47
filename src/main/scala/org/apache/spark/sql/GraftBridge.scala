package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one `private[sql]` doorway graft needs: constructing a DataFrame
  * from a hand-built [[LogicalPlan]] (for the custom TopKPerKey operator —
  * graft/plans/TopKPerKey.scala). `Dataset.ofRows` is package-private to
  * org.apache.spark.sql, so this bridge lives in that package — the same
  * technique every Spark-extension library uses to expose a plan
  * constructor; nothing else internal is touched, and the object contains
  * no logic of its own.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)
}
