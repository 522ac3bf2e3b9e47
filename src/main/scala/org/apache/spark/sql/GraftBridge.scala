package org.apache.spark.sql

import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The `private[sql]` doorways graft needs, living in this package — the
  * same technique every Spark-extension library uses; nothing else internal
  * is touched, and the object contains no logic of its own.
  *
  *  - [[ofRows]]: constructing a DataFrame from a hand-built
  *    [[LogicalPlan]] (for the custom TopKPerKey operator —
  *    graft/plans/TopKPerKey.scala). `Dataset.ofRows` is package-private.
  *  - [[unpersistCheckpoint]]: freeing the blocks of a
  *    `localCheckpoint`ed Dataset. `Dataset.unpersist` only consults the
  *    CacheManager, which never learns about checkpoint RDDs, so calling
  *    it on a checkpointed frame is a silent no-op (verified on 4.1:
  *    `getPersistentRDDs` unchanged after `unpersist(true)` AND after
  *    `catalog.clearCache()`). Iterative ops (CC label propagation,
  *    PageRank, BFS) checkpoint per round and MUST free the superseded
  *    round, or a D-round run holds D copies of its state — the actual
  *    handle is the RDD inside the checkpoint's LogicalRDD leaf.
  */
object GraftBridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** `TaskContext.taskMemoryManager` is `private[spark]`; the spillable
    * TopKPerKey state (graft/plans/TopKPerKey.scala) needs it to register
    * as a [[org.apache.spark.memory.MemoryConsumer]] so its heap state
    * participates in the unified execution-memory pool (acquire on growth,
    * spill on starvation) exactly like ExternalAppendOnlyMap. */
  def taskMemoryManager(tc: org.apache.spark.TaskContext): org.apache.spark.memory.TaskMemoryManager =
    tc.taskMemoryManager()

  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.asInstanceOf[classic.Dataset[_]].queryExecution.analyzed match {
      case lr: execution.LogicalRDD => lr.rdd.unpersist(false)
      case _                        => () // not a checkpointed frame: nothing to free
    }
}
