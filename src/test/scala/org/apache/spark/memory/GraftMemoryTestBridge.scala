package org.apache.spark.memory

import org.apache.spark.SparkConf

/** Test-only doorway into `private[spark]` memory-manager construction
  * (the GraftBridge technique applied to the test tree): a
  * [[TaskMemoryManager]] over a deliberately tiny on-heap unified pool, so
  * §5 tests can drive TopKSpillState's REAL memory-pressure branches —
  * pool starvation and foreign-consumer spill triggers — instead of only
  * the `forceSpillRows` valve. `spark.testing` zeroes the reserved-memory
  * floor, and fraction 1.0 makes `poolBytes` the exact execution budget.
  */
object GraftMemoryTestBridge {
  /** The live SparkEnv's DiskBlockManager local dirs — the REAL roots under
    * which `temp_local_*` spill runs land. `diskBlockManager`/`localDirs`
    * are `private[spark]`; this bridge lives inside `org.apache.spark`, so
    * tests can enumerate the actual configured dirs instead of guessing
    * `java.io.tmpdir` (spark.local.dirs / SPARK_LOCAL_DIRS may point
    * anywhere). */
  def blockManagerLocalDirs(): Seq[java.io.File] =
    org.apache.spark.SparkEnv.get.blockManager.diskBlockManager.localDirs.toSeq

  def tinyTaskMemoryManager(poolBytes: Long): TaskMemoryManager = {
    val conf = new SparkConf(false)
      .set("spark.testing", "true")
      .set("spark.testing.memory", poolBytes.toString)
      .set("spark.memory.fraction", "1.0")
    new TaskMemoryManager(UnifiedMemoryManager(conf, 1), 0L)
  }
}
