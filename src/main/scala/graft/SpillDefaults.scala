package graft

import org.apache.spark.sql.SparkSession

/** Spill-encoding defaults, measured in the round-14 graph-tier decade runs
  * (BASELINE.md): `zstd` shuffle/spill blocks + compressed RDD/checkpoint
  * blocks collapse the iterative Pregel keys' per-round spill from a 60 GB
  * ENOSPC peak to 8.7–17.2 GB at sf100 (~7×, 8–16 bytes/edge — edge-linear,
  * ~9–17 MB/executor on a 1000-executor target). Harness-wide default since
  * round 15: applied by every session builder (Verify/Bench/PlanDump/tests)
  * and mirrored as -D flags in tools/run.sh + build.sbt fork options +
  * Bench's re-exec, so decade sweeps and the driver's own bench inherit it
  * no matter the entry path. RegistrySpec pins the live session values.
  */
object SpillDefaults {
  val configs: Seq[(String, String)] = Seq(
    "spark.io.compression.codec" -> "zstd",
    "spark.rdd.compress"         -> "true",
    "spark.checkpoint.compress"  -> "true")

  def apply(b: SparkSession.Builder): SparkSession.Builder =
    configs.foldLeft(b) { case (bb, (k, v)) => bb.config(k, v) }
}
