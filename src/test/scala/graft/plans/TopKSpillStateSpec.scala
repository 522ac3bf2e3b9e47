package graft.plans

import scala.collection.mutable

import org.apache.spark.memory.{GraftMemoryTestBridge, MemoryConsumer, MemoryMode, TaskMemoryManager}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.execution.metric.SQLMetric
import org.apache.spark.sql.types.{DataType, LongType}
import org.scalatest.funsuite.AnyFunSuite

/** Unit pins for [[TopKSpillState]]'s REAL memory-pressure branches — the
  * paths the end-to-end `forceSpillRows` test (PropertySpec) cannot reach
  * because a shared-session JVM has a multi-GB pool that never starves:
  *
  *   - **pool starvation** (ensureRoom's `bytesHeld > granted` after a
  *     failed acquire): a 256 KiB unified pool via GraftMemoryTestBridge
  *     starves the state for real — no valve — and it must degrade to
  *     disk runs and still merge the exact answer.
  *   - **foreign-trigger spill()**: another MemoryConsumer's over-ask on
  *     the same TaskMemoryManager makes Spark call our `spill(size,
  *     trigger)`; the state must drain, report its released grant, and
  *     the foreign acquire must then succeed.
  *   - **emission barrier**: a foreign spill() arriving while the
  *     in-memory branch of `result()` is draining heaps must be a 0-byte
  *     no-op — before r10's barrier it wrote the undrained heaps to a run
  *     nothing reads, silently losing rows.
  *   - **DiskBlockManager routing**: with a live SparkEnv, runs land as
  *     `temp_local_*` files under the block manager's `blockmgr-*` dirs
  *     (Spark's disk-usage accounting), and cleanup() removes them.
  */
class TopKSpillStateSpec extends AnyFunSuite {

  private val keyProj = UnsafeProjection.create(Array[DataType](LongType))
  private val rowProj = UnsafeProjection.create(Array[DataType](LongType, LongType))
  private def keyRow(k: Long): UnsafeRow =
    keyProj(new GenericInternalRow(Array[Any](k))).copy()
  private def dataRow(k: Long, v: Long): UnsafeRow =
    rowProj(new GenericInternalRow(Array[Any](k, v))).copy()
  // better = smaller value (ascending); the PQ dequeues its max = current worst
  private val byValue: Ordering[InternalRow] = Ordering.by[InternalRow, Long](_.getLong(1))

  private def newState(tmm: TaskMemoryManager, k: Int, force: Long = -1L) = {
    val spills = new SQLMetric("sum", 0)
    val bytes = new SQLMetric("size", 0)
    (new TopKSpillState(tmm, k, 2, byValue, force, spills, bytes), spills, bytes)
  }

  private final class ForeignConsumer(tmm: TaskMemoryManager)
      extends MemoryConsumer(tmm, MemoryMode.ON_HEAP) {
    override def spill(size: Long, trigger: MemoryConsumer): Long = 0L
    def grab(n: Long): Long = acquireMemory(n)
    def release(): Unit = freeMemory(getUsed)
  }

  /** brute-force oracle: per key, ascending-value top k with ranks 1..k */
  private def expect(rows: Seq[(Long, Long)], k: Int): Set[(Long, Long, Long)] =
    rows.groupBy(_._1).flatMap { case (key, g) =>
      g.map(_._2).sorted.take(k).zipWithIndex.map { case (v, i) => (key, v, i + 1L) }
    }.toSet

  private def collect(state: TopKSpillState): Set[(Long, Long, Long)] =
    state.result().map { case (r, rank) => (r.getLong(0), r.getLong(1), rank) }.toSet

  test("pool starvation spills to disk runs WITHOUT the force valve and merges exactly") {
    val tmm = GraftMemoryTestBridge.tinyTaskMemoryManager(256L * 1024)
    val (state, spills, bytes) = newState(tmm, k = 2)
    try {
      // 2500 near-unique keys × 2 rows ≈ 0.7 MiB of held state vs a
      // 256 KiB pool: the first acquire drains the pool, the next growth
      // is refused, and ensureRoom must take the degrade-to-disk branch
      val rows = (0 until 5000).map(i => ((i % 2500).toLong, (i * 2654435761L) % 100000))
      rows.foreach { case (k0, v) => state.insert(keyRow(k0), dataRow(k0, v)) }
      assert(spills.value >= 2,
        s"a 256 KiB pool must starve ~0.7 MiB of heap state into repeated spills, saw ${spills.value}")
      assert(bytes.value > 0, "spillBytes metric not recorded")
      assert(collect(state) == expect(rows, 2), "spill-merge diverged from the brute-force oracle")
    } finally { state.cleanup(); tmm.cleanUpAllAllocatedMemory() }
  }

  test("foreign consumer's over-ask triggers our spill and frees the grant") {
    val tmm = GraftMemoryTestBridge.tinyTaskMemoryManager(8L * 1024 * 1024)
    val (state, spills, _) = newState(tmm, k = 2)
    val foreign = new ForeignConsumer(tmm)
    try {
      val rows = (0 until 3000).map(i => (i.toLong, (i * 48271L) % 10000))
      rows.foreach { case (k0, v) => state.insert(keyRow(k0), dataRow(k0, v)) }
      assert(spills.value == 0, "8 MiB pool must not self-starve on ~1 MiB of state")
      // Derive the squeeze from the state's ACTUAL grant (not a hard-coded
      // chunk constant): ask for more than the pool's free remainder, so
      // the TaskMemoryManager must squeeze OTHER consumers — i.e. call
      // state.spill(size, trigger) on the task thread. Getting more than
      // `pool − grant` is only possible if our spill() released the grant.
      val pool = 8L * 1024 * 1024
      val grant = state.getUsed
      assert(grant > 0, "state holds no grant — the squeeze below proves nothing")
      val free = pool - grant
      val got = foreign.grab(free + 2L * 1024 * 1024)
      assert(got > free,
        s"foreign acquire got $got ≤ free remainder $free — our spill() did not release the grant")
      assert(spills.value >= 1, s"foreign trigger must have spilled, saw ${spills.value}")
      // the state keeps working after being drained mid-stream: new
      // inserts build fresh heaps, and the k-way merge folds the disk run
      // and the live map into the exact answer (keys 0..99 span both)
      val more = (3000 until 3500).map(i => (i.toLong % 100, (i * 16807L) % 10000))
      more.foreach { case (k0, v) => state.insert(keyRow(k0), dataRow(k0, v)) }
      assert(collect(state) == expect(rows ++ more, 2), "post-spill merge diverged")
    } finally { foreign.release(); state.cleanup(); tmm.cleanUpAllAllocatedMemory() }
  }

  test("emission barrier: mid-iteration foreign spill() is a 0-byte no-op, no rows lost") {
    val tmm = GraftMemoryTestBridge.tinyTaskMemoryManager(8L * 1024 * 1024)
    val (state, spills, _) = newState(tmm, k = 2)
    val dummy = new ForeignConsumer(tmm)
    try {
      val rows = for (k0 <- 0L until 50L; j <- 0 until 3)
        yield (k0, (k0 * 31 + j * 7) % 100)
      rows.foreach { case (k0, v) => state.insert(keyRow(k0), dataRow(k0, v)) }
      assert(spills.value == 0)
      val it = state.result() // in-memory branch: lazily drains `heaps`
      val first = { val (r, rank) = it.next(); (r.getLong(0), r.getLong(1), rank) }
      // the squeeze arriving mid-emission (e.g. from the downstream
      // shuffle writer) must NOT doSpill the 49 undrained heaps
      assert(state.spill(Long.MaxValue, dummy) == 0L,
        "barrier must refuse to spill while the in-memory iterator is live")
      assert(spills.value == 0, "a run was written mid-emission — those rows are lost")
      val rest = it.map { case (r, rank) => (r.getLong(0), r.getLong(1), rank) }.toSet
      assert(rest + first == expect(rows.toSeq, 2),
        "emission after the refused spill lost or mangled rows")
    } finally { state.cleanup(); tmm.cleanUpAllAllocatedMemory() }
  }

  test("spill runs land under SparkEnv's DiskBlockManager dirs and cleanup removes them") {
    graft.TestSession.spark // live SparkEnv → newSpillFile routes via DiskBlockManager
    def tempLocalFiles(): Set[String] = {
      val out = mutable.Set.empty[String]
      def walk(f: java.io.File): Unit = {
        val fs = f.listFiles()
        if (fs != null) fs.foreach { c =>
          if (c.isDirectory) walk(c)
          else if (c.getName.startsWith("temp_local_")) out += c.getAbsolutePath
        }
      }
      // the REAL configured roots (spark.local.dirs-aware), via the bridge —
      // walking java.io.tmpdir would miss relocated block-manager dirs
      GraftMemoryTestBridge.blockManagerLocalDirs().foreach(walk)
      out.toSet
    }
    val before = tempLocalFiles()
    val tmm = GraftMemoryTestBridge.tinyTaskMemoryManager(8L * 1024 * 1024)
    val (state, spills, _) = newState(tmm, k = 2, force = 100)
    try {
      val rows = (0 until 500).map(i => (i.toLong, (i * 69621L) % 10000))
      rows.foreach { case (k0, v) => state.insert(keyRow(k0), dataRow(k0, v)) }
      assert(spills.value >= 4, s"forceSpillRows=100 over 500 rows must spill repeatedly, saw ${spills.value}")
      val created = tempLocalFiles() -- before
      assert(created.nonEmpty,
        "no temp_local_* run under any blockmgr- dir — spills bypassed the DiskBlockManager")
      assert(collect(state) == expect(rows, 2))
      state.cleanup()
      assert((tempLocalFiles() -- before).isEmpty, "cleanup() left spill runs on disk")
    } finally { state.cleanup(); tmm.cleanUpAllAllocatedMemory() }
  }
}
