package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Determinism helpers — SURVEY.md Appendix A.
  *
  * Rationale: the driver hash-compares Spark parquet output against DuckDB.
  * Double addition is order-dependent under shuffle; decimal addition is not.
  * So every summed metric is cast to DECIMAL(18,4) BEFORE the aggregate (in
  * both engines), and the aggregate result is cast back to DOUBLE so both
  * engines emit the identical IEEE754 value regardless of the differing
  * decimal output precisions (Spark sum → DECIMAL(28,4), DuckDB → (38,4)).
  */
object Det {
  /** Cast to DECIMAL(18,4) pre-aggregation (order-independent addition). */
  def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  /** Decimal-safe sum emitted as double: sum(dec(c)) :: double. The oracle
    * twin is written literally in each op's SQL —
    * CAST(SUM(CAST(x AS DECIMAL(18,4))) AS DOUBLE) — kept inline so the
    * strings stay greppable and independently runnable.
    */
  def sumDec(c: Column): Column = sum(dec(c)).cast("double")
}

/** Pass-1 + pass-2 metadata of the two-pass distributed global rank, shared
  * by win_rank_distributed and agg_exact_median_distributed so the subtle
  * boundary-pinning fix lives in exactly one place: range-partition on the
  * sort key, stamp spark_partition_id, count per partition (P tiny rows to
  * the driver — never data-sized), and derive cumulative offsets.
  * RangePartitioner guarantees every key in partition i sorts before every
  * key in partition j>i, so a partition-local row_number plus the offset IS
  * the global rank.
  */
object TwoPassRank {
  /** parts: the pinned, pid-stamped range partitioning;
    * meta: (pid, rows-before-pid, rows-in-pid) sorted by pid; n: total rows.
    */
  final case class Staged(parts: DataFrame, meta: Seq[(Int, Long, Long)], n: Long)

  def stage(df: DataFrame, nParts: Int, keys: Seq[Column]): Staged = {
    // localCheckpoint pins ONE materialized range partitioning for both
    // passes. Without it, the counts action and the final plan would each
    // re-execute repartitionByRange, and RangePartitioner's sample seed
    // varies with the RDD id — the two executions can draw different
    // boundaries (observed at sf0.1: offsets off by 61 rows), silently
    // corrupting global ranks. At cluster scale this materialization is
    // the staged sort table the two-pass algorithm persists anyway.
    val parts = df.repartitionByRange(nParts, keys: _*)
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(true)
    val counts = parts.groupBy(col("pid")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1).toSeq
    val offs = counts.map(_._2).scanLeft(0L)(_ + _)
    Staged(
      parts,
      counts.zip(offs).map { case ((pid, cnt), off) => (pid, off, cnt) },
      counts.map(_._2).sum)
  }
}
