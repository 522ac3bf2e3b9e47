package graft.ops

import org.apache.spark.sql.Column
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
