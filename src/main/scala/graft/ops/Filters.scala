package graft.ops

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** §2.2 Projections / filters / predicates. All predicates are plain Column
  * expressions so Catalyst pushes them into the parquet scan (PushedFilters)
  * and prunes columns — verified by plan-shape tests in ScanSpec.
  */
object Filters {

  val filterPredSimple = Op(
    "filter_pred_simple",
    (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_quantity") > 30 && col("l_discount").between(0.02, 0.08))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"), col("l_discount"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      FROM lineitem
      WHERE l_quantity > 30 AND l_discount BETWEEN 0.02 AND 0.08
      ORDER BY l_orderkey, l_linenumber
    """)
  )

  val filterPredCompound = Op(
    "filter_pred_compound",
    (s, d) =>
      T.orders(s, d)
        .filter(
          col("o_orderstatus").isin("O", "F") &&
          !(col("o_totalprice") < 50000.0 || col("o_orderpriority") === "1-URGENT"))
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey")),
    Some("""
      SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM orders
      WHERE o_orderstatus IN ('O','F')
        AND NOT (o_totalprice < 50000.0 OR o_orderpriority = '1-URGENT')
      ORDER BY o_orderkey
    """)
  )

  val filterLikeRegex = Op(
    "filter_like_regex",
    (s, d) =>
      T.part(s, d)
        .filter(col("p_type").like("%BRASS%") || col("p_name").rlike("^[ab].*e$"))
        .select(col("p_partkey"), col("p_name"), col("p_type"))
        .orderBy(col("p_partkey")),
    Some("""
      SELECT p_partkey, p_name, p_type
      FROM part
      WHERE p_type LIKE '%BRASS%' OR regexp_matches(p_name, '^[ab].*e$')
      ORDER BY p_partkey
    """)
  )

  /** Computed projection with the TPC-H charge expression. All inputs are
    * exact 2dp, so the 3-factor product is exact at 6dp — DECIMAL(18,6)
    * lands on the grid with no rounding ties (scale 4 would tie-break
    * differently in Spark HALF_UP vs DuckDB half-even).
    */
  val projectExpr = Op(
    "project_expr",
    (s, d) =>
      T.lineitem(s, d)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax")))
            .cast(DecimalType(18, 6)).cast("double").as("charge"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6)) AS DOUBLE) AS charge
      FROM lineitem
      ORDER BY l_orderkey, l_linenumber
    """)
  )

  /** NULL semantics: fixtures are NULL-free, so inject NULLs via nullif and
    * count coalesce/IS NULL outcomes per status group.
    */
  val filterNullSemantics = Op(
    "filter_null_semantics",
    (s, d) =>
      T.orders(s, d)
        .select(
          col("o_orderstatus"),
          nullif(col("o_orderpriority"), lit("1-URGENT")).as("pri_nulled"))
        .groupBy(col("o_orderstatus"))
        .agg(
          count(lit(1)).as("n_rows"),
          count(col("pri_nulled")).as("n_nonnull"),
          sum(when(col("pri_nulled").isNull, 1L).otherwise(0L)).as("n_null"),
          sum(when(coalesce(col("pri_nulled"), lit("1-URGENT")) === "1-URGENT", 1L).otherwise(0L)).as("n_coalesced"))
        .orderBy(col("o_orderstatus")),
    Some("""
      SELECT o_orderstatus,
             COUNT(*) AS n_rows,
             COUNT(NULLIF(o_orderpriority, '1-URGENT')) AS n_nonnull,
             CAST(SUM(CASE WHEN NULLIF(o_orderpriority, '1-URGENT') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
             CAST(SUM(CASE WHEN COALESCE(NULLIF(o_orderpriority, '1-URGENT'), '1-URGENT') = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_coalesced
      FROM orders
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus
    """)
  )

  val ops: Vector[Op] = Vector(
    filterPredSimple, filterPredCompound, filterLikeRegex, projectExpr, filterNullSemantics)
}
