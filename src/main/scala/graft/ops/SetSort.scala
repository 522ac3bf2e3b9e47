package graft.ops

import org.apache.spark.sql.functions._

/** §2.6 Sorts / limits / top-k / set operations. Top-k uses orderBy.limit so
  * Spark plans TakeOrderedAndProject (per-partition heap + driver merge of k
  * rows — never a global sort). Set ops on narrow projections shuffle only
  * the key columns.
  */
object SetSort {

  /** Multi-key global sort with injected NULLs and explicit null ordering. */
  val sortMultikeyNulls = Op(
    "sort_multikey_nulls",
    (s, d) =>
      T.customer(s, d)
        .select(
          col("c_custkey"), col("c_nationkey"), col("c_name"),
          when(col("c_acctbal") < 0, lit(null)).otherwise(col("c_acctbal")).as("bal"))
        .orderBy(
          col("c_nationkey").desc,
          col("bal").asc_nulls_first,
          col("c_name"),
          col("c_custkey")),
    Some("""
      SELECT c_custkey, c_nationkey, c_name,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal
      FROM customer
      ORDER BY c_nationkey DESC, bal ASC NULLS FIRST, c_name, c_custkey
    """)
  )

  /** Top-50 by price → TakeOrderedAndProject (asserted in plan-shape spec). */
  val sortTopkLimit = Op(
    "sort_topk_limit",
    (s, d) =>
      T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
        .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
        .limit(50),
    Some("""
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 50
    """)
  )

  val setUnionAll = Op(
    "set_union_all",
    (s, d) => {
      val e = T.events(s, d)
      val a = e.filter(col("event_type") === "signup")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      val b = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("event_type"), col("value"))
      a.unionByName(b).orderBy(col("event_id"))
    },
    Some("""
      SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'signup'
      UNION ALL
      SELECT event_id, user_id, event_type, value FROM events WHERE event_type = 'purchase'
      ORDER BY event_id
    """)
  )

  val setUnionDistinct = Op(
    "set_union_distinct",
    (s, d) =>
      T.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .union(T.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .distinct()
        .orderBy(col("nationkey")),
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      UNION
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey
    """)
  )

  val setIntersect = Op(
    "set_intersect",
    (s, d) =>
      T.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersect(T.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey")),
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey
    """)
  )

  val setExcept = Op(
    "set_except",
    (s, d) =>
      T.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .except(T.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .orderBy(col("nationkey")),
    Some("""
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
      ORDER BY nationkey
    """)
  )

  /** Multiset intersection: keeps min(countA, countB) copies per value
    * (vs set_intersect's distinct). Emitted as per-key multiplicities so
    * the output is total-ordered.
    */
  val setIntersectAll = Op(
    "set_intersect_all",
    (s, d) =>
      T.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .intersectAll(T.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_copies"))
        .orderBy(col("nationkey")),
    Some("""
      SELECT nationkey, COUNT(*) AS n_copies FROM (
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT ALL
        SELECT s_nationkey FROM supplier)
      GROUP BY nationkey ORDER BY nationkey
    """)
  )

  /** Multiset difference: keeps max(countA - countB, 0) copies per value. */
  val setExceptAll = Op(
    "set_except_all",
    (s, d) =>
      T.customer(s, d).select(col("c_nationkey").as("nationkey"))
        .exceptAll(T.supplier(s, d).select(col("s_nationkey").as("nationkey")))
        .groupBy(col("nationkey"))
        .agg(count(lit(1)).as("n_copies"))
        .orderBy(col("nationkey")),
    Some("""
      SELECT nationkey, COUNT(*) AS n_copies FROM (
        SELECT c_nationkey AS nationkey FROM customer
        EXCEPT ALL
        SELECT s_nationkey FROM supplier)
      GROUP BY nationkey ORDER BY nationkey
    """)
  )

  /** Wide→long reshape (melt): the inverse of txt_lang_dist_pivot's pivot.
    * Spark's native unpivot keeps this a zero-shuffle narrow transform
    * (each row expands locally) — the Expand operator, no exchange.
    *
    * Oracle uses UNION ALL rather than DuckDB's UNPIVOT: DuckDB UNPIVOT
    * drops NULL values while Spark's unpivot retains them — identical on
    * these non-null columns, but the UNION ALL form can never diverge.
    */
  val reshapeUnpivot = Op(
    "reshape_unpivot",
    (s, d) =>
      T.supplier(s, d)
        .select(col("s_suppkey"),
          col("s_acctbal").cast("double").as("acctbal"),
          col("s_nationkey").cast("double").as("nationkey"))
        .unpivot(Array(col("s_suppkey")), Array(col("acctbal"), col("nationkey")),
          "metric", "value")
        .orderBy(col("s_suppkey"), col("metric")),
    Some("""
      SELECT s_suppkey, 'acctbal' AS metric, CAST(s_acctbal AS DOUBLE) AS value
      FROM supplier
      UNION ALL
      SELECT s_suppkey, 'nationkey', CAST(s_nationkey AS DOUBLE) FROM supplier
      ORDER BY s_suppkey, metric
    """)
  )

  /** 2-D skyline (Pareto frontier, Börzsönyi et al. 2001): parts not
    * dominated on (minimize price, maximize size) — dominance = another
    * part with price <= AND size >=, one strictly better. The sort-based
    * formulation, not the quadratic NOT-EXISTS: (1) per-price max size — a
    * distributed groupBy on price; (2) STRICT-prefix running max over the
    * per-price aggregates ordered by price (|distinct prices| rows — the
    * only non-distributed step, tiny by construction; the fully
    * distributed form range-partitions it with the TwoPassRank
    * prefix-offset kernel); (3) join back: survive iff no strictly-cheaper
    * price reached your size AND no same-price part strictly exceeds it.
    * Equal (price, size) pairs don't dominate each other and both stay —
    * the standard skyline tie rule.
    */
  val aggSkylinePareto = Op(
    "agg_skyline_pareto",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val p = T.part(s, d)
        .select(col("p_partkey"), col("p_retailprice").as("price"),
          col("p_size").as("size"))
      val perPrice = p.groupBy(col("price")).agg(max(col("size")).as("gmax"))
      val wPrefix = Window.orderBy(col("price"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val pref = perPrice.withColumn("strict_max", max(col("gmax")).over(wPrefix))
      p.join(pref, Seq("price"))
        .filter(
          (col("strict_max").isNull || col("strict_max") < col("size")) &&
          col("gmax") === col("size"))
        .select(col("p_partkey"), col("price"), col("size"))
        .orderBy(col("p_partkey"))
    },
    Some("""
      WITH p AS (SELECT p_partkey, p_retailprice AS price, p_size AS size FROM part),
      per_price AS (SELECT price, MAX(size) AS gmax FROM p GROUP BY price),
      pref AS (
        SELECT price, gmax,
               MAX(gmax) OVER (ORDER BY price
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS strict_max
        FROM per_price)
      SELECT p_partkey, price, size
      FROM p JOIN pref USING (price)
      WHERE (strict_max IS NULL OR strict_max < size) AND gmax = size
      ORDER BY p_partkey
    """)
  )

  val ops: Vector[Op] = Vector(
    sortMultikeyNulls, sortTopkLimit, setUnionAll, setUnionDistinct,
    setIntersect, setExcept, setIntersectAll, setExceptAll, reshapeUnpivot,
    aggSkylinePareto)
}
