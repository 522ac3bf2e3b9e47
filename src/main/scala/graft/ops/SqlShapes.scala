package graft.ops

import org.apache.spark.sql.functions._

/** §2.19 Composite SQL flagships, second tier (r3c) — the remaining distinct
  * TPC-H query TOPOLOGIES the first-tier flagships (Q1/Q3/Q5/Q10/Q18 shapes,
  * ops/Joins.scala, ops/Aggs.scala) don't cover, each adapted faithfully to
  * the fixture schema (FIXTURES.md: no partsupp/comment/phone/commitdate
  * columns — the predicate columns change, the join/subquery topology does
  * not). What each adds:
  *   - Q13: outer-join-then-histogram (aggregate OF an aggregate, zero
  *     groups preserved through the outer join).
  *   - Q17: correlated scalar aggregate subquery decorrelated into a
  *     self-grouped broadcast join on the fact's own dimension key.
  *   - Q19: OR-of-ANDs disjunctive predicate — the pushdown stress shape.
  *   - Q21: double-correlated EXISTS / NOT-EXISTS on the same fact —
  *     compound-condition semi- then anti-join.
  *   - Q22: global scalar aggregate gating an anti-joined aggregate.
  * All money/quantity sums route through DECIMAL(18,4) (SURVEY Appendix A);
  * all date arithmetic is whole-day on midnight timestamps (exact in both
  * engines).
  */
object SqlShapes {

  /** TPC-H Q13 shape (customer order-count distribution): LEFT OUTER join
    * customers→orders with a predicate ON THE OUTER SIDE (non-urgent orders
    * only — the fixture's stand-in for Q13's NOT LIKE comment filter), count
    * per customer INCLUDING the zero-order customers the outer join
    * preserves, then aggregate the aggregate: how many customers have k
    * orders. Scale shape: the per-customer count shuffles on c_custkey
    * (the fact's FK, map-side combinable after the join); the histogram's
    * second agg has at most ~hundreds of distinct k — it collapses to a
    * near-driver-size frame regardless of input scale. The outer-side
    * predicate lives in the join condition (not a WHERE), which is exactly
    * what keeps zero-order customers in the result — pushing it to a
    * post-join filter would silently drop them.
    */
  val sqlQ13CustDistribution = Op(
    "sql_q13_cust_distribution",
    (s, d) => {
      val ord = T.orders(s, d)
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .select(col("o_custkey"), col("o_orderkey"))
      T.customer(s, d).select(col("c_custkey"))
        .join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""
      SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
      FROM (
        SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
        FROM customer LEFT OUTER JOIN orders
          ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        GROUP BY c_custkey) c_orders
      GROUP BY c_count
      ORDER BY custdist DESC, c_count DESC
    """)
  )

  /** TPC-H Q17 shape (small-quantity-order revenue): the correlated scalar
    * subquery `l_quantity < 0.2 * (SELECT AVG(l_quantity) ... same part)`
    * decorrelated the way Catalyst (and every planner) wants it: pre-group
    * lineitem by partkey into a per-part threshold table, join it back on
    * the SAME key, filter, sum. The brand filter is pushed BELOW the
    * threshold aggregate: a part's average quantity is a function of that
    * part's rows alone, so semi-joining the fact to the ~1/25 brand part
    * set FIRST is lossless — and it turns "aggregate all of lineitem
    * across all ~20k parts, then discard 24/25 of the result" into one
    * broadcast-pruned scan feeding BOTH the threshold aggregate and the
    * probe side (at 100 TB the difference is a full wasted fact shuffle).
    * The per-part average routes its sum through DECIMAL and divides by
    * the count as a double — bit-identical in both engines — and the
    * final weekly-revenue scalar divides a decimal-exact sum by 7.0.
    */
  val sqlQ17SmallQtyAvg = Op(
    "sql_q17_small_qty_avg",
    (s, d) => {
      val brandParts = T.part(s, d)
        .filter(col("p_brand") === "Brand#23")
        .select(col("p_partkey"))
      val li = T.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
        .join(broadcast(brandParts), col("l_partkey") === col("p_partkey"), "left_semi")
      val thresholds = li.groupBy(col("l_partkey"))
        .agg((sum(Det.dec(col("l_quantity"))).cast("double") / count(lit(1)) / lit(5))
          .as("qty_cut"))
      li.join(thresholds, Seq("l_partkey"))
        .filter(col("l_quantity") < col("qty_cut"))
        .agg((sum(Det.dec(col("l_extendedprice"))).cast("double") / lit(7.0))
          .as("avg_weekly"))
    },
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) / 7.0 AS avg_weekly
      FROM lineitem
      JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#23'
      JOIN (
        SELECT l_partkey AS t_partkey,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) / 5 AS qty_cut
        FROM lineitem
        JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#23'
        GROUP BY l_partkey) t
        ON t_partkey = l_partkey
      WHERE l_quantity < qty_cut
    """)
  )

  /** TPC-H Q19 shape (disjunctive predicate revenue): three (brand ∧
    * size-range ∧ quantity-range) conjunctions OR'd together across the
    * lineitem⋈part join — the canonical pushdown stress test, because the
    * naive plan evaluates the whole disjunction after the join while the
    * right plan pushes the part-only disjuncts (brand ∨ brand ∨ brand) and
    * the lineitem-only disjuncts (qty ranges) below the join as derived
    * range filters. Declaring it as one boolean expression lets Catalyst's
    * constraint propagation do exactly that (CNF conversion extracts the
    * common l_quantity <= 36 and the brand IN set). Revenue decimal-routed.
    */
  val sqlQ19DisjunctivePushdown = Op(
    "sql_q19_disjunctive_pushdown",
    (s, d) => {
      val li = T.lineitem(s, d)
        .select(col("l_partkey"), col("l_quantity"),
          Det.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val pt = T.part(s, d).select(col("p_partkey"), col("p_brand"), col("p_size"))
      val clause =
        (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 10) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#34" && col("p_size").between(1, 15) &&
          col("l_quantity").between(20, 36))
      li.join(pt, col("l_partkey") === col("p_partkey"))
        .filter(clause)
        .agg(sum(col("rev")).cast("double").as("revenue"))
    },
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN part ON p_partkey = l_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 36)
    """)
  )

  /** TPC-H Q21 shape (suppliers who kept orders waiting): the hardest
    * subquery topology in TPC-H — for each late lineitem, EXISTS another
    * supplier's lineitem in the same order AND NOT EXISTS another
    * supplier's LATE lineitem in the same order ("this supplier was the
    * only one late on a multi-supplier order"). The fixture has no
    * commitdate, so "late" is l_shipdate > o_orderdate + 60 days — the
    * predicate changes, the double-correlated-EXISTS topology does not.
    * Spark shape (r18 rewrite, guide §2.4 — the published TPC-H Q21
    * decorrelation): both correlated subqueries collapse into ONE
    * (orderkey, suppkey) aggregate over the joined fact. Per order-supplier
    * pair count the late line items; per order count suppliers and late
    * suppliers; a late line item qualifies iff its order has ≥2 suppliers
    * (the EXISTS) and exactly 1 late supplier (the NOT EXISTS — the row
    * itself is late, so "no OTHER supplier late" ⟺ late-supplier count is
    * 1). numwait = Σ n_late_rows over qualifying pairs — identical to
    * COUNT(*) of qualifying late line items (oracle-attested). This
    * replaces the old left-semi + left-anti pair, whose probe sides
    * re-shuffled line-item-volume rows, with map-side-combined aggregates
    * whose shuffled volume is distinct (order, supplier) pairs (r18 A/B,
    * isolated min-of-3 at sf0.1: 1.74 s → 1.51 s, on a ~1.1 s single-key
    * JVM floor; plan: 1 semi + 1 anti join → 0, one small extra exchange
    * over the pair aggregate). Supplier names ride a broadcast; top-20 is
    * TakeOrderedAndProject.
    */
  val sqlQ21WaitingSuppliers = Op(
    "sql_q21_waiting_suppliers",
    (s, d) => {
      val ord = T.orders(s, d)
        .filter(col("o_orderstatus") === "F")
        .select(col("o_orderkey"), col("o_orderdate"))
      val li = T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      val withLate = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .withColumn("is_late",
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      // one (orderkey, suppkey) rollup carries everything both correlated
      // subqueries asked: n_late_rows per pair, then per order the
      // supplier count (EXISTS other supplier ⟺ n_supp >= 2) and the late-
      // supplier count (NOT EXISTS other late ⟺ n_late_supp == 1, since
      // the qualifying row is itself late)
      val grp = withLate
        .groupBy(col("l_orderkey"), col("l_suppkey"))
        .agg(sum(when(col("is_late"), 1L).otherwise(0L)).as("n_late_rows"))
      val perOrder = grp.groupBy(col("l_orderkey"))
        .agg(count(lit(1)).as("n_supp"),
          sum(when(col("n_late_rows") > 0, 1L).otherwise(0L)).as("n_late_supp"))
      // NO shuffle_hash hint (r19 A/B: 1.40 -> 1.53-2.71 s): the hint
      // pins the strategy and blocks AQE's runtime broadcast of the
      // vertex-sized perOrder side, which is what actually fires here
      val waiting = grp.join(perOrder, "l_orderkey")
        .filter(col("n_late_rows") > 0 &&
          col("n_supp") >= 2 && col("n_late_supp") === 1)
      waiting
        .join(broadcast(T.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_name"))
        .agg(sum(col("n_late_rows")).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
        .limit(20)
    },
    Some("""
      SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      FROM lineitem l1
      JOIN orders   ON o_orderkey = l1.l_orderkey AND o_orderstatus = 'F'
      JOIN supplier ON s_suppkey = l1.l_suppkey
      WHERE l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          JOIN orders o3 ON o3.o_orderkey = l3.l_orderkey
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 20
    """)
  )

  /** TPC-H Q22 shape (global-average-gated anti-join): customers in three
    * market segments whose balance beats the GLOBAL average positive
    * balance of those segments, and who have placed no URGENT orders —
    * count and total balance per segment. (The fixture has no phone column
    * and every customer has at least one order, so the country-prefix
    * IN-list becomes a mktsegment IN-list and the NOT-EXISTS side gains a
    * priority predicate — same shape: an uncorrelated scalar subquery
    * feeding a filter, then NOT EXISTS — but with survivors.)
    * Scale shape: the scalar average is one map-side-combined agg
    * cross-joined as a broadcast literal (never a driver collect); the
    * NOT EXISTS is a left-anti shuffle on custkey; balances decimal-route.
    */
  val sqlQ22GlobalAcctbal = Op(
    "sql_q22_global_acctbal",
    (s, d) => {
      val segs = Seq("AUTOMOBILE", "BUILDING", "MACHINERY")
      val cust = T.customer(s, d)
        .filter(col("c_mktsegment").isin(segs: _*))
        .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      val avgBal = cust.filter(col("c_acctbal") > 0.0)
        .agg((sum(Det.dec(col("c_acctbal"))).cast("double") / count(lit(1)))
          .as("avg_bal"))
      cust.join(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(T.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("numcust"),
          sum(Det.dec(col("c_acctbal"))).cast("double").as("totacctbal"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""
      SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS numcust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
      FROM customer
      WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
        AND c_acctbal > (
          SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
          FROM customer
          WHERE c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')
            AND c_acctbal > 0.0)
        AND NOT EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      GROUP BY c_mktsegment
      ORDER BY c_mktsegment
    """)
  )

  /** TPC-H Q7 shape (volume shipping): the TWO-ROLE dimension join — the
    * same nation table joined under two roles (supplier's nation via
    * lineitem, customer's nation via orders→customer), revenue bucketed by
    * (supp_nation, cust_nation, ship year) for the chosen nation pair in
    * both directions. The topology every analyst hits constantly: one
    * dimension, two join paths, distinguished only by alias. Scale shape:
    * the single fact-fact shuffle is lineitem⋈orders on l_orderkey; BOTH
    * nation roles ride broadcasts (nation→supplier composes into a
    * broadcast onto lineitem; nation→customer composes into a broadcast
    * onto orders — customer is 1/10 of orders and the nation filter cuts
    * it ~12x further), so adding the second role adds ZERO shuffles. The
    * ship-date range and the two-nation IN filters are pushed into the
    * scans; same-nation pairs drop before the fact join, not after.
    * Revenue decimal-routed; year as BIGINT in both engines.
    */
  val sqlQ7VolumeShipping = Op(
    "sql_q7_volume_shipping",
    (s, d) => {
      val pair = Seq("NATION_1", "NATION_2")
      val n1 = T.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
      val n2 = T.nation(s, d).filter(col("n_name").isin(pair: _*))
        .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
      val sup = T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
        .select(col("s_suppkey"), col("supp_nation"))
      val cust = T.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
        .select(col("c_custkey"), col("cust_nation"))
      val ord = T.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("cust_nation"))
      T.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1998-01-01")
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).cast("long").as("l_year"),
          Det.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
        .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .filter(col("supp_nation") =!= col("cust_nation"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(col("volume")).cast("double").as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS BIGINT) AS l_year,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN orders   ON o_orderkey = l_orderkey
      JOIN customer ON c_custkey = o_custkey
      JOIN supplier ON s_suppkey = l_suppkey
      JOIN nation n1 ON n1.n_nationkey = s_nationkey
      JOIN nation n2 ON n2.n_nationkey = c_nationkey
      WHERE n1.n_name IN ('NATION_1', 'NATION_2')
        AND n2.n_name IN ('NATION_1', 'NATION_2')
        AND n1.n_name <> n2.n_name
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year
    """)
  )

  /** TPC-H Q15 shape (top supplier): an aggregate-as-view (per-supplier
    * quarterly revenue) gated by the view's own global MAX — the last
    * distinct aggregate topology (agg view consumed twice: once as rows,
    * once reduced to a scalar). The revenue comparison happens in DECIMAL
    * on both sides — comparing re-derived DOUBLEs for equality is exactly
    * the cross-engine trap the decimal routing exists to avoid; only the
    * reported column casts to double at the end. Scale shape: revenue is
    * ONE map-side-combined shuffle on l_suppkey over the date-pruned fact;
    * the max is a 1-row broadcast gate over the TINY agg view (never the
    * fact, never a driver collect), and supplier names ride a broadcast.
    */
  val sqlQ15TopSupplier = Op(
    "sql_q15_top_supplier",
    (s, d) => {
      val rev = T.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1996-04-01")
        .groupBy(col("l_suppkey"))
        .agg(sum(Det.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("tr"))
      val maxRev = rev.agg(max(col("tr")).as("max_tr"))
      rev.join(broadcast(maxRev), col("tr") === col("max_tr"))
        .join(broadcast(T.supplier(s, d).select(col("s_suppkey"), col("s_name"))),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("tr").cast("double").as("total_revenue"))
        .orderBy(col("s_suppkey"))
    },
    Some("""
      WITH revenue AS (
        SELECT l_suppkey,
               SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS tr
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate <  TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, CAST(tr AS DOUBLE) AS total_revenue
      FROM revenue JOIN supplier ON s_suppkey = l_suppkey
      WHERE tr = (SELECT MAX(tr) FROM revenue)
      ORDER BY s_suppkey
    """)
  )

  /** TPC-H Q6 shape (forecast revenue change): the pure scan-side query —
    * every predicate (date range, discount band, quantity cap) lands in
    * `PushedFilters` on the parquet scan, two columns read, one global
    * decimal agg out. The point at 100 TB: ZERO shuffle rows beyond the
    * 32 partial-agg rows; the plan is a single WholeStageCodegen span over
    * the pruned scan. The bench's floor — if this query is slow the scan
    * path itself is misconfigured. Double literals (0.05/0.07/24) compare
    * against the fixture's raw doubles with identical IEEE semantics in
    * both engines; only the revenue SUM routes through DECIMAL(18,4).
    */
  val sqlQ6ForecastRevenue = Op(
    "sql_q6_forecast_revenue",
    (s, d) => {
      T.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-01-01" && col("l_shipdate") < "1997-01-01"
          && col("l_discount") >= 0.05 && col("l_discount") <= 0.07
          && col("l_quantity") < 24.0)
        .agg(sum(Det.dec(col("l_extendedprice") * col("l_discount")))
          .cast("double").as("revenue"))
    },
    Some("""
      SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1997-01-01'
        AND l_discount >= 0.05 AND l_discount <= 0.07
        AND l_quantity < 24.0
    """)
  )

  /** TPC-H Q4 shape (order priority checking): correlated EXISTS whose
    * predicate crosses the correlation — a lineitem later than ITS order's
    * date + 60 days (the fixture's lateness stand-in for commit<receipt,
    * same adaptation as Q21) — counted per priority bucket. Topology: a
    * left-semi join whose condition mixes both sides' columns, so it
    * cannot collapse to a bloom/IN filter. Scale shape: the quarter filter
    * prunes the orders scan; the semi-join shuffles on the orderkey both
    * facts already carry; and the correlation bound is DERIVED onto the
    * lineitem scan — any qualifying lineitem has l_shipdate > quarter_start
    * + 60d, so that bound is pushed as a plain scan predicate (lossless,
    * ~20x fewer probe rows at any scale; the oracle's pure-EXISTS form
    * proves losslessness by hash equality).
    */
  val sqlQ4PriorityExists = Op(
    "sql_q4_priority_exists",
    (s, d) => {
      val ord = T.orders(s, d)
        .filter(col("o_orderdate") >= "1996-07-01" && col("o_orderdate") < "1996-10-01")
        .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = T.lineitem(s, d)
        .filter(col("l_shipdate") > lit("1996-07-01").cast("timestamp")
          + expr("INTERVAL 60 DAYS"))
        .select(col("l_orderkey"), col("l_shipdate"))
      ord.join(li,
          col("o_orderkey") === col("l_orderkey")
            && col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-07-01'
        AND o_orderdate <  TIMESTAMP '1996-10-01'
        AND EXISTS (
          SELECT 1 FROM lineitem
          WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority
    """)
  )

  /** TPC-H Q14 shape (promotion effect): conditional-aggregate ratio — the
    * promo share of one month's revenue, where numerator and denominator
    * come out of the SAME single pass (a CASE inside the sum, not two
    * scans). Scale shape: month filter pushed to the fact scan, the 2k-row
    * part dim broadcast, one global agg; the ratio divides the two DECIMAL
    * sums only after casting each to double (both engines then do the one
    * identical IEEE division) and rounds half-up via floor(x*1e6+0.5)
    * (round() would be half-even vs half-up across engines).
    */
  val sqlQ14PromoRevenue = Op(
    "sql_q14_promo_revenue",
    (s, d) => {
      val li = T.lineitem(s, d)
        .filter(col("l_shipdate") >= "1996-09-01" && col("l_shipdate") < "1996-10-01")
        .select(col("l_partkey"),
          Det.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      li.join(broadcast(T.part(s, d).select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(
          sum(when(col("p_type") === "PROMO", col("rev"))
            .otherwise(Det.dec(lit(0.0)))).cast("double").as("promo_revenue"),
          sum(col("rev")).cast("double").as("total_revenue"))
        .select(col("promo_revenue"), col("total_revenue"),
          (floor(lit(100.0) * col("promo_revenue") / col("total_revenue") * 1e6
            + 0.5) / 1e6).as("promo_pct"))
    },
    Some("""
      WITH j AS (
        SELECT CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS rev,
               p_type
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-09-01'
          AND l_shipdate <  TIMESTAMP '1996-10-01'),
      sums AS (
        SELECT CAST(SUM(CASE WHEN p_type = 'PROMO' THEN rev
                             ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE) AS promo_revenue,
               CAST(SUM(rev) AS DOUBLE) AS total_revenue
        FROM j)
      SELECT promo_revenue, total_revenue,
             FLOOR(100.0 * promo_revenue / total_revenue * 1000000 + 0.5) / 1000000 AS promo_pct
      FROM sums
    """)
  )

  /** TPC-H Q8 shape (national market share): the share-of-total topology —
    * one nation's fraction of a region's yearly market for one part type,
    * where numerator and denominator are conditional sums of the SAME
    * aggregated pass (the grouping carries every row; the CASE picks the
    * numerator). Combines the two-role nation join (Q7's topology: customer
    * nation restricted to a REGION via the region→nation chain, supplier
    * nation kept as the share dimension) with the conditional-ratio
    * pattern (Q14). Scale shape: part type prunes the fact ~6x through a
    * broadcast; region→nation→customer composes into one broadcast onto
    * orders; supplier⋈nation broadcasts onto lineitem; the ONLY shuffle is
    * the lineitem⋈orders orderkey join, identical to Q7 — the whole extra
    * topology rides broadcasts. Ratio math identical to Q14 (cast each
    * decimal sum to double, one IEEE division, floor-half-up rounding).
    */
  val sqlQ8MarketShare = Op(
    "sql_q8_market_share",
    (s, d) => {
      val amNations = T.nation(s, d)
        .join(broadcast(T.region(s, d).filter(col("r_name") === "AMERICA")
          .select(col("r_regionkey"))),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"))
      val cust = T.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
        .join(broadcast(amNations), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"))
      val ord = T.orders(s, d)
        .filter(col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1998-01-01")
        .select(col("o_orderkey"), col("o_custkey"),
          year(col("o_orderdate")).cast("long").as("o_year"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_year"))
      val supNation = T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
        .join(broadcast(T.nation(s, d)
          .select(col("n_nationkey"), col("n_name").as("supp_nation"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("supp_nation"))
      T.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          Det.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("volume"))
        .join(broadcast(T.part(s, d).filter(col("p_type") === "STANDARD")
          .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(broadcast(supNation), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_1", col("volume"))
            .otherwise(Det.dec(lit(0.0)))).cast("double").as("nation_volume"),
          sum(col("volume")).cast("double").as("total_volume"))
        .select(col("o_year"), col("nation_volume"), col("total_volume"),
          (floor(col("nation_volume") / col("total_volume") * 1e6 + 0.5) / 1e6)
            .as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some("""
      WITH j AS (
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS volume,
               n2.n_name AS supp_nation
        FROM lineitem
        JOIN part     ON p_partkey = l_partkey AND p_type = 'STANDARD'
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation n1 ON n1.n_nationkey = c_nationkey
        JOIN region   ON r_regionkey = n1.n_regionkey AND r_name = 'AMERICA'
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation n2 ON n2.n_nationkey = s_nationkey
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'),
      sums AS (
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_1' THEN volume
                             ELSE CAST(0.0 AS DECIMAL(18,4)) END) AS DOUBLE) AS nation_volume,
               CAST(SUM(volume) AS DOUBLE) AS total_volume
        FROM j GROUP BY o_year)
      SELECT o_year, nation_volume, total_volume,
             FLOOR(nation_volume / total_volume * 1000000 + 0.5) / 1000000 AS mkt_share
      FROM sums ORDER BY o_year
    """)
  )

  /** TPC-H Q1 in full (r7) — `agg_hash_groupby` carries the Q1 SHAPE
    * (grouped wide agg on lineitem); this is the faithful 8-aggregate
    * pricing summary itself: sum_qty, sum_base_price, the two derived
    * money expressions disc_price = p·(1−d) and charge = p·(1−d)·(1+t),
    * three averages, count, under the canonical `l_shipdate ≤
    * 1998-09-02` horizon. Every money term is composed in DECIMAL BEFORE
    * summation (the per-row product p·(1−d)·(1+t) in DECIMAL(18,4)-land
    * is exact and associative; summing doubles would be shuffle-order-
    * dependent), averages divide the decimal sums by the count once at
    * presentation (round 6). One scan, map-side combined, 6 output rows.
    */
  val sqlQ1PricingSummary = Op(
    "sql_q1_pricing_summary",
    (s, d) =>
      T.lineitem(s, d)
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          Det.sumDec(col("l_quantity")).as("sum_qty"),
          Det.sumDec(col("l_extendedprice")).as("sum_base_price"),
          // derived money lands in exact integer MICRO-units: the products
          // are exact decimals (widths capped under both engines' 38-digit
          // ceiling: (15,4)x(16,4)->(32,8), recast (18,8), x(16,4)->(35,12))
          // but a scale-12 decimal -> double conversion rounds DIFFERENTLY
          // in Spark and DuckDB at the 9th decimal (measured), so each row
          // floors to micro-units first and the sum stays in integers —
          // through DECIMAL(38,0) so 1e9-row groups can't wrap a long
          sum(expr("""CAST(FLOOR(CAST(CAST(CAST(l_extendedprice AS DECIMAL(15,4))
                * (CAST(1 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4)))
                AS DECIMAL(18,8)) AS DECIMAL(30,8)) * 1000000) AS DECIMAL(38,0))"""))
            .cast("long").as("sum_disc_price_micro"),
          sum(expr("""CAST(FLOOR(CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(15,4))
                * (CAST(1 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4)))
                AS DECIMAL(18,8))
                * (CAST(1 AS DECIMAL(15,4)) + CAST(l_tax AS DECIMAL(15,4)))
                AS DECIMAL(35,12)) AS DECIMAL(30,12)) * 1000000) AS DECIMAL(38,0))"""))
            .cast("long").as("sum_charge_micro"),
          round(sum(Det.dec(col("l_quantity"))).cast("double")
            / count(lit(1)), 6).as("avg_qty"),
          round(sum(Det.dec(col("l_extendedprice"))).cast("double")
            / count(lit(1)), 6).as("avg_price"),
          round(sum(Det.dec(col("l_discount"))).cast("double")
            / count(lit(1)), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
             CAST(SUM(CAST(FLOOR(CAST(CAST(CAST(l_extendedprice AS DECIMAL(15,4))
                  * (CAST(1 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4)))
                  AS DECIMAL(18,8)) AS DECIMAL(30,8)) * 1000000) AS HUGEINT)) AS BIGINT)
               AS sum_disc_price_micro,
             CAST(SUM(CAST(FLOOR(CAST(CAST(CAST(CAST(l_extendedprice AS DECIMAL(15,4))
                  * (CAST(1 AS DECIMAL(15,4)) - CAST(l_discount AS DECIMAL(15,4)))
                  AS DECIMAL(18,8))
                  * (CAST(1 AS DECIMAL(15,4)) + CAST(l_tax AS DECIMAL(15,4)))
                  AS DECIMAL(35,12)) AS DECIMAL(30,12)) * 1000000) AS HUGEINT)) AS BIGINT)
               AS sum_charge_micro,
             ROUND(CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_qty,
             ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_price,
             ROUND(CAST(SUM(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE)
                   / COUNT(*), 6) AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus
    """)
  )

  val ops: Vector[Op] = Vector(
    sqlQ13CustDistribution, sqlQ17SmallQtyAvg, sqlQ19DisjunctivePushdown,
    sqlQ21WaitingSuppliers, sqlQ22GlobalAcctbal, sqlQ7VolumeShipping,
    sqlQ15TopSupplier, sqlQ6ForecastRevenue, sqlQ4PriorityExists,
    sqlQ14PromoRevenue, sqlQ8MarketShare, sqlQ1PricingSummary)
}
