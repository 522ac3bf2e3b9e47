package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** §2.3 Joins. Scale notes: the two large fact tables (lineitem, orders)
  * sort-merge/shuffle-hash join on their keys; every dimension table
  * (region/nation/customer/supplier/part at TPC-H dim scale) is explicitly
  * `broadcast()` so no shuffle of the fact side is ever keyed by a dim. The
  * as-of join is the linear union+running-window form (no per-key quadratic
  * blowup); the interval join broadcasts the tiny interval table.
  */
object Joins {

  /** Revenue per (region, nation): lineitem⋈orders⋈customer⋈nation⋈region.
    * Fact-fact join shuffles on orderkey; all dims broadcast — at 100 TB the
    * only exchange is lineitem↔orders on the join key.
    */
  val joinStar5Way = Op(
    "join_star_5way",
    (s, d) => {
      val l = T.lineitem(s, d)
      val o = T.orders(s, d)
      val c = T.customer(s, d)
      val n = T.nation(s, d)
      val r = T.region(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          Det.sumDec(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some("""
      SELECT r_name, n_name,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name
    """)
  )

  /** Small-dim join: part is explicitly broadcast — zero shuffle of lineitem. */
  val joinBroadcastInner = Op(
    "join_broadcast_inner",
    (s, d) =>
      T.lineitem(s, d)
        .join(broadcast(T.part(s, d)), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          Det.sumDec(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(col("p_brand")),
    Some("""
      SELECT p_brand,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             COUNT(*) AS n_items
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand ORDER BY p_brand
    """)
  )

  /** Large-large join: lineitem⋈orders shuffles both sides on the key
    * (sort-merge / shuffled-hash under AQE) — the canonical co-partitioned
    * fact join.
    */
  val joinShuffleInner = Op(
    "join_shuffle_inner",
    (s, d) =>
      T.lineitem(s, d)
        .join(T.orders(s, d).hint("merge"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(Det.sumDec(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority")),
    Some("""
      SELECT o_orderpriority,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)
  )

  /** Bucketed co-located join: both fact tables written once as
    * bucketed-sorted tables on the join key (8 buckets), then joined with
    * NO shuffle on either side — the storage-layout answer to the
    * fact-fact join at 100 TB (pay the shuffle once at write time, join
    * shuffle-free forever after; join_shuffle_inner is the same join
    * paying it per query). PlanShapeSpec asserts the bucketed plan carries
    * strictly fewer exchanges than the plain one. Tables live in the
    * session's in-memory catalog with external data under scratch;
    * broadcast is suppressed with a merge hint so the demo survives AQE
    * deciding the small side fits in memory. Oracle: the same join over
    * the original parquet.
    */
  val joinBucketedColocated = Op(
    "join_bucketed_colocated",
    (s, d) => {
      // catalog-gated build per (session, sfDir) — the IVF-index idiom: a
      // bucketed layout is a write-once artifact, so repeat calls in a
      // Verify/Bench sweep pay the bucket shuffle once and only the
      // exchange-free join thereafter. Table names carry the sfDir tag so
      // two scale factors in one JVM can never alias each other's layout.
      val tag = d.replaceAll("[^A-Za-z0-9]", "_")
      val liTbl = s"graft_li_bucketed_$tag"
      val oTbl = s"graft_o_bucketed_$tag"
      if (!s.catalog.tableExists(liTbl) || !s.catalog.tableExists(oTbl)) {
        T.lineitem(s, d).select(col("l_orderkey"), col("l_quantity"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
          .option("path", T.scratchFor(d, "li_bucketed")).saveAsTable(liTbl)
        T.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
          .write.mode("overwrite").format("parquet")
          .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
          .option("path", T.scratchFor(d, "o_bucketed")).saveAsTable(oTbl)
      }
      s.table(liTbl)
        .join(s.table(oTbl).hint("merge"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(Det.sumDec(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n_items"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS n_items
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)
  )

  /** Dynamic partition pruning: the fact is laid out partitioned on the
    * join key; the dim side's filter is only known at run time, so Catalyst
    * injects a dynamicpruning subquery into the fact scan's
    * PartitionFilters (asserted by PlanShapeSpec) — at 100 TB this is what
    * turns "join then discard 95% of partitions" into "never read them".
    * Static pruning twin: sink_partitioned_prune.
    */
  val joinDppPrune = Op(
    "join_dpp_prune",
    (s, d) => {
      // _SUCCESS-gated build per sfDir (the IVF-index idiom): the
      // partitioned layout is a write-once artifact; repeat sweep calls
      // pay only the pruned read, not the re-write.
      val tmp = T.scratchFor(d, "orders_by_prio")
      if (!new java.io.File(tmp, "_SUCCESS").exists()) {
        T.orders(s, d).write.mode("overwrite")
          .partitionBy("o_orderpriority").parquet(tmp)
      }
      val fact = s.read.parquet(tmp)
      val dim = T.orders(s, d).select(col("o_orderpriority").as("p")).distinct()
        .filter(col("p").startsWith("1"))
      fact.join(broadcast(dim), col("o_orderpriority") === col("p"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"), Det.sumDec(col("o_totalprice")).as("sum_price"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
      FROM orders
      WHERE o_orderpriority IN (SELECT DISTINCT o_orderpriority FROM orders
                                WHERE o_orderpriority LIKE '1%')
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)
  )

  /** The SQL entry path: correlated EXISTS / NOT EXISTS plus an
    * uncorrelated scalar subquery, written as spark.sql over temp views.
    * Catalyst decorrelates these into the same semi/anti joins the
    * DataFrame ops use — one optimizer, two front doors.
    */
  val joinSqlExists = Op(
    "join_sql_exists",
    (s, d) => {
      // graft_ prefix: these persist in the shared session catalog, so
      // generic names would silently shadow/stale across ops and sfDirs
      T.customer(s, d).createOrReplaceTempView("graft_customer_v")
      T.orders(s, d).createOrReplaceTempView("graft_orders_v")
      s.sql("""
        SELECT c_nationkey, COUNT(*) AS n_cust,
               (SELECT COUNT(*) FROM graft_orders_v) AS total_orders
        FROM graft_customer_v c
        WHERE EXISTS (SELECT 1 FROM graft_orders_v o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
          AND NOT EXISTS (SELECT 1 FROM graft_orders_v o2
                          WHERE o2.o_custkey = c.c_custkey
                            AND o2.o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey ORDER BY c_nationkey""")
    },
    Some("""
      SELECT c_nationkey, COUNT(*) AS n_cust,
             (SELECT COUNT(*) FROM orders) AS total_orders
      FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
        AND NOT EXISTS (SELECT 1 FROM orders o2
                        WHERE o2.o_custkey = c.c_custkey
                          AND o2.o_orderpriority = '1-URGENT')
      GROUP BY c_nationkey ORDER BY c_nationkey
    """)
  )

  /** Null-safe equality join (<=>): NULL keys match each other, unlike
    * plain equality where NULL matches nothing. Both engines order the
    * null group explicitly (Spark nulls-first default vs DuckDB
    * nulls-last — Appendix A).
    *
    * SCALE FIX (r11; caught by the sf10 sweep at 167×, 288 s): counting
    * the pairs of an equi-join must NEVER materialize them — per key the
    * pair count is |a_k|·|b_k|, so AGGREGATE BOTH SIDES FIRST and multiply
    * (the count-of-cartesian ≡ product-of-counts identity). The original
    * row-level `a JOIN b ON k <=> k2 GROUP BY k` streamed every matched
    * pair through the join: the NULL group alone (every negative-balance
    * customer × every negative-balance supplier, both ~9% of their
    * tables) is ~1.2 BILLION pairs at sf10 and grows quadratically with
    * scale. The rewrite's join touches ≤ |distinct keys| rows per side
    * (26 here), the result is bit-identical, and the null-safe semantics
    * under test — the NULL row surviving the <=> join — is exercised by
    * the aggregated rows exactly as by the raw ones (inner <=> join of
    * the two count tables, nullable key on both sides).
    */
  val joinNullsafeEq = Op(
    "join_nullsafe_eq",
    (s, d) => {
      val a = T.customer(s, d).select(
        when(col("c_acctbal") < 0, lit(null).cast("int"))
          .otherwise(col("c_nationkey")).as("k"))
        .groupBy(col("k")).agg(count(lit(1)).as("na"))
      val b = T.supplier(s, d).select(
        when(col("s_acctbal") < 0, lit(null).cast("int"))
          .otherwise(col("s_nationkey")).as("k2"))
        .groupBy(col("k2")).agg(count(lit(1)).as("nb"))
      a.join(b, col("k") <=> col("k2"))
        .select(col("k"), (col("na") * col("nb")).as("n_pairs"))
        .orderBy(col("k").asc_nulls_first)
    },
    Some("""
      WITH a AS (SELECT CASE WHEN c_acctbal < 0 THEN NULL
                             ELSE c_nationkey END AS k FROM customer),
           b AS (SELECT CASE WHEN s_acctbal < 0 THEN NULL
                             ELSE s_nationkey END AS k2 FROM supplier)
      SELECT k, COUNT(*) AS n_pairs
      FROM a JOIN b ON k IS NOT DISTINCT FROM k2
      GROUP BY k ORDER BY k NULLS FIRST
    """)
  )

  /** Left outer keeps zero-order customers (COUNT over the nullable side). */
  val joinLeftOuter = Op(
    "join_left_outer",
    (s, d) => {
      val c = T.customer(s, d)
      val o = T.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey, c_name ORDER BY c_custkey
    """)
  )

  /** Full outer with NULLs manufactured on both sides (fixtures are FK-closed,
    * so each side is pre-filtered to make the other dangle).
    */
  val joinFullOuter = Op(
    "join_full_outer",
    (s, d) => {
      val n = T.nation(s, d)
        .filter(col("n_nationkey") < 20)
        .select(col("n_nationkey"), col("n_name"))
      val sup = T.supplier(s, d)
        .filter(col("s_acctbal") > 5000.0)
        .groupBy(col("s_nationkey"))
        .agg(count(lit(1)).as("n_sup"))
      n.join(sup, col("n_nationkey") === col("s_nationkey"), "full")
        .orderBy(asc_nulls_first("n_nationkey"), asc_nulls_first("s_nationkey"))
    },
    Some("""
      SELECT n_nationkey, n_name, s_nationkey, n_sup
      FROM (SELECT n_nationkey, n_name FROM nation WHERE n_nationkey < 20) n
      FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_sup FROM supplier
                 WHERE s_acctbal > 5000.0 GROUP BY s_nationkey) s
        ON n_nationkey = s_nationkey
      ORDER BY n_nationkey NULLS FIRST, s_nationkey NULLS FIRST
    """)
  )

  val joinLeftSemi = Op(
    "join_left_semi",
    (s, d) => {
      val c = T.customer(s, d)
      val o = T.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey
    """)
  )

  val joinLeftAnti = Op(
    "join_left_anti",
    (s, d) => {
      val c = T.customer(s, d)
      val o = T.orders(s, d)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      ORDER BY c_custkey
    """)
  )

  /** Bounded cartesian (5×25) — the only place crossJoin is allowed. */
  val joinCrossBounded = Op(
    "join_cross_bounded",
    (s, d) =>
      T.region(s, d).crossJoin(T.nation(s, d))
        .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
        .orderBy(col("r_regionkey"), col("n_nationkey")),
    Some("""
      SELECT r_regionkey, r_name, n_nationkey, n_name
      FROM region CROSS JOIN nation
      ORDER BY r_regionkey, n_nationkey
    """)
  )

  /** Theta join: equi on user_id + range band on value. Spark plans the equi
    * part as the shuffle key and evaluates the band as a post-join filter, so
    * this stays a hash/sort-merge join (never a cartesian). Both sides
    * pre-filtered to 'purchase' to bound the per-key fanout.
    */
  val joinThetaRange = Op(
    "join_theta_range",
    (s, d) => {
      val e = T.events(s, d).filter(col("event_type") === "purchase")
      val e1 = e.select(col("user_id"), col("event_id").as("a_id"), col("value").as("a_val"))
      val e2 = e.select(col("user_id").as("u2"), col("event_id").as("b_id"), col("value").as("b_val"))
      e1.join(e2,
          col("user_id") === col("u2") &&
          col("a_val") < col("b_val") &&
          col("a_id") < col("b_id") &&
          (col("b_val") - col("a_val")) < 0.5)
        .select(col("user_id"), col("a_id"), col("b_id"))
        .orderBy(col("a_id"), col("b_id"))
        .limit(500)
    },
    Some("""
      SELECT e1.user_id AS user_id, e1.event_id AS a_id, e2.event_id AS b_id
      FROM events e1 JOIN events e2
        ON e1.user_id = e2.user_id
       AND e1.value < e2.value
       AND e1.event_id < e2.event_id
       AND e2.value - e1.value < 0.5
      WHERE e1.event_type = 'purchase' AND e2.event_type = 'purchase'
      ORDER BY a_id, b_id
      LIMIT 500
    """)
  )

  /** As-of join, linear form: for each purchase, the latest click by the same
    * user at-or-before it. Implemented as union + running MAX window — one
    * shuffle on user_id, no per-key quadratic candidate join (the 100 TB-safe
    * as-of pattern).
    */
  val joinAsofLastEvent = Op(
    "join_asof_last_event",
    (s, d) => {
      val e = T.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(
          col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "click", 0).otherwise(1).as("tag"),
          when(col("event_type") === "click", col("ts")).as("click_ts"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("last_click_ts", max(col("click_ts")).over(w))
        .filter(col("tag") === 1)
        .select(col("event_id"), col("user_id"), col("ts"), col("last_click_ts"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH tagged AS (
        SELECT event_id, user_id, ts,
               CASE WHEN event_type = 'click' THEN 0 ELSE 1 END AS tag,
               CASE WHEN event_type = 'click' THEN ts END AS click_ts
        FROM events WHERE event_type IN ('click','purchase'))
      SELECT event_id, user_id, ts, last_click_ts FROM (
        SELECT event_id, user_id, ts, tag,
               MAX(click_ts) OVER (PARTITION BY user_id ORDER BY ts, tag, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_click_ts
        FROM tagged)
      WHERE tag = 1
      ORDER BY event_id
    """)
  )

  /** Interval (range) join: events against a 30-day calendar of [lo, hi)
    * intervals. No equi key — Spark broadcasts the 30-row side into a
    * nested-loop join, which is exactly the right plan at any scale when one
    * side is tiny.
    */
  val joinIntervalOverlap = Op(
    "join_interval_overlap",
    (s, d) => {
      val cal = s.range(0, 30).select(
        expr("TIMESTAMP '2024-01-01' + make_interval(0,0,0,CAST(id AS INT),0,0,0)").as("lo"),
        expr("TIMESTAMP '2024-01-01' + make_interval(0,0,0,CAST(id AS INT)+1,0,0,0)").as("hi"))
      T.events(s, d)
        .join(broadcast(cal), col("ts") >= col("lo") && col("ts") < col("hi"))
        .groupBy(col("lo"))
        .agg(count(lit(1)).as("n_events"), Det.sumDec(col("value")).as("sum_value"))
        .orderBy(col("lo"))
    },
    Some("""
      WITH cal AS (
        SELECT TIMESTAMP '2024-01-01' + INTERVAL (i) DAY AS lo,
               TIMESTAMP '2024-01-01' + INTERVAL (i + 1) DAY AS hi
        FROM range(30) t(i))
      SELECT lo, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
      FROM cal JOIN events ON ts >= lo AND ts < hi
      GROUP BY lo ORDER BY lo
    """)
  )

  /** Composite flagship: the TPC-H Q3 shape (shipping priority) — segment
    * filter on the customer dim, double fact join, pre-aggregation filters
    * on both fact sides, revenue aggregation, top-10. One op where every
    * scale idiom composes: the dim filter broadcasts, both date filters
    * push to the parquet scans, revenue sums through DECIMAL(18,4)
    * (2-factor product is exact at scale 4), and the top-10 is
    * TakeOrderedAndProject (per-partition heaps — never a global sort).
    * o_orderpriority stands in for o_shippriority (fixture schema).
    */
  val sqlQ3ShippingPriority = Op(
    "sql_q3_shipping_priority",
    (s, d) => {
      val cut = "1998-01-01"
      val cust = T.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
      val ord = T.orders(s, d)
        .filter(col("o_orderdate") < lit(cut).cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_orderpriority"))
      val li = T.lineitem(s, d)
        .filter(col("l_shipdate") > lit(cut).cast("timestamp"))
        .select(col("l_orderkey"),
          Det.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""
      SELECT l_orderkey, o_orderdate, o_orderpriority,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01'
        AND l_shipdate > TIMESTAMP '1998-01-01'
      GROUP BY l_orderkey, o_orderdate, o_orderpriority
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10
    """)
  )

  /** Bloom-filter semi-join reduction (Bloom 1970 filters; distributed
    * semi-join reduction per Bernstein & Chiu 1981) — the runtime-filter
    * pattern for a dim side too big to broadcast as rows but whose KEY SET
    * fits a bloom sketch (10^9 keys ≈ 1.2 GB at 3% fpp vs hundreds of GB
    * of rows). The
    * dim keys fold into a BloomFilter via a distributed tree aggregate
    * (`stat.bloomFilter` — only the fixed-size sketch reaches the driver),
    * the sketch broadcasts, and the fact side is pre-filtered BEFORE its
    * shuffle — false positives are then removed by the exact join, so the
    * result is hash-identical to the unfiltered join (the oracle is the
    * plain join). The shuffle_hash hint forces the shuffle join this
    * pattern exists for (a broadcastable dim wouldn't need the bloom).
    */
  val joinBloomReduce = Op(
    "join_bloom_reduce",
    (s, d) => {
      val ord = T.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 200000.0)
        .select(col("o_orderkey"), col("o_orderpriority"))
      val bf = ord.stat.bloomFilter("o_orderkey", 100000L, 0.03)
      val bfB = s.sparkContext.broadcast(bf)
      val mightContain = udf((k: Long) => bfB.value.mightContain(k)).withName("bloom_might_contain")
      val li = T.lineitem(s, d)
        .filter(mightContain(col("l_orderkey")))
        .select(col("l_orderkey"),
          Det.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      li.join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_li"), sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("o_orderpriority"))
    },
    Some("""
      SELECT o_orderpriority, COUNT(*) AS n_li,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 200000
      GROUP BY o_orderpriority ORDER BY o_orderpriority
    """)
  )

  /** Binned (bucketized) interval join — the scale path for
    * join_interval_overlap when the interval side is NOT broadcastable.
    * A nested-loop range join is quadratic; instead both sides map to
    * fixed-width time bins (width >= max interval length, here 2 h vs
    * 90 min intervals), each interval explodes into the <= 2 bins it can
    * touch, and the join becomes an ordinary hash-partitioned EQUI-join on
    * bin_id with the exact containment check as a post-join filter. At
    * 100 TB this shuffles each event once on a dense integer key — no
    * broadcast, no nested loop, and the fanout is bounded by
    * ceil(interval_len / bin_width) + 1 = 2 regardless of data volume.
    * 500 synthetic 90-min maintenance windows every 4 h; fully oracled
    * (DuckDB does the direct range join and must agree exactly).
    */
  val joinRangeBinned = Op(
    "join_range_binned",
    (s, d) => {
      val binSec = 7200L // 2 h bins >= the 90-min interval length
      val t0 = lit(1704067200L) // 2024-01-01 00:00:00 UTC, the fixture epoch
      // +3600 offset deliberately misaligns windows with the bin grid so
      // most intervals straddle a bin boundary and explode into 2 bins —
      // the general case the construction must handle
      val win = s.range(0, 500).select(
        col("id").as("win_id"),
        (t0 + col("id") * 14400L + 3600L).as("lo_sec"),
        (t0 + col("id") * 14400L + 3600L + 5400L).as("hi_sec"))
      val winBinned = win
        .withColumn("bin",
          explode(expr(s"sequence(lo_sec div $binSec, (hi_sec - 1) div $binSec)")))
      val ev = T.events(s, d)
        .select(col("event_id"), unix_timestamp(col("ts")).as("sec"))
        .withColumn("bin", expr(s"sec div $binSec"))
      ev.join(winBinned, "bin")
        .filter(col("sec") >= col("lo_sec") && col("sec") < col("hi_sec"))
        .groupBy(col("win_id"))
        .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
        .orderBy(col("win_id"))
    },
    Some("""
      WITH win AS (
        SELECT i AS win_id,
               1704067200 + i * 14400 + 3600 AS lo_sec,
               1704067200 + i * 14400 + 3600 + 5400 AS hi_sec
        FROM range(500) t(i)),
      ev AS (SELECT event_id, CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT) AS sec
             FROM events)
      SELECT win_id, COUNT(*) AS n_events, MIN(event_id) AS first_event
      FROM ev JOIN win ON sec >= lo_sec AND sec < hi_sec
      GROUP BY win_id ORDER BY win_id
    """)
  )

  /** Skew-salted shuffle join — the 100 TB skew recipe made explicit and
    * deterministic. The key is deliberately skewed (all 'view' events
    * collapse onto key -1, ~20% of the table); a plain shuffle join would
    * route that key to one task. Salting: the fact side gets a
    * deterministic salt (event_id % 8 — never rand(), which breaks retries
    * and oracles), the build side is replicated ×8 via explode, and the
    * join key becomes (k, salt) — the hot key now spreads over 8 tasks.
    * The merge hint forces a real shuffle join so the salt matters (with a
    * broadcastable dim you'd broadcast instead). AQE's skew-join handles
    * sort-merge skew at runtime too; salting is the portable form that
    * also covers aggregations.
    */
  val joinSkewSalted = Op(
    "join_skew_salted",
    (s, d) => {
      def keyed = T.events(s, d).withColumn("k",
        when(col("event_type") === "view", lit(-1L)).otherwise(col("user_id")))
      val fact = keyed.withColumn("salt", pmod(col("event_id"), lit(8)).cast("int"))
      val dim = keyed.groupBy(col("k")).agg(count(lit(1)).as("k_weight"))
        .withColumn("salt", explode(expr("sequence(0, 7)")))
      fact.join(dim.hint("merge"), Seq("k", "salt"))
        .groupBy(col("k"))
        .agg(
          count(lit(1)).as("n_events"),
          Det.sumDec(col("value")).as("sum_value"),
          max(col("k_weight")).as("k_weight"))
        .orderBy(col("k"))
    },
    Some("""
      WITH keyed AS (
        SELECT CASE WHEN event_type = 'view' THEN -1 ELSE user_id END AS k, value
        FROM events),
      dim AS (SELECT k, COUNT(*) AS k_weight FROM keyed GROUP BY k)
      SELECT k, COUNT(*) AS n_events,
             CAST(SUM(CAST(value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value,
             MAX(k_weight) AS k_weight
      FROM keyed JOIN dim USING (k)
      GROUP BY k ORDER BY k
    """)
  )

  /** Pure non-equi join (no equality conjunct at all): customers banded into
    * account-balance tiers held in a 5-row lookup table. With zero equi-keys
    * Spark cannot hash- or sort-merge-join; the ONLY scalable physical form
    * is BroadcastNestedLoopJoin with the tiny side broadcast — each fact
    * partition streams once past the 5 in-memory tier rows, no shuffle of
    * the big side at any scale (PlanShapeSpec asserts the BNLJ + the
    * stream-side's absence of an Exchange). Contrast with join_theta_range,
    * whose user_id equality conjunct lets the range predicate ride a hash
    * join, and join_range_binned, the path when NEITHER side broadcasts.
    */
  val joinBroadcastNestedLoop = Op(
    "join_broadcast_nested_loop",
    (s, d) => {
      import s.implicits._
      val tiers = Seq(
        ("t1_low", -1000.0, 0.0), ("t2_small", 0.0, 2500.0),
        ("t3_mid", 2500.0, 5000.0), ("t4_high", 5000.0, 7500.0),
        ("t5_top", 7500.0, 10000.0))
        .toDF("tier", "lo", "hi")
      T.customer(s, d)
        .join(broadcast(tiers), col("c_acctbal") >= col("lo") && col("c_acctbal") < col("hi"))
        .groupBy(col("tier"))
        .agg(count(lit(1)).as("n_cust"), Det.sumDec(col("c_acctbal")).as("sum_bal"))
        .orderBy(col("tier"))
    },
    Some("""
      SELECT tier, COUNT(*) AS n_cust,
             CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS sum_bal
      FROM customer
      JOIN (VALUES ('t1_low', -1000.0, 0.0), ('t2_small', 0.0, 2500.0),
                   ('t3_mid', 2500.0, 5000.0), ('t4_high', 5000.0, 7500.0),
                   ('t5_top', 7500.0, 10000.0)) AS tiers(tier, lo, hi)
        ON c_acctbal >= lo AND c_acctbal < hi
      GROUP BY tier ORDER BY tier
    """)
  )

  /** As-of join WITH TOLERANCE — the bounded-staleness variant of
    * join_asof_last_event: each purchase attributes to the same user's
    * latest click only if it happened within the last 15 minutes,
    * otherwise NULL (unattributed). Same linear union + running-max window
    * kernel (one shuffle on user_id, never a per-key candidate join); the
    * tolerance is a post-window null-out, which is also exactly what makes
    * the streaming twin's state evictable (stream_stream_join's watermark
    * IS this bound). Latency in exact integer microseconds.
    */
  val joinAsofTolerance = Op(
    "join_asof_tolerance",
    (s, d) => {
      val tolUs = 15L * 60 * 1000000
      val e = T.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(
          col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "click", 0).otherwise(1).as("tag"),
          when(col("event_type") === "click", unix_micros(col("ts"))).as("click_us"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      e.withColumn("last_click_us", max(col("click_us")).over(w))
        .filter(col("tag") === 1)
        .withColumn("lat_us", unix_micros(col("ts")) - col("last_click_us"))
        .select(
          col("event_id").as("purchase_id"), col("user_id"),
          when(col("lat_us") <= tolUs, col("lat_us")).as("latency_us"))
        .orderBy(col("purchase_id"))
    },
    Some("""
      SELECT p.event_id AS purchase_id, p.user_id,
             CASE WHEN epoch_us(p.ts) - lc.last_us <= 900000000
                  THEN epoch_us(p.ts) - lc.last_us END AS latency_us
      FROM events p
      LEFT JOIN LATERAL (
        SELECT MAX(epoch_us(c.ts)) AS last_us
        FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click'
          AND c.ts <= p.ts) lc ON TRUE
      WHERE p.event_type = 'purchase'
      ORDER BY purchase_id
    """)
  )

  /** Nearest-as-of join, EITHER direction (r5) — the sensor-fusion /
    * log-alignment variant the backward-only asof twins can't express:
    * each purchase pairs with its temporally NEAREST click, before or
    * after, with ties broken toward backward (the causal side). Same
    * linear kernel as join_asof_last_event — union-tag the two sides,
    * ONE shuffle on user_id, then TWO running windows over the same sorted
    * partition: a backward running max (last click at-or-before) and a
    * forward running min over the reversed order (first click strictly
    * after; a click at the exact purchase instant counts as backward with
    * Δ=0, not both). Never a per-key candidate join, never a range join —
    * at 100 TB this is one sort-shuffle regardless of per-user event
    * counts. Distances in exact integer microseconds.
    */
  val joinAsofNearest = Op(
    "join_asof_nearest",
    (s, d) => {
      val e = T.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select(
          col("event_id"), col("user_id"), col("ts"),
          when(col("event_type") === "click", 0).otherwise(1).as("tag"),
          when(col("event_type") === "click", unix_micros(col("ts"))).as("click_us"))
      val wBack = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"), col("event_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wFwd = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("tag").desc, col("event_id").desc)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val back = unix_micros(col("ts")) - max(col("click_us")).over(wBack)
      val fwd = min(col("click_us")).over(wFwd) - unix_micros(col("ts"))
      e.withColumn("back_us", back)
        .withColumn("fwd_us", fwd)
        .filter(col("tag") === 1)
        .select(
          col("event_id").as("purchase_id"), col("user_id"),
          when(col("back_us").isNotNull &&
              (col("fwd_us").isNull || col("back_us") <= col("fwd_us")), "backward")
            .when(col("fwd_us").isNotNull, "forward").as("direction"),
          when(col("back_us").isNotNull &&
              (col("fwd_us").isNull || col("back_us") <= col("fwd_us")), col("back_us"))
            .when(col("fwd_us").isNotNull, col("fwd_us")).as("nearest_us"))
        .orderBy(col("purchase_id"))
    },
    Some("""
      SELECT p.event_id AS purchase_id, p.user_id,
             CASE WHEN b.last_us IS NOT NULL AND (f.first_us IS NULL OR
                       epoch_us(p.ts) - b.last_us <= f.first_us - epoch_us(p.ts))
                  THEN 'backward'
                  WHEN f.first_us IS NOT NULL THEN 'forward' END AS direction,
             CASE WHEN b.last_us IS NOT NULL AND (f.first_us IS NULL OR
                       epoch_us(p.ts) - b.last_us <= f.first_us - epoch_us(p.ts))
                  THEN epoch_us(p.ts) - b.last_us
                  WHEN f.first_us IS NOT NULL THEN f.first_us - epoch_us(p.ts)
             END AS nearest_us
      FROM events p
      LEFT JOIN LATERAL (
        SELECT MAX(epoch_us(c.ts)) AS last_us FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts <= p.ts) b ON TRUE
      LEFT JOIN LATERAL (
        SELECT MIN(epoch_us(c.ts)) AS first_us FROM events c
        WHERE c.user_id = p.user_id AND c.event_type = 'click' AND c.ts > p.ts) f ON TRUE
      WHERE p.event_type = 'purchase'
      ORDER BY purchase_id
    """)
  )

  /** Composite flagship: the TPC-H Q5 shape (local-supplier revenue) — the
    * hardest join topology in the TPC-H core because the supplier edge is a
    * DOUBLE condition: lineitem joins supplier on l_suppkey AND the
    * customer's nation must equal the supplier's nation, which no single
    * join reorder removes. The scale plan: region→nation prunes to a
    * broadcast dim chain, the orders date filter pushes to the scan, the
    * two fact joins shuffle on orderkey once, and the nation-equality is a
    * post-join filter on two already-present int columns (never a second
    * shuffle). Revenue sums through DECIMAL(18,4).
    */
  val sqlQ5LocalSupplier = Op(
    "sql_q5_local_supplier",
    (s, d) => {
      val asiaNations = T.nation(s, d)
        .join(broadcast(T.region(s, d).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name"))
      val ord = T.orders(s, d)
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = T.lineitem(s, d).select(
        col("l_orderkey"), col("l_suppkey"),
        Det.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      // customer/supplier are key-projected but GROW with SF (unlike
      // region/nation, bounded by geography) — no broadcast hint: AQE
      // broadcasts them at test scale and falls back to shuffle joins at
      // 100 TB, where forcing the hint would OOM the driver.
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(T.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(T.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(asiaNations), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""
      SELECT n_name,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1997-01-01'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name
    """)
  )

  /** Composite flagship: the TPC-H Q10 shape (returned-item revenue) — the
    * canonical "who cost us money last quarter" report: quarter-filtered
    * orders, returned lineitems only (l_returnflag = 'R'), revenue rolled
    * up per customer with the customer's nation attached, top-20. Scale
    * shape: both fact filters push to the scans, the fact-fact join
    * shuffles on orderkey, customer attributes ride a broadcast, and the
    * top-20 is TakeOrderedAndProject. The group-by carries the customer
    * attribute columns (name/acctbal/nation) — at 100 TB that is free
    * because c_custkey determines them, so the grouping hash is as wide as
    * the key but no extra shuffle rows exist.
    */
  val sqlQ10ReturnedItems = Op(
    "sql_q10_returned_items",
    (s, d) => {
      val ord = T.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1997-04-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      val li = T.lineitem(s, d)
        .filter(col("l_returnflag") === "R")
        .select(col("l_orderkey"),
          Det.dec(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("rev"))
      val cust = T.customer(s, d)
        .join(broadcast(T.nation(s, d).select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      // cust grows with SF — unhinted, so AQE broadcasts at test scale
      // and shuffles on c_custkey at 100 TB (same rationale as Q5).
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        .agg(sum(col("rev")).cast("double").as("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""
      SELECT c_custkey, c_name, c_acctbal, n_name,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM customer
      JOIN nation   ON c_nationkey = n_nationkey
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1997-04-01'
        AND l_returnflag = 'R'
      GROUP BY c_custkey, c_name, c_acctbal, n_name
      ORDER BY revenue DESC, c_custkey
      LIMIT 20
    """)
  )

  /** Composite flagship: the TPC-H Q18 shape (large-volume customers) —
    * the HAVING-aggregate-as-filter topology the other flagships don't
    * cover: lineitem pre-aggregates per order, the aggregate ITSELF is
    * the filter (sum qty > 300), and only the surviving handful of
    * orderkeys join onward. Scale shape: the heavy agg is map-side
    * combined on the fact's own key (no join before it), its output is
    * tiny so AQE broadcasts it into orders, the threshold compares
    * decimal-exact sums, and the top-20 is TakeOrderedAndProject.
    */
  val sqlQ18LargeOrders = Op(
    "sql_q18_large_orders",
    (s, d) => {
      val big = T.lineitem(s, d)
        .groupBy(col("l_orderkey"))
        .agg(sum(Det.dec(col("l_quantity"))).as("sum_qty"))
        .filter(col("sum_qty") > 300)
      val ord = T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"), col("o_totalprice"))
      big.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(T.customer(s, d).select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_orderdate"), col("o_totalprice"),
          col("sum_qty").cast("double").as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(20)
    },
    Some("""
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             CAST(sum_qty AS DOUBLE) AS sum_qty
      FROM (
        SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(18,4))) AS sum_qty
        FROM lineitem GROUP BY l_orderkey
        HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300) big
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 20
    """)
  )

  /** Incremental maintenance of a JOIN view (r7; the delta-propagation
    * identity of every materialized-view engine — Blakeley 1986):
    * `agg_incremental_rollup` maintains an AGGREGATE incrementally, this
    * maintains a JOIN — V = O ⋈ C updates as
    * ΔV = ΔO⋈C_old ∪ O_old⋈ΔC ∪ ΔO⋈ΔC, so arrival of deltas touches
    * |Δ|-proportional work, never the accumulated view. The base slice
    * O_old⋈C_old is MATERIALIZED once behind a _SUCCESS gate (the
    * inverted-index idiom): repeated queries — and a real refresh loop —
    * read it back instead of re-joining history, which is the entire point
    * of IVM at 100 TB (the base view is the big thing; the three delta
    * branches shuffle only delta rows, and the dimension delta is
    * broadcast-size by nature). Deltas are hash-slices (orderkey%5,
    * custkey%7) so the oracle can reproduce membership exactly; output is
    * the per-segment rollup of the maintained view plus how many of its
    * rows arrived incrementally — hash-equal to a full recompute, which
    * is the IVM correctness statement itself.
    */
  val joinViewDeltaMaintain = Op(
    "join_view_delta_maintain",
    (s, d) => {
      val orders = T.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val cust = T.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
      val oldO = orders.filter(pmod(col("o_orderkey"), lit(5)) =!= 0)
      val deltaO = orders.filter(pmod(col("o_orderkey"), lit(5)) === 0)
      val oldC = cust.filter(pmod(col("c_custkey"), lit(7)) =!= 0)
      val deltaC = cust.filter(pmod(col("c_custkey"), lit(7)) === 0)
      val baseDir = T.scratchFor(d, "ivm_base")
      if (!new java.io.File(s"$baseDir/_SUCCESS").exists())
        oldO.join(broadcast(oldC), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("segment"), col("o_totalprice"))
          .write.mode("overwrite").parquet(baseDir)
      def branch(o: org.apache.spark.sql.DataFrame, c: org.apache.spark.sql.DataFrame) =
        o.join(broadcast(c), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("segment"), col("o_totalprice"))
      val maintained = s.read.parquet(baseDir).withColumn("from_delta", lit(0L))
        .unionByName(branch(deltaO, oldC).withColumn("from_delta", lit(1L)))
        .unionByName(branch(oldO, deltaC).withColumn("from_delta", lit(1L)))
        .unionByName(branch(deltaO, deltaC).withColumn("from_delta", lit(1L)))
      maintained.groupBy(col("segment"))
        .agg(count(lit(1)).as("n_rows"),
          Det.sumDec(col("o_totalprice")).as("revenue"),
          sum(col("from_delta")).as("n_incremental"))
        .orderBy(col("segment"))
    },
    Some("""
      SELECT c_mktsegment AS segment, COUNT(*) AS n_rows,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
             CAST(SUM(CASE WHEN o_orderkey % 5 = 0 OR c_custkey % 7 = 0
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_incremental
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY 1 ORDER BY segment
    """)
  )

  /** Connector statistics driving join strategy (r8) — the capability
    * that closes the DSv2 story: `graft.sources.RangeLedger` implements
    * SupportsReportStatistics with PREDICATE-AWARE estimates (the column
    * moduli are known, so `day < 50` reports ~rows·50/365 — selectivity a
    * file source can only guess). Without the interface, a v2 relation
    * defaults to `spark.sql.defaultSizeInBytes` = Long.Max and this join
    * would sort-merge; with it, the ~2.7k-row filtered ledger reports
    * ~87 KB and Catalyst BROADCASTS it against lineitem unhinted — the
    * plan guard pins BroadcastHashJoin with the connector on the build
    * side. Fact side shuffles nothing; revenue through the decimal
    * discipline.
    */
  val joinDsv2StatsBroadcast = Op(
    "join_dsv2_stats_broadcast",
    (s, d) => {
      val ledger = s.read.format("graft.sources.RangeLedger")
        .option("rows", "20000").option("slices", "4").load()
        .filter(col("day") < 50)
        .select(col("id"), col("bucket"))
      T.lineitem(s, d)
        .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        .join(ledger, col("l_partkey") === col("id"))
        .groupBy((col("bucket") % 10).as("b10"))
        .agg(count(lit(1)).as("n_lines"),
          Det.sumDec(col("l_extendedprice") * (lit(1) - col("l_discount")))
            .as("revenue"))
        .orderBy(col("b10"))
    },
    Some("""
      SELECT CAST(bucket % 10 AS INTEGER) AS b10, COUNT(*) AS n_lines,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      FROM lineitem
      JOIN (
        SELECT range AS id, CAST(range % 97 AS INTEGER) AS bucket
        FROM range(0, 20000)
        WHERE CAST(range % 365 AS INTEGER) < 50) ledger
        ON l_partkey = ledger.id
      GROUP BY 1 ORDER BY b10
    """)
  )

  /** DSv2 RUNTIME filtering (r8) — dynamic pruning for a connector: the
    * ledger scan declares `id` runtime-filterable, and when the selective
    * part dimension's build side materializes, Spark hands the scan an
    * In(id, …) filter MID-EXECUTION; readers then skip every id outside
    * the join key set before a row exists — the DSv2 analog of dynamic
    * partition pruning, and what a Cassandra/Iceberg connector does with
    * a join's key set at 100 TB. Semantics are unchanged by the callback
    * (it is purely an efficiency contract), so the op stays fully
    * oracled; the §5 test pins that the callback actually fired with an
    * In filter and that results match with the queue cleared first.
    */
  val joinDsv2RuntimeFilter = Op(
    "join_dsv2_runtime_filter",
    (s, d) => {
      val ledger = s.read.format("graft.sources.RangeLedger")
        .option("rows", "1000000").option("slices", "8").load()
      val dim = T.part(s, d)
        .filter(col("p_size") <= 2)
        .select(col("p_partkey"), col("p_size"))
      ledger.join(dim, col("id") === col("p_partkey"))
        .groupBy(col("p_size"))
        .agg(count(lit(1)).as("n"), sum(col("units")).as("sum_units"))
        .orderBy(col("p_size"))
    },
    Some("""
      SELECT p_size, COUNT(*) AS n, CAST(SUM(units) AS BIGINT) AS sum_units
      FROM (
        SELECT range AS id, (range * 2654435761) % 1000000 AS units
        FROM range(0, 1000000)) ledger
      JOIN (SELECT p_partkey, p_size FROM part WHERE p_size <= 2) dim
        ON ledger.id = dim.p_partkey
      GROUP BY p_size ORDER BY p_size
    """)
  )

  /** Epsilon self-join via grid bucketing (r14) — the classic spatial /
    * metric-space join: all point pairs within distance eps, without the
    * O(n²) cross join. Points are the purchase events embedded in a 2-D
    * plane (x = value, y = user_id mod 512 — exact small integers in
    * DOUBLE). Algorithm: home cell = (⌊x/eps⌋, ⌊y/eps⌋); the PROBE side
    * replicates each point to its 3×3 cell neighborhood, the BUILD side
    * keeps one home cell per point; an equi-join on the cell key then the
    * exact (a.x−b.x)²+(a.y−b.y)² ≤ eps² filter. A qualifying pair (a<b)
    * matches exactly once: b's unique home cell lies inside a's
    * neighborhood. Scale shape: 9× replication then ONE hash shuffle on
    * the cell key — candidate work is O(n · local density), never n²; hot
    * cells (price round-numbers) are ordinary join skew, handled by AQE
    * skew splitting exactly as join_skew_salted demonstrates. Determinism:
    * cell ids from floor() on identical doubles, the distance predicate is
    * the same IEEE expression in both engines, output is exact ids plus
    * dist2 rounded to 6. The DuckDB oracle is the NAIVE semantics (self
    * join with |Δx|,|Δy| band predicates) — independent of the grid
    * algorithm, so it checks the candidate-generation logic itself.
    *
    * ORACLE FORM (revised for the sf10 decade, r14): the first committed
    * oracle was the literal band self-join (b.x BETWEEN a.x±eps AND b.y
    * BETWEEN a.y±eps). DuckDB plans that with IEJoin/hash-join shapes
    * whose candidate set is quadratic at sf10 (measured: the naive form
    * did not finish in 80 min; a y-only hash join leaves 7.8e9 residual
    * pairs). The committed oracle instead exploits an IMPLIED exactness:
    * y is integer-valued and eps < 1, so dist² ≤ eps² forces Δy = 0 — the
    * oracle equi-joins on y PLUS a width-1.0 ⌊x⌋ bucket ±1 neighborhood
    * (materialized as a plain column so DuckDB composes the (y, bx) hash
    * key — measured 20.4 s / 39.6 M pairs at sf10). The bucketing differs
    * from the op's construction in width (1.0 vs 0.5), dimensionality
    * (1-D x vs 2-D cells), and replication side, so candidate generation
    * is still independently derived; the exact dist² ≤ 0.25 predicate is
    * the shared semantics, as before.
    *
    * ORACLE BAND WIDTH (history; caught by the sf1 decade check,
    * 11/394,956 pairs): the first oracle's band endpoints a.x ± 0.5 were
    * ROUNDED doubles, so a pair whose decimal Δx is exactly 0.50 — whose
    * computed (a.x−b.x) is exactly 0.5 and dist² exactly 0.25, included
    * by the distance predicate in BOTH engines — could fall just outside
    * the rounded endpoint and be wrongly excluded by the band pre-filter
    * alone. The revised bucket form has no rounded endpoint at all (the
    * ±1 width-1.0 neighborhood over-covers every |Δx| ≤ 0.5 pair, and
    * ⌊x⌋ is exact on cents doubles); the boundary case stays pinned at
    * unit scale by PropertySpec's planted 0.42/0.92 fixture. The GRID
    * side has no such edge either: cells are exact for any |Δx| ≤ 0.5
    * pair because fixture coordinates are cents (boundary-aligned values
    * are exact binary doubles), so a computed-0.5 gap spans at most one
    * cell boundary.
    */
  val joinSpatialGridEps = Op(
    "join_spatial_grid_eps",
    (s, d) => {
      val eps = 0.5
      val pts = T.events(s, d)
        .filter(col("event_type") === "purchase")
        .select(col("event_id").as("id"), col("value").as("x"),
          (col("user_id") % 512).cast("double").as("y"))
      val home = pts
        .withColumn("cx", floor(col("x") / eps).cast("long"))
        .withColumn("cy", floor(col("y") / eps).cast("long"))
      val probe = home
        .withColumn("dx", explode(array(lit(-1L), lit(0L), lit(1L))))
        .withColumn("dy", explode(array(lit(-1L), lit(0L), lit(1L))))
        .select(col("id").as("a_id"), col("x").as("ax"), col("y").as("ay"),
          (col("cx") + col("dx")).as("cx"), (col("cy") + col("dy")).as("cy"))
      val build = home.select(
        col("id").as("b_id"), col("x").as("bx"), col("y").as("by"),
        col("cx"), col("cy"))
      probe.join(build, Seq("cx", "cy"))
        .filter(col("a_id") < col("b_id"))
        .withColumn("dist2",
          (col("ax") - col("bx")) * (col("ax") - col("bx")) +
          (col("ay") - col("by")) * (col("ay") - col("by")))
        .filter(col("dist2") <= eps * eps)
        .select(col("a_id"), col("b_id"), round(col("dist2"), 6).as("dist2"))
        .orderBy(col("a_id"), col("b_id"))
    },
    Some("""
      WITH pts AS (
        SELECT event_id AS id, value AS x, CAST(user_id % 512 AS DOUBLE) AS y,
               CAST(FLOOR(value) AS BIGINT) AS bx
        FROM events WHERE event_type = 'purchase'),
      probe AS (
        SELECT id, x, y, bx + d AS bxd
        FROM pts, (SELECT UNNEST([-1, 0, 1]) AS d) ds)
      SELECT a.id AS a_id, b.id AS b_id,
             ROUND((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y), 6) AS dist2
      FROM probe a JOIN pts b ON b.y = a.y AND b.bx = a.bxd
      WHERE a.id < b.id
        AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 0.25
      ORDER BY a_id, b_id
    """)
  )

  val ops: Vector[Op] = Vector(
    joinSpatialGridEps,
    joinViewDeltaMaintain, joinDsv2StatsBroadcast, joinDsv2RuntimeFilter,
    joinStar5Way, joinBroadcastInner, joinShuffleInner, joinBucketedColocated,
    joinDppPrune, joinSqlExists, joinNullsafeEq, joinLeftOuter, joinFullOuter,
    joinLeftSemi, joinLeftAnti, joinCrossBounded, joinThetaRange,
    joinAsofLastEvent, joinIntervalOverlap, joinRangeBinned, joinSkewSalted,
    joinBloomReduce, sqlQ3ShippingPriority, joinBroadcastNestedLoop,
    joinAsofTolerance, joinAsofNearest, sqlQ5LocalSupplier, sqlQ10ReturnedItems,
    sqlQ18LargeOrders)
}
