package graft.ops

import org.apache.spark.sql.functions._

/** §2.3 Joins. Scale notes: the two large fact tables (lineitem, orders)
  * sort-merge/shuffle-hash join on their keys; every dimension table
  * (region/nation/customer/supplier/part at TPC-H dim scale) is explicitly
  * `broadcast()` so no shuffle of the fact side is ever keyed by a dim.
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

  val ops: Vector[Op] = Vector(joinStar5Way)
}
