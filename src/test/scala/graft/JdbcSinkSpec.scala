package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{Registry, Scans, T}

/** §5 pins for `sink_jdbc_predictions` (ops/MLPipeline.scala) — asserting
  * the three claims its scaladoc makes about the JDBC write-back:
  *
  *   1. **Batching arithmetic**: with 4 write partitions and batchsize=50,
  *      every partition of the smallest fixture (500 docs → 125 rows/task)
  *      carries more than one batch's worth of rows, so each task's
  *      prepared-statement loop MUST flush ≥3 batches — the re-batching
  *      path is genuinely exercised, not skipped in a single flush.
  *   2. **VARCHAR (not CLOB) surviving overwrite**: after a SECOND
  *      overwrite cycle, Derby's own catalog (SYS.SYSCOLUMNS) still shows
  *      VARCHAR(8)/VARCHAR(16) for lang/intent — `createTableColumnTypes`
  *      re-applied on the drop/recreate. Derby's default string mapping is
  *      CLOB, which it refuses to GROUP BY, so dropping the option would
  *      make the read-back aggregation error remotely.
  *   3. **4-way partitioned read-back plan**: the DataFrame the op returns
  *      scans a JDBCRelation on `predictions` with numPartitions=4 — the
  *      read leg is parallel, not a single-connection straw.
  */
class JdbcSinkSpec extends AnyFunSuite {
  import TestSession._

  test("batchsize arithmetic: every write partition needs >1 JDBC batch") {
    val perPart = T.documents(spark, sf).repartition(4)
      .rdd.mapPartitions(it => Iterator(it.size)).collect()
    assert(perPart.length == 4, perPart.toSeq)
    assert(perPart.sum == 500, perPart.toSeq)
    perPart.foreach { n =>
      val batches = math.ceil(n / 50.0).toInt
      assert(batches >= 3,
        s"partition of $n rows flushes only $batches batch(es) at batchsize=50: ${perPart.toSeq}")
    }
  }

  test("overwrite cycle keeps VARCHAR catalog types and the 4-way read-back plan") {
    // Two invocations = a full overwrite cycle: the second write drops and
    // recreates the table, so the catalog types seen below are the ones
    // createTableColumnTypes applied on RE-creation, not table creation.
    Registry.queries("sink_jdbc_predictions")(spark, sf).collect()
    val df = Registry.queries("sink_jdbc_predictions")(spark, sf)

    val conn = java.sql.DriverManager.getConnection(Scans.jdbcUrlFor(sf))
    val types: Map[String, String] = try {
      val rs = conn.createStatement().executeQuery(
        """SELECT c.COLUMNNAME, c.COLUMNDATATYPE FROM SYS.SYSCOLUMNS c
          |JOIN SYS.SYSTABLES t ON c.REFERENCEID = t.TABLEID
          |WHERE t.TABLENAME = 'PREDICTIONS'""".stripMargin)
      Iterator.continually(rs)
        .takeWhile(_.next()).map(r => r.getString(1) -> r.getString(2)).toMap
    } finally conn.close()
    assert(types.get("lang").exists(_.startsWith("VARCHAR(8)")),
      s"lang not VARCHAR(8) in Derby catalog: $types")
    assert(types.get("intent").exists(_.startsWith("VARCHAR(16)")),
      s"intent not VARCHAR(16) in Derby catalog: $types")
    assert(!types.values.exists(_.contains("CLOB")),
      s"CLOB leaked into the predictions table: $types")

    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation(predictions)"), plan)
    assert(plan.contains("numPartitions=4"),
      s"read-back is not the 4-way partitioned scan: $plan")

    // And the round trip is lossless: folding the DB read-back over lang
    // equals the parquet-round-trip sibling's per-intent aggregate (same
    // rule, independent store), and total row count is exactly the corpus.
    val viaDb = df.collect().map(r =>
      (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(viaDb.values.sum == 500, viaDb)
    val byIntent = viaDb.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val sibling = Registry.queries("ml_predictions_sink")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byIntent == sibling, s"DB $byIntent vs parquet $sibling")
  }
}
