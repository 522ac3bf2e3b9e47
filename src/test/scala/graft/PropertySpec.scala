package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Registry

/** Cross-op invariants (§5.2-3). */
class PropertySpec extends AnyFunSuite {
  import TestSession._

  test("sessionization: partitions events exactly, gaps bounded") {
    val sessions = Registry.queries("stream_sessionize_30m")(spark, sf).collect()
    val nEvents = graft.ops.T.events(spark, sf).count()
    assert(sessions.map(_.getLong(2)).sum == nEvents, "sessions must partition events")
    assert(sessions.forall(_.getLong(5) >= 0), "negative duration")
    // duration of an n-event session is at most (n-1) * gap
    assert(sessions.forall(r => r.getLong(5) <= (r.getLong(2) - 1) * 1800),
      "a session spans longer than its events allow under a 30-min gap")
  }

  test("jaccard scores are in (0, 1]") {
    val rows = Registry.queries("sim_jaccard_pairs")(spark, sf).collect()
    assert(rows.forall { r => val j = r.getDouble(2); j > 0 && j <= 1.0 })
  }

  test("cosine scores are within [-1, 1] + fp slack") {
    val rows = Registry.queries("sim_cosine_knn")(spark, sf).collect()
    assert(rows.forall { r => val c = r.getDouble(3); c >= -1.0000001 && c <= 1.0000001 })
  }

  test("keyed dedup is idempotent") {
    val once = Registry.queries("dedup_keyed_latest")(spark, sf)
    assert(once.count() ==
      once.dropDuplicates("user_id", "event_type").count())
  }

  test("topk aggregator equals sort-limit per group") {
    val agg = Registry.queries("udaf_imperative_topk")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(col("value").desc, col("event_id"))
    val ref = graft.ops.T.events(spark, sf)
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("event_type"), col("rn").cast("long"), col("value"), col("event_id"))
      .orderBy(col("event_type"), col("rn"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(agg.toSeq == ref.toSeq)
  }

  test("vec_dot matches the declarative higher-order fold") {
    graft.functions.VectorDot.register(spark)
    val e = graft.ops.T.embeddings(spark, sf).limit(50)
    val hof = aggregate(
      zip_with(col("embedding"), col("embedding"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)
    val diff = e.select(
        (call_function("vec_dot", col("embedding"), col("embedding")) - hof).as("d"))
      .agg(max(abs(col("d")))).head().getDouble(0)
    assert(diff == 0.0, s"vec_dot diverges from fold by $diff")
  }
}
