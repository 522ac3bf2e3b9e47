package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Registry

/** Every declared op must run on sf0.001; the driver contract maps must be
  * mutually consistent.
  */
class RegistrySpec extends AnyFunSuite {
  import TestSession._

  test("queries and oracleSql keys are consistent") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracles without queries: ${o -- q}")
    val exempt = q -- o
    val expectedExempt = Set(
      "agg_approx_hll", "agg_hll_partitioned_merge", "agg_approx_quantiles",
      "win_sliding_distinct_hll",
      "txt_hashing_tf", "txt_freq_tokens",
      "sim_minhash_lsh",
      "stream_structured_tumbling", "stream_dedup_watermark", "stream_late_data_policy",
      "stream_stream_join", "stream_stream_outer_join",
      "ml_feature_pipeline", "ml_logreg_intent", "ml_train_test_split",
      "ml_pca_features",
      "sink_codec_tradeoff", "sink_sorted_skipping",
      "sim_brp_lsh", "sim_ivf_knn", "sim_ivf_pq",
      "sem_dedup_clusters", "mm_decode_real")
    assert(exempt == expectedExempt, s"unexpected oracle-exempt set: $exempt")
  }

  test("entry returns rows on sf0.001 (t1 smoke)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  for ((name, fn) <- Registry.queries.toSeq.sortBy(_._1)) {
    test(s"op $name runs on sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}
