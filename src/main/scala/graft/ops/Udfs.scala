package graft.ops

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** §2.11 UDF / UDAF / UDTF surface — the only engine-extension code in the
  * project (everything else rides on built-ins). The scalar UDF ships next
  * to its codegen-able built-in twin (least/greatest) and the op proves
  * UDF == builtin; prefer the builtin in real pipelines — a Scala UDF is an
  * iterator-level black box that breaks whole-stage codegen and filter
  * pushdown.
  */
object Udfs {

  /** Scala UDF clip vs the built-in least(greatest(...)) twin — both
    * aggregated; equal columns prove the UDF against the codegen path.
    */
  val udfScalar = Op(
    "udf_scalar",
    (s, d) => {
      val clip = udf((v: Double, lo: Double, hi: Double) => math.min(math.max(v, lo), hi))
      T.events(s, d)
        .groupBy(col("event_type"))
        .agg(
          Det.sumDec(clip(col("value"), lit(5.0), lit(95.0))).as("sum_clip_udf"),
          Det.sumDec(least(greatest(col("value"), lit(5.0)), lit(95.0))).as("sum_clip_builtin"))
        .orderBy(col("event_type"))
    },
    Some("""
      SELECT event_type,
             CAST(SUM(CAST(least(greatest(value, 5.0), 95.0) AS DECIMAL(18,4))) AS DOUBLE) AS sum_clip_udf,
             CAST(SUM(CAST(least(greatest(value, 5.0), 95.0) AS DECIMAL(18,4))) AS DOUBLE) AS sum_clip_builtin
      FROM events GROUP BY event_type ORDER BY event_type
    """)
  )

  /** Typed Aggregator: weighted mean of value, weight = json k + 1.
    * Buffer holds exact integers (value is exact 2dp → value*100 is an
    * exact long), so the merge is associative/commutative — shuffle order
    * cannot change the result.
    */
  private[graft] case class WmBuf(sumScaled: Long, sumW: Long)

  private[graft] object WeightedMean extends Aggregator[(Long, Double), WmBuf, Double] {
    def zero: WmBuf = WmBuf(0L, 0L)
    def reduce(b: WmBuf, in: (Long, Double)): WmBuf =
      WmBuf(b.sumScaled + in._1 * math.round(in._2 * 100), b.sumW + in._1)
    def merge(a: WmBuf, b: WmBuf): WmBuf =
      WmBuf(a.sumScaled + b.sumScaled, a.sumW + b.sumW)
    def finish(b: WmBuf): Double =
      if (b.sumW == 0) Double.NaN else (b.sumScaled / 100.0) / b.sumW
    def bufferEncoder: Encoder[WmBuf] = Encoders.product[WmBuf]
    def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  val udafAggregator = Op(
    "udaf_aggregator",
    (s, d) => {
      val wmean = udaf(WeightedMean)
      T.events(s, d)
        .withColumn("w", get_json_object(col("props"), "$.k").cast("long") + 1)
        .groupBy((col("user_id") % 10).as("bucket"))
        .agg(round(wmean(col("w"), col("value")), 6).as("wmean"))
        .orderBy(col("bucket"))
    },
    Some("""
      SELECT user_id % 10 AS bucket,
             ROUND(CAST(SUM(CAST(w * value AS DECIMAL(18,4))) AS DOUBLE) / SUM(w), 6) AS wmean
      FROM (SELECT user_id, value, CAST(props->>'$.k' AS BIGINT) + 1 AS w FROM events)
      GROUP BY 1 ORDER BY 1
    """)
  )

  /** Imperative top-k Aggregator (TypedImperativeAggregate-style): a
    * bounded sorted buffer merged associatively — the distributed top-k
    * building block (constant memory per group vs sort-all). Oracle twin is
    * the window row_number form.
    */
  private val K = 5

  private[graft] object TopK extends Aggregator[(Double, Long), Seq[(Double, Long)], Seq[(Double, Long)]] {
    // hoisted: Ordering.Tuple2 is an implicit def — resolving it per row
    // would allocate a fresh Ordering in the hot path
    private val ord2: Ordering[(Double, Long)] = Ordering.Tuple2
    private def ord(t: (Double, Long)): (Double, Long) = (-t._1, t._2)
    private def trim(s: Seq[(Double, Long)]): Seq[(Double, Long)] =
      s.sortBy(ord)(ord2).take(K)
    def zero: Seq[(Double, Long)] = Seq.empty
    // Bounded insertion into an already-sorted buffer — O(k) per row, not
    // the O(k log k) full re-sort (trim stays for merge, whose inputs may
    // interleave arbitrarily).
    def reduce(b: Seq[(Double, Long)], in: (Double, Long)): Seq[(Double, Long)] = {
      if (b.length == K && ord2.lteq(ord(b.last), ord(in))) b
      else {
        val i = b.indexWhere(t => ord2.gt(ord(t), ord(in)))
        val at = if (i < 0) b.length else i
        (b.take(at) :+ in) ++ b.drop(at).take(K - at - 1)
      }
    }
    def merge(a: Seq[(Double, Long)], b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(a ++ b)
    def finish(b: Seq[(Double, Long)]): Seq[(Double, Long)] = trim(b)
    def bufferEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
    def outputEncoder: Encoder[Seq[(Double, Long)]] = ExpressionEncoder()
  }

  val udafImperativeTopk = Op(
    "udaf_imperative_topk",
    (s, d) => {
      val topk = udaf(TopK)
      T.events(s, d)
        .groupBy(col("event_type"))
        .agg(topk(col("value"), col("event_id")).as("top"))
        .select(col("event_type"), posexplode(col("top")).as(Seq("pos", "t")))
        .select(
          col("event_type"), (col("pos") + 1).cast("long").as("rn"),
          col("t._1").as("value"), col("t._2").as("event_id"))
        .orderBy(col("event_type"), col("rn"))
    },
    Some("""
      SELECT event_type, CAST(rn AS BIGINT) AS rn, value, event_id FROM (
        SELECT event_type, value, event_id,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
        FROM events)
      WHERE rn <= 5 ORDER BY event_type, rn
    """)
  )

  /** Generator (UDTF) surface: one row per (doc_id, segment) by splitting
    * on the literal token ' the ' — posexplode is Spark's built-in
    * Generator; a custom Generator Expression adds nothing here (§7.2).
    */
  val udtfGenerator = Op(
    "udtf_generator",
    (s, d) =>
      T.documents(s, d)
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), posexplode(split(col("text"), " the ")).as(Seq("pos", "segment")))
        .select(
          col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
          col("segment"), length(col("segment")).cast("long").as("seg_len"))
        .orderBy(col("doc_id"), col("pos")),
    Some("""
      SELECT doc_id, generate_subscripts(segs, 1) AS pos, unnest(segs) AS segment,
             CAST(length(unnest(segs)) AS BIGINT) AS seg_len
      FROM (SELECT doc_id, string_split(text, ' the ') AS segs
            FROM documents WHERE doc_id < 100)
      ORDER BY doc_id, pos
    """)
  )

  /** Misra-Gries heavy-hitters summary (Misra & Gries 1982; mergeable-
    * summary form per Agarwal et al. 2013): k bounded counters per
    * aggregation state, merged associatively by count-sum then subtracting
    * the (k+1)-th largest — the DETERMINISTIC-bound counterpart to
    * agg_countmin_freq's probabilistic CMS: for every item,
    * est ≤ true ≤ est + N/(k+1), and any item with frequency > N/(k+1) is
    * guaranteed present. The counter SET depends on merge order (hence
    * oracle-exempt; ExemptSpec pins the bounds against exact counts), but
    * the guarantees hold under every order — that is the point of a
    * mergeable summary. At scale this is the map-side-combine shape
    * itself: O(k) state per partial, one merge tree, never a shuffle of
    * raw frequencies.
    */
  private val MgK = 8

  private[graft] object MisraGries extends Aggregator[String, Map[String, Long], Map[String, Long]] {
    def zero: Map[String, Long] = Map.empty
    def reduce(b: Map[String, Long], t: String): Map[String, Long] =
      if (b.contains(t)) b.updated(t, b(t) + 1L)
      else if (b.size < MgK) b.updated(t, 1L)
      else b.flatMap { case (k, c) => if (c > 1L) Some(k -> (c - 1L)) else None }
    def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
      val m = a ++ b.map { case (k, v) => k -> (a.getOrElse(k, 0L) + v) }
      if (m.size <= MgK) m
      else {
        // subtract the (k+1)-th largest count from everyone, keep positives
        val thresh = m.values.toSeq.sorted(Ordering[Long].reverse)(MgK)
        m.flatMap { case (k, c) => if (c > thresh) Some(k -> (c - thresh)) else None }
      }
    }
    def finish(b: Map[String, Long]): Map[String, Long] = b
    def bufferEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
    def outputEncoder: Encoder[Map[String, Long]] = ExpressionEncoder()
  }

  val udafMisraGries = Op(
    "udaf_misra_gries",
    (s, d) => {
      val mg = udaf(MisraGries)
      T.documents(s, d)
        .select(explode(split(col("text"), " ")).as("token"))
        .filter(length(col("token")) > 0)
        .agg(mg(col("token")).as("summary"))
        .select(explode(col("summary")).as(Seq("token", "est_count")))
        .orderBy(col("est_count").desc, col("token"))
    },
    None
  )

  val ops: Vector[Op] = Vector(udfScalar, udafAggregator, udafImperativeTopk,
    udtfGenerator, udafMisraGries)
}
