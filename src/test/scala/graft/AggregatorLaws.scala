package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.ops.Udfs

/** ScalaCheck algebraic laws for the custom Aggregators: distributed
  * aggregation is only correct if merge is associative and commutative
  * (shuffle may combine partial buffers in any order/grouping) and
  * reduce-then-merge equals any other partitioning of the input.
  */
object AggregatorLaws extends Properties("Aggregators") {

  // --- WeightedMean ---------------------------------------------------
  private val wmIn: Gen[(Long, Double)] = for {
    w <- Gen.choose(1L, 100L)
    v <- Gen.choose(0, 10000).map(_ / 100.0) // exact 2dp, like the fixtures
  } yield (w, v)

  private def wmBuf(xs: List[(Long, Double)]): Udfs.WmBuf =
    xs.foldLeft(Udfs.WeightedMean.zero)(Udfs.WeightedMean.reduce)

  property("weightedMean merge is commutative") =
    forAll(Gen.listOf(wmIn), Gen.listOf(wmIn)) { (a, b) =>
      Udfs.WeightedMean.merge(wmBuf(a), wmBuf(b)) ==
        Udfs.WeightedMean.merge(wmBuf(b), wmBuf(a))
    }

  property("weightedMean merge is associative") =
    forAll(Gen.listOf(wmIn), Gen.listOf(wmIn), Gen.listOf(wmIn)) { (a, b, c) =>
      Udfs.WeightedMean.merge(Udfs.WeightedMean.merge(wmBuf(a), wmBuf(b)), wmBuf(c)) ==
        Udfs.WeightedMean.merge(wmBuf(a), Udfs.WeightedMean.merge(wmBuf(b), wmBuf(c)))
    }

  property("weightedMean is partition-invariant") =
    forAll(Gen.listOf(wmIn), Gen.choose(0, 100)) { (xs, cut) =>
      val k = if (xs.isEmpty) 0 else cut % (xs.size + 1)
      val (l, r) = xs.splitAt(k)
      Udfs.WeightedMean.merge(wmBuf(l), wmBuf(r)) == wmBuf(xs)
    }

  // --- TopK -----------------------------------------------------------
  private val tkIn: Gen[(Double, Long)] = for {
    v <- Gen.choose(0, 10000).map(_ / 100.0)
    id <- Gen.choose(0L, 1000L)
  } yield (v, id)

  private def tkBuf(xs: List[(Double, Long)]): Seq[(Double, Long)] =
    xs.foldLeft(Udfs.TopK.zero)(Udfs.TopK.reduce)

  private def brute(xs: List[(Double, Long)]): Seq[(Double, Long)] =
    xs.sortBy { case (v, id) => (-v, id) }.take(5)

  property("topK buffer always equals brute-force top-5") =
    forAll(Gen.listOf(tkIn)) { xs =>
      Udfs.TopK.finish(tkBuf(xs)) == brute(xs)
    }

  property("topK merge is partition-invariant") =
    forAll(Gen.listOf(tkIn), Gen.choose(0, 100)) { (xs, cut) =>
      val k = if (xs.isEmpty) 0 else cut % (xs.size + 1)
      val (l, r) = xs.splitAt(k)
      Udfs.TopK.merge(tkBuf(l), tkBuf(r)) == brute(xs)
    }

  property("topK merge is commutative") =
    forAll(Gen.listOf(tkIn), Gen.listOf(tkIn)) { (a, b) =>
      Udfs.TopK.merge(tkBuf(a), tkBuf(b)) == Udfs.TopK.merge(tkBuf(b), tkBuf(a))
    }
}
