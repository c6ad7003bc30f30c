package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.operators.SetAggregator

/** Pure ScalaCheck laws (no Spark session): the algebra the operators rely on. */
object AggregatorLaws extends Properties("SetAggregator") {

  private val ids = Gen.listOf(Gen.oneOf((1 to 40).map(i => s"id$i")))

  property("reduce-fold equals sorted distinct") = Prop.forAll(ids) { xs =>
    xs.foldLeft(SetAggregator.zero)(SetAggregator.reduce) == xs.toSet &&
      SetAggregator.finish(xs.toSet) == xs.distinct.sorted
  }

  property("merge is commutative and associative (shuffle-order independence)") =
    Prop.forAll(ids, ids, ids) { (a, b, c) =>
      val (sa, sb, sc) = (a.toSet, b.toSet, c.toSet)
      SetAggregator.merge(sa, sb) == SetAggregator.merge(sb, sa) &&
        SetAggregator.merge(SetAggregator.merge(sa, sb), sc) ==
          SetAggregator.merge(sa, SetAggregator.merge(sb, sc))
    }

  property("hyperplane signs are deterministic ±1") =
    Prop.forAll(Gen.choose(0, 63), Gen.choose(0, 127)) { (i, d) =>
      val s = graft.operators.Similarity.hyperplaneSign(i, d)
      (s == 1.0 || s == -1.0) && s == graft.operators.Similarity.hyperplaneSign(i, d)
    }
}

/** Laws for the bounded top-k buffer: any partitioning of the input into
  * reduce/merge trees must equal the global sorted top-k — the property that
  * makes map-side combine safe at any parallelism.
  */
object TopKLaws extends Properties("TopKAggregator") {
  import graft.operators.TopKAggregator
  import graft.operators.TopKAggregator.Scored

  private val rows = Gen.listOf(for {
    // NaN included: the buffer order must stay total (NaN ranks last) or
    // insert/merge evict non-deterministically across partitionings
    score <- Gen.frequency(
      9 -> Gen.chooseNum(-1e6, 1e6),
      1 -> Gen.const(Double.NaN))
    id <- Gen.chooseNum(0L, 50L) // small id range => score ties happen
  } yield Scored(score, id))

  // scala 2.13's default Ordering[Double] is TotalOrdering: NaN is the
  // maximum, so -score ascending ranks NaN last — same order as the
  // aggregator's `before`
  private def globalTopK(xs: Seq[Scored], k: Int): Seq[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  // case-class == is IEEE on the Double field (NaN != NaN); compare bits
  private def canon(xs: Seq[Scored]): Seq[(Long, Long)] =
    xs.map(s => (java.lang.Double.doubleToLongBits(s.score), s.id))

  property("fold-reduce equals sorted top-k") =
    Prop.forAll(rows, Gen.choose(1, 7)) { (xs, k) =>
      val agg = TopKAggregator(k)
      canon(agg.finish(xs.foldLeft(agg.zero)(agg.reduce))) == canon(globalTopK(xs, k))
    }

  property("non-positive k is rejected at construction") =
    Prop.forAll(Gen.choose(-5, 0)) { k =>
      Prop.throws(classOf[IllegalArgumentException])(TopKAggregator(k))
    }

  property("arbitrary partition + merge equals sorted top-k (shuffle independence)") =
    Prop.forAll(rows, Gen.choose(1, 7), Gen.choose(1, 5)) { (xs, k, nParts) =>
      val agg = TopKAggregator(k)
      val partials = xs.zipWithIndex
        .groupBy(_._2 % nParts).values.map(_.map(_._1))
        .map(_.foldLeft(agg.zero)(agg.reduce))
      val merged = partials.foldLeft(agg.zero)(agg.merge)
      canon(agg.finish(merged)) == canon(globalTopK(xs, k))
    }
}
