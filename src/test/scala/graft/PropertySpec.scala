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

/** Laws for the sequence-packing walk: any walk-ordered input packs with
  * full coverage, no overflow, dense bin/pos numbering, and a new bin opens
  * ONLY when the chunk genuinely does not fit — next-fit, not
  * first-chunk-per-bin.
  */
object PackingLaws extends Properties("Packing") {
  import graft.operators.Packing
  import graft.operators.Packing.ChunkMeta

  private val budget = 64
  // walk-ordered shard-contiguous input, sizes in [1, budget]
  private val walks: Gen[List[ChunkMeta]] = for {
    nShards <- Gen.choose(1, 4)
    chunks <- Gen.listOf(for {
      shard <- Gen.choose(0, nShards - 1)
      n <- Gen.choose(1, budget)
    } yield (shard, n))
  } yield chunks.sortBy(_._1).zipWithIndex.map { case ((s, n), i) =>
    ChunkMeta(doc_id = i.toLong, chunk_idx = 0, n_tokens = n, pack_h = i.toLong, shard = s)
  }

  property("coverage, order, overflow, density, and next-fit minimality") =
    Prop.forAll(walks) { xs =>
      val out = Packing.packIterator(xs.iterator, budget).toList
      val coverage = out.map(_.doc_id) == xs.map(_.doc_id) // same rows, same order
      val noOverflow = out.groupBy(o => (o.shard, o.bin))
        .values.forall(_.map(_.n_tokens).sum <= budget)
      val dense = out.groupBy(o => (o.shard, o.bin)).values.forall(b =>
        b.map(_.pack_pos).sorted == b.indices.toList) &&
        out.groupBy(_.shard).values.forall(s =>
          s.map(_.bin).distinct.sorted == (0 to s.map(_.bin).max).toList)
      // next-fit: consecutive rows in one shard open a new bin only on a
      // genuine overflow of the bin being closed
      val minimal = out.zip(out.drop(1)).forall { case (a, b) =>
        b.shard != a.shard || b.bin == a.bin || {
          val closedFill = out.filter(o => o.shard == a.shard && o.bin == a.bin)
            .map(_.n_tokens).sum
          closedFill + b.n_tokens > budget
        }
      }
      coverage && noOverflow && dense && minimal
    }

  property("oversized chunk fails fast") =
    Prop.forAll(Gen.choose(budget + 1, budget * 3)) { n =>
      val bad = ChunkMeta(1L, 0, n, 1L, 0)
      Prop.throws(classOf[IllegalArgumentException])(
        Packing.packIterator(Iterator(bad), budget).toList)
    }
}

/** Laws for the forward as-of matcher: in-order delivery (each batch's
  * events at or above the previous high-water mark) must reproduce the
  * batch forward-as-of-with-tolerance result exactly, for ANY batch split.
  */
object ForwardAsOfLaws extends Properties("StreamingAsOf.forwardStep") {
  import graft.streaming.StreamingAsOf
  import graft.streaming.StreamingAsOf.{Enriched, FEvent, FState}

  private val tol = 10L
  private val scenarios: Gen[(List[FEvent], List[Int])] = for {
    n <- Gen.choose(0, 24)
    evs <- Gen.listOfN(n, for {
      t <- Gen.choose(0L, 60L)
      side <- Gen.oneOf(0, 1)
    } yield (t, side))
    cuts <- Gen.listOf(Gen.choose(0, math.max(n - 1, 0)))
  } yield {
    // in-order delivery: sort by time; unique payloads label each event
    val ordered = evs.sortBy(_._1).zipWithIndex.map { case ((t, side), i) =>
      FEvent("k", t, side, s"pl$i-t$t", new java.sql.Timestamp(t))
    }
    (ordered, cuts.distinct.sorted)
  }

  private def batchReference(evs: Seq[FEvent]): Set[(String, Long, String)] = {
    val builds = evs.filter(_.side == 0).groupBy(_.t)
      .map { case (t, es) => (t, es.map(_.pl).max) }.toSeq.sortBy(_._1)
    evs.filter(_.side == 1).flatMap { p =>
      builds.collectFirst {
        case (bt, bpl) if bt >= p.t && bt <= p.t + tol => (p.pl, bt, bpl)
      }
    }.toSet
  }

  property("any in-order batch split + final flush equals the batch result") =
    Prop.forAll(scenarios) { case (evs, cuts) =>
      val batches = { // split the ordered stream at the generated cut points
        val bounds = (0 +: cuts.filter(_ <= evs.size) :+ evs.size).distinct.sorted
        bounds.zip(bounds.drop(1)).map { case (a, b) => evs.slice(a, b) }
      }
      var st = FState(Nil, Nil)
      var wm = 0L // watermark trails: max event time of PRIOR batches
      val emitted = Seq.newBuilder[Enriched]
      batches.foreach { b =>
        val (next, out) = StreamingAsOf.forwardStep(st, b, wm, tol)
        st = next; emitted ++= out
        if (b.nonEmpty) wm = math.max(wm, b.map(_.t).max)
      }
      val (_, tail) = StreamingAsOf.forwardStep(st, Nil, Long.MaxValue / 2, tol)
      emitted ++= tail
      val got = emitted.result().map(e => (e.probePl, e.buildT, e.buildPl)).toSet
      val want = batchReference(evs)
      Prop(got == want) :| s"got $got, want $want"
    }
}
