package graft

import graft.functions.TopK
import graft.functions.TopK.Scored
import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the bounded top-k Aggregator: against the
  * sort-everything reference implementation, under arbitrary
  * reduce/merge orders (the distributed execution can split and merge
  * partitions any way it likes). */
object TopKProps extends Properties("TopK") {

  private val scoredGen = for {
    id <- Gen.choose(0L, 50L)
    score <- Gen.oneOf(Gen.choose(-1.0, 1.0), Gen.oneOf(0.0, 0.5, -0.5))
  } yield Scored(id, score)

  private val listGen = Gen.listOf(scoredGen)

  private def reference(xs: List[Scored], k: Int): List[Scored] =
    xs.sortBy(s => (-s.score, s.id)).take(k)

  property("reduce-only equals sort-take reference") =
    Prop.forAll(listGen, Gen.choose(1, 8)) { (xs, k) =>
      val agg = new TopK.TopKAggregator(k)
      xs.foldLeft(agg.zero)(agg.reduce).toList == reference(xs, k)
    }

  property("arbitrary partition splits + merges equal the reference") =
    Prop.forAll(listGen, Gen.choose(1, 8), Gen.choose(1, 5)) { (xs, k, nParts) =>
      val agg = new TopK.TopKAggregator(k)
      val parts = xs.grouped(math.max(1, (xs.size + nParts - 1) / nParts)).toList
      val buffers = parts.map(p => p.foldLeft(agg.zero)(agg.reduce))
      val merged = buffers.foldLeft(agg.zero)(agg.merge)
      agg.finish(merged).toList == reference(xs, k)
    }
}
