package graft

import graft.operators.Dedup
import org.scalacheck.{Gen, Prop, Properties}

/** The pigeonhole guarantee behind simhash banding, proven over
  * random signatures instead of just the planted corpus: any two
  * 60-bit signatures within the hamming budget MUST share at least
  * one compound band key, for every supported geometry. (The
  * converse — collisions above the budget — is allowed; the hamming
  * filter removes those.) */
object BandingProps extends Properties("SimhashBanding") {

  private val sigGen = Gen.choose(0L, (1L << 60) - 1)

  /** Flip up to `maxFlips` distinct bit positions. */
  private def flippedGen(maxFlips: Int): Gen[(Long, Long)] = for {
    sig <- sigGen
    n <- Gen.choose(0, maxFlips)
    bits <- Gen.pick(n, 0 until 60)
  } yield (sig, bits.foldLeft(sig)((s, b) => s ^ (1L << b)))

  property("hamming <= 3 pairs always share a compound key (4/5/6 chunks)") =
    Prop.forAll(flippedGen(3)) { case (a, b) =>
      Seq(4, 5, 6).forall { nc =>
        val ka = Dedup.bandingKeys(a, 3, nc).toSet
        val kb = Dedup.bandingKeys(b, 3, nc).toSet
        (ka intersect kb).nonEmpty
      }
    }

  property("key count is C(numChunks, numChunks - maxHamming)") =
    Prop.forAll(sigGen) { sig =>
      Dedup.bandingKeys(sig, 3, 4).size == 4 &&
      Dedup.bandingKeys(sig, 3, 5).size == 10 &&
      Dedup.bandingKeys(sig, 3, 6).size == 20
    }

  property("keys depend only on their own chunks") =
    Prop.forAll(sigGen, Gen.choose(0, 5), Gen.choose(1, 10)) { (sig, chunk, nBits) =>
      Seq(4, 5, 6).forall { nc =>
        val width = 60 / nc
        val c = chunk % nc
        // flip bits inside chunk c only
        val flipped = (0 until math.min(nBits, width)).foldLeft(sig) {
          (s, i) => s ^ (1L << (c * width + i))
        }
        val before = Dedup.bandingKeys(sig, 3, nc)
        val after = Dedup.bandingKeys(flipped, 3, nc)
        val combos = (0 until nc).combinations(nc - 3).toSeq
        combos.indices.forall { id =>
          if (combos(id).contains(c)) true // may change
          else before(id) == after(id)     // must not change
        }
      }
    }
}
