package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.schema.{Params, Region}
import graft.pipeline.GenData

/** Property-based invariants the reference implies (SURVEY.md §5.3).
  * ScalaCheck generators are driven with fixed seeds (no scalatestplus bridge
  * in the offline cache), so failures are reproducible.
  */
class PropertySpec extends AnyFunSuite {

  private val regionGen: Gen[Region] = for {
    x0 <- Gen.choose(0, 200)
    y0 <- Gen.choose(0, 200)
    w <- Gen.choose(1, 100)
    h <- Gen.choose(1, 100)
    s <- Gen.choose(0.0, 1.0)
  } yield Region("t", x0, y0, x0 + w, y0 + h, s)

  private val regionsGen: Gen[List[Region]] = Gen.listOfN(12, regionGen)

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(1234L + i)))

  test("sortBoxes is a permutation") {
    samples(regionsGen, 200).foreach { rs =>
      assert(Order.sortBoxes(rs).sortBy(r => (r.x0, r.y0, r.x1, r.y1, r.score)) ==
        rs.sortBy(r => (r.x0, r.y0, r.x1, r.y1, r.score)))
    }
  }

  test("dedup output is a subsequence of its input and idempotent") {
    samples(regionsGen, 200).foreach { rs =>
      val out = Order.dedupBoxes(rs)
      var i = 0
      out.foreach { r =>
        val j = rs.indexWhere(_ == r, i)
        assert(j >= i)
        i = j + 1
      }
      assert(Order.dedupBoxes(out) == out)
    }
  }

  test("extraction is deterministic and emits regions within payload bounds") {
    (0 until 300).foreach { i =>
      val payload = GenData.payload(99L, s"prop-$i")
      val r1 = Detect.extract(payload)
      val r2 = Detect.extract(payload)
      assert(r1 == r2)
      val decoded = Payload.decode(payload)
      r1.foreach { r =>
        assert(r.x0 >= 0 && r.y0 >= 0 && r.x1 <= decoded.width && r.y1 <= decoded.height)
        assert(r.x0 <= r.x1 && r.y0 <= r.y1)
        assert(r.score >= 0.0 && r.score <= 1.0)
      }
    }
  }

  test("surviving dedup pairs: the reference keep-rule no longer fires") {
    samples(regionsGen, 200).foreach { rs =>
      val out = Order.dedupBoxes(rs).toIndexedSeq
      for (i <- out.indices; j <- i + 1 until out.length) {
        val v1 = Geom.partialOverlap(out(i), out(j))
        val v2 = Geom.partialOverlap(out(j), out(i))
        // if v1 >= v2 the later would have been dropped when v1 >= thr;
        // the asymmetric branch can legitimately leave v2 >= thr pairs when
        // the earlier box was dropped by a different partner first.
        if (v1 >= v2) assert(v1 < Params.DedupThresh)
      }
    }
  }
}
