package graft

import graft.functions.KmvSketch
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** The KMV Aggregator's algebra, against the brute-force definition: for
  * ANY input multiset and ANY partitioning of it, reducing then merging
  * must yield exactly the k smallest distinct values. */
class KmvSketchSpec extends AnyFunSuite {

  private def check(prop: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  private val agg = new KmvSketch(8)

  private def viaAgg(chunks: Seq[Seq[Long]]): Seq[Long] = {
    val partials = chunks.map(_.foldLeft(agg.zero)(agg.reduce))
    partials.foldLeft(agg.zero)(agg.merge).toSeq
  }

  test("property: reduce+merge over any partitioning == k smallest distinct") {
    val gen = for {
      xs <- Gen.listOf(Gen.chooseNum(0L, 40L)) // dense → many duplicates
      cuts <- Gen.chooseNum(1, 5)
    } yield (xs, cuts)
    check(Prop.forAll(gen) { case (xs, cuts) =>
      val chunks = if (xs.isEmpty) Seq(Seq.empty[Long])
        else xs.grouped(math.max(1, xs.length / cuts)).toSeq
      val brute = xs.distinct.sorted.take(8)
      viaAgg(chunks) == brute
    })
  }

  test("property: merge is commutative and idempotent on the same sketch") {
    val bufGen = Gen.listOf(Gen.chooseNum(0L, 100L))
      .map(xs => xs.foldLeft(agg.zero)(agg.reduce))
    check(Prop.forAll(bufGen, bufGen) { (a, b) =>
      agg.merge(a, b).toSeq == agg.merge(b, a).toSeq &&
        agg.merge(a, a).toSeq == a.toSeq
    })
  }

  test("finish: (k_used, h_k) and exactness below k") {
    val b = Seq(5L, 3L, 9L, 3L, 5L).foldLeft(agg.zero)(agg.reduce)
    assert(agg.finish(b) === ((3L, 9L)))
    assert(agg.finish(agg.zero) === ((0L, 0L)))
  }
}
