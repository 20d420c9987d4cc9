package graft

import org.scalatest.funsuite.AnyFunSuite

/** The 10×/100× linearity evidence rests on replicated copies being
  * pairwise-DISJOINT shards: each copy's cipher must be an injective letter
  * map (within-copy Jaccard/fingerprint relations preserved) and no two
  * copies may share a map (identical texts across copies would make every
  * doc an N-way near-duplicate and pair counts quadratic). */
class ScaleBenchSpec extends AnyFunSuite {

  test("affine cipher family: identity at 0, injective, pairwise-distinct past 100 copies") {
    val maps = (0 until 150).map(k => ScaleBench.affine(k))
    // copy 0 is the identity (the 1x baseline measures the raw corpus)
    assert(maps(0)._1 == maps(0)._2)
    maps.foreach { case (from, to) =>
      assert(from.length == 52 && to.length == 52)
      // injective: a substitution alphabet must be a permutation
      assert(to.toSet.size == 52)
      // lowercase maps to lowercase (token boundaries survive)
      assert(to.take(26).forall(_.isLower) && to.drop(26).forall(_.isUpper))
    }
    // pairwise distinct up to 150 copies (family size 312)
    assert(maps.map(_._2).distinct.size == 150)
  }
}
