package graft.slope

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite

class InterpolationSpec extends AnyFunSuite {

  test("exact path values map to themselves with frac 1") {
    val path = Array(10.0, 5.0, 1.0)
    val br = Interpolation.interpolatePenalty(path, Array(5.0))
    assert(br.frac(0) == 1.0)
    assert(br.left(0) == 1 && br.right(0) == 1)
  }

  test("midpoints interpolate linearly between bracketing steps") {
    val path = Array(10.0, 6.0, 2.0)
    val br = Interpolation.interpolatePenalty(path, Array(8.0))
    assert(br.left(0) == 0 && br.right(0) == 1)
    assert(math.abs(br.frac(0) - 0.5) < 1e-12)
    val betas = IndexedSeq(
      DenseMatrix((1.0, 2.0)),
      DenseMatrix((3.0, 6.0)),
      DenseMatrix((5.0, 10.0)))
    val out = Interpolation.interpolateCoefficients(betas, br)
    assert(math.abs(out(0)(0, 0) - 2.0) < 1e-12)
    assert(math.abs(out(0)(0, 1) - 4.0) < 1e-12)
  }

  test("out-of-range requests clamp to the path endpoints") {
    val path = Array(10.0, 5.0, 1.0)
    val hi = Interpolation.interpolatePenalty(path, Array(100.0))
    assert(hi.left(0) == 0 && hi.right(0) == 0 && hi.frac(0) == 1.0)
    val lo = Interpolation.interpolatePenalty(path, Array(0.001))
    assert(lo.left(0) == 2 && lo.right(0) == 2 && lo.frac(0) == 1.0)
  }

  test("single-step path always returns that step") {
    val br = Interpolation.interpolatePenalty(Array(3.0), Array(1.0, 3.0, 99.0))
    assert(br.left.forall(_ == 0) && br.right.forall(_ == 0) && br.frac.forall(_ == 1.0))
  }

  test("interpolation is exact for linear-in-penalty coefficients") {
    // β(σ) = a + b·σ ⇒ linear interpolation in σ is exact at any requested σ
    val path = Array(8.0, 4.0, 2.0, 1.0)
    val beta = path.map(s => DenseMatrix((2.0 + 3.0 * s)))
    for (s <- Seq(6.0, 3.0, 1.5, 1.2)) {
      val br = Interpolation.interpolatePenalty(path, Array(s))
      val out = Interpolation.interpolateCoefficients(beta.toIndexedSeq, br)
      assert(math.abs(out(0)(0, 0) - (2.0 + 3.0 * s)) < 1e-9, s"at sigma $s")
    }
  }
}
