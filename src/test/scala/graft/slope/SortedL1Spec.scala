package graft.slope

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

class SortedL1Spec extends AnyFunSuite {

  private def randomCase(rng: Random): (Array[Double], Array[Double]) = {
    val p = 1 + rng.nextInt(40)
    val b = Array.fill(p)(rng.nextDouble() * 20.0 - 10.0)
    val lam = Array.fill(p)(rng.nextDouble() * 3.0).sortBy(x => -x)
    (b, lam)
  }

  test("prox with zero lambda is identity") {
    val rng = new Random(1)
    for (_ <- 1 to 200) {
      val b = Array.fill(1 + rng.nextInt(20))(rng.nextDouble() * 10 - 5)
      val out = SortedL1.prox(b, Array.fill(b.length)(0.0))
      out.zip(b).foreach { case (o, x) => assert(math.abs(o - x) < 1e-12) }
    }
  }

  test("prox with constant lambda equals elementwise soft-thresholding") {
    val rng = new Random(2)
    for (_ <- 1 to 500) {
      val l = rng.nextDouble() * 4.0
      val b = Array.fill(1 + rng.nextInt(30))(rng.nextDouble() * 16 - 8)
      val out = SortedL1.prox(b, Array.fill(b.length)(l))
      val st = b.map(x => math.signum(x) * math.max(math.abs(x) - l, 0.0))
      out.zip(st).foreach { case (o, e) => assert(math.abs(o - e) < 1e-10, s"$o vs $e") }
    }
  }

  test("prox output magnitudes are isotonic in input-magnitude order, shrink, keep sign") {
    val rng = new Random(3)
    for (_ <- 1 to 500) {
      val (b, lam) = randomCase(rng)
      val out = SortedL1.prox(b, lam)
      val mags = b.indices.sortBy(i => -math.abs(b(i))).map(i => math.abs(out(i)))
      mags.sliding(2).foreach {
        case Seq(a, c) => assert(a >= c - 1e-12)
        case _         =>
      }
      b.indices.foreach { i =>
        assert(math.abs(out(i)) <= math.abs(b(i)) + 1e-12)
        assert(out(i) == 0.0 || math.signum(out(i)) == math.signum(b(i)))
      }
    }
  }

  test("prox minimizes the proximal objective vs candidate points") {
    // ½‖x−b‖² + Σλ|x|_(i) at the prox output must not exceed the objective
    // at soft-threshold / zero / identity / perturbed-output candidates.
    def obj(x: Array[Double], b: Array[Double], lam: Array[Double]): Double = {
      var q = 0.0
      for (i <- x.indices) { val d = x(i) - b(i); q += 0.5 * d * d }
      q + SortedL1.penalty(x, lam)
    }
    val rng = new Random(4)
    for (_ <- 1 to 300) {
      val (b, lam) = randomCase(rng)
      val out = SortedL1.prox(b, lam)
      val fOut = obj(out, b, lam)
      val perturbed = out.map(x => x + (rng.nextDouble() - 0.5) * 0.01)
      val cands = Seq(
        b.map(x => math.signum(x) * math.max(math.abs(x) - lam(0), 0.0)),
        Array.fill(b.length)(0.0),
        b.clone(),
        perturbed)
      cands.foreach(c => assert(fOut <= obj(c, b, lam) + 1e-9))
    }
  }

  test("prox pooling hand-computed cases") {
    // b=(10, 9.9), λ=(5, 1): untied solution (5, 8.9) violates ordering →
    // pooled: argmin over x1=x2=t of ½((t−10)²+(t−9.9)²)+6t = 6.95.
    val out = SortedL1.prox(Array(10.0, 9.9), Array(5.0, 1.0))
    assert(math.abs(out(0) - 6.95) < 1e-12 && math.abs(out(1) - 6.95) < 1e-12)
    // no pooling, clamp at zero
    val out2 = SortedL1.prox(Array(5.0, 1.0), Array(2.0, 2.0))
    assert(math.abs(out2(0) - 3.0) < 1e-12 && out2(1) == 0.0)
    // sign and sort-order restoration
    val out3 = SortedL1.prox(Array(-2.0, 3.0), Array(2.0, 1.0))
    assert(math.abs(out3(0) - (-1.0)) < 1e-12 && math.abs(out3(1) - 1.0) < 1e-12)
  }

  test("infeasibility: zero inside the dual ball, cumulative-sum max outside") {
    val lam = Array(2.0, 1.0)
    assert(SortedL1.infeasibility(Array(1.5, 0.9), lam) == 0.0)
    assert(math.abs(SortedL1.infeasibility(Array(3.0, 0.0), lam) - 1.0) < 1e-12)
    // prefix sums: (2.5−2)=0.5, then +(2.5−1)=2.0 → max 2.0
    assert(math.abs(SortedL1.infeasibility(Array(2.5, 2.5), lam) - 2.0) < 1e-12)
  }

  test("penalty is the λ-weighted sorted-magnitude sum") {
    assert(math.abs(SortedL1.penalty(Array(-1.0, 3.0), Array(2.0, 1.0)) - 7.0) < 1e-12)
  }
}
