package graft.slope

import org.scalatest.funsuite.AnyFunSuite

class LambdaSequenceSpec extends AnyFunSuite {

  test("bh matches known Φ⁻¹ values") {
    // q=0.1, n=2: λ1 = Φ⁻¹(1−0.025) = 1.959963984540054,
    //             λ2 = Φ⁻¹(1−0.05)  = 1.6448536269514722
    val lam = LambdaSequence.bh(2, 0.1)
    assert(math.abs(lam(0) - 1.959963984540054) < 1e-9)
    assert(math.abs(lam(1) - 1.6448536269514722) < 1e-9)
  }

  test("bh is non-increasing and positive for q in (0,1)") {
    for (q <- Seq(0.05, 0.1, 0.2, 0.5); p <- Seq(1, 3, 10, 100)) {
      val lam = LambdaSequence.bh(p, q)
      assert(lam.forall(_ > 0))
      lam.sliding(2).foreach {
        case Array(a, b) => assert(a >= b)
        case _           =>
      }
    }
  }

  test("gaussian correction: λ_i scaled by sqrt(1 + Σλ²/(n−i−1)) then clamped non-increasing") {
    val p = 10
    val q = 0.2
    val n = 100L
    val bh = LambdaSequence.bh(p, q)
    val g = LambdaSequence.gaussian(p, q, n)
    assert(g(0) == bh(0)) // first element untouched
    // second element: bh(1)*sqrt(1 + bh(0)²/(n−2))
    val exp1 = bh(1) * math.sqrt(1.0 + bh(0) * bh(0) / (n - 2).toDouble)
    assert(math.abs(g(1) - exp1) < 1e-12)
    g.sliding(2).foreach {
      case Array(a, b) => assert(a >= b - 1e-15)
      case _           =>
    }
  }

  test("gaussian clamp engages when n is small relative to p") {
    // small n forces the 1/(n−i−1) correction to blow up → min reached
    // early, tail filled with the min value
    val g = LambdaSequence.gaussian(20, 0.2, 10L)
    val mn = g.min
    val iMin = g.indexOf(mn)
    assert(iMin < g.length - 1, "clamp should engage before the end")
    (iMin until g.length).foreach(i => assert(g(i) == mn))
  }

  test("bh and gaussian sequences match an independent cross-language oracle") {
    // fixtures computed with Python statistics.NormalDist().inv_cdf
    // (independent Φ⁻¹ implementation) for p=10, q=0.2, n=100
    val bhExpected = Array(
      2.326347874040841, 2.053748910631822, 1.880793608151250, 1.750686071252169,
      1.644853626951472, 1.554773594596853, 1.475791028179170, 1.405071560309633,
      1.340755033690217, 1.281551565544601)
    val gaussExpected = Array(
      2.326347874040841, 2.109694425422352, 1.974096391494197, 1.871949969306888,
      1.788074581556193, 1.715664313524743, 1.651081833956999, 1.592157400247699,
      1.537494602611533, 1.486143095285984)
    val bhActual = LambdaSequence.bh(10, 0.2)
    val gaussActual = LambdaSequence.gaussian(10, 0.2, 100L)
    for (i <- 0 until 10) {
      assert(math.abs(bhActual(i) - bhExpected(i)) < 1e-12, s"bh($i)")
      assert(math.abs(gaussActual(i) - gaussExpected(i)) < 1e-12, s"gaussian($i)")
    }
  }

  test("oscar: q*(p−i)+1 for i=1..p") {
    val lam = LambdaSequence.oscar(4, 0.5)
    assert(lam.sameElements(Array(2.5, 2.0, 1.5, 1.0)))
  }

  test("user sequence is scaled by n") {
    assert(LambdaSequence.user(Array(2.0, 1.0), 50L).sameElements(Array(100.0, 50.0)))
  }

  test("sigmaMax makes the zero solution exactly critical") {
    // σ_max = max cumsum(sorted |g|)/cumsum(λ): at σ_max the null model is
    // on the boundary of the dual feasible region → infeasibility of g wrt
    // σ_max·λ is 0, and any smaller σ gives positive infeasibility.
    val g = Array(3.0, -1.0, 2.0, 0.5)
    val lam = Array(2.0, 1.5, 1.0, 0.5)
    val sm = LambdaSequence.sigmaMax(g, lam)
    assert(SortedL1.infeasibility(g, lam.map(_ * sm)) < 1e-12)
    assert(SortedL1.infeasibility(g, lam.map(_ * sm * 0.99)) > 0)
  }

  test("sigmaGrid is geometric from σmax to σmax·ratio") {
    val grid = LambdaSequence.sigmaGrid(10.0, 1e-2, 3)
    assert(math.abs(grid(0) - 10.0) < 1e-12)
    assert(math.abs(grid(1) - 1.0) < 1e-12)
    assert(math.abs(grid(2) - 0.1) < 1e-12)
    // single-point grid = endpoint (Armadillo linspace N=1 semantics)
    val one = LambdaSequence.sigmaGrid(10.0, 1e-2, 1)
    assert(math.abs(one(0) - 0.1) < 1e-12)
  }
}
