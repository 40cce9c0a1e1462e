package graft.slope

import breeze.linalg.DenseMatrix
import org.scalatest.funsuite.AnyFunSuite

class ScreeningSpec extends AnyFunSuite {

  private def colMat(values: Double*): DenseMatrix[Double] =
    new DenseMatrix(values.length, 1, values.toArray)

  test("strong rule keeps features with large previous gradient") {
    // p=3, m=1. λ = λ_prev = (1,1,1)·σ with σ=1. Condition per sorted entry:
    // |g| + λ_prev − 2λ = |g| − 1 ≥ 0 cumulatively.
    val g = colMat(5.0, 0.1, 2.0)
    val lam = Array(1.0, 1.0, 1.0)
    val out = Screening.strongSet(g, lam, lam, intercept = false)
    // sorted |g| = (5, 2, 0.1) → prefix sums of (4, 1, −0.9): s=4≥0 → k=1,
    // s=1≥0 → k=2, s=−0.9 <0 and i+k reaches p → k=2 → features {0, 2}
    assert(out.sameElements(Array(0, 2)))
  }

  test("strong rule returns empty set when gradient is far inside the dual ball") {
    val g = colMat(0.1, 0.05)
    val lam = Array(1.0, 1.0)
    val out = Screening.strongSet(g, lam, lam, intercept = false)
    assert(out.isEmpty)
  }

  test("strong rule prepends the intercept index and shifts features") {
    val g = new DenseMatrix(3, 1, Array(99.0, 5.0, 0.01)) // row 0 = intercept
    val lam = Array(1.0, 1.0)
    val out = Screening.strongSet(g, lam, lam, intercept = true)
    assert(out.head == 0)
    assert(out.contains(1)) // feature 0 (grad 5) shifted to row 1
    assert(!out.contains(2))
  }

  test("kktCheck flags zero-coef features whose gradient breaks the sorted-L1 dual bound") {
    // cumsums of sorted |g|−λ: (2−1)=1 > rh flags entry 0; 1+(0−1)=0 ≤ rh
    // leaves entry 1 clean.
    val g = colMat(2.0, 0.0)
    val beta = colMat(0.0, 0.0)
    val lam = Array(1.0, 1.0)
    val out = Screening.kktCheck(g, beta, lam, tol = 1e-3, intercept = false)
    assert(out.sameElements(Array(0)))
    // the violation is prefix-cumulative: a big leading gradient keeps the
    // running sum positive and flags later entries too
    val out2 = Screening.kktCheck(colMat(5.0, 0.1), beta, lam, tol = 1e-3, intercept = false)
    assert(out2.sameElements(Array(0, 1)))
  }

  test("kktCheck never flags nonzero-coef features") {
    val g = colMat(5.0, 4.0)
    val beta = colMat(1.0, 0.0)
    val lam = Array(1.0, 1.0)
    val out = Screening.kktCheck(g, beta, lam, tol = 1e-3, intercept = false)
    // entry 0 violates but has β≠0 → cleared; entry 1: cumsum (4) + (3) > rh
    assert(out.sameElements(Array(1)))
  }

  test("kktCheck passes a feasible gradient") {
    val g = colMat(0.5, 0.3)
    val beta = colMat(0.0, 0.0)
    val lam = Array(1.0, 1.0)
    assert(Screening.kktCheck(g, beta, lam, tol = 1e-3, intercept = false).isEmpty)
  }

  test("kktCheck shifts indices past the intercept row") {
    // features (1.5, 0.4): cumsums (0.5, −0.1) → only feature 0 flagged,
    // reported at row 1 (past the intercept row)
    val g = new DenseMatrix(3, 1, Array(0.0, 1.5, 0.4))
    val beta = DenseMatrix.zeros[Double](3, 1)
    val lam = Array(1.0, 1.0)
    val out = Screening.kktCheck(g, beta, lam, tol = 1e-3, intercept = true)
    assert(out.sameElements(Array(1)))
  }

  test("set algebra on sorted arrays") {
    assert(Sets.union(Array(1, 3, 5), Array(2, 3, 6)).sameElements(Array(1, 2, 3, 5, 6)))
    assert(Sets.diff(Array(1, 3, 5), Array(3)).sameElements(Array(1, 5)))
    assert(Sets.intersect(Array(1, 3, 5), Array(3, 5, 7)).sameElements(Array(3, 5)))
    assert(Sets.union(Array.empty[Int], Array(1)).sameElements(Array(1)))
  }
}
