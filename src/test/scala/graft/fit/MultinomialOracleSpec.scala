package graft.fit

import breeze.linalg.{DenseMatrix, DenseVector, inv}
import org.scalatest.funsuite.AnyFunSuite
import graft.slope._

/** σ→0 multinomial limit vs an independent Newton solver for unregularized
  * softmax regression in the reference's m−1 full-rank parametrization
  * (mirrors test-multinomial.R's glmnet(lambda=0) oracle).
  */
class MultinomialOracleSpec extends AnyFunSuite {

  test("multinomial sigma→0 limit matches full-rank softmax Newton oracle") {
    val prob = RandomProblem(n = 300, p = 2, family = Multinomial, nTargets = 2,
      amplitude = 1.0, seed = 77L)
    val (xs, ctr, scl) = RandomProblem.standardizeLocal(prob.x, intercept = true,
      center = true, scale = "l2")
    val ops = new LocalOps(xs, prob.y, Multinomial, true)
    val fit = SlopePath.fit(ops,
      SlopeConfig(family = "multinomial", sigma = Array(1e-7)),
      ctr, scl, Array(0.0, 0.0), Array(1.0, 1.0))
    val beta = fit.betas.head // 3×2 (intercept + 2 features; 2 targets)

    // Newton on raw design with intercept: θ is 3×2, flattened col-major
    val n = prob.x.rows
    val xi = DenseMatrix.horzcat(DenseMatrix.ones[Double](n, 1), prob.x)
    val d = 3 * 2
    var theta = DenseVector.zeros[Double](d)
    for (_ <- 0 until 80) {
      val th = new DenseMatrix(3, 2, theta.toArray)
      val lp = xi * th // n×2
      val grad = DenseVector.zeros[Double](d)
      val hess = DenseMatrix.zeros[Double](d, d)
      for (i <- 0 until n) {
        val lpRow = Array(lp(i, 0), lp(i, 1))
        val lse = MathUtil.logSumExp0(lpRow)
        val pRow = Array(math.exp(lpRow(0) - lse), math.exp(lpRow(1) - lse))
        for (a <- 0 until 2; j <- 0 until 3) {
          grad((a * 3) + j) += xi(i, j) * (pRow(a) - prob.y(i, a))
          for (b <- 0 until 2; k <- 0 until 3) {
            val w = pRow(a) * ((if (a == b) 1.0 else 0.0) - pRow(b))
            hess((a * 3) + j, (b * 3) + k) += xi(i, j) * xi(i, k) * w
          }
        }
      }
      // small ridge for numerical safety in the Newton solve only
      for (r <- 0 until d) hess(r, r) += 1e-9
      theta = theta - inv(hess) * grad
    }
    val thetaM = new DenseMatrix(3, 2, theta.toArray)
    for (j <- 0 until 3; a <- 0 until 2)
      assert(math.abs(beta(j, a) - thetaM(j, a)) < 2e-3,
        s"coef ($j,$a): ${beta(j, a)} vs ${thetaM(j, a)}")
  }
}
