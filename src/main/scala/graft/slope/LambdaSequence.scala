package graft.slope

/** Penalty-shape (λ) sequences and the σ path grid, matching the reference's
  * `regularizationPath` (reference src/regularizationPath.h:9-72).
  *
  * λ sequences are of length m·p (targets × features). σ scales the whole
  * λ vector; the σ grid is geometric from σ_max down to
  * σ_max·lambda_min_ratio. σ_max is the smallest σ for which the all-zero
  * solution is optimal, computed from the gradient at the null model.
  */
object LambdaSequence {

  /** Benjamini–Hochberg sequence λ_i = Φ⁻¹(1 − q·i/(2·nLambda)), i = 1..n
    * (reference src/regularizationPath.h:28-33).
    */
  def bh(nLambda: Int, q: Double): Array[Double] =
    Array.tabulate(nLambda)(i => MathUtil.qnorm(1.0 - (i + 1) * q / (2.0 * nLambda)))

  /** BH with the Monte-Carlo-free gaussian correction
    * `λ_i *= sqrt(1 + Σ_{j<i} λ_j² / max(1, n−i−1))`, then clamped to be
    * non-increasing from its minimum onward
    * (reference src/regularizationPath.h:35-46).
    */
  def gaussian(nLambda: Int, q: Double, n: Long): Array[Double] = {
    val lam = bh(nLambda, q)
    if (nLambda > 1) {
      var sumSq = 0.0
      var i = 1
      while (i < nLambda) {
        sumSq += lam(i - 1) * lam(i - 1)
        val w = math.max(1.0, (n - i - 1).toDouble)
        lam(i) *= math.sqrt(1.0 + sumSq / w)
        i += 1
      }
      // ensure non-increasing: everything from the (first) argmin on = min
      var iMin = 0
      i = 1
      while (i < nLambda) { if (lam(i) < lam(iMin)) iMin = i; i += 1 }
      val mn = lam(iMin)
      i = iMin
      while (i < nLambda) { lam(i) = mn; i += 1 }
    }
    lam
  }

  /** OSCAR sequence λ_i = q·(nLambda − i) + 1 for i = 1..nLambda
    * (reference src/regularizationPath.h:48-50).
    */
  def oscar(nLambda: Int, q: Double): Array[Double] =
    Array.tabulate(nLambda)(i => q * (nLambda - i - 1).toDouble + 1.0)

  /** User-supplied sequences are standardized by n
    * (reference src/regularizationPath.h:52-55).
    */
  def user(lam: Array[Double], n: Long): Array[Double] = lam.map(_ * n)

  def build(lambdaType: String, nLambda: Int, q: Double, n: Long,
            userLambda: Array[Double] = Array.empty): Array[Double] =
    lambdaType match {
      case "bh"       => bh(nLambda, q)
      case "gaussian" => gaussian(nLambda, q, n)
      case "oscar"    => oscar(nLambda, q)
      case "user"     => user(userLambda, n)
      case other      => throw new IllegalArgumentException(s"unknown lambda type: $other")
    }

  /** σ_max = max_k ( Σ_{i≤k} |∇f(0)|_(i) / Σ_{i≤k} λ_i )
    * (reference src/regularizationPath.h:64-65); |∇f(0)| from `lambdaMax`.
    */
  def sigmaMax(gradAbs: Array[Double], lambda: Array[Double]): Double = {
    require(gradAbs.length == lambda.length)
    val sorted = SortedL1.absSortedDesc(gradAbs)
    var cg = 0.0
    var cl = 0.0
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < sorted.length) {
      cg += sorted(i)
      cl += lambda(i)
      val r = cg / cl
      if (r > mx) mx = r
      i += 1
    }
    mx
  }

  /** Geometric grid `exp(linspace(log σmax, log(σmax·ratio), nSigma))`
    * (reference src/regularizationPath.h:67-71). For nSigma == 1 this is the
    * endpoint, matching Armadillo's linspace.
    */
  def sigmaGrid(sigmaMax: Double, lambdaMinRatio: Double, nSigma: Int): Array[Double] = {
    if (nSigma == 1) return Array(sigmaMax * lambdaMinRatio)
    val lo = math.log(sigmaMax)
    val hi = math.log(sigmaMax * lambdaMinRatio)
    Array.tabulate(nSigma)(i => math.exp(lo + (hi - lo) * i / (nSigma - 1.0)))
  }
}
