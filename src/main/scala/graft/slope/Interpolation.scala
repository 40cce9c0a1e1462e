package graft.slope

import breeze.linalg.DenseMatrix

/** Linear interpolation of coefficients between path steps, for `coef`/
  * `predict` at penalty values that were not on the fitted path
  * (reference R/interpolatePenalty.R:10-37, R/interpolateCoefficients.R:9-27,
  * glmnet-derived semantics).
  */
object Interpolation {

  /** For each requested penalty, the bracketing path indices (0-based) and
    * the weight of the left (larger-penalty) step.
    */
  final case class Brackets(left: Array[Int], right: Array[Int], frac: Array[Double])

  /** `penalty` is the fitted path (decreasing); `requested` any values.
    * Requested values are clamped into the path's range.
    */
  def interpolatePenalty(penalty: Array[Double], requested: Array[Double]): Brackets = {
    val k = penalty.length
    val d = requested.length
    if (k == 1)
      return Brackets(Array.fill(d)(0), Array.fill(d)(0), Array.fill(d)(1.0))

    val pmax = penalty.max
    val pmin = penalty.min
    val denom = penalty(0) - penalty(k - 1)
    // degenerate path (all kept penalties equal): behave like the k == 1
    // case instead of dividing by zero into NaN positions
    if (denom == 0.0)
      return Brackets(Array.fill(d)(0), Array.fill(d)(0), Array.fill(d)(1.0))
    // normalized positions: 0 at the first (largest) penalty, 1 at the last
    val pn = penalty.map(p => (penalty(0) - p) / denom)

    val left = new Array[Int](d)
    val right = new Array[Int](d)
    val frac = new Array[Double](d)
    var t = 0
    while (t < d) {
      val x = MathUtil.clamp(requested(t), pmin, pmax)
      val v = (penalty(0) - x) / denom
      // locate v in the non-decreasing pn: pn(j) <= v <= pn(j+1)
      var j = 0
      while (j < k - 2 && pn(j + 1) < v) j += 1
      val coord =
        if (v <= pn(0)) 0.0
        else if (v >= pn(k - 1)) (k - 1).toDouble
        else j + (v - pn(j)) / (pn(j + 1) - pn(j))
      val l = math.floor(coord).toInt
      val r = math.ceil(coord).toInt
      left(t) = l
      right(t) = r
      frac(t) =
        if (l == r || math.abs(pn(l) - pn(r)) < MathUtil.Eps) 1.0
        else (v - pn(r)) / (pn(l) - pn(r))
      t += 1
    }
    Brackets(left, right, frac)
  }

  /** β_new_i = frac_i·β_left_i + (1−frac_i)·β_right_i. */
  def interpolateCoefficients(betas: IndexedSeq[DenseMatrix[Double]],
                              br: Brackets): IndexedSeq[DenseMatrix[Double]] =
    (0 until br.frac.length).map { i =>
      val l = betas(br.left(i))
      val r = betas(br.right(i))
      (l * br.frac(i)) + (r * (1.0 - br.frac(i)))
    }
}
