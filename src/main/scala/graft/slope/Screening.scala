package graft.slope

import breeze.linalg.DenseMatrix

/** Feature-screening operators: the SLOPE strong rule and the KKT
  * optimality check that repairs its violations. Both operate on the full
  * gradient matrix (p×m, column-major; row 0 is the intercept when present)
  * and return ascending row indices into the full coefficient matrix.
  *
  * These run driver-side on p·m doubles between distributed gradient passes —
  * the reference's analogue of dynamic partition pruning for the feature
  * dimension (SURVEY.md §4.1).
  */
object Screening {

  /** SLOPE strong rule (reference src/screening.h:7-53): on
    * |∇f(β_prev)| sorted descending, find the largest prefix k at which the
    * running sum of `|g|_(i) + λ_prev_i − 2λ_i` goes non-negative; those k
    * flattened entries mark candidate features. A feature row is in the
    * strong set if any of its m targets is marked. Index 0 (intercept) is
    * always included when `intercept`.
    */
  def strongSet(gradPrev: DenseMatrix[Double],
                lambda: Array[Double],
                lambdaPrev: Array[Double],
                intercept: Boolean): Array[Int] = {
    val m = gradPrev.cols
    val p = lambda.length // = m * pFeat
    val pFeat = p / m
    val skip = gradPrev.rows - pFeat // intercept rows to drop

    val absGrad = new Array[Double](p)
    var idx = 0
    var j = 0
    while (j < m) {
      var i = 0
      while (i < pFeat) {
        absGrad(idx) = math.abs(gradPrev(skip + i, j))
        idx += 1
        i += 1
      }
      j += 1
    }

    val ord = SortedL1.descendingOrder(absGrad)
    val tmp = Array.tabulate(p)(r => absGrad(ord(r)) + lambdaPrev(r) - 2.0 * lambda(r))

    var i = 0
    var k = 0
    var s = 0.0
    while (i + k < p) {
      s += tmp(k + i)
      if (s >= 0) { k = k + i + 1; i = 0; s = 0.0 }
      else i += 1
    }

    val active = new Array[Boolean](p)
    var r = 0
    while (r < k) { active(ord(r)) = true; r += 1 }

    val rows = (0 until pFeat).filter(f => (0 until m).exists(t => active(f + t * pFeat)))
    (if (intercept) 0 +: rows.map(_ + 1) else rows).toArray
  }

  /** KKT check for SLOPE (reference src/kktCheck.h:8-37): flag flattened
    * entries where `cumsum(sort(|∇|, desc) − λ) > max(√eps, tol·λ_0)` (in
    * original order), clear entries whose coefficient is already nonzero,
    * and return feature rows with any flagged target (shifted past the
    * intercept row when present).
    */
  def kktCheck(gradient: DenseMatrix[Double],
               beta: DenseMatrix[Double],
               lambda: Array[Double],
               tol: Double,
               intercept: Boolean): Array[Int] = {
    val skip = if (intercept) 1 else 0
    val pFeat = gradient.rows - skip
    val m = gradient.cols
    val p = pFeat * m

    val g = new Array[Double](p)
    val nonzero = new Array[Boolean](p)
    var idx = 0
    var j = 0
    while (j < m) {
      var i = 0
      while (i < pFeat) {
        g(idx) = math.abs(gradient(skip + i, j))
        nonzero(idx) = beta(skip + i, j) != 0.0
        idx += 1
        i += 1
      }
      j += 1
    }

    val ord = SortedL1.descendingOrder(g)
    val rh = math.max(math.sqrt(MathUtil.Eps), tol * lambda(0))
    val flag = new Array[Boolean](p)
    var cs = 0.0
    var r = 0
    while (r < p) {
      cs += g(ord(r)) - lambda(r)
      flag(ord(r)) = cs > rh
      r += 1
    }
    var i = 0
    while (i < p) { if (nonzero(i)) flag(i) = false; i += 1 }

    val rows = (0 until pFeat).filter(f => (0 until m).exists(t => flag(f + t * pFeat)))
    (if (intercept) rows.map(_ + 1) else rows).toArray
  }
}

/** Ordered-index-set algebra on sorted ascending arrays
  * (reference src/utils.h:27-46).
  */
object Sets {
  def union(a: Array[Int], b: Array[Int]): Array[Int] = {
    val out = new scala.collection.mutable.ArrayBuffer[Int](a.length + b.length)
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      if (a(i) < b(j)) { out += a(i); i += 1 }
      else if (a(i) > b(j)) { out += b(j); j += 1 }
      else { out += a(i); i += 1; j += 1 }
    }
    while (i < a.length) { out += a(i); i += 1 }
    while (j < b.length) { out += b(j); j += 1 }
    out.toArray
  }

  def diff(a: Array[Int], b: Array[Int]): Array[Int] = {
    val bs = b.toSet
    a.filterNot(bs)
  }

  def intersect(a: Array[Int], b: Array[Int]): Array[Int] = {
    val bs = b.toSet
    a.filter(bs)
  }
}
