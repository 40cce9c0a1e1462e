package graft.slope

/** The sorted-L1 (SLOPE/OWL) norm toolkit: proximal operator, penalty value,
  * and dual infeasibility. These are the engine's defining operators.
  *
  * The prox is the stack-based pool-adjacent-violators algorithm of the
  * reference (reference src/prox.h:8-56): work on |β| sorted descending,
  * subtract λ, pool adjacent blocks whose running averages violate
  * monotonicity, clamp at zero, then undo the sort and restore signs.
  * O(p log p), driver-side — β lives on the driver between distributed
  * gradient passes (SURVEY.md §2.1 F8: inherently global, cannot be
  * partitioned; p caps the feature dimension, not row count).
  */
object SortedL1 {

  /** prox_{sorted-L1(λ)}(b). `lambda` must be non-increasing and
    * non-negative, with `lambda.length == b.length`.
    */
  def prox(b: Array[Double], lambda: Array[Double]): Array[Double] = {
    val p = b.length
    require(lambda.length == p, s"lambda length ${lambda.length} != ${p}")
    if (p == 0) return new Array[Double](0)

    val absB = new Array[Double](p)
    var i = 0
    while (i < p) { absB(i) = math.abs(b(i)); i += 1 }
    // descending order of |b|
    val order = Array.range(0, p).sortBy(j => -absB(j))
    val v = new Array[Double](p) // |b| sorted descending
    i = 0
    while (i < p) { v(i) = absB(order(i)); i += 1 }

    // Stack of blocks [idxI(k), idxJ(k)] with block sum s(k) and mean w(k).
    val s = new Array[Double](p)
    val w = new Array[Double](p)
    val idxI = new Array[Int](p)
    val idxJ = new Array[Int](p)
    var k = 0
    i = 0
    while (i < p) {
      idxI(k) = i
      idxJ(k) = i
      s(k) = v(i) - lambda(i)
      w(k) = s(k)
      while (k > 0 && w(k - 1) <= w(k)) {
        k -= 1
        idxJ(k) = i
        s(k) += s(k + 1)
        w(k) = s(k) / (i - idxI(k) + 1.0)
      }
      k += 1
      i += 1
    }

    var j = 0
    while (j < k) {
      val d = math.max(w(j), 0.0)
      var t = idxI(j)
      while (t <= idxJ(j)) { v(t) = d; t += 1 }
      j += 1
    }

    val out = new Array[Double](p)
    i = 0
    while (i < p) {
      out(order(i)) = v(i) * (if (b(order(i)) < 0) -1.0 else if (b(order(i)) > 0) 1.0 else 0.0)
      i += 1
    }
    out
  }

  /** Penalty value Σ λ_j |b|_(j) (|b| sorted descending). */
  def penalty(b: Array[Double], lambda: Array[Double]): Double = {
    val sorted = b.map(math.abs).sortBy(x => -x)
    var acc = 0.0
    var i = 0
    while (i < sorted.length) { acc += sorted(i) * lambda(i); i += 1 }
    acc
  }

  /** Dual infeasibility `max(max cumsum(sort(|g|, desc) − λ), 0)`
    * (reference src/infeasibility.h:8-12).
    */
  def infeasibility(g: Array[Double], lambda: Array[Double]): Double = {
    if (g.length == 0) return 0.0
    val sorted = g.map(math.abs).sortBy(x => -x)
    var cs = 0.0
    var mx = Double.NegativeInfinity
    var i = 0
    while (i < sorted.length) {
      cs += sorted(i) - lambda(i)
      if (cs > mx) mx = cs
      i += 1
    }
    math.max(mx, 0.0)
  }
}
