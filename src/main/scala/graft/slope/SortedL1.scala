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

  /** Indices of `keys` in DESCENDING key order, allocation-lean: a
    * primitive-key mergesort (no Integer/Double boxing — these sorts run on
    * the driver between every distributed pass, over p·m entries).
    */
  private[slope] def descendingOrder(keys: Array[Double]): Array[Int] = {
    val n = keys.length
    val idx = Array.range(0, n)
    val tmp = new Array[Int](n)
    def merge(lo: Int, mid: Int, hi: Int): Unit = {
      System.arraycopy(idx, lo, tmp, lo, hi - lo)
      var i = lo; var j = mid; var k = lo
      while (k < hi) {
        if (i < mid && (j >= hi || keys(tmp(i)) >= keys(tmp(j)))) {
          idx(k) = tmp(i); i += 1
        } else { idx(k) = tmp(j); j += 1 }
        k += 1
      }
    }
    def sort(lo: Int, hi: Int): Unit =
      if (hi - lo > 1) {
        val mid = lo + (hi - lo) / 2
        sort(lo, mid); sort(mid, hi); merge(lo, mid, hi)
      }
    sort(0, n)
    idx
  }

  /** Sorted-descending copy of |xs| without boxing. */
  private[slope] def absSortedDesc(xs: Array[Double]): Array[Double] = {
    val a = new Array[Double](xs.length)
    var i = 0
    while (i < xs.length) { a(i) = math.abs(xs(i)); i += 1 }
    java.util.Arrays.sort(a)
    // reverse in place
    var lo = 0; var hi = a.length - 1
    while (lo < hi) { val t = a(lo); a(lo) = a(hi); a(hi) = t; lo += 1; hi -= 1 }
    a
  }

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
    // descending order of |b| (unboxed sort — hot driver path)
    val order = descendingOrder(absB)
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
    val sorted = absSortedDesc(b)
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
    val sorted = absSortedDesc(g)
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
