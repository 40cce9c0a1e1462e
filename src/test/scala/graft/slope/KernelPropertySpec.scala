package graft.slope

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** ScalaCheck-generator property suite for the driver-side SLOPE math
  * kernel — randomized invariants that hand-picked cases can't cover
  * (SURVEY §5). Generators are sampled with deterministic seeds (the
  * offline environment has no scalatest↔scalacheck bridge artifact, so
  * trials drive `Gen` directly — 100 cases per property, reproducible).
  * The prox properties are the textbook characterization of the sorted-L1
  * proximal operator; any violation means the PAVA implementation is wrong
  * on some input shape.
  */
class KernelPropertySpec extends AnyFunSuite {

  private val params = Gen.Parameters.default
  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(params, Seed(seed))

  private val vecGen: Gen[Array[Double]] =
    Gen.choose(1, 24).flatMap(p =>
      Gen.listOfN(p, Gen.choose(-10.0, 10.0)).map(_.toArray))

  private def lambdaGen(p: Int): Gen[Array[Double]] =
    Gen.listOfN(p, Gen.choose(0.0, 5.0)).map(_.toArray.sortBy(-(_: Double)))

  private def trials(f: (Array[Double], Array[Double], Long) => Unit): Unit =
    for (t <- 0 until 100) {
      val b = sample(vecGen, 1000L + t)
      val lambda = sample(lambdaGen(b.length), 2000L + t)
      f(b, lambda, t.toLong)
    }

  private def objective(x: Array[Double], b: Array[Double],
                        lambda: Array[Double]): Double = {
    var q = 0.0
    for (i <- x.indices) { val d = x(i) - b(i); q += 0.5 * d * d }
    q + SortedL1.penalty(x, lambda)
  }

  test("prox minimizes the proximal objective against random perturbations") {
    trials { (b, lambda, t) =>
      val px = SortedL1.prox(b, lambda)
      val base = objective(px, b, lambda)
      val rng = new scala.util.Random(t)
      for (_ <- 0 until 20) {
        val cand = px.map(v => v + (rng.nextDouble() - 0.5) * 0.2)
        assert(objective(cand, b, lambda) >= base - 1e-9)
      }
    }
  }

  test("prox is firmly nonexpansive: ||prox(x) - prox(y)|| <= ||x - y||") {
    trials { (b, lambda, t) =>
      val rng = new scala.util.Random(t ^ 0x5bf03635L)
      val y = b.map(v => v + rng.nextGaussian())
      val px = SortedL1.prox(b, lambda)
      val py = SortedL1.prox(y, lambda)
      def dist(a: Array[Double], c: Array[Double]) =
        math.sqrt(a.indices.map(i => (a(i) - c(i)) * (a(i) - c(i))).sum)
      assert(dist(px, py) <= dist(b, y) + 1e-9)
    }
  }

  test("prox positive-scaling: prox_{cλ}(c·x) = c·prox_λ(x)") {
    trials { (b, lambda, t) =>
      val c = sample(Gen.choose(0.1, 4.0), 3000L + t)
      val scaled = SortedL1.prox(b.map(_ * c), lambda.map(_ * c))
      val ref = SortedL1.prox(b, lambda).map(_ * c)
      for (i <- b.indices)
        assert(math.abs(scaled(i) - ref(i)) <= 1e-9 * math.max(1.0, math.abs(ref(i))))
    }
  }

  test("prox magnitudes shrink, keep sign, and are isotonic in input order") {
    trials { (b, lambda, _) =>
      val px = SortedL1.prox(b, lambda)
      for (i <- b.indices) {
        assert(math.abs(px(i)) <= math.abs(b(i)) + 1e-12)
        assert(px(i) == 0.0 || math.signum(px(i)) == math.signum(b(i)))
      }
      val order = b.indices.sortBy(i => -math.abs(b(i)))
      for (w <- order.sliding(2) if w.length == 2)
        assert(math.abs(px(w(0))) >= math.abs(px(w(1))) - 1e-12)
    }
  }

  test("infeasibility is non-negative and zero on gradients scaled into the dual ball") {
    trials { (g, lambda, _) =>
      assert(SortedL1.infeasibility(g, lambda) >= 0.0)
      val sortedAbs = g.map(math.abs).sorted(Ordering[Double].reverse)
      val cumG = sortedAbs.scanLeft(0.0)(_ + _).tail
      val cumL = lambda.scanLeft(0.0)(_ + _).tail
      val maxRatio = cumG.zip(cumL).map { case (cg, cl) =>
        if (cl > 0) cg / cl else if (cg > 0) Double.PositiveInfinity else 0.0
      }.max
      if (maxRatio > 0 && maxRatio.isFinite) {
        val inside = g.map(_ / (maxRatio * (1 + 1e-12)))
        assert(SortedL1.infeasibility(inside, lambda) <= 1e-9)
      }
    }
  }

  test("family pseudo-gradients match finite differences of the primal") {
    val h = 1e-6
    for (t <- 0 until 100) {
      val rng = new scala.util.Random(7000L + t)
      val fams: Seq[(Family, Int, () => Array[Double])] = Seq(
        (Gaussian, 1, () => Array(rng.nextGaussian() * 2)),
        (Binomial, 1, () => Array(if (rng.nextBoolean()) 1.0 else -1.0)),
        (Poisson, 1, () => Array(rng.nextInt(6).toDouble)),
        (Multinomial, 2, () => {
          // one-hot over m−1 targets (or all-zero = reference class)
          val out = new Array[Double](2)
          val c = rng.nextInt(3)
          if (c < 2) out(c) = 1.0
          out
        }))
      for ((fam, mT, genY) <- fams) {
        val y = genY()
        val lp = Array.fill(mT)(rng.nextGaussian() * 2)
        val g = fam.rowPseudoGradient(y, lp)
        for (j <- 0 until mT) {
          val up = lp.clone(); up(j) += h
          val dn = lp.clone(); dn(j) -= h
          val fd = (fam.rowPrimal(y, up) - fam.rowPrimal(y, dn)) / (2 * h)
          assert(math.abs(g(j) - fd) < 1e-4 * math.max(1.0, math.abs(fd)),
            s"${fam.name} target $j: analytic ${g(j)} vs fd $fd (y=${y.toSeq}, lp=${lp.toSeq})")
        }
      }
    }
  }

  test("bh sequence: non-increasing, positive, pointwise decreasing in q") {
    for (t <- 0 until 100) {
      val p = sample(Gen.choose(1, 200), 4000L + t)
      val q1 = sample(Gen.choose(0.01, 0.99), 5000L + t)
      val q2 = sample(Gen.choose(0.01, 0.99), 6000L + t)
      val s1 = LambdaSequence.bh(p, q1)
      assert(s1.forall(_ > 0))
      for (w <- s1.sliding(2) if w.length == 2) assert(w(0) >= w(1))
      val lo = math.min(q1, q2); val hi = math.max(q1, q2)
      if (hi - lo > 1e-6) {
        val sLo = LambdaSequence.bh(p, lo)
        val sHi = LambdaSequence.bh(p, hi)
        for (i <- sLo.indices) assert(sLo(i) >= sHi(i) - 1e-12)
      }
    }
  }
}
