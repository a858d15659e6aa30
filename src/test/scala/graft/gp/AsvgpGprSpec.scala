package graft.gp

import breeze.linalg.{cholesky, DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** ASVGP correctness:
  *  - the RKHS inner product used for Kuu satisfies the reproducing
  *    property <k(z,.), phi_j>_H == phi_j(z) (fine-quadrature check —
  *    this pins the 1/(4 lam^3 var) constant AND the state-space boundary
  *    terms in one shot);
  *  - Kuu is banded (|i-j| > 2 exactly 0) and positive definite;
  *  - the collapsed bound NEVER exceeds the exact log marginal likelihood;
  *  - with enough features the bound tightens to the exact 1-D Matern32
  *    marginal likelihood and predictions match the exact GP;
  *  - 2-D Kronecker features match a dense product-kernel GP;
  *  - cross-model: ASVGP and VFF agree at matched generous budgets;
  *  - optimise improves the objective and is deterministic.
  */
class AsvgpGprSpec extends AnyFunSuite {

  // 1-D data strictly inside (0, 1) — same fixture family as VffGprSpec
  private val n = 30
  private val xs1 = Array.tabulate(n)(i => 0.02 + 0.96 * ((i * 37 % 97) / 97.0))
  private val coords1 = DenseMatrix.tabulate[Double](n, 1)((i, _) => xs1(i))
  private val y1 = DenseVector.tabulate[Double](n) { i =>
    math.sin(3.0 * xs1(i)) * 0.5 + ((i * 13 % 11) - 5) * 0.004
  }
  private val h1 = Array(0.4, 0.8, 0.01) // [ell, var, s]

  /** dense product-Matern32 GP: exact nlml + predictions (test oracle). */
  private def denseGp(x: DenseMatrix[Double], y: DenseVector[Double],
                      ells: Array[Double], vars0: Array[Double], s: Double) = {
    val nn = x.rows
    val dd = x.cols
    def kf(p: DenseMatrix[Double], pi: Int, q: DenseMatrix[Double], qi: Int): Double =
      (0 until dd).map { k =>
        val arg = math.sqrt(3.0) * math.abs(p(pi, k) - q(qi, k)) / ells(k)
        vars0(k) * (1.0 + arg) * math.exp(-arg)
      }.product
    val km = DenseMatrix.tabulate[Double](nn, nn)((i, j) => kf(x, i, x, j) + (if (i == j) s else 0.0))
    val l = cholesky(km)
    val alpha = {
      val z = DenseVector.zeros[Double](nn)
      var i = 0
      while (i < nn) { var ss = y(i); var j = 0; while (j < i) { ss -= l(i, j) * z(j); j += 1 }; z(i) = ss / l(i, i); i += 1 }
      val out = DenseVector.zeros[Double](nn)
      i = nn - 1
      while (i >= 0) { var ss = z(i); var j = i + 1; while (j < nn) { ss -= l(j, i) * out(j); j += 1 }; out(i) = ss / l(i, i); i -= 1 }
      out
    }
    var logdet = 0.0
    (0 until nn).foreach(i => logdet += math.log(l(i, i)))
    val lml = -0.5 * (y dot alpha) - logdet - 0.5 * nn * math.log(2 * math.Pi)
    (lml, (xq: DenseMatrix[Double]) => {
      val mq = xq.rows
      Array.tabulate(mq) { j =>
        var mean = 0.0
        (0 until nn).foreach(i => mean += kf(x, i, xq, j) * alpha(i))
        mean
      }
    })
  }

  test("RKHS inner product satisfies the reproducing property <k(z,.), phi_j> == phi_j(z)") {
    // fine-quadrature version of AsvgpGpr.rkhsInner applied to f = k(z, .)
    // and g = phi_j on [a, b]; k(z, .) is C^1 with a second-derivative jump
    // at z, so we integrate the two smooth halves separately.
    val a0 = -0.5; val b0 = 1.5; val m = 12
    val ell = 0.37; val varK = 0.83
    val lam = math.sqrt(3.0) / ell
    val gp = new AsvgpGpr(coords1, y1, Array(m), Array(a0), Array(b0))
    val h = (b0 - a0) / (m - 2).toDouble

    def kz(z: Double, x: Double): Double = {
      val arg = lam * math.abs(x - z); varK * (1.0 + arg) * math.exp(-arg)
    }
    def kzD1(z: Double, x: Double): Double = {
      val r = x - z; val arg = lam * math.abs(r)
      // d/dx var (1 + lam|r|) e^(-lam|r|) = -var lam^2 r e^(-lam|r|)
      -varK * lam * lam * r * math.exp(-arg)
    }
    def kzD2(z: Double, x: Double): Double = {
      val r = x - z; val arg = lam * math.abs(r)
      -varK * lam * lam * math.exp(-arg) * (1.0 - lam * math.abs(r))
    }
    def phiAt(j: Int, x: Double): Double = gp.phi(0, j, x)
    def phiD1At(j: Int, x: Double): Double = gp.phiD1(0, j, x)

    for (z <- Seq(0.11, 0.53, 0.97); j <- 0 until m) {
      def integrand(x: Double): Double = {
        val lf = kzD2(z, x) + 2 * lam * kzD1(z, x) + lam * lam * kz(z, x)
        val lphi = gp.phiD2(0, j, x) + 2 * lam * gp.phiD1(0, j, x) + lam * lam * phiAt(j, x)
        lf * lphi
      }
      // Simpson piecewise between ALL breakpoints (spline knots and z) —
      // the integrand has jump discontinuities at knots (phi'' is piecewise
      // constant) and a kink at z, so integrating across them would leave
      // O(1e-4) noise that swamps the assertion
      def simpson(lo: Double, hi: Double, steps: Int): Double = {
        val w = (hi - lo) / steps
        (0 until steps).map { i =>
          val x0 = lo + i * w; val x2 = x0 + w; val x1 = 0.5 * (x0 + x2)
          (integrand(x0) + 4 * integrand(x1) + integrand(x2)) * w / 6.0
        }.sum
      }
      val knots = (0 to m + 2).map(t => a0 + (t - 2) * h).filter(k => k > a0 && k < b0)
      val breaks = (Seq(a0, b0, z) ++ knots).sorted.distinct
      val integral = breaks.sliding(2).map { case Seq(lo, hi) =>
        simpson(lo + 1e-12, hi - 1e-12, 200)
      }.sum
      val bnd = kz(z, a0) * phiAt(j, a0) / varK +
        kzD1(z, a0) * phiD1At(j, a0) / (lam * lam * varK)
      val inner = integral / (4 * lam * lam * lam * varK) + bnd
      val want = phiAt(j, z)
      // tolerance is Simpson noise on the |x-z| kink, not formula error —
      // a wrong constant or boundary term would miss by O(0.1)
      assert(math.abs(inner - want) < 5e-4,
        s"z=$z j=$j: <k(z,.), phi_j>_H = $inner but phi_j(z) = $want")
    }
  }

  test("Kuu is banded and positive definite; bound never exceeds the exact lml (1-D)") {
    val (lml, _) = denseGp(coords1, y1, Array(h1(0)), Array(h1(1)), h1(2))
    Seq(6, 12, 24, 48).foreach { m =>
      val gp = new AsvgpGpr(coords1, y1, Array(m), Array(-0.5), Array(1.5))
      val elbo = -gp.negElbo(h1)
      assert(!elbo.isInfinite, s"m=$m: Kuu must be PD (cholesky succeeded)")
      assert(elbo <= lml + 1e-9, s"m=$m: elbo $elbo must lower-bound lml $lml")
      // bandedness: inner products of splines 3+ apart are exactly zero
      assert(gp.rkhsInner(0, 0, 3, h1(0), h1(1)) === 0.0)
      assert(gp.rkhsInner(0, 1, 5, h1(0), h1(1)) === 0.0)
    }
  }

  test("the bound tightens to the exact 1-D marginal likelihood; predictions match") {
    // B2-spline features converge at rate h^2 in the ELBO (vs VFF's
    // spectral rate) — the ASVGP trade: more features, but sparse ones.
    // m=192 on [-0.5, 1.5] gives h ~ 0.01 and a <0.1-nat gap.
    val (lml, predExact) = denseGp(coords1, y1, Array(h1(0)), Array(h1(1)), h1(2))
    val gp = new AsvgpGpr(coords1, y1, Array(192), Array(-0.5), Array(1.5))
    val elbo = -gp.negElbo(h1)
    assert(math.abs(elbo - lml) < 0.02 * math.abs(lml) + 0.05,
      s"m=192: elbo $elbo vs exact lml $lml")
    val xq = DenseMatrix.tabulate[Double](5, 1)((i, _) => 0.1 + 0.2 * i)
    val pv = gp.predict(xq, h1)
    val pe = predExact(xq)
    (0 until 5).foreach(i =>
      assert(math.abs(pv.fs(i) - pe(i)) < 5e-3, s"pred $i: ${pv.fs(i)} vs ${pe(i)}"))
    assert(pv.fsVar.forall(v => v > 0 && v < h1(1) + 1e-6))
  }

  test("2-D Kronecker features match a dense product-kernel GP") {
    val nn = 40
    val c2 = DenseMatrix.tabulate[Double](nn, 2) { (i, k) =>
      if (k == 0) 0.05 + 0.9 * ((i * 29 % 83) / 83.0) else 0.05 + 0.9 * ((i * 41 % 79) / 79.0)
    }
    val y2 = DenseVector.tabulate[Double](nn) { i =>
      0.4 * math.sin(3 * c2(i, 0)) * math.cos(2 * c2(i, 1)) + ((i * 7 % 13) - 6) * 0.003
    }
    val h2 = Array(0.5, 0.6, 0.9, 0.7, 0.01)
    val (lml, predExact) = denseGp(c2, y2, Array(0.5, 0.6), Array(0.9, 0.7), 0.01)
    // lower-bound invariant + the h^2 ELBO rate (halving h shrinks the gap
    // ~4x) + predictions, which converge much faster than the bound
    val gap = (m: Int) => {
      val g = new AsvgpGpr(c2, y2, Array(m, m), Array(-1.0, -1.0), Array(2.0, 2.0))
      val e = -g.negElbo(h2)
      assert(e <= lml + 1e-9, s"m=$m: elbo $e must lower-bound lml $lml")
      lml - e
    }
    val g28 = gap(28); val g56 = gap(56)
    assert(g56 < g28 / 2.5, s"h^2 rate: gap(56)=$g56 vs gap(28)=$g28")
    val gp = new AsvgpGpr(c2, y2, Array(56, 56), Array(-1.0, -1.0), Array(2.0, 2.0))
    val xq = DenseMatrix((0.3, 0.4), (0.7, 0.2), (0.5, 0.8))
    val pv = gp.predict(xq, h2)
    val pe = predExact(xq)
    (0 until 3).foreach(i =>
      assert(math.abs(pv.fs(i) - pe(i)) < 2e-2, s"pred $i: ${pv.fs(i)} vs ${pe(i)}"))
  }

  test("cross-model: ASVGP and VFF bounds agree at matched generous budgets (1-D)") {
    val asvgp = new AsvgpGpr(coords1, y1, Array(192), Array(-0.5), Array(1.5))
    val vff = new VffGpr(coords1, y1, Array(48), Array(-1.5), Array(2.5))
    val ea = -asvgp.negElbo(h1)
    val ev = -vff.negElbo(h1)
    assert(math.abs(ea - ev) < 0.02 * math.abs(ev) + 0.1, s"asvgp $ea vs vff $ev")
  }

  test("optimise improves the objective and is deterministic") {
    val gp = new AsvgpGpr(coords1, y1, Array(48), Array(-0.5), Array(1.5))
    val init = Array(1.0, 1.0, 0.1)
    // production-shaped bounded constraints (the near-noiseless fixture is
    // degenerate as s -> 0, where an unbounded line search stalls)
    val bij: Array[Bijector] = Array(
      Bijectors.SigmoidScaled(0.05, 5.0), Bijectors.SigmoidScaled(0.01, 5.0),
      Bijectors.SigmoidScaled(0.002, 1.0))
    val (o1, obj1, ok1, it1) = gp.optimise(init, bij, maxIter = 40, tolerance = 1e-5)
    val (o2, obj2, _, _) = gp.optimise(init, bij, maxIter = 40, tolerance = 1e-5)
    assert(ok1)
    assert(it1 > 0 && it1 <= 40)
    assert(obj1 <= gp.negElbo(init) + 1e-9)
    assert(o1.sameElements(o2) && obj1 === obj2, "deterministic")
  }
}
