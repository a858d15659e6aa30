package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import breeze.optimize.{DiffFunction, LBFGS}

/** Actually-Sparse Variational GP (Cunningham et al., AISTATS 2023) with a
  * separable per-dimension Matern-3/2 kernel — the reference's
  * `GPflowASVGPModel` (GPSat/models/asvgp_model.py:17-214, which wraps the
  * public ASVGP `GPR_kron` with `B2Spline` bases for Matern-3/2). The
  * inter-domain inducing features are quadratic (order-2) B-splines on a
  * per-dim interval [a_d, b_d]; cross-dimension features are Kronecker
  * (Khatri-Rao row) products — VFF's sibling with COMPACTLY SUPPORTED
  * features, so Kuf has exactly 3 nonzeros per point per dim and Kuu is
  * banded (bandwidth 2) instead of diagonal-plus-rank-one.
  *
  * Collapsed bound: identical in form to VffGpr (vff.py:612-645):
  *   P = Kuf Kfu / s + Kuu,  L = chol(P),  c = L^-1 (Kuf y) / s
  *   elbo = -n/2 log(2 pi s) - 1/2 logdet P + 1/2 logdet Kuu
  *          - (y^T y)/(2s) + (c^T c)/2 - (sum_i kdiag_i)/(2s)
  *          + (sum Kuu^-1 o Kuf Kfu)/(2s)
  *
  * What changes vs VFF is the feature algebra:
  *  - Kuf[i, x] = phi_i(x) (the spline evaluated at x) by the reproducing
  *    property — B2 splines are C^1 piecewise quadratics, members of the
  *    Matern-3/2 RKHS on [a, b];
  *  - Kuu[i, j] = <phi_i, phi_j>_H, the Matern-3/2 RKHS inner product on
  *    [a, b]. From the state-space view (f'' + 2 lam f' + lam^2 f = w,
  *    spectral density q = 4 lam^3 var, stationary state cov
  *    diag(var, lam^2 var)):
  *      <f, g>_H = f(a)g(a)/var + f'(a)g'(a)/(lam^2 var)
  *               + (1/(4 lam^3 var)) Int_a^b (Lf)(Lg) dx,
  *    with L = d^2/dx^2 + 2 lam d/dx + lam^2 and lam = sqrt(3)/ell.
  *    The integrand is piecewise quartic, so 3-point Gauss-Legendre per
  *    knot sub-interval is EXACT. (AsvgpGprSpec additionally pins the
  *    whole inner product against the reproducing property
  *    <k(z,.), phi_j>_H == phi_j(z) by fine quadrature.)
  *
  * Like VFF, Kuf depends only on coordinates: Kuf y and Kuf Kfu are
  * precomputed once and every hyperparameter evaluation is O(M_total^3),
  * independent of n — FD gradients over the 2D+1 hypers are the pragmatic
  * optimiser. At 100-TB scale the per-tile cost profile is the same as
  * VffGpr's; the banded structure is additionally the right starting point
  * for a future O(M) sparse path (the ASVGP paper's headline), which this
  * dense-at-tile-scale implementation does not need at M <= a few hundred.
  *
  * @param ms per-dim B-spline feature count (>= 3)
  * @param a,b per-dim domain; training coords must lie inside
  */
final class AsvgpGpr(coords: DenseMatrix[Double], y: DenseVector[Double],
                     ms: Array[Int], a: Array[Double], b: Array[Double]) {
  require(coords.rows == y.length, "coords/obs length mismatch")
  val n: Int = coords.rows
  val d: Int = coords.cols
  require(ms.length == d && a.length == d && b.length == d, "per-dim ms/a/b required")
  (0 until d).foreach { k =>
    require(ms(k) >= 3, "need at least 3 B-spline features per dim")
    require(b(k) > a(k), "empty domain")
    (0 until n).foreach(i => require(coords(i, k) > a(k) && coords(i, k) < b(k),
      s"training coords must lie strictly inside the domain (dim $k)"))
  }

  private val Log2Pi = math.log(2.0 * math.Pi)
  val mTotal: Int = ms.product

  /** per-dim knot spacing: m splines, spline i supported on
    * [a + (i-2)h, a + (i+1)h]; the m supports tile [a, b] with ~3 splines
    * active at every x.
    */
  private def hOf(k: Int): Double = (b(k) - a(k)) / (ms(k) - 2).toDouble

  // cardinal quadratic B-spline on [0, 3): value, first, second derivative
  private def b2(u: Double): Double =
    if (u <= 0.0 || u >= 3.0) 0.0
    else if (u < 1.0) 0.5 * u * u
    else if (u < 2.0) 0.5 * (-2.0 * u * u + 6.0 * u - 3.0)
    else 0.5 * (3.0 - u) * (3.0 - u)
  private def b2d1(u: Double): Double =
    if (u <= 0.0 || u >= 3.0) 0.0
    else if (u < 1.0) u
    else if (u < 2.0) 3.0 - 2.0 * u
    else u - 3.0
  private def b2d2(u: Double): Double =
    if (u <= 0.0 || u >= 3.0) 0.0
    else if (u < 1.0) 1.0
    else if (u < 2.0) -2.0
    else 1.0

  /** phi_i and derivatives in dim k. */
  private[gp] def phi(k: Int, i: Int, x: Double): Double = {
    val h = hOf(k); b2((x - (a(k) + (i - 2) * h)) / h)
  }
  private[gp] def phiD1(k: Int, i: Int, x: Double): Double = {
    val h = hOf(k); b2d1((x - (a(k) + (i - 2) * h)) / h) / h
  }
  private[gp] def phiD2(k: Int, i: Int, x: Double): Double = {
    val h = hOf(k); b2d2((x - (a(k) + (i - 2) * h)) / h) / (h * h)
  }

  /** per-dim feature matrix (m_d x cols): spline evaluations. */
  private def kufDim(k: Int, xs: Int => Double, cols: Int): DenseMatrix[Double] = {
    val out = DenseMatrix.zeros[Double](ms(k), cols)
    var j = 0
    while (j < cols) {
      val xv = xs(j)
      var i = 0
      while (i < ms(k)) { out(i, j) = phi(k, i, xv); i += 1 }
      j += 1
    }
    out
  }

  /** Khatri-Rao row stack across dims (same operator as VffGpr.kvs). */
  private def kvs(mats: Seq[DenseMatrix[Double]]): DenseMatrix[Double] =
    mats.reduce { (ab, c) =>
      val out = DenseMatrix.zeros[Double](ab.rows * c.rows, ab.cols)
      var i = 0
      while (i < ab.rows) {
        var j = 0
        while (j < c.rows) {
          var col = 0
          while (col < ab.cols) {
            out(i * c.rows + j, col) = ab(i, col) * c(j, col)
            col += 1
          }
          j += 1
        }
        i += 1
      }
      out
    }

  // static precomputes (hyper-independent)
  private val kuf: DenseMatrix[Double] =
    kvs((0 until d).map(k => kufDim(k, i => coords(i, k), n)))
  private val kufY: DenseVector[Double] = kuf * y
  private val kufKfu: DenseMatrix[Double] = kuf * kuf.t
  private val trYTY: Double = y dot y

  // 3-point Gauss-Legendre nodes/weights on [-1, 1] (exact to degree 5)
  private val GlX = Array(-math.sqrt(0.6), 0.0, math.sqrt(0.6))
  private val GlW = Array(5.0 / 9.0, 8.0 / 9.0, 5.0 / 9.0)

  /** Matern-3/2 RKHS inner product <phi_i, phi_j>_H on [a_k, b_k]. */
  private[gp] def rkhsInner(k: Int, i: Int, j: Int, ell: Double, varK: Double): Double = {
    val lam = math.sqrt(3.0) / ell
    val h = hOf(k)
    def lOp(idx: Int, x: Double): Double =
      phiD2(k, idx, x) + 2.0 * lam * phiD1(k, idx, x) + lam * lam * phi(k, idx, x)
    // integrate over the overlap of supports intersected with [a, b],
    // knot interval by knot interval (integrand is polynomial per piece)
    val lo = math.max(a(k), a(k) + (math.max(i, j) - 2) * h)
    val hi = math.min(b(k), a(k) + (math.min(i, j) + 1) * h)
    var integral = 0.0
    if (hi > lo) {
      // split at EVERY knot in (lo, hi) so each piece is a pure polynomial;
      // knot t sits at a + (t-2)h, i.e. knot coordinate u = (x-a)/h + 2
      var p = lo
      while (p < hi - 1e-12 * h) {
        val u = (p - a(k)) / h + 2.0
        val tNext = math.floor(u + 1e-9).toInt + 1
        val q = math.min(hi, a(k) + (tNext - 2).toDouble * h)
        val c = 0.5 * (p + q); val r = 0.5 * (q - p)
        var g = 0
        while (g < 3) {
          val x = c + r * GlX(g)
          integral += GlW(g) * r * lOp(i, x) * lOp(j, x)
          g += 1
        }
        p = q
      }
    }
    val bnd = phi(k, i, a(k)) * phi(k, j, a(k)) / varK +
      phiD1(k, i, a(k)) * phiD1(k, j, a(k)) / (lam * lam * varK)
    integral / (4.0 * lam * lam * lam * varK) + bnd
  }

  /** per-dim Kuu (banded: |i-j| > 2 is exactly 0) + inverse + logdet. */
  private def kuuDim(k: Int, ell: Double, varK: Double)
  : (DenseMatrix[Double], DenseMatrix[Double], Double) = {
    val m = ms(k)
    val kuu = DenseMatrix.zeros[Double](m, m)
    var i = 0
    while (i < m) {
      var j = i
      while (j < math.min(m, i + 3)) {
        val v = rkhsInner(k, i, j, ell, varK)
        kuu(i, j) = v; kuu(j, i) = v
        j += 1
      }
      i += 1
    }
    val l = breeze.linalg.cholesky(kuu)
    var logdet = 0.0
    i = 0
    while (i < m) { logdet += 2.0 * math.log(l(i, i)); i += 1 }
    // inv = L^-T L^-1 via m solves of the identity
    val inv = DenseMatrix.eye[Double](m)
    var c0 = 0
    while (c0 < m) {
      var r = 0
      while (r < m) {
        var s0 = inv(r, c0); var t0 = 0
        while (t0 < r) { s0 -= l(r, t0) * inv(t0, c0); t0 += 1 }
        inv(r, c0) = s0 / l(r, r)
        r += 1
      }
      r = m - 1
      while (r >= 0) {
        var s0 = inv(r, c0); var t0 = r + 1
        while (t0 < m) { s0 -= l(t0, r) * inv(t0, c0); t0 += 1 }
        inv(r, c0) = s0 / l(r, r)
        r -= 1
      }
      c0 += 1
    }
    (kuu, inv, logdet)
  }

  private def kron(msq: Seq[DenseMatrix[Double]]): DenseMatrix[Double] =
    msq.reduce { (x, z) =>
      val out = DenseMatrix.zeros[Double](x.rows * z.rows, x.cols * z.cols)
      var i = 0
      while (i < x.rows) {
        var j = 0
        while (j < x.cols) {
          val v = x(i, j)
          var p = 0
          while (p < z.rows) {
            var q = 0
            while (q < z.cols) { out(i * z.rows + p, j * z.cols + q) = v * z(p, q); q += 1 }
            p += 1
          }
          j += 1
        }
        i += 1
      }
      out
    }

  /** packed hyper vector: [ell_1..ell_d, var_1..var_d, s]. */
  def nHypers: Int = 2 * d + 1

  /** negative ELBO (the minimised objective). */
  def negElbo(h: Array[Double]): Double = {
    require(h.length == nHypers)
    val s = h(2 * d)
    if (s <= 0 || (0 until d).exists(k => h(k) <= 0 || h(d + k) <= 0))
      return Double.PositiveInfinity
    try {
      val dims = (0 until d).map(k => kuuDim(k, h(k), h(d + k)))
      val kuu = kron(dims.map(_._1))
      val kuuInv = kron(dims.map(_._2))
      val kuuLogdet = (0 until d).map(k => (mTotal.toDouble / ms(k)) * dims(k)._3).sum

      val p = (kufKfu / s) + kuu
      val l = breeze.linalg.cholesky(p)
      var logdetP = 0.0
      var i = 0
      while (i < mTotal) { logdetP += 2.0 * math.log(l(i, i)); i += 1 }
      val c = lowerSolve(l, kufY) / s
      val cTc = c dot c
      var trKiK = 0.0
      i = 0
      while (i < mTotal) {
        var j = 0
        while (j < mTotal) { trKiK += kuuInv(i, j) * kufKfu(i, j); j += 1 }
        i += 1
      }
      val kdiagSum = n * (0 until d).map(k => h(d + k)).product
      val elbo = -0.5 * n * math.log(2.0 * math.Pi * s) - 0.5 * logdetP + 0.5 * kuuLogdet -
        0.5 * trYTY / s + 0.5 * cTc - 0.5 * kdiagSum / s + 0.5 * trKiK / s
      -elbo
    } catch { case _: Exception => Double.PositiveInfinity }
  }

  /** L-BFGS in bijector space with central-difference gradients — each
    * evaluation is O(M_total^3), independent of n (see VffGpr.optimise).
    * Returns (hypers, objective, converged, iterationsActuallyRun).
    */
  def optimise(init: Array[Double], bijectors: Array[Bijector],
               maxIter: Int = 60, tolerance: Double = 1e-7,
               fdStep: Double = 1e-6): (Array[Double], Double, Boolean, Int) = {
    require(bijectors.length == nHypers)
    val u0 = DenseVector(init.indices.map(i => bijectors(i).inv(init(i))).toArray)
    require(u0.forall(v => !v.isNaN), "initial parameters map to NaN in variable space")
    val h = fdStep
    val f = new DiffFunction[DenseVector[Double]] {
      def calculate(u: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val theta = Array.tabulate(nHypers)(i => bijectors(i).fwd(u(i)))
        val v0 = negElbo(theta)
        if (v0.isInfinite) return (1e25, u - u0)
        val g = new Array[Double](nHypers)
        var i = 0
        while (i < nHypers) {
          val up = theta.clone(); up(i) += h
          val dn = theta.clone(); dn(i) -= h
          g(i) = (negElbo(up) - negElbo(dn)) / (2 * h) * bijectors(i).grad(u(i))
          i += 1
        }
        (v0, DenseVector(g))
      }
    }
    try {
      val lbfgs = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7, tolerance = tolerance)
      val st = lbfgs.minimizeAndReturnState(f, u0)
      val hOpt = Array.tabulate(nHypers)(i => bijectors(i).fwd(st.x(i)))
      val obj = negElbo(hOpt)
      if (obj.isInfinite || obj.isNaN) (init, negElbo(init), false, st.iter)
      else (hOpt, obj, !st.searchFailed, st.iter)
    } catch { case _: Exception => (init, negElbo(init), false, 0) }
  }

  /** Posterior prediction (collapsed q(u), same algebra as VffGpr.predict).
    * Prediction points should lie inside [a, b] (TileModels builds the
    * domain with a full-span margin, so local prediction grids always do);
    * outside, the spline features vanish and the posterior reverts to the
    * prior — sane, but not the exact inter-domain projection.
    */
  def predict(xs: DenseMatrix[Double], hyp: Array[Double]): GprPrediction = {
    val s = hyp(2 * d)
    val dims = (0 until d).map(k => kuuDim(k, hyp(k), hyp(d + k)))
    val kuu = kron(dims.map(_._1))
    val kuuInv = kron(dims.map(_._2))
    val p = (kufKfu / s) + kuu
    val l = breeze.linalg.cholesky(p)
    val c = lowerSolve(l, kufY) / s

    val mStar = xs.rows
    val kus = kvs((0 until d).map(k => kufDim(k, j => xs(j, k), mStar)))
    val tmp = lowerSolve(l, kus)
    val kiKus = kuuInv * kus
    val varPrior = (0 until d).map(k => hyp(d + k)).product
    val fs = new Array[Double](mStar)
    val fsVar = new Array[Double](mStar)
    val yVar = new Array[Double](mStar)
    var j = 0
    while (j < mStar) {
      var mean = 0.0
      var t2 = 0.0
      var t3 = 0.0
      var i = 0
      while (i < mTotal) {
        mean += tmp(i, j) * c(i)
        t2 += tmp(i, j) * tmp(i, j)
        t3 += kiKus(i, j) * kus(i, j)
        i += 1
      }
      fs(j) = mean
      fsVar(j) = varPrior + t2 - t3
      yVar(j) = fsVar(j) + s
      j += 1
    }
    GprPrediction(fs, fsVar, yVar)
  }

  private def lowerSolve(l: DenseMatrix[Double], v: DenseVector[Double]): DenseVector[Double] = {
    val out = v.copy
    var i = 0
    while (i < l.rows) {
      var ss = out(i)
      var j = 0
      while (j < i) { ss -= l(i, j) * out(j); j += 1 }
      out(i) = ss / l(i, i)
      i += 1
    }
    out
  }

  private def lowerSolve(l: DenseMatrix[Double], bMat: DenseMatrix[Double]): DenseMatrix[Double] = {
    val out = bMat.copy
    var cIdx = 0
    while (cIdx < bMat.cols) {
      var i = 0
      while (i < l.rows) {
        var ss = out(i, cIdx)
        var j = 0
        while (j < i) { ss -= l(i, j) * out(j, cIdx); j += 1 }
        out(i, cIdx) = ss / l(i, i)
        i += 1
      }
      cIdx += 1
    }
    out
  }
}
