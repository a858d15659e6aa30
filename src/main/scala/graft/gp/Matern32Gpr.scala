package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector, cholesky, diag, sum, trace}
import breeze.optimize.{DiffFunction, LBFGS}

/** Hyperparameters in constrained (parameter) space; vector order follows the
  * reference convention [lengthscales..., kernel_variance, likelihood_variance]
  * (GPSat/models/pure_python_gpr.py:309-314).
  */
final case class GprParams(
    lengthscales: Array[Double],
    kernelVariance: Double,
    likelihoodVariance: Double) {
  def dim: Int = lengthscales.length
  def toArray: Array[Double] = lengthscales ++ Array(kernelVariance, likelihoodVariance)
}

object GprParams {
  def fromArray(a: Array[Double]): GprParams =
    GprParams(a.dropRight(2), a(a.length - 2), a(a.length - 1))
  /** Reference-equivalent defaults (unit lengthscales / variances, the
    * GPflow and pure-python starting point).
    */
  def default(dim: Int): GprParams = GprParams(Array.fill(dim)(1.0), 1.0, 1.0)
}

final case class GprFitResult(
    params: GprParams,
    objective: Double, // negative log marginal likelihood at the optimum
    success: Boolean,
    iterations: Int)

final case class GprPrediction(
    fs: Array[Double],     // posterior mean f*
    fsVar: Array[Double],  // posterior variance f*_var
    yVar: Array[Double])   // predictive variance = f*_var + likelihood_variance

/** Exact Gaussian-process regression with a Matern-3/2 kernel: the per-tile
  * numeric payload of the engine. Pure Scala + Breeze (LAPACK Cholesky),
  * zero Spark dependencies; runs inside `flatMapGroups` on executors.
  *
  * Math replicated from the reference:
  *  - kernel: Q = ||sqrt(3) x / ell - sqrt(3) x' / ell||_2,
  *    k = sigma^2 (1 + Q) exp(-Q)             (GPSat/models/pure_python_gpr.py:378-405)
  *  - NLML:   L = chol(K + sn2 I); alpha = L^T \ (L \ y);
  *    nlZ = y.alpha/2 + sum(log diag L) + n log(2 pi)/2;
  *    Cholesky failure => +inf                (pure_python_gpr.py:439-506)
  *  - predict (Rasmussen Algo 2.1): f* = K*^T alpha; v = L \ K*;
  *    f*_var = diag(K** - v^T v); y_var = f*_var + sn2
  *                                              (pure_python_gpr.py:509-553, :241-266)
  *  - optimisation runs in bijector-transformed variable space
  *    (pure_python_gpr.py:303-342); we use analytic gradients
  *    dnlZ/dtheta = tr((K^-1 - alpha alpha^T) dK/dtheta)/2 chained through
  *    the bijector, where the reference uses finite differences (jac=False).
  *
  * @param coords n x d matrix of coordinates, already divided by coords_scale
  * @param y      length-n observation vector, already demeaned/scaled
  */
final class Matern32Gpr(coords: DenseMatrix[Double], y: DenseVector[Double]) {
  require(coords.rows == y.length, "coords/obs length mismatch")
  val n: Int = coords.rows
  val d: Int = coords.cols

  private val Sqrt3 = math.sqrt(3.0)
  private val Log2Pi = math.log(2.0 * math.Pi)

  /** Per-dimension scaled absolute differences q_theta(i,j) = sqrt(3)|x_i - x_j| / ell_theta
    * for the training set; returns (Q, perDimQ) where Q = sqrt(sum_theta q^2).
    */
  private def trainDistances(ell: Array[Double]): (DenseMatrix[Double], Array[DenseMatrix[Double]]) = {
    val perDim = Array.tabulate(d) { k =>
      val m = DenseMatrix.zeros[Double](n, n)
      val c = coords(::, k)
      val s = Sqrt3 / ell(k)
      var i = 0
      while (i < n) {
        var j = i + 1
        while (j < n) {
          val v = math.abs(c(i) - c(j)) * s
          m(i, j) = v; m(j, i) = v
          j += 1
        }
        i += 1
      }
      m
    }
    val q = DenseMatrix.zeros[Double](n, n)
    var i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        var s2 = 0.0
        var k = 0
        while (k < d) { val v = perDim(k)(i, j); s2 += v * v; k += 1 }
        val v = math.sqrt(s2)
        q(i, j) = v; q(j, i) = v
        j += 1
      }
      i += 1
    }
    (q, perDim)
  }

  /** K(train, train) without noise. */
  private def kernelTrain(p: GprParams): DenseMatrix[Double] = {
    val (q, _) = trainDistances(p.lengthscales)
    kernelFromQ(q, p.kernelVariance)
  }

  private def kernelFromQ(q: DenseMatrix[Double], sf2: Double): DenseMatrix[Double] =
    q.map(v => sf2 * (1.0 + v) * math.exp(-v))

  /** K(train, test): n x m. */
  private def kernelCross(xs: DenseMatrix[Double], p: GprParams): DenseMatrix[Double] = {
    val m = xs.rows
    val out = DenseMatrix.zeros[Double](n, m)
    val ell = p.lengthscales
    var i = 0
    while (i < n) {
      var j = 0
      while (j < m) {
        var s2 = 0.0
        var k = 0
        while (k < d) {
          val v = (coords(i, k) - xs(j, k)) * Sqrt3 / ell(k)
          s2 += v * v
          k += 1
        }
        val q = math.sqrt(s2)
        out(i, j) = p.kernelVariance * (1.0 + q) * math.exp(-q)
        j += 1
      }
      i += 1
    }
    out
  }

  /** Solve L z = b for lower-triangular L (forward substitution). */
  private def solveLower(l: DenseMatrix[Double], b: DenseVector[Double]): DenseVector[Double] = {
    val z = b.copy
    var i = 0
    while (i < n) {
      var s = z(i)
      var j = 0
      while (j < i) { s -= l(i, j) * z(j); j += 1 }
      z(i) = s / l(i, i)
      i += 1
    }
    z
  }

  /** Solve L^T z = b (back substitution). */
  private def solveUpperT(l: DenseMatrix[Double], b: DenseVector[Double]): DenseVector[Double] = {
    val z = b.copy
    var i = n - 1
    while (i >= 0) {
      var s = z(i)
      var j = i + 1
      while (j < n) { s -= l(j, i) * z(j); j += 1 }
      z(i) = s / l(i, i)
      i -= 1
    }
    z
  }

  /** Negative log marginal likelihood; +inf if K + sn2 I is not SPD. */
  def nlml(p: GprParams): Double =
    try {
      val k = kernelTrain(p)
      var i = 0
      while (i < n) { k(i, i) += p.likelihoodVariance; i += 1 }
      val l = cholesky(k)
      val alpha = solveUpperT(l, solveLower(l, y))
      var logDet = 0.0
      i = 0
      while (i < n) { logDet += math.log(l(i, i)); i += 1 }
      0.5 * (y dot alpha) + logDet + 0.5 * n * Log2Pi
    } catch { case _: Exception => Double.PositiveInfinity }

  /** NLML and analytic gradient w.r.t. the constrained parameter vector
    * [ell_1..ell_d, sf2, sn2]. Returns +inf value with zero gradient when
    * the Cholesky fails (reference returns inf, pure_python_gpr.py:499-501).
    */
  def nlmlAndGrad(p: GprParams): (Double, Array[Double]) =
    try {
      val (qDist, perDim) = trainDistances(p.lengthscales)
      val kx = kernelFromQ(qDist, p.kernelVariance)
      val kNoise = kx.copy
      var i = 0
      while (i < n) { kNoise(i, i) += p.likelihoodVariance; i += 1 }
      val l = cholesky(kNoise)
      val alpha = solveUpperT(l, solveLower(l, y))
      var logDet = 0.0
      i = 0
      while (i < n) { logDet += math.log(l(i, i)); i += 1 }
      val value = 0.5 * (y dot alpha) + logDet + 0.5 * n * Log2Pi

      // Linv (lower-triangular inverse), then Kinv = Linv^T Linv
      val linv = DenseMatrix.eye[Double](n)
      var c = 0
      while (c < n) {
        val col = linv(::, c)
        // forward substitution on unit column c
        var r = c
        while (r < n) {
          var s = col(r)
          var j = c
          while (j < r) { s -= l(r, j) * col(j); j += 1 }
          col(r) = s / l(r, r)
          r += 1
        }
        c += 1
      }
      val kinv = linv.t * linv
      // Qm = Kinv - alpha alpha^T
      val qm = kinv - (alpha * alpha.t)

      val grad = new Array[Double](d + 2)
      // d nlZ / d ell_k = sum(Qm .* (sf2 * q_k^2 * exp(-Q) / ell_k)) / 2
      var k = 0
      while (k < d) {
        var s = 0.0
        var ii = 0
        while (ii < n) {
          var jj = 0
          while (jj < n) {
            val qk = perDim(k)(ii, jj)
            s += qm(ii, jj) * qk * qk * math.exp(-qDist(ii, jj))
            jj += 1
          }
          ii += 1
        }
        grad(k) = 0.5 * p.kernelVariance * s / p.lengthscales(k)
        k += 1
      }
      // d nlZ / d sf2 = sum(Qm .* Kx) / (2 sf2)
      grad(d) = 0.5 * sum(qm *:* kx) / p.kernelVariance
      // d nlZ / d sn2 = tr(Qm) / 2
      grad(d + 1) = 0.5 * trace(qm)
      (value, grad)
    } catch {
      case _: Exception => (Double.PositiveInfinity, new Array[Double](d + 2))
    }

  /** L-BFGS optimisation of the NLML in bijector-transformed variable space.
    * `bijectors` has length d + 2, aligned with the parameter vector.
    * On Cholesky failure at the initial point, or optimiser blow-up, returns
    * the initial parameters with success = false.
    */
  def optimise(
      init: GprParams,
      bijectors: Array[Bijector],
      maxIter: Int = 100,
      tolerance: Double = 1e-9): GprFitResult = {
    require(bijectors.length == d + 2, s"need ${d + 2} bijectors, got ${bijectors.length}")
    val theta0 = init.toArray
    val u0 = DenseVector(theta0.indices.map(i => bijectors(i).inv(theta0(i))).toArray)
    require(u0.forall(v => !v.isNaN), "initial parameters map to NaN in variable space")

    val f = new DiffFunction[DenseVector[Double]] {
      def calculate(u: DenseVector[Double]): (Double, DenseVector[Double]) = {
        val theta = Array.tabulate(d + 2)(i => bijectors(i).fwd(u(i)))
        val (v, gTheta) = nlmlAndGrad(GprParams.fromArray(theta))
        if (v.isInfinite)
          // steer the line search back towards u0 when K is not SPD
          (1e25, u - u0)
        else {
          val gU = DenseVector(Array.tabulate(d + 2)(i => gTheta(i) * bijectors(i).grad(u(i))))
          (v, gU)
        }
      }
    }

    try {
      val lbfgs = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7, tolerance = tolerance)
      val state = lbfgs.minimizeAndReturnState(f, u0)
      val thetaOpt = Array.tabulate(d + 2)(i => bijectors(i).fwd(state.x(i)))
      val pOpt = GprParams.fromArray(thetaOpt)
      val objective = nlml(pOpt)
      if (objective.isInfinite || objective.isNaN)
        GprFitResult(init, nlml(init), success = false, state.iter)
      else
        GprFitResult(pOpt, objective, success = !state.searchFailed, state.iter)
    } catch {
      case _: Exception => GprFitResult(init, nlml(init), success = false, 0)
    }
  }

  /** Posterior prediction at xs (m x d, already scaled). */
  def predict(xs: DenseMatrix[Double], p: GprParams): GprPrediction = {
    val m = xs.rows
    val kxsx = kernelCross(xs, p) // n x m
    val kNoise = kernelTrain(p)
    var i = 0
    while (i < n) { kNoise(i, i) += p.likelihoodVariance; i += 1 }
    val l = cholesky(kNoise)
    val alpha = solveUpperT(l, solveLower(l, y))
    val fs = new Array[Double](m)
    val fsVar = new Array[Double](m)
    val yVar = new Array[Double](m)
    var j = 0
    while (j < m) {
      val kcol = kxsx(::, j)
      fs(j) = kcol dot alpha
      val v = solveLower(l, kcol)
      // diag K(xs, xs) = sf2 (Q = 0 at zero distance)
      val variance = p.kernelVariance - (v dot v)
      fsVar(j) = variance
      yVar(j) = variance + p.likelihoodVariance
      j += 1
    }
    GprPrediction(fs, fsVar, yVar)
  }
}
