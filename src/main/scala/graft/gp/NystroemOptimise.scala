package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import breeze.optimize.{ApproximateGradientFunction, DiffFunction, LBFGS}

/** Hyperparameter optimisation for the Nyström-approximated GP — the
  * reference-faithful path: scipy L-BFGS-B with jac=False, i.e. FINITE
  * DIFFERENCE gradients of the approximate NLML in bijector space
  * (pure_python_gpr.py:303-342 with approx=True; the reference never
  * derives analytic gradients for the Nyström objective).
  */
object NystroemOptimise {

  def optimise(coords: DenseMatrix[Double], y: DenseVector[Double], landmarks: Array[Int],
               init: GprParams, bijectors: Array[Bijector],
               maxIter: Int = 30, tolerance: Double = 1e-6): GprFitResult = {
    val d = coords.cols
    require(bijectors.length == d + 2)
    val theta0 = init.toArray
    val u0 = DenseVector(theta0.indices.map(i => bijectors(i).inv(theta0(i))).toArray)

    def objective(u: DenseVector[Double]): Double = {
      val theta = Array.tabulate(d + 2)(i => bijectors(i).fwd(u(i)))
      val p = GprParams.fromArray(theta)
      try {
        val st = NystroemGpr.fit(coords, y, landmarks, p.lengthscales,
          p.kernelVariance, p.likelihoodVariance)
        val v = NystroemGpr.nlml(y, st)
        if (v.isNaN || v.isInfinite) 1e25 else v
      } catch { case _: Exception => 1e25 }
    }

    val f: DiffFunction[DenseVector[Double]] =
      new ApproximateGradientFunction[Int, DenseVector[Double]](objective, 1e-6)

    try {
      val lbfgs = new LBFGS[DenseVector[Double]](maxIter = maxIter, m = 7, tolerance = tolerance)
      val state = lbfgs.minimizeAndReturnState(f, u0)
      val thetaOpt = Array.tabulate(d + 2)(i => bijectors(i).fwd(state.x(i)))
      val pOpt = GprParams.fromArray(thetaOpt)
      val obj = objective(state.x)
      if (obj >= 1e25) GprFitResult(init, objective(u0), success = false, state.iter)
      else GprFitResult(pOpt, obj, success = !state.searchFailed, state.iter)
    } catch {
      case _: Exception => GprFitResult(init, objective(u0), success = false, 0)
    }
  }
}
