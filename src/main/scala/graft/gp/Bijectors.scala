package graft.gp

/** Constraint bijectors mapping unconstrained optimiser variables u to
  * constrained hyperparameters theta, with exact branch semantics of the
  * reference implementation (GPSat/utils.py:2320-2400): numerically-stable
  * softplus, threshold-branched inverse softplus, and scaled sigmoid.
  *
  * Optimisation runs in u-space (the reference optimises "in transformed
  * variable space", GPSat/models/pure_python_gpr.py:303-342); gradients of
  * the objective w.r.t. u are obtained via `grad` (d theta / d u).
  */
sealed trait Bijector extends Serializable {

  /** unconstrained -> constrained */
  def fwd(u: Double): Double

  /** constrained -> unconstrained (may be +-Infinity out of range) */
  def inv(theta: Double): Double

  /** d theta / d u at unconstrained value u */
  def grad(u: Double): Double

  /** Reference `_move_to_within_bound` (pure_python_gpr.py:145-163): if the
    * current constrained value maps to +-inf in u-space, nudge it just
    * inside the support by `tol`; otherwise keep it.
    */
  def moveWithinBound(theta: Double, tol: Double = 1e-2): Double
}

object Bijectors {

  /** log(eps_float64) + 2, the reference inverse-softplus branch threshold
    * (GPSat/utils.py:2371-2374 via np.finfo(float64).eps).
    */
  private val InvSoftplusThreshold = math.log(2.220446049250313e-16) + 2.0

  final case class Softplus(shift: Double = 0.0) extends Bijector {
    // log1p(exp(-|x|)) + max(x, 0) + shift  (utils.py:2319-2323)
    def fwd(u: Double): Double =
      math.log1p(math.exp(-math.abs(u))) + math.max(u, 0.0) + shift

    // threshold-branched stable inverse (utils.py:2326-2374)
    def inv(theta: Double): Double = {
      val y = theta - shift
      if (y <= 0.0) Double.NegativeInfinity
      else if (y < math.exp(InvSoftplusThreshold)) math.log(y)
      else if (y > -InvSoftplusThreshold) y
      else math.log(-math.expm1(-y)) + y
    }

    // d/du softplus(u) = sigmoid(u)
    def grad(u: Double): Double = 1.0 / (1.0 + math.exp(-u))

    def moveWithinBound(theta: Double, tol: Double): Double = {
      val chk = inv(theta)
      if (chk == Double.NegativeInfinity) shift + tol
      else theta // +inf unreachable for softplus; NaN left to caller asserts
    }
  }

  final case class SigmoidScaled(low: Double, high: Double) extends Bijector {
    require(high > low, s"sigmoid bijector requires high > low, got [$low, $high]")

    // (high - low) / (1 + exp(-x)) + low  (utils.py:2377-2380)
    def fwd(u: Double): Double = (high - low) / (1.0 + math.exp(-u)) + low

    // -log((high - low)/(y - low) - 1), +-inf outside (low, high) (utils.py:2383-2400)
    def inv(theta: Double): Double =
      if (theta <= low) Double.NegativeInfinity
      else if (theta >= high) Double.PositiveInfinity
      else -math.log((high - low) / (theta - low) - 1.0)

    // d/du = (theta - low) (high - theta) / (high - low)
    def grad(u: Double): Double = {
      val s = 1.0 / (1.0 + math.exp(-u))
      (high - low) * s * (1.0 - s)
    }

    def moveWithinBound(theta: Double, tol: Double): Double = {
      val chk = inv(theta)
      if (chk == Double.NegativeInfinity) low + tol
      else if (chk == Double.PositiveInfinity) high - tol
      else theta
    }
  }

  /** exp/log transform ("exp" option, pure_python_gpr.py:135-137). */
  case object ExpBijector extends Bijector {
    def fwd(u: Double): Double = math.exp(u)
    def inv(theta: Double): Double = math.log(theta)
    def grad(u: Double): Double = math.exp(u)
    def moveWithinBound(theta: Double, tol: Double): Double =
      if (theta <= 0.0) tol else theta
  }

  /** Reference default when no constraint config is given
    * (pure_python_gpr.py:71-77: `{"func": "softplus"}`).
    */
  val default: Bijector = Softplus(0.0)

  /** Reference `_guess_constraint_func` (pure_python_gpr.py:86-93). */
  def guess(low: Option[Double], high: Option[Double], shift: Option[Double]): Bijector =
    (low, high) match {
      case (Some(l), Some(h)) => SigmoidScaled(l, h)
      case _                  => Softplus(shift.getOrElse(0.0))
    }
}
