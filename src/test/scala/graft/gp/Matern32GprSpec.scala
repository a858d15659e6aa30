package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** Golden values generated from the reference math (numpy replication of
  * GPSat/models/pure_python_gpr.py SGPkernel / SMLII_mod / GPR) on the
  * reference's 12-point toy set (pure_python_gpr.py:571-583).
  */
class Matern32GprSpec extends AnyFunSuite {

  private val x12 = Array(0.865, 0.666, 0.804, 0.771, 0.147, 0.866, 0.007, 0.026, 0.171, 0.889, 0.243, 0.028)
  private val y12 = Array(1.57, 3.48, 3.12, 3.91, 3.07, 1.35, 3.80, 3.82, 3.49, 1.30, 4.00, 3.82)

  private def gpr1d = new Matern32Gpr(
    new DenseMatrix(x12.length, 1, x12), DenseVector(y12))

  test("Matern-3/2 kernel entries match reference math (golden)") {
    // probe via nlml-free path: kernel entry k(x0,x1) at ell=0.5, sf2=1.2
    // golden from numpy replication: K[0,1]=1.0174635938222425, K[3,7]=0.32534787709644214
    val g = gpr1d
    val p = GprParams(Array(0.5), 1.2, 0.0)
    // reconstruct through predict: with sn2=0 prediction at training points has
    // K*^T alpha; instead check kernel entry via the closed form directly
    def k(a: Double, b: Double): Double = {
      val q = math.sqrt(3.0) * math.abs(a - b) / 0.5
      1.2 * (1.0 + q) * math.exp(-q)
    }
    assert(math.abs(k(x12(0), x12(1)) - 1.0174635938222425) < 1e-14)
    assert(math.abs(k(x12(3), x12(7)) - 0.32534787709644214) < 1e-14)
    // and that the engine's nlml at those params is finite/sane
    assert(g.nlml(GprParams(Array(0.5), 1.2, 0.1)).isFinite)
  }

  test("NLML matches golden (1-d, 12-point toy set)") {
    val v = gpr1d.nlml(GprParams(Array(0.5), 1.2, 0.1))
    assert(math.abs(v - 24.515184711487894) < 1e-9, s"nlml=$v")
  }

  test("prediction matches golden (Rasmussen Algo 2.1)") {
    val xs = new DenseMatrix(5, 1, Array(0.0, 0.25, 0.5, 0.75, 1.0))
    val pred = gpr1d.predict(xs, GprParams(Array(0.5), 1.2, 0.1))
    val fsGold = Array(3.63861949, 3.67912219, 3.82368756, 3.20047757, 0.6439825)
    val fvGold = Array(0.03713744, 0.05367693, 0.17487652, 0.03311197, 0.17115729)
    for (i <- 0 until 5) {
      assert(math.abs(pred.fs(i) - fsGold(i)) < 1e-7, s"fs($i)=${pred.fs(i)}")
      assert(math.abs(pred.fsVar(i) - fvGold(i)) < 1e-7, s"fsVar($i)=${pred.fsVar(i)}")
      assert(math.abs(pred.yVar(i) - (fvGold(i) + 0.1)) < 1e-7)
    }
  }

  test("NLML matches golden (3-d coords)") {
    val x3 = Array(
      Array(-1.694767, 1.119675, -0.246363), Array(0.893861, 1.911958, 0.153983),
      Array(0.004482, -1.711795, -0.926244), Array(-0.00047, 0.71692, 1.214956),
      Array(-0.476235, -1.736255, -0.847418), Array(1.638374, -1.146459, -0.191504),
      Array(1.724824, -1.900403, 0.402196), Array(1.800518, -1.078788, 0.19396),
      Array(1.636513, -1.467322, 0.09365), Array(1.001639, 0.676053, -0.128989),
      Array(-1.180604, -0.036936, -0.510461), Array(-0.090395, -0.536438, 1.351672),
      Array(1.07459, -0.744021, 0.290501), Array(-0.895804, -0.188628, -0.588087),
      Array(0.629598, -0.518596, -0.163628), Array(0.877296, -0.348033, 1.625693),
      Array(-1.278194, 0.964475, -0.310504), Array(-0.294186, 0.537519, 0.091625),
      Array(-0.340456, -1.994292, -1.630951), Array(0.837578, 0.097382, 0.784642))
    val y3 = Array(-0.452194, -0.232778, -0.099873, 0.105667, -0.080983, 0.416708,
      -0.284358, 0.539037, 0.093991, 0.548861, -0.980232, 0.142552, 0.656895,
      -0.870165, 0.435357, 0.832976, -0.591687, -0.298907, 0.04901, 0.803836)
    val m = DenseMatrix.tabulate(20, 3)((i, j) => x3(i)(j))
    val g = new Matern32Gpr(m, DenseVector(y3))
    val v = g.nlml(GprParams(Array(0.8, 1.1, 2.0), 0.9, 0.05))
    // golden rounds the inputs to 6 dp, so compare loosely
    assert(math.abs(v - 13.518222796760185) < 1e-3, s"nlml3=$v")
    val xsRows = Array(Array(0.0, 0.0, 0.0), Array(1.0, -1.0, 0.5), Array(-1.5, 0.5, -0.5))
    val xs = DenseMatrix.tabulate[Double](3, 3)((i, j) => xsRows(i)(j))
    val pred = g.predict(xs, GprParams(Array(0.8, 1.1, 2.0), 0.9, 0.05))
    val fsGold = Array(-0.01047273, 0.51151548, -0.70685567)
    val fvGold = Array(0.29270966, 0.15295678, 0.22550662)
    for (i <- 0 until 3) {
      assert(math.abs(pred.fs(i) - fsGold(i)) < 1e-3)
      assert(math.abs(pred.fsVar(i) - fvGold(i)) < 1e-3)
    }
  }

  test("analytic gradient matches finite differences") {
    val g = gpr1d
    val p0 = Array(0.5, 1.2, 0.1)
    val (_, grad) = g.nlmlAndGrad(GprParams.fromArray(p0))
    val eps = 1e-6
    for (i <- p0.indices) {
      val up = p0.clone; up(i) += eps
      val dn = p0.clone; dn(i) -= eps
      val fd = (g.nlml(GprParams.fromArray(up)) - g.nlml(GprParams.fromArray(dn))) / (2 * eps)
      assert(math.abs(grad(i) - fd) < 1e-4 * math.max(1.0, math.abs(fd)),
        s"param $i: analytic=${grad(i)} fd=$fd")
    }
  }

  test("optimise reduces NLML and is deterministic") {
    val g = gpr1d
    val init = GprParams.default(1)
    val bij: Array[Bijector] = Array.fill(3)(Bijectors.default)
    val r1 = g.optimise(init, bij)
    val r2 = g.optimise(init, bij)
    assert(r1.objective < g.nlml(init), "optimisation should improve NLML")
    assert(r1.success)
    assert(r1.objective == r2.objective, "fit must be deterministic")
    assert(r1.params.lengthscales(0) > 0 && r1.params.kernelVariance > 0)
  }

  test("optimise respects sigmoid constraints") {
    val g = gpr1d
    val bij: Array[Bijector] = Array(
      Bijectors.SigmoidScaled(1e-8, 0.3), // lengthscale capped at 0.3
      Bijectors.default,
      Bijectors.SigmoidScaled(0.00125, 0.5))
    val init = GprParams(Array(0.1), 1.0,
      Bijectors.SigmoidScaled(0.00125, 0.5).moveWithinBound(1.0)) // 1.0 out of range -> high - tol
    val r = g.optimise(init, bij)
    assert(r.params.lengthscales(0) > 1e-8 && r.params.lengthscales(0) < 0.3)
    assert(r.params.likelihoodVariance > 0.00125 && r.params.likelihoodVariance < 0.5)
  }

  test("Cholesky failure yields +inf NLML, not an exception") {
    // duplicate points with zero noise => singular K
    val xs = Array(1.0, 1.0, 1.0)
    val g = new Matern32Gpr(new DenseMatrix(3, 1, xs), DenseVector(1.0, 2.0, 3.0))
    val v = g.nlml(GprParams(Array(1.0), 1.0, 0.0))
    assert(v == Double.PositiveInfinity || v.isNaN == false) // must not throw
  }
}

class BijectorsSpec extends AnyFunSuite {
  test("softplus forward matches stable formula and inverse round-trips") {
    val b = Bijectors.Softplus(0.0)
    assert(math.abs(b.fwd(0.0) - math.log(2.0)) < 1e-15)
    // large x: softplus(x) ~ x
    assert(math.abs(b.fwd(800.0) - 800.0) < 1e-12)
    for (u <- Seq(-30.0, -5.0, -1.0, 0.0, 0.5, 3.0, 40.0, 700.0))
      assert(math.abs(b.inv(b.fwd(u)) - u) < 1e-6, s"roundtrip at $u")
  }

  test("inverse softplus branch thresholds (reference utils.py:2326-2374)") {
    val b = Bijectors.Softplus(0.0)
    assert(b.inv(0.0) == Double.NegativeInfinity)
    assert(b.inv(-1.0) == Double.NegativeInfinity)
    // tiny y -> log(y) branch
    val tiny = 1e-16
    assert(math.abs(b.inv(tiny) - math.log(tiny)) < 1e-9)
    // huge y -> identity branch
    assert(b.inv(100.0) == 100.0)
    // shift moves support
    val bs = Bijectors.Softplus(2.0)
    assert(bs.inv(2.0) == Double.NegativeInfinity)
    assert(math.abs(bs.fwd(bs.inv(2.5)) - 2.5) < 1e-12)
  }

  test("scaled sigmoid and inverse") {
    val b = Bijectors.SigmoidScaled(0.00125, 0.01)
    assert(b.inv(0.001) == Double.NegativeInfinity)
    assert(b.inv(0.02) == Double.PositiveInfinity)
    for (t <- Seq(0.002, 0.005, 0.0099))
      assert(math.abs(b.fwd(b.inv(t)) - t) < 1e-12)
    // move within bound: tol nudging (pure_python_gpr.py:145-163)
    assert(b.moveWithinBound(1.0, tol = 1e-3) == 0.01 - 1e-3)
    assert(b.moveWithinBound(0.0, tol = 1e-3) == 0.00125 + 1e-3)
    assert(b.moveWithinBound(0.005, tol = 1e-3) == 0.005)
  }

  test("bijector gradients match finite differences") {
    val cases: Seq[Bijector] = Seq(
      Bijectors.Softplus(0.0), Bijectors.Softplus(1.5),
      Bijectors.SigmoidScaled(-1.0, 3.0), Bijectors.ExpBijector)
    val eps = 1e-7
    for (b <- cases; u <- Seq(-2.0, -0.3, 0.0, 0.7, 2.5)) {
      val fd = (b.fwd(u + eps) - b.fwd(u - eps)) / (2 * eps)
      assert(math.abs(b.grad(u) - fd) < 1e-6 * math.max(1.0, math.abs(fd)), s"$b at $u")
    }
  }
}
