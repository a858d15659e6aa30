package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** SGPR (Titsias collapsed bound) correctness:
  *  - ELBO + predictions pinned against an independent numpy replication of
  *    the public GPflow SGPR formulas on exact-rational inputs (goldens
  *    below were produced by a numpy script with the same data);
  *  - analytic gradients validated against central finite differences;
  *  - with inducing = ALL training points the bound is tight: SGPR must
  *    reproduce the exact GP's NLML and predictions (the reference pins
  *    SGPR against exact-GP analytic values at 1e-4,
  *    tests/test_localexperts.py:229-251).
  */
class SgprGprSpec extends AnyFunSuite {

  private val n = 40
  private val d = 3
  private val m = 8

  // exact-rational deterministic data (bit-identical to the numpy script)
  private val coords = DenseMatrix.tabulate[Double](n, d) { (i, j) =>
    j match {
      case 0 => (i * 7 % 13) * 0.3
      case 1 => (i * 5 % 11) * 0.4
      case _ => (i % 3) * 1.0
    }
  }
  private val y = DenseVector.tabulate[Double](n) { i =>
    0.1 * coords(i, 0) + 0.05 * coords(i, 1) - 0.02 * coords(i, 2) +
      ((i * 37 % 101) - 50) * 0.002
  }
  private val params = GprParams(Array(1.2, 0.8, 1.5), 0.9, 0.05)
  private def sgpr = new SgprGpr(coords, y, SgprGpr.strideSelect(n, m))

  test("ELBO matches the numpy golden (1e-8)") {
    // numpy: elbo = -166.3068418099
    assert(math.abs(sgpr.negElbo(params) - 166.3068418099) < 1e-8)
  }

  test("predictions match the numpy goldens (1e-9)") {
    val xs = DenseMatrix((0.5, 0.9, 1.0), (2.1, 3.2, 0.0), (3.3, 0.4, 2.0))
    val p = sgpr.predict(xs, params)
    val wantMean = Array(0.0755343802427122, 0.225364710890239, 0.342761596847225)
    val wantFVar = Array(0.740166101737545, 0.735089230675232, 0.138059211083894)
    val wantYVar = Array(0.790166101737545, 0.785089230675232, 0.188059211083894)
    (0 until 3).foreach { i =>
      assert(math.abs(p.fs(i) - wantMean(i)) < 1e-9, s"mean $i: ${p.fs(i)}")
      assert(math.abs(p.fsVar(i) - wantFVar(i)) < 1e-9, s"fvar $i: ${p.fsVar(i)}")
      assert(math.abs(p.yVar(i) - wantYVar(i)) < 1e-9, s"yvar $i: ${p.yVar(i)}")
    }
  }

  test("analytic gradient matches central finite differences (rel 1e-5)") {
    val g = sgpr
    val (_, grad) = g.negElboAndGrad(params)
    val theta = params.toArray
    val h = 1e-6
    theta.indices.foreach { i =>
      val up = theta.clone(); up(i) += h
      val dn = theta.clone(); dn(i) -= h
      val fd = (g.negElbo(GprParams.fromArray(up)) - g.negElbo(GprParams.fromArray(dn))) / (2 * h)
      val rel = math.abs(grad(i) - fd) / math.max(1e-8, math.abs(fd))
      assert(rel < 1e-5, s"param $i: analytic ${grad(i)} vs FD $fd (rel $rel)")
    }
  }

  test("inducing = all points: SGPR reproduces the exact GP (bound is tight)") {
    val full = new SgprGpr(coords, y, Array.tabulate(n)(identity))
    val exact = new Matern32Gpr(coords, y)
    val nlml = exact.nlml(params)
    assert(math.abs(full.negElbo(params) - nlml) < 1e-3 * math.abs(nlml),
      s"negElbo ${full.negElbo(params)} vs nlml $nlml")

    val xs = DenseMatrix((0.5, 0.9, 1.0), (2.1, 3.2, 0.0), (3.3, 0.4, 2.0))
    val ps = full.predict(xs, params)
    val pe = exact.predict(xs, params)
    (0 until 3).foreach { i =>
      assert(math.abs(ps.fs(i) - pe.fs(i)) < 1e-4, s"mean $i: ${ps.fs(i)} vs ${pe.fs(i)}")
      assert(math.abs(ps.fsVar(i) - pe.fsVar(i)) < 1e-4, s"fvar $i: ${ps.fsVar(i)} vs ${pe.fsVar(i)}")
    }
  }

  test("optimise: improves the objective, respects bounds, deterministic") {
    val g = sgpr
    val bij: Array[Bijector] = Array(
      Bijectors.SigmoidScaled(0.01, 20.0), Bijectors.SigmoidScaled(0.01, 20.0),
      Bijectors.SigmoidScaled(0.01, 20.0), Bijectors.SigmoidScaled(1e-6, 10.0),
      Bijectors.SigmoidScaled(1e-6, 1.0))
    val init = GprParams(Array(1.0, 1.0, 1.0), 1.0, 0.5)
    val r1 = g.optimise(init, bij, maxIter = 60)
    val r2 = g.optimise(init, bij, maxIter = 60)
    assert(r1.objective <= g.negElbo(init) + 1e-9, "optimiser must not worsen the objective")
    assert(r1.params.lengthscales.forall(l => l > 0.01 && l < 20.0))
    assert(r1.params.likelihoodVariance > 1e-6 && r1.params.likelihoodVariance < 1.0)
    assert(r1.params.toArray.sameElements(r2.params.toArray), "deterministic")
  }

  test("optimised SGPR recovers signal on a larger window (M << n)") {
    // 400-point window, smooth signal + small noise; M=60 inducing
    val nn = 400
    val cc = DenseMatrix.tabulate[Double](nn, 2) { (i, j) =>
      if (j == 0) (i * 13 % 97) * 0.08 - 3.84 else (i * 29 % 89) * 0.09 - 3.96
    }
    val yy = DenseVector.tabulate[Double](nn) { i =>
      0.3 * math.sin(cc(i, 0)) + 0.2 * math.cos(cc(i, 1)) + ((i * 41 % 31) - 15) * 0.001
    }
    val g = new SgprGpr(cc, yy, SgprGpr.strideSelect(nn, 60))
    val bij: Array[Bijector] = Array(
      Bijectors.SigmoidScaled(0.01, 20.0), Bijectors.SigmoidScaled(0.01, 20.0),
      Bijectors.SigmoidScaled(1e-6, 10.0), Bijectors.SigmoidScaled(1e-6, 1.0))
    val fit = g.optimise(GprParams(Array(1.0, 1.0), 1.0, 0.1), bij, maxIter = 80)
    assert(fit.success)
    val xs = DenseMatrix((0.0, 0.0), (1.0, -1.0), (-2.0, 2.0))
    val p = g.predict(xs, fit.params)
    (0 until 3).foreach { i =>
      val truth = 0.3 * math.sin(xs(i, 0)) + 0.2 * math.cos(xs(i, 1))
      assert(math.abs(p.fs(i) - truth) < 0.02, s"pred ${p.fs(i)} vs truth $truth")
      assert(p.fsVar(i) > 0 && p.fsVar(i) < 1.0)
    }
  }
}
