package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** SVGP correctness:
  *  - the full analytic gradient (variational mean, triangular scale, and
  *    hyperparameters) validated against central finite differences;
  *  - with a Gaussian likelihood and full batches, the trained ELBO and
  *    predictions must converge to the COLLAPSED Titsias solution — i.e.
  *    match [[SgprGpr]] at the same hyperparameters (cross-model check);
  *  - minibatch training reaches the same neighbourhood;
  *  - deterministic (no RNG anywhere).
  */
class SvgpGprSpec extends AnyFunSuite {

  private val n = 40
  private val d = 3
  private val m = 8
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
  private def bij: Array[Bijector] = Array.fill[Bijector](d + 2)(Bijectors.default)

  test("analytic gradient (m, L, hypers) matches central finite differences") {
    val g = new SvgpGpr(coords, y, SvgpGpr.strideSelect(n, m))
    // non-trivial variational state
    (0 until m).foreach(i => g.vm(i) = 0.05 * (i - 3))
    (0 until m).foreach { c =>
      (c until m).foreach(r => g.vL(r + c * m) = if (r == c) 0.8 + 0.05 * c else 0.02 * (r - c))
    }
    val idx = Array.tabulate(n)(identity)
    val (_, grad) = g.negElboAndGrad(params, idx)
    val h = 1e-6
    val base = m + m * (m + 1) / 2

    def fAt(): Double = g.negElboAndGrad(params, idx)._1
    // variational mean entries
    Seq(0, 3, m - 1).foreach { i =>
      val v0 = g.vm(i)
      g.vm(i) = v0 + h; val up = fAt()
      g.vm(i) = v0 - h; val dn = fAt()
      g.vm(i) = v0
      val fd = (up - dn) / (2 * h)
      assert(math.abs(grad(i) - fd) < 1e-5 * math.max(1.0, math.abs(fd)), s"m($i): ${grad(i)} vs $fd")
    }
    // triangular entries (diag + off-diag)
    val packedIdxs = Seq(0, 1, m, m * (m + 1) / 2 - 1)
    // rebuild the packed -> colmajor mapping used by the optimiser
    val lowToCol = {
      val t = scala.collection.mutable.ArrayBuffer[Int]()
      (0 until m).foreach(c => (c until m).foreach(r => t += (r + c * m)))
      t.toArray
    }
    packedIdxs.foreach { pi =>
      val ci = lowToCol(pi)
      val v0 = g.vL(ci)
      g.vL(ci) = v0 + h; val up = fAt()
      g.vL(ci) = v0 - h; val dn = fAt()
      g.vL(ci) = v0
      val fd = (up - dn) / (2 * h)
      assert(math.abs(grad(m + pi) - fd) < 1e-5 * math.max(1.0, math.abs(fd)),
        s"L(packed $pi): ${grad(m + pi)} vs $fd")
    }
    // hyperparameters
    val theta = params.toArray
    theta.indices.foreach { i =>
      val up = theta.clone(); up(i) += h
      val dn = theta.clone(); dn(i) -= h
      val fd = (g.negElboAndGrad(GprParams.fromArray(up), idx)._1 -
        g.negElboAndGrad(GprParams.fromArray(dn), idx)._1) / (2 * h)
      val got = grad(base + i)
      assert(math.abs(got - fd) < 1e-4 * math.max(1.0, math.abs(fd)), s"theta($i): $got vs $fd")
    }
  }

  test("full-batch variational-only training converges to the collapsed (SGPR) bound") {
    val svgp = new SvgpGpr(coords, y, SvgpGpr.strideSelect(n, m))
    svgp.optimise(params, bij, steps = 3000, lr = 0.05, trainHypers = false)
    val sgpr = new SgprGpr(coords, y, SgprGpr.strideSelect(n, m))
    val collapsed = sgpr.negElbo(params)
    val trained = svgp.negElbo(params)
    assert(trained >= collapsed - 1e-6, "collapsed bound is the optimum over q")
    assert(math.abs(trained - collapsed) < 1e-3 * math.abs(collapsed),
      s"SVGP $trained vs SGPR $collapsed")

    val xs = DenseMatrix((0.5, 0.9, 1.0), (2.1, 3.2, 0.0), (3.3, 0.4, 2.0))
    val ps = svgp.predict(xs, params)
    val pg = sgpr.predict(xs, params)
    (0 until 3).foreach { i =>
      assert(math.abs(ps.fs(i) - pg.fs(i)) < 5e-3, s"mean $i: ${ps.fs(i)} vs ${pg.fs(i)}")
      assert(math.abs(ps.fsVar(i) - pg.fsVar(i)) < 5e-3, s"fvar $i: ${ps.fsVar(i)} vs ${pg.fsVar(i)}")
    }
  }

  test("minibatch training lands near the full-batch optimum; deterministic") {
    val a = new SvgpGpr(coords, y, SvgpGpr.strideSelect(n, m), batchSize = 10)
    val ra = a.optimise(params, bij, steps = 4000, lr = 0.03, trainHypers = false)
    val sgpr = new SgprGpr(coords, y, SgprGpr.strideSelect(n, m))
    val collapsed = sgpr.negElbo(params)
    assert(math.abs(ra.objective - collapsed) < 2e-2 * math.abs(collapsed),
      s"minibatch SVGP ${ra.objective} vs collapsed $collapsed")
    // determinism: same construction + steps -> bit-identical state
    val b1 = new SvgpGpr(coords, y, SvgpGpr.strideSelect(n, m), batchSize = 10)
    b1.optimise(params, bij, steps = 4000, lr = 0.03, trainHypers = false)
    assert(a.vm.sameElements(b1.vm) && a.vL.sameElements(b1.vL))
  }

  test("joint training improves the ELBO over the initial hyperparameters") {
    val svgp = new SvgpGpr(coords, y, SvgpGpr.strideSelect(n, m))
    val init = GprParams(Array(1.0, 1.0, 1.0), 1.0, 0.5)
    val before = {
      val tmp = new SvgpGpr(coords, y, SvgpGpr.strideSelect(n, m))
      tmp.optimise(init, bij, steps = 2000, lr = 0.05, trainHypers = false).objective
    }
    val fit = svgp.optimise(init, bij, steps = 3000, lr = 0.05)
    assert(fit.success)
    assert(fit.objective < before, s"joint ${fit.objective} should beat variational-only $before")
    assert(fit.params.likelihoodVariance > 0 && fit.params.kernelVariance > 0)
  }
}
