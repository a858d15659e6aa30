package graft.gp

import breeze.linalg.{cholesky, DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** VFF correctness:
  *  - the collapsed bound NEVER exceeds the exact log marginal likelihood
  *    (lower-bound invariant, any hyperparameters);
  *  - with enough features the bound tightens to the exact 1-D Matern32
  *    marginal likelihood and the predictions match the exact GP;
  *  - 2-D Kronecker features match a dense product-kernel GP;
  *  - optimise improves and is deterministic.
  */
class VffGprSpec extends AnyFunSuite {

  // 1-D data strictly inside (0, 1)
  private val n = 30
  private val xs1 = Array.tabulate(n)(i => 0.02 + 0.96 * ((i * 37 % 97) / 97.0))
  private val coords1 = DenseMatrix.tabulate[Double](n, 1)((i, _) => xs1(i))
  private val y1 = DenseVector.tabulate[Double](n) { i =>
    math.sin(3.0 * xs1(i)) * 0.5 + ((i * 13 % 11) - 5) * 0.004
  }
  // hypers packed [ell, var, s]
  private val h1 = Array(0.4, 0.8, 0.01)

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
      // forward then back solve
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

  test("collapsed bound never exceeds the exact log marginal likelihood (1-D)") {
    val (lml, _) = denseGp(coords1, y1, Array(h1(0)), Array(h1(1)), h1(2))
    Seq(4, 8, 16, 48).foreach { m =>
      val vff = new VffGpr(coords1, y1, Array(m), Array(-0.5), Array(1.5))
      val elbo = -vff.negElbo(h1)
      assert(elbo <= lml + 1e-9, s"m=$m: elbo $elbo must lower-bound lml $lml")
    }
  }

  test("the bound tightens to the exact 1-D marginal likelihood; predictions match") {
    // domain must extend a few lengthscales beyond the data (the VFF
    // boundary effect — the reference's domain_size knob): data in (0,1),
    // ell=0.4 -> domain [-1.5, 2.5] gives ~3.75 ell of margin
    val (lml, predExact) = denseGp(coords1, y1, Array(h1(0)), Array(h1(1)), h1(2))
    val vff = new VffGpr(coords1, y1, Array(64), Array(-1.5), Array(2.5))
    val elbo = -vff.negElbo(h1)
    assert(math.abs(elbo - lml) < 0.02 * math.abs(lml) + 0.05,
      s"m=64: elbo $elbo vs exact lml $lml")
    val xq = DenseMatrix.tabulate[Double](5, 1)((i, _) => 0.1 + 0.2 * i)
    val pv = vff.predict(xq, h1)
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
    val h2 = Array(0.5, 0.6, 0.9, 0.7, 0.01) // [ell1, ell2, var1, var2, s]
    val (lml, predExact) = denseGp(c2, y2, Array(0.5, 0.6), Array(0.9, 0.7), 0.01)
    val vff = new VffGpr(c2, y2, Array(32, 32), Array(-1.5, -1.5), Array(2.5, 2.5))
    val elbo = -vff.negElbo(h2)
    assert(elbo <= lml + 1e-9)
    // 2-D boundary effects compound (per-dim gaps multiply through the
    // product kernel): the bound sits within a few nats of the exact lml
    assert(math.abs(elbo - lml) < 0.12 * math.abs(lml) + 0.5, s"elbo $elbo vs lml $lml")
    val xq = DenseMatrix((0.3, 0.4), (0.7, 0.2), (0.5, 0.8))
    val pv = vff.predict(xq, h2)
    val pe = predExact(xq)
    (0 until 3).foreach(i =>
      assert(math.abs(pv.fs(i) - pe(i)) < 2e-2, s"pred $i: ${pv.fs(i)} vs ${pe(i)}"))
  }

  test("edge-corrected prediction outside the domain stays sane") {
    val vff = new VffGpr(coords1, y1, Array(48), Array(-0.5), Array(1.5))
    val xq = DenseMatrix.tabulate[Double](2, 1)((i, _) => if (i == 0) -1.2 else 2.3)
    val p = vff.predict(xq, h1)
    // far outside: mean decays toward 0, variance toward the prior
    assert(p.fs.forall(v => math.abs(v) < 0.5))
    assert(p.fsVar.forall(v => v > 0 && v < h1(1) * 1.2))
  }

  test("optimise improves the objective and is deterministic") {
    val vff = new VffGpr(coords1, y1, Array(24), Array(-0.5), Array(1.5))
    val init = Array(1.0, 1.0, 0.1)
    val bij: Array[Bijector] = Array.fill(3)(Bijectors.default)
    val (h1o, obj1, ok1, it1) = vff.optimise(init, bij, maxIter = 40)
    val (h2o, obj2, _, _) = vff.optimise(init, bij, maxIter = 40)
    assert(ok1)
    assert(it1 > 0 && it1 <= 40, "reported iterations are the actual L-BFGS count")
    assert(obj1 <= vff.negElbo(init) + 1e-9)
    assert(h1o.sameElements(h2o) && obj1 === obj2, "deterministic")
  }
}
