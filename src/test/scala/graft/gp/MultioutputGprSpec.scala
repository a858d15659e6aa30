package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** Multioutput GPR correctness:
  *  - P=1, L=1, H=[[1]] collapses to the exact single-output Matern-3/2 GP
  *    to machine precision (nlml AND predictions);
  *  - H = I with diagonal noise factorises: joint nlml == sum of the two
  *    independent single-output nlmls;
  *  - a genuine mixing model (two channels reading one latent field with
  *    different gains) recovers the latent field at held-out points and
  *    predicts each channel with its gain;
  *  - optimise improves the objective and is deterministic.
  */
class MultioutputGprSpec extends AnyFunSuite {

  private val n = 24
  private val xs = Array.tabulate(n)(i => 0.02 + 0.96 * ((i * 37 % 97) / 97.0))
  private val coords = DenseMatrix.tabulate[Double](n, 1)((i, _) => xs(i))
  private def f(x: Double): Double = 0.5 * math.sin(3.0 * x)
  private val noise = Array.tabulate(n)(i => ((i * 13 % 11) - 5) * 0.004)
  private val y1 = DenseVector.tabulate[Double](n)(i => f(xs(i)) + noise(i))

  test("P=1, L=1, H=[[1]] equals the exact single-output GP to machine precision") {
    val mo = new MultioutputGpr(coords, y1.toDenseMatrix.t, DenseMatrix(1.0))
    val exact = new Matern32Gpr(coords, y1)
    for (hyp <- Seq(Array(0.4, 0.8, 0.01), Array(0.15, 1.3, 0.05), Array(2.0, 0.3, 0.001))) {
      val a = mo.nlml(hyp)
      val b = exact.nlml(GprParams(Array(hyp(0)), hyp(1), hyp(2)))
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b)), s"nlml $a vs $b at ${hyp.toSeq}")
    }
    val hyp = Array(0.4, 0.8, 0.01)
    val xq = DenseMatrix.tabulate[Double](5, 1)((i, _) => 0.1 + 0.2 * i)
    val (mMean, mVar) = mo.predictLatent(xq, hyp)
    val pe = exact.predict(xq, GprParams(Array(0.4), 0.8, 0.01))
    (0 until 5).foreach { i =>
      assert(math.abs(mMean(i, 0) - pe.fs(i)) < 1e-9, s"mean $i")
      assert(math.abs(mVar(i, 0) - pe.fsVar(i)) < 1e-9, s"var $i")
    }
    // observed-channel prediction adds the noise variance
    val (_, oVar) = mo.predictObserved(xq, hyp)
    (0 until 5).foreach(i => assert(math.abs(oVar(i, 0) - (mVar(i, 0) + 0.01)) < 1e-12))
  }

  test("H = I with diagonal noise factorises into independent per-channel GPs") {
    val y2 = DenseVector.tabulate[Double](n)(i => 0.3 * math.cos(2.0 * xs(i)) - noise(i))
    val ys = DenseMatrix.tabulate[Double](n, 2)((i, p) => if (p == 0) y1(i) else y2(i))
    val mo = new MultioutputGpr(coords, ys, DenseMatrix.eye[Double](2))
    // packed: [ls_l0, ls_l1, var_0, var_1, r_0, r_1]
    val joint = mo.nlml(Array(0.4, 0.7, 0.8, 0.5, 0.01, 0.02))
    val g1 = new Matern32Gpr(coords, y1).nlml(GprParams(Array(0.4), 0.8, 0.01))
    val g2 = new Matern32Gpr(coords, y2).nlml(GprParams(Array(0.7), 0.5, 0.02))
    assert(math.abs(joint - (g1 + g2)) < 1e-8, s"joint $joint vs ${g1 + g2}")
  }

  test("two channels with gains (1, 2) over one latent field: latent recovery + channel gains") {
    val h = DenseMatrix(1.0, 2.0) // P=2, L=1
    val ys = DenseMatrix.tabulate[Double](n, 2)((i, p) =>
      (if (p == 0) 1.0 else 2.0) * f(xs(i)) + (if (p == 0) noise(i) else -noise(i)))
    val mo = new MultioutputGpr(coords, ys, h)
    val hyp = Array(0.4, 0.5, 0.001, 0.001)
    val xq = DenseMatrix.tabulate[Double](7, 1)((i, _) => 0.15 + 0.1 * i)
    val (lm, lv) = mo.predictLatent(xq, hyp)
    (0 until 7).foreach { i =>
      assert(math.abs(lm(i, 0) - f(xq(i, 0))) < 0.01, s"latent $i: ${lm(i, 0)} vs ${f(xq(i, 0))}")
      assert(lv(i, 0) > 0 && lv(i, 0) < 0.5)
    }
    val (om, _) = mo.predictObserved(xq, hyp)
    (0 until 7).foreach { i =>
      assert(math.abs(om(i, 0) - f(xq(i, 0))) < 0.01)
      assert(math.abs(om(i, 1) - 2.0 * f(xq(i, 0))) < 0.02)
      assert(math.abs(om(i, 1) - 2.0 * om(i, 0)) < 1e-9, "channel means share the latent")
    }
    // the two-channel joint fit beats a single-channel fit's latent variance
    val single = new MultioutputGpr(coords,
      ys(::, 0).toDenseMatrix.t, DenseMatrix(1.0))
    val (_, svRaw) = single.predictLatent(xq, Array(0.4, 0.5, 0.001))
    (0 until 7).foreach(i => assert(lv(i, 0) <= svRaw(i, 0) + 1e-12,
      "extra channel can only reduce posterior variance"))
  }

  test("optimise improves the objective and is deterministic") {
    val h = DenseMatrix(1.0, 2.0)
    val ys = DenseMatrix.tabulate[Double](n, 2)((i, p) =>
      (if (p == 0) 1.0 else 2.0) * f(xs(i)) + (if (p == 0) noise(i) else -noise(i)))
    val mo = new MultioutputGpr(coords, ys, h)
    val init = Array(1.0, 1.0, 0.05, 0.05)
    val bij: Array[Bijector] = Array(
      Bijectors.SigmoidScaled(0.05, 5.0), Bijectors.SigmoidScaled(0.01, 5.0),
      Bijectors.SigmoidScaled(0.0005, 1.0), Bijectors.SigmoidScaled(0.0005, 1.0))
    val (o1, obj1, ok1, it1) = mo.optimise(init, bij, maxIter = 40, tolerance = 1e-5)
    val (o2, obj2, _, _) = mo.optimise(init, bij, maxIter = 40, tolerance = 1e-5)
    assert(ok1)
    assert(it1 > 0)
    assert(obj1 <= mo.nlml(init) + 1e-9)
    assert(o1.sameElements(o2) && obj1 === obj2, "deterministic")
  }
}
