package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** MaternGpr (selectable smoothness) + SkiGpr (KISS-GP kernel interpolation):
  *  - MaternGpr(nu=1.5) equals Matern32Gpr to machine precision;
  *  - nu=0.5 / nu=2.5 kernels pinned against independently-written closed
  *    forms at hand distances;
  *  - bestNu recovers the discrete smoothness from likelihood;
  *  - SKI cubic interpolation reproduces quadratics exactly on the grid;
  *  - the SKI kernel converges to the exact kernel as the grid refines;
  *  - SKI NLML/predictions approach the exact GP on a fine grid;
  *  - optimise improves and is deterministic.
  */
class SkiMaternSpec extends AnyFunSuite {

  private val n = 30
  private val xs1 = Array.tabulate(n)(i => 0.02 + 0.96 * ((i * 37 % 97) / 97.0))
  private val coords1 = DenseMatrix.tabulate[Double](n, 1)((i, _) => xs1(i))
  private val y1 = DenseVector.tabulate[Double](n) { i =>
    math.sin(3.0 * xs1(i)) * 0.5 + ((i * 13 % 11) - 5) * 0.004
  }
  private val h1 = Array(0.4, 0.8, 0.01)

  test("MaternGpr(nu=1.5) == Matern32Gpr (nlml and predictions)") {
    val gp = new MaternGpr(coords1, y1, 1.5)
    val exact = new Matern32Gpr(coords1, y1)
    for (hyp <- Seq(Array(0.4, 0.8, 0.01), Array(0.15, 1.3, 0.05))) {
      val a = gp.nlml(hyp)
      val b = exact.nlml(GprParams(Array(hyp(0)), hyp(1), hyp(2)))
      assert(math.abs(a - b) < 1e-9 * math.max(1.0, math.abs(b)), s"$a vs $b")
    }
    val xq = DenseMatrix.tabulate[Double](5, 1)((i, _) => 0.1 + 0.2 * i)
    val pa = gp.predict(xq, h1)
    val pb = exact.predict(xq, GprParams(Array(0.4), 0.8, 0.01))
    (0 until 5).foreach { i =>
      assert(math.abs(pa.fs(i) - pb.fs(i)) < 1e-9)
      assert(math.abs(pa.fsVar(i) - pb.fsVar(i)) < 1e-9)
    }
  }

  test("nu=0.5 and nu=2.5 kernel values match the closed forms") {
    // 2-point fixtures: nlml of n=2 has a closed form from the 2x2 kernel
    val c2 = DenseMatrix.tabulate[Double](2, 1)((i, _) => i * 0.3)
    val y2 = DenseVector(0.2, -0.1)
    def nlml2(k01: Double, sf2: Double, sn2: Double): Double = {
      val a0 = sf2 + sn2
      val det = a0 * a0 - k01 * k01
      val quad = (a0 * (y2(0) * y2(0) + y2(1) * y2(1)) - 2 * k01 * y2(0) * y2(1)) / det
      0.5 * quad + 0.5 * math.log(det) + math.log(2 * math.Pi)
    }
    val r = 0.3 / 0.4 // scaled distance
    val q12 = r                 // nu=1/2: q = sqrt(2*0.5) r = r
    val q52 = math.sqrt(5.0) * r
    val k12 = 0.8 * math.exp(-q12)
    val k52 = 0.8 * (1 + q52 + q52 * q52 / 3.0) * math.exp(-q52)
    assert(math.abs(new MaternGpr(c2, y2, 0.5).nlml(h1) - nlml2(k12, 0.8, 0.01)) < 1e-10)
    assert(math.abs(new MaternGpr(c2, y2, 2.5).nlml(h1) - nlml2(k52, 0.8, 0.01)) < 1e-10)
  }

  test("bestNu picks the smoothness that maximises the optimised likelihood") {
    // rough data (white-ish increments) should prefer LOW nu over 2.5
    val yr = DenseVector.tabulate[Double](n)(i => if ((i * 7 % 3) == 0) 0.3 else -0.3)
    val bij: Array[Bijector] = Array(
      Bijectors.SigmoidScaled(0.02, 5.0), Bijectors.SigmoidScaled(0.01, 5.0),
      Bijectors.SigmoidScaled(0.001, 1.0))
    val (nuRough, _, _) = MaternGpr.bestNu(coords1, yr, Array(0.3, 0.5, 0.05), bij, maxIter = 25)
    assert(nuRough == 0.5, s"rough data picked nu=$nuRough")
    // smooth data (a sine with tiny noise) should prefer HIGH nu
    val (nuSmooth, _, _) = MaternGpr.bestNu(coords1, y1, Array(0.3, 0.5, 0.05), bij, maxIter = 25)
    assert(nuSmooth == 2.5, s"smooth data picked nu=$nuSmooth")
  }

  test("SKI cubic interpolation reproduces quadratics exactly and sums to one") {
    val gp = new SkiGpr(coords1, y1, Array(24))
    // cubic convolution (Keys a = -1/2) reproduces polynomials up to
    // degree 2: interpolating f(t) = 2 + 3t + t^2 sampled at grid points
    // must give f(x) exactly at arbitrary x
    def f(t: Double): Double = 2.0 + 3.0 * t + t * t
    for (x <- Seq(0.03, 0.31, 0.555, 0.97) ++ coords1(::, 0).toScalaVector) {
      val (b, w) = gp.stencil(0, x)
      assert(math.abs(w.sum - 1.0) < 1e-12, "partition of unity")
      val interp = (0 until 4).map { j =>
        w(j) * f(gp.gridStart(0) + (b + j) * gp.gridStep(0))
      }.sum
      assert(math.abs(interp - f(x)) < 1e-10, s"x=$x: $interp vs ${f(x)}")
    }
  }

  test("SKI kernel converges to the exact kernel as the grid refines") {
    val hyp = Array(0.4, 0.8, 0.01)
    def maxErr(g: Int): Double = {
      val gp = new SkiGpr(coords1, y1, Array(g))
      val pts = Seq(0.1, 0.27, 0.5, 0.83)
      (for (a <- pts; b <- pts) yield {
        val q = math.sqrt(3.0) * math.abs(a - b) / 0.4
        val exact = 0.8 * (1 + q) * math.exp(-q)
        math.abs(gp.skiKernel(Array(a), Array(b), hyp) - exact)
      }).max
    }
    val e16 = maxErr(16); val e32 = maxErr(32); val e64 = maxErr(64)
    assert(e32 < e16 && e64 < e32, s"errors not decreasing: $e16 $e32 $e64")
    assert(e64 < 5e-4, s"fine-grid kernel error $e64")
  }

  test("SKI NLML and predictions approach the exact GP on a fine grid") {
    val gp = new SkiGpr(coords1, y1, Array(96))
    val exact = new Matern32Gpr(coords1, y1)
    val a = gp.nlml(h1)
    val b = exact.nlml(GprParams(Array(0.4), 0.8, 0.01))
    assert(math.abs(a - b) < 0.02 * math.abs(b) + 0.1, s"ski $a vs exact $b")
    val xq = DenseMatrix.tabulate[Double](5, 1)((i, _) => 0.1 + 0.2 * i)
    val pa = gp.predict(xq, h1)
    val pb = exact.predict(xq, GprParams(Array(0.4), 0.8, 0.01))
    (0 until 5).foreach { i =>
      assert(math.abs(pa.fs(i) - pb.fs(i)) < 5e-3, s"pred $i: ${pa.fs(i)} vs ${pb.fs(i)}")
      assert(pa.fsVar(i) > 0)
    }
  }

  test("SKI 2-D: Hadamard factorisation matches the dense product kernel") {
    val nn = 30
    val c2 = DenseMatrix.tabulate[Double](nn, 2) { (i, k) =>
      if (k == 0) 0.05 + 0.9 * ((i * 29 % 83) / 83.0) else 0.05 + 0.9 * ((i * 41 % 79) / 79.0)
    }
    val y2 = DenseVector.tabulate[Double](nn)(i => 0.4 * math.sin(3 * c2(i, 0)) * math.cos(2 * c2(i, 1)))
    val gp = new SkiGpr(c2, y2, Array(64, 64))
    val hyp = Array(0.5, 0.6, 0.9, 0.7, 0.01)
    val pts = Seq(Array(0.3, 0.4), Array(0.7, 0.2))
    for (a <- pts; b <- pts) {
      val exact = (0 until 2).map { k =>
        val ell = hyp(k); val vk = hyp(2 + k)
        val q = math.sqrt(3.0) * math.abs(a(k) - b(k)) / ell
        vk * (1 + q) * math.exp(-q)
      }.product
      assert(math.abs(gp.skiKernel(a, b, hyp) - exact) < 2e-3,
        s"2-D ski kernel ${gp.skiKernel(a, b, hyp)} vs $exact")
    }
  }

  test("SKI analytic gradient matches finite differences (1-D and 2-D, every nu)") {
    val c2d = DenseMatrix.tabulate[Double](24, 2) { (i, k) =>
      if (k == 0) 0.05 + 0.9 * ((i * 29 % 83) / 83.0) else 0.05 + 0.9 * ((i * 41 % 79) / 79.0)
    }
    val y2d = DenseVector.tabulate[Double](24)(i => 0.4 * math.sin(3 * c2d(i, 0)) * math.cos(2 * c2d(i, 1)))
    for ((gp, hyp) <- Seq(
      (new SkiGpr(coords1, y1, Array(24)), Array(0.9, 1.3, 0.12)),
      (new SkiGpr(coords1, y1, Array(24), nu = 0.5), Array(0.7, 0.8, 0.2)),
      (new SkiGpr(coords1, y1, Array(24), nu = 2.5), Array(1.1, 0.6, 0.05)),
      (new SkiGpr(c2d, y2d, Array(12, 12)), Array(0.8, 1.2, 0.9, 1.1, 0.15)))) {
      val (v, g) = gp.nlmlWithGrad(hyp)
      assert(math.abs(v - gp.nlml(hyp)) < 1e-9, "value must equal nlml")
      val fd = 1e-6
      hyp.indices.foreach { i =>
        val up = hyp.clone(); up(i) += fd
        val dn = hyp.clone(); dn(i) -= fd
        val num = (gp.nlml(up) - gp.nlml(dn)) / (2 * fd)
        assert(math.abs(g(i) - num) <= 1e-4 * math.max(1.0, math.abs(num)),
          s"d=${gp.d} nu=${gp.nu} param $i: analytic ${g(i)} vs FD $num")
      }
    }
  }

  test("SKI optimise improves the objective and is deterministic") {
    val gp = new SkiGpr(coords1, y1, Array(32))
    val init = Array(1.0, 1.0, 0.1)
    val bij: Array[Bijector] = Array(
      Bijectors.SigmoidScaled(0.05, 5.0), Bijectors.SigmoidScaled(0.01, 5.0),
      Bijectors.SigmoidScaled(0.002, 1.0))
    val (o1, obj1, ok1, it1) = gp.optimise(init, bij, maxIter = 40, tolerance = 1e-5)
    val (o2, obj2, _, _) = gp.optimise(init, bij, maxIter = 40, tolerance = 1e-5)
    assert(ok1)
    assert(it1 > 0)
    assert(obj1 <= gp.nlml(init) + 1e-9)
    assert(o1.sameElements(o2) && obj1 === obj2)
  }
}
