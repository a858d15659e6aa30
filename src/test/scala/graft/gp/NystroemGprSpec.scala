package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import org.scalatest.funsuite.AnyFunSuite

/** Goldens generated from a numpy replication of the reference Nystroem
  * math (pure_python_gpr.py:408-435) on the shared fixture, with the same
  * landmark set the reference's seeded np.random.choice(seed=20) picks.
  */
class NystroemGprSpec extends AnyFunSuite {
  private val x = DenseMatrix.tabulate[Double](60, 3)((i, j) => NystroemFixture.X(i)(j))
  private val y = DenseVector(NystroemFixture.Y)
  private val ell = Array(0.9, 1.2, 2.5)

  test("Nystroem NLML matches the reference math (golden)") {
    val st = NystroemGpr.fit(x, y, NystroemFixture.Landmarks, ell, 0.8, 0.05)
    val v = NystroemGpr.nlml(y, st)
    assert(math.abs(v - 66.63088159282547) < 1e-6, s"nlZ=$v")
  }

  test("Nystroem prediction mean matches golden; negative residual variance -> NaN (reference behavior)") {
    val st = NystroemGpr.fit(x, y, NystroemFixture.Landmarks, ell, 0.8, 0.05)
    val xsRows = Array(Array(0.0, 0.0, 0.0), Array(1.0, -1.0, 0.5))
    val xs = DenseMatrix.tabulate[Double](2, 3)((i, j) => xsRows(i)(j))
    val p = NystroemGpr.predict(x, xs, st, ell, 0.8, 0.05)
    assert(math.abs(p.fs(0) - -2.57509126) < 1e-6)
    assert(math.abs(p.fs(1) - 1.17359981) < 1e-6)
    assert(p.fsVar(0).isNaN && p.fsVar(1).isNaN) // reference squares sqrt(<0)
  }

  test("Nystroem approaches the exact GP as M -> n") {
    val exact = new Matern32Gpr(x, y)
    val p = GprParams(ell, 0.8, 0.05)
    val full = NystroemGpr.fit(x, y, Array.tabulate(60)(identity), ell, 0.8, 0.05)
    val vExact = exact.nlml(p)
    val vApprox = NystroemGpr.nlml(y, full)
    assert(math.abs(vExact - vApprox) < 0.5, s"exact=$vExact approx=$vApprox")
  }

  test("stride landmark selection is deterministic and sorted") {
    val s = NystroemGpr.strideSelect(100, 10)
    assert(s.toSeq === s.sorted.toSeq)
    assert(s.distinct.length === 10)
    assert(NystroemGpr.strideSelect(100, 10).toSeq === s.toSeq)
  }
}
