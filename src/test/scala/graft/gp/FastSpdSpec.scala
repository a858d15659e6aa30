package graft.gp

import dev.ludovic.netlib.lapack.LAPACK
import org.netlib.util.intW
import org.scalatest.funsuite.AnyFunSuite

class FastSpdSpec extends AnyFunSuite {
  private val lapack = LAPACK.getInstance

  private def randSpd(n: Int, seed: Long): Array[Double] = {
    val rng = new scala.util.Random(seed)
    val x = Array.fill(n, 8)(rng.nextGaussian())
    val a = new Array[Double](n * (n + 1)) // padded: netlib bound checks
    for (i <- 0 until n; j <- 0 until n) {
      var s = 0.0
      for (k <- 0 until 8) { val d = x(i)(k) - x(j)(k); s += d * d }
      a(i + j * n) = math.exp(-s / 8)
    }
    for (i <- 0 until n) a(i + i * n) += 0.5
    a
  }

  private def upperDiff(a: Array[Double], b: Array[Double], n: Int): Double = {
    var m = 0.0
    for (j <- 0 until n; i <- 0 to j) m = math.max(m, math.abs(a(i + j * n) - b(i + j * n)))
    m
  }

  test("blocked potrf matches f2j dpotrf (sizes straddling the block size)") {
    for (n <- Seq(3, 63, 64, 65, 130, 257, 500)) {
      val a0 = randSpd(n, n)
      val mine = a0.clone(); val ref = a0.clone()
      assert(FastSpd.potrfUpper(mine, n) === 0)
      val info = new intW(0)
      lapack.dpotrf("U", n, ref, n, info)
      assert(info.`val` === 0)
      assert(upperDiff(mine, ref, n) < 1e-10, s"potrf n=$n")
    }
  }

  test("blocked potri matches f2j dpotri") {
    for (n <- Seq(5, 64, 129, 400)) {
      val a0 = randSpd(n, n + 1)
      val mine = a0.clone(); val ref = a0.clone()
      val info = new intW(0)
      assert(FastSpd.potrfUpper(mine, n) === 0)
      assert(FastSpd.potriUpper(mine, n) === 0)
      lapack.dpotrf("U", n, ref, n, info)
      lapack.dpotri("U", n, ref, n, info)
      assert(info.`val` === 0)
      assert(upperDiff(mine, ref, n) < 1e-8, s"potri n=$n")
    }
  }

  test("potrs solves the system") {
    val n = 100
    val a0 = randSpd(n, 7)
    val f = a0.clone()
    assert(FastSpd.potrfUpper(f, n) === 0)
    val rng = new scala.util.Random(9)
    val x = Array.fill(n)(rng.nextGaussian())
    // b = A x
    val b = new Array[Double](n)
    for (i <- 0 until n; j <- 0 until n) b(i) += a0(math.min(i, j) + math.max(i, j) * n) * x(j)
    FastSpd.potrsUpper(f, n, b)
    for (i <- 0 until n) assert(math.abs(b(i) - x(i)) < 1e-8)
  }

  test("potrf reports non-SPD") {
    val n = 10
    val a = new Array[Double](n * (n + 1)) // zero matrix: not SPD
    assert(FastSpd.potrfUpper(a, n) > 0)
  }
}
