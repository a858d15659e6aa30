package graft.gp

import breeze.linalg.{DenseMatrix, DenseVector}
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}

/** Kernel-level scaling microbenchmark (no Spark): measures the per-tile
  * GP evaluation (kernel build -> dpotrf -> dpotrs -> dpotri -> fused
  * gradient contraction) under T concurrent threads — the hardware-roofline
  * evidence for the 8->32 thread scaling numbers in BENCH.md. Each thread
  * owns its own Matern32Gpr instance (scratch buffers are per-instance,
  * exactly like one fit task per Spark core).
  *
  * Usage: runMain graft.gp.KernelBench [n] [threads,threads,...] [evalsPerThread]
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 400
    val threadCounts = if (args.length > 1) args(1).split(",").map(_.toInt) else Array(1, 8, 32)
    val evals = if (args.length > 2) args(2).toInt else 30
    val d = 3
    val p = GprParams(Array(3.0, 3.0, 2.0), 1.0, 0.05)

    def mkGp(seed: Int): Matern32Gpr = {
      val rng = new scala.util.Random(seed)
      val coords = DenseMatrix.tabulate[Double](n, d)((_, _) => rng.nextDouble() * 10)
      val y = DenseVector.tabulate[Double](n)(_ => rng.nextDouble() - 0.5)
      new Matern32Gpr(coords, y)
    }

    println(s"n=$n evals/thread=$evals (kernel = build+potrf+potrs+potri+grad)")
    val results = threadCounts.map { t =>
      val pool = Executors.newFixedThreadPool(t)
      val gps = Array.tabulate(t)(mkGp)
      // warmup (JIT + buffers)
      gps.foreach(_.nlmlAndGrad(p))
      val latch = new CountDownLatch(t)
      val t0 = System.nanoTime()
      (0 until t).foreach { ti =>
        pool.submit(new Runnable {
          def run(): Unit = {
            var i = 0
            while (i < evals) { gps(ti).nlmlAndGrad(p); i += 1 }
            latch.countDown()
          }
        })
      }
      latch.await(30, TimeUnit.MINUTES)
      val wall = (System.nanoTime() - t0) / 1e9
      pool.shutdown()
      val msPerEval = wall * 1000.0 / evals
      println(f"threads=$t%2d  wall=$wall%7.2f s  ms/eval=$msPerEval%8.2f  evals/s-total=${t * evals / wall}%8.1f")
      (t, msPerEval)
    }
    for (i <- 1 until results.length) {
      val (tLo, mLo) = results(i - 1)
      val (tHi, mHi) = results(i)
      println(f"scaling ${tLo}->${tHi}: per-eval efficiency ${mLo / mHi}%.2f")
    }
  }
}
