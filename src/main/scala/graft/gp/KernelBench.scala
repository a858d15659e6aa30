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
  * Repeats each thread-count measurement REPEATS times (default 5) and
  * reports the median with per-repeat /proc/stat steal deltas — single
  * samples on this shared host swing +-20% (BENCH.md).
  *
  * Usage: runMain graft.gp.KernelBench [n] [threads,threads,...] [evalsPerThread] [repeats]
  */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toInt else 400
    val threadCounts = if (args.length > 1) args(1).split(",").map(_.toInt) else Array(1, 8, 32)
    val evals = if (args.length > 2) args(2).toInt else 30
    val repeats = if (args.length > 3) args(3).toInt else 5
    val d = 3
    val p = GprParams(Array(3.0, 3.0, 2.0), 1.0, 0.05)

    def mkGp(seed: Int): Matern32Gpr = {
      val rng = new scala.util.Random(seed)
      val coords = DenseMatrix.tabulate[Double](n, d)((_, _) => rng.nextDouble() * 10)
      val y = DenseVector.tabulate[Double](n)(_ => rng.nextDouble() - 0.5)
      new Matern32Gpr(coords, y)
    }

    def cpuJiffies(): (Long, Long) = {
      val src = scala.io.Source.fromFile("/proc/stat")
      try {
        val f = src.getLines().next().trim.split("\\s+").drop(1).map(_.toLong)
        (if (f.length > 7) f(7) else 0L, f.sum)
      } finally src.close()
    }
    println(s"n=$n evals/thread=$evals repeats=$repeats (kernel = build+potrf+potrs+potri+grad)")
    val results = threadCounts.map { t =>
      val pool = Executors.newFixedThreadPool(t)
      val gps = Array.tabulate(t)(mkGp)
      // warmup (JIT + buffers)
      gps.foreach(_.nlmlAndGrad(p))
      val samples = (1 to repeats).map { _ =>
        val (s0, j0) = cpuJiffies()
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
        val (s1, j1) = cpuJiffies()
        val steal = if (j1 > j0) 100.0 * (s1 - s0) / (j1 - j0) else 0.0
        (wall * 1000.0 / evals, steal)
      }
      pool.shutdown()
      val med = samples.map(_._1).sorted.apply(repeats / 2)
      val stealStr = samples.map(v => f"${v._2}%.1f").mkString(",")
      println(f"threads=$t%2d  ms/eval median=$med%8.2f  min=${samples.map(_._1).min}%8.2f  evals/s-total=${t * 1000.0 / med}%8.1f  steal%%=[$stealStr]")
      (t, med)
    }
    for (i <- 1 until results.length) {
      val (tLo, mLo) = results(i - 1)
      val (tHi, mHi) = results(i)
      println(f"scaling ${tLo}->${tHi}: per-eval efficiency ${mLo / mHi}%.2f")
    }
  }
}
