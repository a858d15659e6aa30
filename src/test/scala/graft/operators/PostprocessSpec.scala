package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class PostprocessSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("NaN hyperparameters are skipped, not clamped into maxVal sources") {
    // reference semantics (postprocessing.py:305-311): NaN values never
    // contribute to the smoothing; Spark's least(NaN, max) would otherwise
    // turn a NaN into a maxVal-valued source
    val df = Seq(
      (0.0, 0.0, 0.0, 1.0),
      (1.0, 0.0, 0.0, Double.NaN),
      (2.0, 0.0, 0.0, 3.0)
    ).toDF("x", "y", "t", "v")
    val out = Postprocess.smoothHyperparameters(df, Postprocess.SmoothConfig(
      "v", otherDims = Seq("t"), lX = 1e9, lY = 1e9, maxVal = Some(100.0)))
      .select("x", "v").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    // lX huge -> weights ~1: every target smooths to mean(1, 3) = 2, because
    // the NaN source is DROPPED (if it were clamped to 100 the mean would be ~34.7)
    assert(out.size === 3)
    out.values.foreach(v => assert(math.abs(v - 2.0) < 1e-6, s"got $out"))
  }

  test("radius-bounded smoothing matches exact all-pairs on a large synthetic field") {
    // 60 x 50 = 3,000 experts, two time groups; l = 2 grid spacings, so the
    // cutoff-7 neighborhood is ~14 cells across vs the 60-wide domain —
    // the candidate join does real pruning here, and the truncated weights
    // (< exp(-24.5)) are far below the comparison tolerance
    val field = (for {
      t <- Seq(0.0, 1.0); iy <- 0 until 50; ix <- 0 until 60
    } yield (ix * 100.0, iy * 100.0, t,
      math.sin(ix * 0.3) * math.cos(iy * 0.2) + 0.001 * (ix + iy) + t))
      .toDF("x", "y", "t", "v")
    val cfgFast = Postprocess.SmoothConfig("v", otherDims = Seq("t"),
      lX = 200.0, lY = 200.0, maxVal = Some(2.0))
    val fast = Postprocess.smoothHyperparameters(field, cfgFast)
    val exact = Postprocess.smoothHyperparameters(field, cfgFast.copy(cutoff = None))
    val fm = fast.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    val em = exact.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2)) -> r.getDouble(3)).toMap
    assert(fm.keySet === em.keySet)
    for ((k, v) <- em) assert(math.abs(fm(k) - v) < 1e-9, s"at $k: ${fm(k)} vs $v")
    // and the fast path is the cell-bucketed candidate join, not all-pairs
    val plan = fast.queryExecution.analyzed.toString
    assert(plan.contains("__cell"), s"expected the cell-bucketed radius join:\n$plan")
  }

  test("clamp applies before AND after smoothing (postprocessing.py:289-301)") {
    val df = Seq(
      (0.0, 0.0, 0.0, 10.0), // clamped to 4 BEFORE smoothing
      (1.0, 0.0, 0.0, 2.0)
    ).toDF("x", "y", "t", "v")
    val out = Postprocess.smoothHyperparameters(df, Postprocess.SmoothConfig(
      "v", otherDims = Seq("t"), lX = 1e9, lY = 1e9, maxVal = Some(4.0)))
      .select("v").as[Double].collect()
    out.foreach(v => assert(math.abs(v - 3.0) < 1e-6, s"mean(4, 2) = 3 expected, got $v"))
  }
}
