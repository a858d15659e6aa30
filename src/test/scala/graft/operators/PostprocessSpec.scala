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
