package graft.core

import org.scalatest.funsuite.AnyFunSuite

class JsonConfigSpec extends AnyFunSuite {

  private val json =
    """{
      |  "n_docs": 8000, "seed": 7,
      |  "z_filter": {"low": -0.35, "high": 0.65},
      |  "bin_res": 50000, "expert_range": [-500000, 500000],
      |  "expert_spacing": 200000, "pred_spacing": 25000,
      |  "model": {
      |    "coords_scale": [50000, 50000, 1],
      |    "training_radius": 300000, "inference_radius": 200000,
      |    "t_window": [-4, 4], "min_obs": 3, "max_iter": 60,
      |    "constraints": {
      |      "lengthscales": {"low": [1e-8, 1e-8, 1e-8], "high": [600000, 600000, 9]},
      |      "likelihood_variance": {"low": 0.00125, "high": 0.01}
      |    }
      |  }
      |}""".stripMargin

  test("parses the reference-shaped run config") {
    val cfg = JsonConfig.parsePipeline(json)
    assert(cfg.nDocs === 8000 && cfg.seed === 7)
    assert(cfg.expertRange === (-500000.0, 500000.0))
    assert(cfg.oi.trainingRadius === 300000.0)
    assert(cfg.oi.maxIter === 60)
    val ls = cfg.oi.lengthscaleBounds.get
    assert(ls.high.toSeq === Seq(600000.0, 600000.0, 9.0))
    val lv = cfg.oi.likelihoodVarianceBounds.get
    assert(lv.low(0) === 0.00125 && lv.high(0) === 0.01)
    assert(cfg.oi.kernelVarianceBounds.isEmpty)
    assert(cfg.oi.optimise)
  }

  test("defaults apply when fields are absent") {
    val cfg = JsonConfig.parsePipeline("""{"model": {}}""")
    assert(cfg.oi.trainingRadius === 300000.0)
    assert(cfg.oi.coordsScale.toSeq === Seq(50000.0, 50000.0, 1.0))
    assert(cfg.oi.lengthscaleBounds.isEmpty)
    assert(cfg.oi.sgprAboveN === 0 && cfg.oi.sgprM === 500)
    assert(cfg.expertMasks.isEmpty)
  }

  test("parses el_masks and SGPR model-swap keys") {
    val cfg = JsonConfig.parsePipeline(
      """{"el_masks": ["had_obs", "grid_space:4"],
        | "model": {"sgpr_above_n": 1000, "num_inducing_points": 300}}""".stripMargin)
    assert(cfg.expertMasks === Seq("had_obs", "grid_space:4"))
    assert(cfg.oi.sgprAboveN === 1000 && cfg.oi.sgprM === 300)
  }

  test("export_h5 path parses (the CLI's store-export hook)") {
    assert(JsonConfig.exportH5Path("""{"export_h5": "/tmp/out.h5"}""") === Some("/tmp/out.h5"))
    assert(JsonConfig.exportH5Path("""{"n_docs": 10}""") === None)
  }

  test("canonical rendering is key-order independent (config identity)") {
    val a = JsonConfig.canonical("""{"b": 1, "a": {"y": 2, "x": [3, 4]}}""")
    val b = JsonConfig.canonical("""{"a": {"x": [3, 4], "y": 2}, "b": 1}""")
    assert(a === b)
    val c = JsonConfig.canonical("""{"a": {"x": [4, 3], "y": 2}, "b": 1}""")
    assert(a !== c, "array order is semantic and must be preserved")
  }
}
