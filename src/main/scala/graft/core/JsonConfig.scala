package graft.core

import graft.plans.{Bounds, GpSatPipeline, OIConfig}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** JSON codec for the declarative run configuration — the engine's analog
  * of the reference's config-driven entry points
  * (configs/example_local_expert_oi.json, GPSat/config_dataclasses.py).
  * Canonical (sorted-key, compact) rendering backs the config-identity
  * table (ResultStore.configId; reference utils.py:1136-1273).
  */
object JsonConfig {
  implicit private val formats: Formats = DefaultFormats

  private def dOpt(j: JValue, k: String): Option[Double] =
    (j \ k).toOption.collect {
      case JDouble(v) => v
      case JInt(v) => v.toDouble
      case JLong(v) => v.toDouble
    }
  private def d(j: JValue, k: String, default: Double): Double = dOpt(j, k).getOrElse(default)
  private def darr(j: JValue, k: String): Option[Array[Double]] =
    (j \ k).toOption.collect { case JArray(vs) => vs.map {
      case JDouble(v) => v
      case JInt(v) => v.toDouble
      case JLong(v) => v.toDouble
      case other => throw new IllegalArgumentException(s"$k: non-numeric $other")
    }.toArray }

  private def bounds(j: JValue, name: String, dims: Int): Option[Bounds] =
    (j \ name).toOption.map { b =>
      def side(k: String) = darr(b, k)
        .orElse(dOpt(b, k).map(v => Array.fill(dims)(v)))
        .getOrElse(throw new IllegalArgumentException(s"$name.$k missing"))
      Bounds(side("low"), side("high"))
    }

  /** Parse a pipeline config JSON (all fields optional, reference-shaped):
    * {
    *   "n_docs": 50000, "seed": 42,
    *   "z_filter": {"low": -0.35, "high": 0.65},
    *   "bin_res": 50000, "expert_range": [-500000, 500000],
    *   "expert_spacing": 200000, "pred_spacing": 5000,
    *   "smooth_lengthscale": 200000,
    *   "model": {
    *     "coords_scale": [50000, 50000, 1],
    *     "training_radius": 300000, "inference_radius": 200000,
    *     "t_window": [-4, 4], "min_obs": 3, "max_obs_per_tile": 0,
    *     "max_iter": 100, "optimise": true,
    *     "constraints": {
    *       "lengthscales": {"low": [...], "high": [...]},
    *       "kernel_variance": {"low": ..., "high": ...},
    *       "likelihood_variance": {"low": ..., "high": ...}
    *     }
    *   }
    * }
    */
  def parsePipeline(json: String): GpSatPipeline.PipelineConfig = {
    val j = JsonMethods.parse(json)
    val m = j \ "model"
    val cons = m \ "constraints"
    val base = GpSatPipeline.PipelineConfig()
    val tw = darr(m, "t_window").getOrElse(Array(-4.0, 4.0))
    val er = darr(j, "expert_range").getOrElse(Array(base.expertRange._1, base.expertRange._2))
    val zf = (j \ "z_filter").toOption.map(z => (d(z, "low", -0.35), d(z, "high", 0.65)))
      .getOrElse(base.zFilter)
    val oi = OIConfig(
      trainingRadius = d(m, "training_radius", 300000.0),
      tWindowBelow = tw(0), tWindowAbove = tw(1),
      inferenceRadius = d(m, "inference_radius", 200000.0),
      coordsScale = darr(m, "coords_scale").getOrElse(Array(50000.0, 50000.0, 1.0)),
      obsMeanLocal = (m \ "obs_mean").toOption.contains(JString("local")),
      minObs = d(m, "min_obs", 3).toInt,
      maxObsPerTile = d(m, "max_obs_per_tile", 0).toInt,
      model = (m \ "name").toOption.collect { case JString(s) => s }.getOrElse(""),
      nystroemAboveN = d(m, "nystroem_above_n", 0).toInt,
      nystroemM = d(m, "nystroem_m", 100).toInt,
      sgprAboveN = d(m, "sgpr_above_n", 0).toInt,
      sgprM = d(m, "num_inducing_points", 500).toInt, // reference kwarg name
      maxIter = d(m, "max_iter", 100).toInt,
      lengthscaleBounds = bounds(cons, "lengthscales", 3),
      kernelVarianceBounds = bounds(cons, "kernel_variance", 1),
      likelihoodVarianceBounds = bounds(cons, "likelihood_variance", 1),
      initLengthscales = darr(m, "init_lengthscales").getOrElse(Array(1.0, 1.0, 1.0)),
      initKernelVariance = d(m, "init_kernel_variance", 1.0),
      initLikelihoodVariance = d(m, "init_likelihood_variance", 1.0),
      optimise = (m \ "optimise").toOption.forall(_ == JBool(true)))
    GpSatPipeline.PipelineConfig(
      nDocs = d(j, "n_docs", base.nDocs.toDouble).toLong,
      seed = d(j, "seed", 42).toLong,
      zFilter = zf,
      binRes = d(j, "bin_res", base.binRes),
      expertRange = (er(0), er(1)),
      expertSpacing = d(j, "expert_spacing", base.expertSpacing),
      expertMasks = (j \ "el_masks").toOption.collect {
        case JArray(vs) => vs.map {
          case JString(s) => s
          case other => throw new IllegalArgumentException(s"el_masks: non-string $other")
        }
      }.getOrElse(Seq.empty),
      predSpacing = d(j, "pred_spacing", base.predSpacing),
      smoothLengthscale = d(j, "smooth_lengthscale", base.smoothLengthscale),
      warmStartRerun = (j \ "warm_start_rerun").toOption.contains(JBool(true)),
      oi = oi)
  }

  /** Optional `"export_h5": "/path/results.h5"` — after the run, the CLI
    * exports the store tables into one reference-shaped multi-key `.h5`
    * (ResultStore.exportH5), so downstream pd.read_hdf tooling keeps
    * working.
    */
  def exportH5Path(json: String): Option[String] =
    (JsonMethods.parse(json) \ "export_h5").toOption.collect { case JString(s) => s }

  /** Optional `"export_h5_format": "fixed" | "table"` — "table" writes the
    * PyTables format='table' layout the reference's own stores use.
    */
  def exportH5Format(json: String): String =
    (JsonMethods.parse(json) \ "export_h5_format").toOption
      .collect { case JString(s) => s }.getOrElse("fixed")

  /** Canonical JSON for config identity: sorted keys, compact. */
  def canonical(json: String): String = {
    def sort(v: JValue): JValue = v match {
      case JObject(fields) => JObject(fields.sortBy(_._1).map { case (k, x) => (k, sort(x)) })
      case JArray(vs) => JArray(vs.map(sort))
      case other => other
    }
    JsonMethods.compact(JsonMethods.render(sort(JsonMethods.parse(json))))
  }
}
