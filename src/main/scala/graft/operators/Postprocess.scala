package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-processing: hyperparameter field smoothing and prediction gluing
  * (reference GPSat/postprocessing.py + utils.get_weighted_values).
  */
object Postprocess {

  final case class SmoothConfig(
      valCol: String,
      xCol: String = "x",
      yCol: String = "y",
      otherDims: Seq[String] = Seq("t"), // non-smoothed dims incl. _dim_* columns
      lX: Double = 1.0,
      lY: Double = 1.0,
      minVal: Option[Double] = None,
      maxVal: Option[Double] = None)

  /** Gaussian kernel smoothing of a hyperparameter field across expert
    * locations (reference `smooth_hyperparameters` + `gaussian_2d_weight`,
    * GPSat/postprocessing.py:22-52, :96-395): for each expert (x0, y0),
    * the weighted mean over ALL experts in the same other-dims group with
    * w = exp(-(((x-x0)/l_x)^2 + ((y-y0)/l_y)^2) / 2), values clamped to
    * [min, max] BEFORE smoothing and the result clamped again AFTER
    * (postprocessing.py:289-301). NaN values are skipped; all-NaN groups
    * drop (reference emits NaN then dropna, :305-311).
    *
    * The reference's python loop over other-dims combos with an O(n^2)
    * guvectorized kernel becomes a self-join on the other dims + groupBy —
    * one shuffle, all groups at once. Expert counts are small (10^2..10^5),
    * and the join key (other dims) partitions the quadratic work.
    */
  def smoothHyperparameters(df: DataFrame, cfg: SmoothConfig): DataFrame = {
    def clamp(c: Column): Column = {
      val lo = cfg.minVal.map(v => greatest(c, lit(v))).getOrElse(c)
      cfg.maxVal.map(v => least(lo, lit(v))).getOrElse(lo)
    }
    // NaN must survive to the source-side isnan filter: Spark's
    // least(NaN, max) evaluates to max, which would turn NaN values into
    // maxVal-valued smoothing sources instead of skipping them
    // (postprocessing.py:305-311 semantics).
    val clamped = df.withColumn("__v",
      when(isnan(col(cfg.valCol)), col(cfg.valCol)).otherwise(clamp(col(cfg.valCol))))

    val tgt = clamped.select(
      (Seq(col(cfg.xCol).as("__x0"), col(cfg.yCol).as("__y0")) ++ cfg.otherDims.map(col)): _*)
    val src = clamped.select(
      (Seq(col(cfg.xCol).as("__xs"), col(cfg.yCol).as("__ys"), col("__v")) ++ cfg.otherDims.map(col)): _*)
      .filter(!isnan(col("__v")))

    val joined =
      if (cfg.otherDims.nonEmpty) tgt.join(src, cfg.otherDims, "inner")
      else tgt.crossJoin(src)

    val d2 = pow((col("__xs") - col("__x0")) / cfg.lX, 2) + pow((col("__ys") - col("__y0")) / cfg.lY, 2)
    val w = exp(-d2 / 2.0)

    joined
      .groupBy((Seq(col("__x0"), col("__y0")) ++ cfg.otherDims.map(col)): _*)
      .agg((sum(w * col("__v")) / sum(w)).as("__sm"))
      .select((Seq(col("__x0").as(cfg.xCol), col("__y0").as(cfg.yCol)) ++
        cfg.otherDims.map(col) :+ clamp(col("__sm")).as(cfg.valCol)): _*)
  }

  /** Gaussian-weighted glue of overlapping per-expert predictions onto
    * prediction locations (reference `get_weighted_values`,
    * GPSat/utils.py:2081-2214; used examples/inline_example.py:527-534):
    * per unique ref tuple, out_v = sum(w * v) / sum(w) with
    * w = exp(-(sum_i (ref_i - dist_i)^2) / (2 * lengthscale^2)).
    * One groupBy — the minimal plan.
    */
  def getWeightedValues(df: DataFrame, refCols: Seq[String], distToCols: Seq[String],
                        valCols: Seq[String], lengthscale: Double): DataFrame = {
    require(refCols.length == distToCols.length, "ref/dist column lists must align")
    val d2 = refCols.zip(distToCols).map { case (r, d) =>
      (col(r) - col(d)) * (col(r) - col(d))
    }.reduce(_ + _)
    val w = exp(-(d2 / (lengthscale * lengthscale)) / 2.0)
    val aggs = valCols.map(v => (sum(w * col(v)) / sum(w)).as(v))
    df.groupBy(refCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
