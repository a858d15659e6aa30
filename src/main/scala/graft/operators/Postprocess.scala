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
      maxVal: Option[Double] = None,
      // candidate cutoff in LENGTHSCALES: sources beyond cutoff normalized
      // distance are dropped before the pairwise aggregate (their weight is
      // < exp(-cutoff^2/2) ~ 2e-11 at the default 7 — below double display
      // precision for any sane field). Targets with NO source within the
      // cutoff (e.g. an isolated NaN-valued expert) fall back to the exact
      // all-pairs aggregate, so no row is dropped relative to the
      // reference. None = exact all-pairs everywhere (reference's own
      // O(n^2) semantics, fine at 10^2..10^3 experts).
      cutoff: Option[Double] = Some(7.0))

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
    * guvectorized kernel becomes a candidate join + groupBy. With
    * `cfg.cutoff` set (the default), candidates come from
    * [[SpatialJoin.radiusJoin]] in LENGTHSCALE-NORMALIZED coordinates
    * (x/lX, y/lY) at radius = cutoff, with the other dims as equality
    * keys — cell-bucketed, so a 10^5-expert field generates
    * O(n x neighborhood) pairs instead of the O(n^2)-per-group self-join
    * (10^10 pairs at the survey's upper bound). Truncated weights are
    * < exp(-cutoff^2/2) ~ 2e-11 of the (>= 1) self weight — float noise.
    * `cutoff = None` keeps the exact all-pairs join (reference parity to
    * the last ulp; the reference itself is O(n^2) here).
    */
  def smoothHyperparameters(df: DataFrame, cfg: SmoothConfig): DataFrame = {
    require(cfg.lX > 0 && cfg.lY > 0, "lengthscales must be positive")
    def clamp(c: Column): Column = {
      val lo = cfg.minVal.map(v => greatest(c, lit(v))).getOrElse(c)
      cfg.maxVal.map(v => least(lo, lit(v))).getOrElse(lo)
    }
    // NaN must survive to the source-side isnan filter: Spark's
    // least(NaN, max) evaluates to max, which would turn NaN values into
    // maxVal-valued smoothing sources instead of skipping them
    // (postprocessing.py:305-311 semantics).
    // The clamped field feeds the target side, the source side, and the
    // NaN-target probe — three to four computations of the caller's
    // upstream plan (for q18 a 600k-row radius join + aggregate).
    // Hyperparameter fields are expert-sized by design, so materialize
    // ONCE (eager localCheckpoint) and fan out from the cached blocks.
    val clamped = df.withColumn("__v",
      when(isnan(col(cfg.valCol)), col(cfg.valCol)).otherwise(clamp(col(cfg.valCol))))
      .localCheckpoint()

    val tgtAll = clamped.select(
      (Seq(col(cfg.xCol).as("__x0"), col(cfg.yCol).as("__y0"), col("__v").as("__tv")) ++
        cfg.otherDims.map(col)): _*)
    val tgt = tgtAll.drop("__tv")
    val src = clamped.select(
      (Seq(col(cfg.xCol).as("__xs"), col(cfg.yCol).as("__ys"), col("__v")) ++ cfg.otherDims.map(col)): _*)
      .filter(!isnan(col("__v")))

    def allPairs(t: DataFrame): DataFrame =
      if (cfg.otherDims.nonEmpty) t.join(src, cfg.otherDims, "inner")
      else t.crossJoin(src)

    def aggregate(joined: DataFrame): DataFrame = {
      val d2 = pow((col("__xs") - col("__x0")) / cfg.lX, 2) + pow((col("__ys") - col("__y0")) / cfg.lY, 2)
      val w = exp(-d2 / 2.0)
      joined
        .groupBy((Seq(col("__x0"), col("__y0")) ++ cfg.otherDims.map(col)): _*)
        .agg((sum(w * col("__v")) / sum(w)).as("__sm"))
    }

    val smoothed = cfg.cutoff match {
      case Some(cut) =>
        // Only a NaN-VALUED target can be starved by the cutoff: every
        // finite target is its own source at distance 0. The reference
        // still fills isolated NaN targets with the weighted mean of
        // distant sources (postprocessing.py:305-311), so NaN targets —
        // rare by construction (failed fits) — take the exact all-pairs
        // aggregate, and only finite targets ride the radius join. No row
        // is dropped relative to the reference, and the common path costs
        // one cell-bucketed join.
        val tgtFinite = tgtAll.filter(!isnan(col("__tv"))).drop("__tv")
        val tgtNaN = tgtAll.filter(isnan(col("__tv"))).drop("__tv")
        // radius join on lengthscale-normalized coordinates: one isotropic
        // radius bounds both dims; exact refine is dist^2 <= cutoff^2 there
        val tn = tgtFinite.withColumn("__x0n", col("__x0") / cfg.lX)
          .withColumn("__y0n", col("__y0") / cfg.lY)
        val sn = src.withColumn("__xsn", col("__xs") / cfg.lX)
          .withColumn("__ysn", col("__ys") / cfg.lY)
        val near = aggregate(
          SpatialJoin.radiusJoin(tn, sn, SpatialJoin.RadiusJoinConfig(
            radius = cut, leftX = "__x0n", leftY = "__y0n",
            rightX = "__xsn", rightY = "__ysn", matchCols = cfg.otherDims,
            rightPrefix = "__s_"))
            .withColumnRenamed("__s___xs", "__xs").withColumnRenamed("__s___ys", "__ys")
            .withColumnRenamed("__s___v", "__v"))
        // NaN targets are rare-to-absent (failed fits): probe with a
        // limit-1 job and skip the all-pairs union subtree entirely when
        // there are none (optimization round — the empty union still cost
        // a full second aggregate's worth of stages)
        if (tgtNaN.isEmpty) near
        else near.unionByName(aggregate(allPairs(tgtNaN)))
      case None => aggregate(allPairs(tgt))
    }

    smoothed
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
