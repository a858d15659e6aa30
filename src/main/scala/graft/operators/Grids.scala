package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grid generation — expert-location and prediction-location lattices
  * (reference grid_2d_flatten, GPSat/utils.py:1788-1882): cell-center grids
  * over an x/y range, built distributed from spark.range cross products
  * (no driver-side meshgrid materialisation).
  */
object Grids {

  /** Number of edges for step-size semantics: arange(min, max + step, step).
    * For ranges divisible by step this is (max - min)/step + 1 edges;
    * centers = edges - 1.
    */
  private def nCenters(min: Double, max: Double, step: Double): Long = {
    // replicate np.arange(min, max + step, step) length: ceil((max + step - min)/step)
    val n = math.ceil((max + step - min) / step - 1e-12).toLong
    n - 1 // centers between consecutive edges
  }

  /** Flattened 2-d grid of cell centers (center=True semantics):
    * x_i = x_min + (i + 0.5) * step. Row order matches the reference
    * meshgrid flatten (y outer, x inner) when sorted by (y, x).
    */
  def grid2dFlatten(spark: SparkSession, xRange: (Double, Double), yRange: (Double, Double),
                    step: Double): DataFrame = {
    val nx = nCenters(xRange._1, xRange._2, step)
    val ny = nCenters(yRange._1, yRange._2, step)
    val xs = spark.range(nx).select((lit(xRange._1) + (col("id") + 0.5) * step).as("x"))
    val ys = spark.range(ny).select((lit(yRange._1) + (col("id") + 0.5) * step).as("y"))
    ys.crossJoin(xs).select("x", "y") // y outer, x inner
  }

  /** Expert locations: grid over the range, with a time coordinate
    * t = floor(mean(obs.t)) (examples/inline_example.py:213-221).
    */
  def expertLocations(spark: SparkSession, obs: DataFrame,
                      xRange: (Double, Double), yRange: (Double, Double),
                      spacing: Double, tCol: String = "t"): DataFrame = {
    val tVal = floor(avg(col(tCol)))
    val t = obs.agg(tVal.as("t"))
    grid2dFlatten(spark, xRange, yRange, spacing).crossJoin(t.hint("broadcast"))
      .select(col("x"), col("y"), col("t").cast("double").as("t"))
  }

  /** `add_data_to_col` (GPSat/dataloader.py:1415-1498): replicate the frame
    * once per value — a cross join with a literal array (used to fan expert
    * locations across dates).
    */
  def addDataToCol(df: DataFrame, colName: String, values: Seq[Any]): DataFrame =
    df.drop(colName).withColumn(colName, explode(array(values.map(lit): _*)))

  /** `shift_arrays` prediction locations (GPSat/prediction_locations.py:182-205):
    * the meshgrid of per-dimension offsets added to each expert location —
    * an explode of the offset cross-product.
    */
  def shiftArrays(experts: DataFrame, xShifts: Seq[Double], yShifts: Seq[Double],
                  xCol: String = "x", yCol: String = "y"): DataFrame = {
    val offsets = for (dy <- yShifts; dx <- xShifts) yield (dx, dy)
    val offCol = array(offsets.map { case (dx, dy) =>
      struct(lit(dx).as("dx"), lit(dy).as("dy"))
    }: _*)
    experts
      .withColumn("__off", explode(offCol))
      .withColumn("pred_x", col(xCol) + col("__off.dx"))
      .withColumn("pred_y", col(yCol) + col("__off.dy"))
      .drop("__off")
  }

  /** `had_obs` expert-location mask (reference get_masks_for_expert_loc,
    * GPSat/dataloader.py:2784-2792): keep expert locations whose (x, y)
    * grid cell had at least one non-NaN observation on ANY date. The
    * reference builds an xarray any-over-dates boolean mask; over a sparse
    * binned table the same semantics is one left-semi equi join against
    * the distinct observed (x, y) — no mask array, no extra pass at scale.
    */
  def hadObsMask(experts: DataFrame, binnedRef: DataFrame, obsCol: String,
                 xCol: String = "x", yCol: String = "y"): DataFrame =
    experts.join(
      binnedRef
        .filter(col(obsCol).isNotNull && !isnan(col(obsCol).cast("double")))
        .select(col(xCol), col(yCol)).distinct(),
      Seq(xCol, yCol), "left_semi")

  /** `grid_space` lattice mask (reference sparse_true_array,
    * GPSat/utils.py:1075-1133 via dataloader.py:2793-2803): keep every
    * `gridSpace`-th distinct coordinate value per dimension (rank %
    * gridSpace == offset over the sorted distinct values). Distinct
    * coordinate counts are lattice-sized, so each dimension's rank table is
    * computed on the (tiny) distinct set and broadcast back — the full
    * table is never window-shuffled.
    */
  def gridSpaceMask(df: DataFrame, dims: Seq[String], gridSpace: Int,
                    gridSpaceOffset: Int = 0): DataFrame = {
    require(gridSpace > 0, "grid_space must be positive")
    import org.apache.spark.sql.expressions.Window
    dims.foldLeft(df) { (d, dim) =>
      // the global window ranks the DISTINCT values of ONE grid axis —
      // grid-axis-sized (hundreds), then broadcast back; Spark's
      // single-partition WindowExec warning refers to this tiny set
      val keep = d.select(dim).distinct()
        .withColumn("__rk", row_number().over(Window.orderBy(dim)) - 1)
        .filter(pmod(col("__rk"), lit(gridSpace)) === gridSpaceOffset)
        .drop("__rk")
      d.join(broadcast(keep), Seq(dim), "left_semi")
    }
  }

  /** `local_select` applied to generated prediction locations relative to
    * their expert (reference PredictionLocations, prediction_locations.py:106-111
    * -> DataLoader.local_data_select, dataloader.py:2354-2447): keep rows
    * where pred[col] comp (expert[col] + val). Operates on an already
    * expert-joined frame (expert columns prefixed), so it is a plain
    * filter — no extra join or shuffle.
    */
  def localSelect(joined: DataFrame, conditions: Seq[(String, String, Double)],
                  expertPrefix: String = "expert_"): DataFrame =
    conditions.foldLeft(joined) { case (d, (c, comp, v)) =>
      val ref = col(expertPrefix + c) + v
      val cc = col(c)
      d.filter(comp match {
        case ">=" => cc >= ref
        case ">"  => cc > ref
        case "==" => cc === ref
        case "<=" => cc <= ref
        case "<"  => cc < ref
        case other => throw new IllegalArgumentException(s"comp: $other is not valid")
      })
    }

  /** Prediction grid: fine lattice, optionally masked by point-in-polygon
    * "ocean" rings (examples/inline_example.py:250-266).
    */
  def predictionGrid(spark: SparkSession, xRange: (Double, Double), yRange: (Double, Double),
                     spacing: Double, oceanRings: Option[Array[Array[Double]]] = None): DataFrame = {
    val g = grid2dFlatten(spark, xRange, yRange, spacing)
    oceanRings match {
      case Some(rings) =>
        import graft.functions._
        g.withColumn("lon", laea_lon(col("x"), col("y")))
          .withColumn("lat", laea_lat(col("x"), col("y")))
          .withColumn("is_in_ocean", point_in_polygon(col("lon"), col("lat"), rings))
          .filter(col("is_in_ocean"))
          .select("x", "y")
      case None => g
    }
  }
}
