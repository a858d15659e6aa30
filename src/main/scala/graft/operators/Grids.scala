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
