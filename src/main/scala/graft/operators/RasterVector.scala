package graft.operators

import graft.functions.point_in_polygon
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raster↔vector conversions over the engine's polygon kernel — the named
  * GIS half of the tiling story, composing the existing pieces:
  *
  *  - vector→vector: [[assignZones]] labels each point row with the first
  *    polygon zone containing it (ray-cast even-odd rule, identical to
  *    the reference's `globe.is_ocean` mask semantics,
  *    examples/inline_example.py:263-266);
  *  - vector→summary: [[zonalStats]] = zone assignment + grouped
  *    statistics (the zonal-statistics GIS primitive);
  *  - vector→raster: [[rasterize]] burns the zone polygons onto a regular
  *    cell-center lattice (scipy-`binned_statistic_2d`-style centers,
  *    matching [[Binning]]'s grid conventions);
  *  - raster→vector is the gridded sources' native direction (every
  *    NetCdfGrid/ZarrGrid scan flattens a raster to point rows).
  *
  * Scale shape: zones ride INSIDE the codegen'd [[point_in_polygon]]
  * expressions as constructor constants — a broadcast-free, join-free,
  * shuffle-free projection over the point table (the only shuffle in
  * [[zonalStats]] is the partial-aggregated groupBy on the zone label).
  * This is the named-region case (ocean basins, seas, hemispheres —
  * dozens of zones, each a few dozen vertices). A million-polygon layer
  * would instead bbox-bucket the polygons through the cell-prefix join
  * machinery (SpatialJoin.radiusJoin) before the exact ray-cast refine;
  * that path exists, this operator is the broadcast-constant fast path.
  */
object RasterVector {

  /** One polygon zone: a label and its rings (flat [x0,y0,x1,y1,...]
    * arrays; multiple rings OR together, even-odd within each).
    */
  final case class Zone(id: String, rings: Array[Array[Double]])

  /** First-match zone label for a point, or null when no zone contains
    * it. Zone order is precedence order (earlier zones shadow later ones
    * where they overlap), matching a painter's-order zone map.
    */
  def zoneColumn(zones: Seq[Zone], xCol: Column, yCol: Column): Column =
    zones.foldRight(lit(null).cast("string")) { case (z, acc) =>
      when(point_in_polygon(xCol, yCol, z.rings), lit(z.id)).otherwise(acc)
    }

  /** Label each row with its containing zone (`zone` column, null =
    * outside all zones).
    */
  def assignZones(points: DataFrame, zones: Seq[Zone],
                  xCol: String = "x", yCol: String = "y"): DataFrame = {
    require(zones.nonEmpty, "assignZones needs at least one zone")
    require(zones.map(_.id).distinct.size == zones.size, "duplicate zone ids")
    points.withColumn("zone", zoneColumn(zones, col(xCol), col(yCol)))
  }

  /** Zonal statistics: assign zones, drop outside-all-zones rows, and
    * aggregate `valCol` per zone. Statistics use [[Binning]]'s names:
    * mean/median/count/sum/min/max/std (std = sample, ddof=1).
    */
  def zonalStats(points: DataFrame, zones: Seq[Zone], valCol: String,
                 statistics: Seq[String] = Seq("mean", "count"),
                 xCol: String = "x", yCol: String = "y"): DataFrame = {
    require(statistics.nonEmpty, "zonalStats needs at least one statistic")
    val v = col(valCol)
    val aggs = statistics.map {
      case "mean"   => avg(v).as(s"${valCol}_mean")
      case "median" => median(v).as(s"${valCol}_median")
      case "count"  => count(v).as(s"${valCol}_count")
      case "sum"    => sum(v).as(s"${valCol}_sum")
      case "min"    => min(v).as(s"${valCol}_min")
      case "max"    => max(v).as(s"${valCol}_max")
      case "std"    => stddev_samp(v).as(s"${valCol}_std")
      case other    => throw new IllegalArgumentException(s"unknown statistic: $other")
    }
    assignZones(points, zones, xCol, yCol)
      .filter(col("zone").isNotNull)
      .groupBy("zone").agg(aggs.head, aggs.tail: _*)
  }

  /** Burn zones onto a regular raster: the cell-center lattice of
    * [[Grids.grid2dFlatten]] (x_i = x_min + (i + 0.5) * step), each
    * center labeled with its first-match zone; cells outside every zone
    * drop (sparse-raster convention, matching the gridded sinks' NaN
    * fill for absent cells).
    */
  def rasterize(spark: SparkSession, zones: Seq[Zone],
                xRange: (Double, Double), yRange: (Double, Double),
                step: Double): DataFrame =
    assignZones(Grids.grid2dFlatten(spark, xRange, yRange, step), zones)
      .filter(col("zone").isNotNull)
      .select("x", "y", "zone")

  /** Raster→vector region extraction: label 4-adjacent raster cells with
    * their connected component (the polygonization primitive — each
    * region is one output polygon's cell set). `valueCol` restricts
    * adjacency to equal-valued cells (classic same-class labeling);
    * isolated cells keep their own cell id as the region label.
    *
    * Scale shape: cells get the engine's int64 cell id
    * ([[graft.functions.cell_encode]]); 4-adjacency becomes two
    * long-key equi-joins (east neighbor = id + stride, north = id + 1 —
    * no geometry in the shuffle), and labeling reuses
    * [[Dedup.connectedComponents]] — driver union-find for small edge
    * sets, distributed hash-min label propagation above the cutoff. The
    * region label is the component's MINIMUM cell id (deterministic).
    */
  def labelRegions(cells: DataFrame, res: Double, x0: Double, y0: Double,
                   xCol: String = "x", yCol: String = "y",
                   valueCol: Option[String] = None,
                   driverMaxEdges: Long = 5000000L): DataFrame = {
    import graft.functions.{cell_encode, Cells}
    val withId = cells.withColumn("_cell",
      cell_encode(col(xCol), col(yCol), res, x0, y0))
    val left = withId.select(
      col("_cell").as("idA") +: valueCol.map(c => col(c).as("_vA")).toSeq: _*)
    val right = withId.select(
      col("_cell").as("idB") +: valueCol.map(c => col(c).as("_vB")).toSeq: _*)
    def adjacent(offset: Long): DataFrame = {
      var j = left.withColumn("_nb", col("idA") + lit(offset))
        .join(right, col("_nb") === col("idB"))
      valueCol.foreach(_ => j = j.filter(col("_vA") === col("_vB")))
      j.select("idA", "idB")
    }
    val pairs = adjacent(Cells.Stride).unionByName(adjacent(1L)) // east, north
    val labels = Dedup.connectedComponents(pairs, driverMaxEdges)
    withId.join(labels, withId("_cell") === labels("id"), "left")
      .withColumn("region", coalesce(col("label"), col("_cell")))
      .drop("id", "label", "_cell")
  }
}
