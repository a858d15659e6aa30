package graft.operators

import graft.SparkTestBase
import graft.functions.PointInPolygonKernel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RasterVectorSpec extends AnyFunSuite with SparkTestBase {

  // the SparkEntry q77/q78 zones, repeated here: concave L, convex
  // pentagon, and a triangle overlapping the pentagon
  private val L = Array(
    -700000.0, -700000.0, -100000.0, -700000.0, -100000.0, -300000.0,
    -400000.0, -300000.0, -400000.0, 500000.0, -700000.0, 500000.0)
  private val Pent = Array(
    100000.0, -500000.0, 700000.0, -500000.0, 760000.0, 100000.0,
    400000.0, 600000.0, 60000.0, 150000.0)
  private val Tri = Array(
    300000.0, -600000.0, 750000.0, 300000.0, 150000.0, 400000.0)
  private val zones = Seq(
    RasterVector.Zone("west_l", Array(L)),
    RasterVector.Zone("east_pent", Array(Pent)),
    RasterVector.Zone("tri_overlap", Array(Tri)))

  private def lattice: Seq[(Double, Double)] =
    for { i <- 0 until 31; j <- 0 until 31 }
      yield (-750000.0 + i * 50000.0, -750000.0 + j * 50000.0)

  test("assignZones: concave ring honors the notch; overlap takes painter's order") {
    import spark.implicits._
    // the L's notch (between bar and arm) is OUTSIDE; bar and arm inside
    val probes = Seq(
      (-250000.0, 0.0, null), (-250000.0, -500000.0, "west_l"),
      (-550000.0, 300000.0, "west_l"))
    val got = RasterVector.assignZones(
      probes.map(p => (p._1, p._2)).toDF("x", "y"), zones)
      .orderBy("x", "y").collect().map(_.getAs[String]("zone"))
    // sorted by (x, y): (-550k,300k), (-250k,-500k), (-250k,0)
    assert(got.toSeq === Seq("west_l", "west_l", null))

    // every lattice point in BOTH pentagon and triangle labels east_pent
    val both = lattice.filter { case (x, y) =>
      PointInPolygonKernel.containsRing(x, y, Pent) &&
        PointInPolygonKernel.containsRing(x, y, Tri) }
    assert(both.size > 5) // the overlap is real
    val labels = RasterVector.assignZones(both.toDF("x", "y"), zones)
      .select("zone").distinct().collect().map(_.getString(0)).toSeq
    assert(labels === Seq("east_pent"))
    // and some triangle points outside the pentagon DO label tri_overlap
    val triOnly = lattice.filter { case (x, y) =>
      PointInPolygonKernel.containsRing(x, y, Tri) &&
        !PointInPolygonKernel.containsRing(x, y, Pent) }
    assert(triOnly.nonEmpty)
    val triLabels = RasterVector.assignZones(triOnly.toDF("x", "y"), zones)
      .select("zone").distinct().collect().map(_.getString(0)).toSeq
    assert(triLabels === Seq("tri_overlap"))
  }

  test("multi-ring zone: disjoint rings OR together") {
    import spark.implicits._
    val two = Seq(RasterVector.Zone("both", Array(
      Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0),
      Array(100.0, 0.0, 110.0, 0.0, 110.0, 10.0, 0.0 + 100.0, 10.0))))
    val got = RasterVector.assignZones(
      Seq((5.0, 5.0), (105.0, 5.0), (55.0, 5.0)).toDF("x", "y"), two)
      .orderBy("x").collect().map(_.getAs[String]("zone")).toSeq
    assert(got === Seq("both", null, "both"))
  }

  test("zonalStats matches a driver-side brute-force replay") {
    import spark.implicits._
    val pts = lattice.zipWithIndex.map { case ((x, y), i) =>
      (x, y, math.sin(i * 0.7) * 10.0) }
    val got = RasterVector.zonalStats(pts.toDF("x", "y", "z"), zones, "z",
      statistics = Seq("mean", "count", "sum", "min", "max"))
      .collect().map(r => r.getString(0) ->
        (r.getDouble(1), r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val want = pts.groupBy { case (x, y, _) =>
      zones.find(z => z.rings.exists(PointInPolygonKernel.containsRing(x, y, _)))
        .map(_.id).orNull }
      .collect { case (zone, rows) if zone != null =>
        val vs = rows.map(_._3)
        zone -> ((vs.sum / vs.size, vs.size.toLong, vs.sum, vs.min, vs.max)) }
    assert(got.keySet === want.keySet)
    for ((z, (m, n, s, lo, hi)) <- want) {
      val (gm, gn, gs, glo, ghi) = got(z)
      assert(gn === n); assert(math.abs(gm - m) < 1e-9)
      assert(math.abs(gs - s) < 1e-9); assert(glo === lo); assert(ghi === hi)
    }
  }

  test("labelRegions: 4-adjacency components, value constraint, isolated cells") {
    import spark.implicits._
    // lattice res=1 with origin 0: cells at centers (i+0.5, j+0.5)
    def c(i: Int, j: Int, v: String) = (i + 0.5, j + 0.5, v)
    // region A: L-shaped 3 cells; region B: same value but diagonal only
    // (NOT connected under 4-adjacency); region C: different value,
    // adjacent to A; D: isolated far cell
    val cells = Seq(
      c(0, 0, "a"), c(1, 0, "a"), c(1, 1, "a"), // A
      c(2, 2, "a"),                             // B (diagonal from (1,1))
      c(0, 1, "b"),                             // C (adjacent to A, other value)
      c(7, 7, "a"))                             // D isolated
    val got = RasterVector.labelRegions(
      cells.toDF("x", "y", "zone"), res = 1.0, x0 = 0.0, y0 = 0.0,
      valueCol = Some("zone"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(3)).toMap
    def id(i: Int, j: Int) = graft.functions.Cells.pack(i, j)
    assert(got((0.5, 0.5)) === id(0, 0))
    assert(got((1.5, 0.5)) === id(0, 0)) // min id in component A
    assert(got((1.5, 1.5)) === id(0, 0))
    assert(got((2.5, 2.5)) === id(2, 2)) // diagonal: own region
    assert(got((0.5, 1.5)) === id(0, 1)) // other value: own region
    assert(got((7.5, 7.5)) === id(7, 7)) // isolated keeps own id
    // without the value constraint, C merges into A
    val merged = RasterVector.labelRegions(
      cells.toDF("x", "y", "zone"), res = 1.0, x0 = 0.0, y0 = 0.0)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(3)).toMap
    assert(merged((0.5, 1.5)) === id(0, 0))
  }

  test("labelRegions matches a brute-force union-find on the zone raster") {
    val raster = RasterVector.rasterize(spark, zones,
      (-750000.0, 750000.0), (-750000.0, 750000.0), 100000.0)
    val got = RasterVector.labelRegions(raster,
      res = 100000.0, x0 = -750000.0, y0 = -750000.0, valueCol = Some("zone"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(3)).toMap
    // brute force over collected cells
    val cells = raster.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getString(2)))
    def key(x: Double, y: Double) = (((x + 750000.0) / 100000.0 - 0.5).round.toInt,
      ((y + 750000.0) / 100000.0 - 0.5).round.toInt)
    val byIdx = cells.map { case (x, y, z) => key(x, y) -> (x, y, z) }.toMap
    val parent = scala.collection.mutable.Map.empty[(Int, Int), (Int, Int)]
    def find(k: (Int, Int)): (Int, Int) = {
      var r = k; while (parent.getOrElse(r, r) != r) r = parent(r); r
    }
    def union(a: (Int, Int), b: (Int, Int)): Unit = {
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(rb) = ra
    }
    for (((i, j), (_, _, z)) <- byIdx; (di, dj) <- Seq((1, 0), (0, 1)))
      byIdx.get((i + di, j + dj)).foreach { case (_, _, z2) =>
        if (z2 == z) union((i, j), (i + di, j + dj)) }
    val want = cells.map { case (x, y, _) =>
      val members = byIdx.keys.filter(k => find(k) == find(key(x, y)))
      (x, y) -> members.map { case (i, j) => graft.functions.Cells.pack(i, j) }.min
    }.toMap
    assert(got === want)
    assert(got.values.toSet.size > 1) // multiple regions exist
  }

  test("plan shape: zone assignment is shuffle-free; zonalStats is one partial-agg exchange") {
    import spark.implicits._
    val pts = lattice.map { case (x, y) => (x, y, 1.0) }.toDF("x", "y", "z")
    // assignZones: pure codegen'd projection — no exchange, no join
    // repartition keeps the projection from constant-folding into a
    // LocalTableScan; the op itself must add NO hash exchange and no join
    val assignPlan = RasterVector.assignZones(pts.repartition(4), zones)
      .queryExecution.executedPlan.toString
    assert(!assignPlan.contains("Exchange hashpartitioning"),
      s"assignZones must not shuffle:\n$assignPlan")
    assert(!assignPlan.contains("Join"), s"assignZones must not join:\n$assignPlan")
    assert(assignPlan.contains("point_in_polygon"), "zones ride as codegen'd expressions")
    // zonalStats: partial HashAggregate -> ONE exchange -> final
    val statsPlan = RasterVector.zonalStats(pts.repartition(4), zones, "z")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(statsPlan).length
    assert(exchanges === 1, s"expected one zone-key exchange, got $exchanges:\n$statsPlan")
    assert("HashAggregate".r.findAllIn(statsPlan).length >= 2, "partial+final aggregation")
  }

  test("rasterize burns the zone map onto cell centers, sparse") {
    val got = RasterVector.rasterize(spark, zones,
      (-750000.0, 750000.0), (-750000.0, 750000.0), 100000.0)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)) -> r.getString(2)).toMap
    val centers = for { i <- 0 until 15; j <- 0 until 15 }
      yield (-750000.0 + (i + 0.5) * 100000.0, -750000.0 + (j + 0.5) * 100000.0)
    val want = centers.flatMap { case (x, y) =>
      zones.find(z => z.rings.exists(PointInPolygonKernel.containsRing(x, y, _)))
        .map(z => (x, y) -> z.id) }.toMap
    assert(got === want)
    assert(got.size < 15 * 15) // outside-all-zones cells dropped
    assert(got.values.toSet === Set("west_l", "east_pent", "tri_overlap"))
  }
}
