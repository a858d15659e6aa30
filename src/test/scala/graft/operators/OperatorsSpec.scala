package graft.operators

import graft.SparkTestBase
import graft.sources.ObsDocs
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ObsDocsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("synthesis is deterministic and parallelism-independent") {
    val a = ObsDocs.synthesize(spark, 500, seed = 42, numPartitions = 2).collect()
    val b = ObsDocs.synthesize(spark, 500, seed = 42, numPartitions = 8).collect()
    assert(a.sortBy(_.doc_id).sameElements(b.sortBy(_.doc_id)))
    val c = ObsDocs.synthesize(spark, 500, seed = 7).collect()
    assert(!a.sortBy(_.doc_id).sameElements(c.sortBy(_.doc_id)))
  }

  test("extractObs parses the reading and keeps coordinates in range") {
    val docs = ObsDocs.synthesize(spark, 1000, 42).toDF()
    val obs = ObsDocs.extractObs(docs)
    assert(obs.count() === 1000)
    val r = obs.agg(
      min("lat"), max("lat"), min("t"), max("t"),
      countDistinct("source"), count(when(col("z").isNull, 1))).head()
    assert(r.getDouble(0) >= 60.0 && r.getDouble(1) <= 90.0)
    assert(r.getDouble(2) >= 18322.0 && r.getDouble(3) <= 18330.0)
    assert(r.getLong(4) === 3)
    assert(r.getLong(5) === 0)
  }

  test("span-sequence invariant: (kind, text, media_ref, order) preserved through extraction") {
    val docs = ObsDocs.synthesize(spark, 400, 42).toDF()
    val obs = ObsDocs.extractObs(docs)
    def flat(df: org.apache.spark.sql.DataFrame) = df
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), col("s.kind"), col("s.text"), col("s.media_ref"), col("s.offset"))
    val before = flat(docs).collect().map(_.toSeq).toSet
    val after = flat(obs).collect().map(_.toSeq).toSet
    assert(before === after, "span sequences must be carried through untouched")
  }

  test("reassembleSpans rebuilds exact arrays after an adversarial shuffle") {
    val docs = ObsDocs.synthesize(spark, 400, 42).toDF()
    // variable span counts (2-4 per doc) make positional slotting non-trivial
    val exploded = docs
      .select(col("doc_id"), posexplode(col("spans")).as(Seq("pos", "s")))
      .select(col("doc_id"), col("pos"), col("s.kind").as("kind"),
        col("s.text").as("text"), col("s.media_ref").as("media_ref"),
        col("s.offset").as("offset"))
      .repartition(col("kind")) // interleaves docs, destroys row order
      .sortWithinPartitions(desc("text")) // actively wrong order
    val back = ObsDocs.reassembleSpans(exploded)
    val want = docs.collect().map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    val got = back.collect().map(r => r.getString(0) -> r.getSeq[Any](1)).toMap
    assert(got === want, "span arrays must come back IDENTICAL, order included")
  }
}

class BinningSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("binDataBy matches brute-force binned mean, including right-edge closure") {
    val res = 10.0
    val cfg = Binning.BinConfig("z", "x", "y", Seq("g"), res, (0.0, 100.0), (0.0, 100.0), Seq("mean"))
    val rng = new scala.util.Random(5)
    val rows = Seq.tabulate(2000) { i =>
      (rng.nextDouble() * 120 - 10, rng.nextDouble() * 120 - 10, rng.nextDouble(), if (i % 2 == 0) "a" else "b")
    } ++ Seq((100.0, 50.0, 0.7, "a"), (0.0, 100.0, 0.3, "b")) // exact edges
    val df = rows.toDF("x", "y", "z", "g")
    val got = Binning.binDataBy(df, cfg).collect()
      .map(r => ((r.getDouble(0), r.getDouble(1), r.getString(2)), r.getDouble(3))).toMap

    // brute force with scipy semantics
    val brute = rows
      .filter(r => r._1 >= 0 && r._1 <= 100 && r._2 >= 0 && r._2 <= 100)
      .groupBy { r =>
        val ix = math.min(math.floor(r._1 / res).toLong, 9L)
        val iy = math.min(math.floor(r._2 / res).toLong, 9L)
        (ix * res + res / 2, iy * res + res / 2, r._4)
      }
      .map { case (k, vs) => k -> vs.map(_._3).sum / vs.size }
    assert(got.keySet === brute.keySet)
    for ((k, v) <- brute) assert(math.abs(got(k) - v) < 1e-12, s"bin $k")
    // the x == 100.0 edge point landed in the last bin
    assert(got.contains((95.0, 55.0, "a")))
  }

  test("median statistic is exact") {
    val df = Seq((1.0, 1.0, 1.0), (1.5, 1.0, 2.0), (1.2, 1.0, 10.0)).toDF("x", "y", "z")
    val cfg = Binning.BinConfig("z", "x", "y", Seq.empty, 10.0, (0.0, 10.0), (0.0, 10.0), Seq("median"))
    val got = Binning.binDataBy(df, cfg).head().getDouble(2)
    assert(got === 2.0)
  }

  test("statsOnVals returns the moment/quantile row") {
    val df = spark.range(1000).select((col("id") % 100).cast("double").as("v"))
    val r = Binning.statsOnVals(df, "v").head()
    assert(r.getLong(0) === 1000 && r.getLong(1) === 1000)
    assert(math.abs(r.getDouble(4) - 49.5) < 1e-9) // mean
  }
}

class GridsSpec extends AnyFunSuite with SparkTestBase {

  test("grid2dFlatten reproduces the inline-example expert grid (25 experts at 200 km)") {
    val g = Grids.grid2dFlatten(spark, (-500000.0, 500000.0), (-500000.0, 500000.0), 200000.0)
    val rows = g.orderBy("y", "x").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(rows.length === 25)
    val expected = for (y <- -2 to 2; x <- -2 to 2) yield (x * 200000.0, y * 200000.0)
    // centers: -400k, -200k, 0, 200k, 400k
    assert(rows.toSeq === expected.toSeq)
  }

  test("grid2dFlatten matches the reference doctest (0..2 res 1 -> 4 centers)") {
    val g = Grids.grid2dFlatten(spark, (0.0, 2.0), (0.0, 2.0), 1.0)
      .orderBy("y", "x").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(g.toSeq === Seq((0.5, 0.5), (1.5, 0.5), (0.5, 1.5), (1.5, 1.5)))
  }

  test("addDataToCol fans rows across values (cross join with literal array)") {
    import spark.implicits._
    val df = Seq(("a", 1.0), ("b", 2.0)).toDF("k", "x")
    val out = Grids.addDataToCol(df, "date", Seq("2020-03-05", "2020-03-06"))
    assert(out.count() === 4)
    assert(out.select("date").distinct().count() === 2)
  }

  test("hadObsMask keeps only expert locations whose cell had any observation") {
    import spark.implicits._
    // binned table on the same 1.0-res lattice as the expert grid; one cell
    // carries a NaN-only value and must NOT count as observed
    val binned = Seq(
      (0.5, 0.5, 1.0), (1.5, 0.5, 2.0), (0.5, 1.5, Double.NaN)
    ).toDF("x", "y", "z")
    val experts = Grids.grid2dFlatten(spark, (0.0, 2.0), (0.0, 2.0), 1.0)
    val kept = Grids.hadObsMask(experts, binned, "z")
      .orderBy("y", "x").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(kept.toSeq === Seq((0.5, 0.5), (1.5, 0.5)))
  }

  test("gridSpaceMask keeps every grid_space-th distinct coordinate per dim") {
    val g = Grids.grid2dFlatten(spark, (0.0, 6.0), (0.0, 6.0), 1.0) // 6x6 centers
    val kept = Grids.gridSpaceMask(g, Seq("x", "y"), gridSpace = 2)
      .select("x", "y").orderBy("y", "x").collect().map(r => (r.getDouble(0), r.getDouble(1)))
    // rank % 2 == 0 -> centers 0.5, 2.5, 4.5 in each dim
    val want = for (y <- Seq(0.5, 2.5, 4.5); x <- Seq(0.5, 2.5, 4.5)) yield (x, y)
    assert(kept.toSeq === want)
    // offset shifts the lattice
    val off = Grids.gridSpaceMask(g, Seq("x"), gridSpace = 3, gridSpaceOffset = 1)
    assert(off.select("x").distinct().orderBy("x").collect().map(_.getDouble(0)).toSeq
      === Seq(1.5, 4.5))
  }

  test("localSelect filters prediction rows relative to their expert") {
    import spark.implicits._
    val joined = Seq(
      (1.0, 5.0, 2.0, 3.0), // x <= ex+0 fails (1 <= 2 ok) / y > ey+1 (5 > 4 ok)
      (3.0, 5.0, 2.0, 3.0), // x <= ex fails
      (1.0, 3.5, 2.0, 3.0)  // y > ey+1 fails
    ).toDF("x", "y", "expert_x", "expert_y")
    val out = Grids.localSelect(joined, Seq(("x", "<=", 0.0), ("y", ">", 1.0)))
    assert(out.collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq === Seq((1.0, 5.0)))
    intercept[IllegalArgumentException](Grids.localSelect(joined, Seq(("x", "~", 0.0))))
  }
}

class SpatialJoinSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  private val rng = new scala.util.Random(11)
  private val obs = Seq.tabulate(3000) { i =>
    (s"o$i", rng.nextDouble() * 2e6 - 1e6, rng.nextDouble() * 2e6 - 1e6, 18322.0 + rng.nextInt(9))
  }
  private val experts = Seq.tabulate(25) { i =>
    ((i % 5) * 200000.0 - 400000.0, (i / 5) * 200000.0 - 400000.0, 18326.0)
  }
  private val radius = 300000.0

  private def bruteCount(inclusive: Boolean): Map[(Double, Double), Long] =
    experts.map { case (ex, ey, et) =>
      val n = obs.count { case (_, ox, oy, ot) =>
        val d2 = (ox - ex) * (ox - ex) + (oy - ey) * (oy - ey)
        val dOk = if (inclusive) d2 <= radius * radius else d2 < radius * radius
        dOk && ot >= et - 4 && ot <= et + 4
      }
      (ex, ey) -> n.toLong
    }.toMap

  private def joined(broadcastRight: Boolean, salt: Int) = {
    val o = obs.toDF("doc_id", "x", "y", "t")
    val e = experts.toDF("x", "y", "t")
    SpatialJoin.radiusJoin(o, e, SpatialJoin.RadiusJoinConfig(
      radius = radius,
      temporal = Some(SpatialJoin.TemporalWindow("t", "t", -4.0, 4.0)),
      broadcastRight = broadcastRight, saltBuckets = salt))
  }

  test("radius join row counts match brute force exactly (broadcast path)") {
    val got = joined(broadcastRight = true, 0)
      .groupBy("expert_x", "expert_y").count().collect()
      .map(r => (r.getDouble(0), r.getDouble(1)) -> r.getLong(2)).toMap
    val want = bruteCount(inclusive = true).filter(_._2 > 0)
    assert(got === want)
  }

  test("radius join identical rows on shuffle+salted path") {
    val a = joined(broadcastRight = true, 0)
      .select("doc_id", "expert_x", "expert_y").collect().map(_.toSeq).toSet
    val b = joined(broadcastRight = false, 8)
      .select("doc_id", "expert_x", "expert_y").collect().map(_.toSeq).toSet
    assert(a === b)
    assert(a.nonEmpty)
  }

  test("no duplicate (left, right) pairs from the neighbor explode") {
    val j = joined(broadcastRight = true, 0).groupBy("doc_id", "expert_x", "expert_y").count()
    assert(j.filter(col("count") > 1).count() === 0)
  }

  test("strict vs inclusive radius: boundary point") {
    val o = Seq(("edge", 300000.0, 0.0, 18326.0)).toDF("doc_id", "x", "y", "t")
    val e = Seq((0.0, 0.0, 18326.0)).toDF("x", "y", "t")
    def cnt(incl: Boolean) = SpatialJoin.radiusJoin(o, e,
      SpatialJoin.RadiusJoinConfig(radius = radius, inclusive = incl)).count()
    assert(cnt(true) === 1)  // training window: query_ball_point includes r
    assert(cnt(false) === 0) // prediction max_dist: strict
  }

  test("knnJoin returns the k nearest experts") {
    val o = Seq(("p", 10000.0, 10000.0, 18326.0)).toDF("doc_id", "x", "y", "t")
    val e = experts.toDF("x", "y", "t")
    val got = SpatialJoin.knnJoin(o, e, Seq("doc_id"), 3,
      SpatialJoin.RadiusJoinConfig(radius = 500000.0))
      .select("expert_x", "expert_y").collect()
      .map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val want = experts.map { case (x, y, _) => ((x, y), (x - 10000.0) * (x - 10000.0) + (y - 10000.0) * (y - 10000.0)) }
      .sortBy(_._2).take(3).map(_._1).toSet
    assert(got === want)
  }
}

class ShiftArraysSpec extends AnyFunSuite with graft.SparkTestBase {
  import spark.implicits._
  test("shiftArrays emits the offset meshgrid per expert") {
    val e = Seq((100.0, 200.0)).toDF("x", "y")
    val got = Grids.shiftArrays(e, Seq(-10.0, 0.0, 10.0), Seq(-5.0, 5.0))
      .select("pred_x", "pred_y").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
    val want = (for (dy <- Seq(-5.0, 5.0); dx <- Seq(-10.0, 0.0, 10.0)) yield (100.0 + dx, 200.0 + dy)).toSet
    assert(got === want)
    assert(got.size === 6)
  }
}
