package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExpressionsSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("LAEA forward matches reference doctest (utils.py:598-599)") {
    val row = Seq((-105.01621, 39.57422)).toDF("lon", "lat")
      .select(laea_x($"lon", $"lat").as("x"), laea_y($"lon", $"lat").as("y"))
      .head()
    assert(math.abs(row.getDouble(0) - -5254767.014984061) < 1e-6)
    assert(math.abs(row.getDouble(1) - 1409604.1043472202) < 1e-6)
  }

  test("LAEA inverse matches reference doctest (utils.py:646-648)") {
    val row = Seq((1000000.0, 2000000.0)).toDF("x", "y")
      .select(laea_lon($"x", $"y").as("lon"), laea_lat($"x", $"y").as("lat"))
      .head()
    assert(math.abs(row.getDouble(0) - 153.434948822922) < 1e-9)
    assert(math.abs(row.getDouble(1) - 69.86894542225777) < 1e-9)
  }

  test("LAEA round-trips over the Arctic (codegen path, many rows)") {
    val df = spark.range(1000).select(
      (rand(1) * 360 - 180).as("lon"),
      (rand(2) * 29 + 60).as("lat"))
    val back = df.select(
      $"lon", $"lat",
      laea_lon(laea_x($"lon", $"lat"), laea_y($"lon", $"lat")).as("lon2"),
      laea_lat(laea_x($"lon", $"lat"), laea_y($"lon", $"lat")).as("lat2"))
    val maxErr = back.select(
      max(abs($"lon" - $"lon2")).as("e1"), max(abs($"lat" - $"lat2")).as("e2")).head()
    assert(maxErr.getDouble(0) < 1e-11, s"lon err ${maxErr.getDouble(0)}")
    assert(maxErr.getDouble(1) < 1e-11, s"lat err ${maxErr.getDouble(1)}")
  }

  test("cell_encode matches the SQL arithmetic form exactly") {
    // the driver-oracle form: (floor((x-x0)/res) + 2^20) * 2^21 + floor((y-y0)/res) + 2^20
    val res = 300000.0
    val df = spark.range(5000).select(
      (rand(3) * 9000000 - 4500000).as("x"),
      (rand(4) * 9000000 - 4500000).as("y"))
    val cmp = df.select(
      cell_encode($"x", $"y", res, -4500000.0, -4500000.0).as("cell"),
      ((floor(($"x" - lit(-4500000.0)) / res) + 1048576L) * 2097152L +
        (floor(($"y" - lit(-4500000.0)) / res) + 1048576L)).as("sqlForm"))
    assert(cmp.filter($"cell" =!= $"sqlForm").count() === 0)
  }

  test("cell_encode boundary semantics: floor arithmetic, left-closed bins") {
    val res = 50000.0
    val rows = Seq((0.0, 0.0), (49999.999, 0.0), (50000.0, 0.0), (-0.0001, 0.0))
      .toDF("x", "y")
      .select(cell_encode($"x", $"y", res).as("c")).collect().map(_.getLong(0))
    assert(rows(0) === rows(1)) // same bin
    assert(rows(2) === rows(0) + Cells.Stride) // next x bin
    assert(rows(3) === rows(0) - Cells.Stride) // previous x bin
  }

  test("cell_neighbors contains self and 8 surrounding cells") {
    val r = Seq((100.0, 100.0)).toDF("x", "y")
      .select(cell_neighbors($"x", $"y", 100.0).as("n"), cell_encode($"x", $"y", 100.0).as("c"))
      .head()
    val ns = r.getSeq[Long](0)
    assert(ns.length === 9)
    assert(ns.distinct.length === 9)
    assert(ns.contains(r.getLong(1)))
    // every neighbor is within 1 axis step
    val cx = Cells.cellX(r.getLong(1)); val cy = Cells.cellY(r.getLong(1))
    assert(ns.forall { n => math.abs(Cells.cellX(n) - cx) <= 1 && math.abs(Cells.cellY(n) - cy) <= 1 })
  }

  test("cell_parent shifts axis indices") {
    val c = Cells.pack(1023, -37)
    assert(Cells.parent(c, 3) === Cells.pack(1023 >> 3, -37 >> 3))
    val viaCol = Seq(c).toDF("c").select(cell_parent($"c", 3)).head().getLong(0)
    assert(viaCol === Cells.parent(c, 3))
  }

  test("point_in_polygon: square ring with hole behavior (even-odd)") {
    val square = Array(0.0, 0.0, 10.0, 0.0, 10.0, 10.0, 0.0, 10.0)
    val df = Seq((5.0, 5.0), (15.0, 5.0), (-1.0, -1.0), (9.99, 9.99)).toDF("lon", "lat")
    val got = df.select(point_in_polygon($"lon", $"lat", Array(square))).collect().map(_.getBoolean(0))
    assert(got.toSeq === Seq(true, false, false, true))
  }

  test("simhash64: near-identical docs have small hamming distance; different docs large") {
    val a = "the quick brown fox jumps over the lazy dog and runs far away today"
    val b = "the quick brown fox jumps over the lazy dog and runs far away tonight"
    val c = "completely unrelated text about spark catalyst expression codegen internals"
    val df = Seq((a, b), (a, c)).toDF("s1", "s2")
      .select(hamming64(simhash64($"s1"), simhash64($"s2")).as("d"))
    val ds = df.collect().map(_.getInt(0))
    assert(ds(0) < ds(1), s"near-dup ${ds(0)} should be < unrelated ${ds(1)}")
    assert(ds(0) <= 16)
  }

  test("minhash_sig: jaccard-similar strings share signature positions") {
    val a = "abcdefghijklmnopqrstuvwxyz0123456789abcdefghijklmnopqrstuvwxyz"
    val b = a.replace('z', 'Z') // small edit
    val c = a.reverse + "~~~completely different content here~~~"
    val r = Seq((a, b, c)).toDF("a", "b", "c").select(
      minhash_sig($"a", 64, 5).as("sa"), minhash_sig($"b", 64, 5).as("sb"), minhash_sig($"c", 64, 5).as("sc")
    ).head()
    def overlap(x: Seq[Long], y: Seq[Long]): Int = x.zip(y).count { case (p, q) => p == q }
    val sa = r.getSeq[Long](0); val sb = r.getSeq[Long](1); val sc = r.getSeq[Long](2)
    assert(overlap(sa, sb) > overlap(sa, sc))
    assert(overlap(sa, sa) === 64)
  }

  test("winnow_fingerprint is robust to small edits") {
    val a = "x" * 20 + "the core shared content of this document stays identical" + "y" * 20
    val b = "z" * 25 + "the core shared content of this document stays identical" + "w" * 15
    val r = Seq((a, b)).toDF("a", "b")
      .select(winnow_fingerprint($"a", 8, 4).as("fa"), winnow_fingerprint($"b", 8, 4).as("fb")).head()
    val fa = r.getSeq[Long](0).toSet; val fb = r.getSeq[Long](1).toSet
    assert(fa.intersect(fb).nonEmpty, "shared content must produce shared fingerprints")
  }

  test("SQL registration works (cell_encode / laea via spark.sql)") {
    val n = spark.sql(
      "SELECT cell_encode(laea_x(lon, lat), laea_y(lon, lat), 300000.0) AS c " +
        "FROM VALUES (10.0, 75.0), (11.0, 75.0) AS t(lon, lat)").count()
    assert(n === 2)
  }

  test("bijector columns round-trip") {
    val df = Seq(0.005, 0.002).toDF("v")
    val back = df.select(sigmoid_fwd(sigmoid_inv($"v", 0.00125, 0.01), 0.00125, 0.01).as("b"))
      .collect().map(_.getDouble(0))
    assert(math.abs(back(0) - 0.005) < 1e-12 && math.abs(back(1) - 0.002) < 1e-12)
  }
}
