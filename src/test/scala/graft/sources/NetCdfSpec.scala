package graft.sources

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

class NetCdfSpec extends AnyFunSuite with SparkTestBase {

  test("writer emits byte-exact classic CDF-1 (hand-derived golden per the public spec)") {
    // one dim x(2), one double coord var x = [1.5, 2.5], no attrs.
    // header: magic 'CDF'\x01 | numrecs 0
    // dim_list:  tag 0x0A, n=1, name "x" (len 1 + 3 pad), len 2      -> 20 B
    // gatt_list: 0, 0                                                ->  8 B
    // var_list:  tag 0x0B, n=1, name "x", ndims 1, dimids [0],
    //            atts (0,0), nc_type 6, vsize 16, begin 80           -> 44 B
    // => header 80 bytes, then 2 big-endian doubles
    val want = ByteBuffer.allocate(96).order(ByteOrder.BIG_ENDIAN)
    want.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte).putInt(0)
    want.putInt(0x0A).putInt(1)
    want.putInt(1).put('x'.toByte).put(0.toByte).put(0.toByte).put(0.toByte).putInt(2)
    want.putInt(0).putInt(0)
    want.putInt(0x0B).putInt(1)
    want.putInt(1).put('x'.toByte).put(0.toByte).put(0.toByte).put(0.toByte)
    want.putInt(1).putInt(0)
    want.putInt(0).putInt(0)
    want.putInt(6).putInt(16).putInt(80)
    want.putDouble(1.5).putDouble(2.5)

    val got = NetCdf3.write(
      Seq(NetCdf3.NcDim("x", 2)),
      Seq(NetCdf3.WVar("x", Seq("x"), Array(1.5, 2.5))))
    assert(got.toSeq === want.array().toSeq)
  }

  test("parse roundtrips write: dims, shapes, attrs, values") {
    val bytes = NetCdf3.write(
      Seq(NetCdf3.NcDim("y", 3), NetCdf3.NcDim("x", 2)),
      Seq(
        NetCdf3.WVar("y", Seq("y"), Array(10.0, 20.0, 30.0)),
        NetCdf3.WVar("x", Seq("x"), Array(1.0, 2.0)),
        NetCdf3.WVar("z", Seq("y", "x"), Array(1, 2, 3, 4, 5, 6).map(_.toDouble),
          attrs = Map("units" -> "m"))),
      gattrs = Map("title" -> "graft test granule"))
    val nc = NetCdf3.parse(bytes)
    assert(nc.dims === Seq(NetCdf3.NcDim("y", 3), NetCdf3.NcDim("x", 2)))
    assert(nc.gattrs === Map("title" -> "graft test granule"))
    assert(nc.shape("z") === Seq(3, 2))
    assert(nc.variable("z").attrs === Map("units" -> "m"))
    assert(nc.readDoubles("z").toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    assert(nc.readDoubles("y").toSeq === Seq(10.0, 20.0, 30.0))
  }

  test("reader handles CDF-2 (64-bit begin offsets) and int/float/short payloads") {
    // hand-build a v2 file: dim x(2); vars i:int[2], f:float[2], s:short[2]
    def nameField(b: ByteBuffer, s: String): Unit = {
      b.putInt(s.length); s.foreach(c => b.put(c.toByte))
      (0 until (4 - s.length % 4) % 4).foreach(_ => b.put(0.toByte))
    }
    val header = 8 + (8 + 12) + 8 + (8 + 3 * (8 + 4 + 4 + 8 + 4 + 4 + 8))
    val buf = ByteBuffer.allocate(header + 8 + 8 + 4 + 4 /* short pad to 4 */)
      .order(ByteOrder.BIG_ENDIAN)
    buf.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(2.toByte).putInt(0)
    buf.putInt(0x0A).putInt(1); nameField(buf, "x"); buf.putInt(2)
    buf.putInt(0).putInt(0)
    buf.putInt(0x0B).putInt(3)
    var begin = header.toLong
    def varEntry(nm: String, t: Int, vsize: Int): Unit = {
      nameField(buf, nm); buf.putInt(1).putInt(0); buf.putInt(0).putInt(0)
      buf.putInt(t).putInt(vsize).putLong(begin); begin += vsize
    }
    varEntry("i", 4, 8); varEntry("f", 5, 8); varEntry("s", 3, 4)
    buf.putInt(7).putInt(-9)
    buf.putFloat(1.25f).putFloat(-2.5f)
    buf.putShort(300.toShort).putShort((-5).toShort)
    val nc = NetCdf3.parse(buf.array())
    assert(nc.readDoubles("i").toSeq === Seq(7.0, -9.0))
    assert(nc.readDoubles("f").toSeq === Seq(1.25, -2.5))
    assert(nc.readDoubles("s").toSeq === Seq(300.0, -5.0))
  }

  test("readGrid2d: per-granule parallel scan emits the xarray to_dataframe layout") {
    val dir = Files.createTempDirectory("graft_nc_").toString
    def granule(path: String, bias: Double): Unit =
      Files.write(Paths.get(path), NetCdf3.write(
        Seq(NetCdf3.NcDim("y", 2), NetCdf3.NcDim("x", 3)),
        Seq(
          NetCdf3.WVar("y", Seq("y"), Array(0.0, 1.0)),
          NetCdf3.WVar("x", Seq("x"), Array(10.0, 20.0, 30.0)),
          NetCdf3.WVar("z", Seq("y", "x"), Array.tabulate(6)(i => bias + i)))))
    granule(s"$dir/a.nc", 0.0)
    granule(s"$dir/b.nc", 100.0)

    val df = NetCdfGrid.readGrid2d(spark, s"$dir/*.nc", "x", "y", Seq("z"))
    assert(df.count() === 12)
    assert(df.columns.toSeq === Seq("source_file", "x", "y", "z"))
    val a = df.filter(org.apache.spark.sql.functions.col("source_file").endsWith("a.nc"))
      .orderBy("y", "x").collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(a.toSeq === Seq(
      (10.0, 0.0, 0.0), (20.0, 0.0, 1.0), (30.0, 0.0, 2.0),
      (10.0, 1.0, 3.0), (20.0, 1.0, 4.0), (30.0, 1.0, 5.0)))
  }

  test("readGrid2d reads NetCDF-4 (HDF5 container) granules, mixed with classic in one glob") {
    val dir = Files.createTempDirectory("graft_nc4_").toString
    // classic granule
    Files.write(Paths.get(s"$dir/a.nc"), NetCdf3.write(
      Seq(NetCdf3.NcDim("y", 2), NetCdf3.NcDim("x", 3)),
      Seq(
        NetCdf3.WVar("y", Seq("y"), Array(0.0, 1.0)),
        NetCdf3.WVar("x", Seq("x"), Array(10.0, 20.0, 30.0)),
        NetCdf3.WVar("z", Seq("y", "x"), Array.tabulate(6)(i => 0.0 + i)))))
    // NetCDF-4-shaped granule: HDF5 container, chunked+gzip variables
    Files.write(Paths.get(s"$dir/b.nc"), Hdf5Lite.write(Seq(
      Hdf5Lite.H5Var("y", Seq(2), doubles = Array(0.0, 1.0)),
      Hdf5Lite.H5Var("x", Seq(3), doubles = Array(10.0, 20.0, 30.0)),
      Hdf5Lite.H5Var("z", Seq(2, 3), doubles = Array.tabulate(6)(i => 100.0 + i))),
      chunkRows = 1, deflate = 6))

    val df = NetCdfGrid.readGrid2d(spark, s"$dir/*.nc", "x", "y", Seq("z"))
    assert(df.count() === 12)
    val b = df.filter(org.apache.spark.sql.functions.col("source_file").endsWith("b.nc"))
      .orderBy("y", "x").collect().map(r => (r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(b.toSeq === Seq(
      (10.0, 0.0, 100.0), (20.0, 0.0, 101.0), (30.0, 0.0, 102.0),
      (10.0, 1.0, 103.0), (20.0, 1.0, 104.0), (30.0, 1.0, 105.0)))
  }

  test("distributed granule sink: executor-written bands roundtrip bit-exactly; " +
    "one band is byte-identical to the driver sink") {
    import spark.implicits._
    val rows = for (y <- 0 until 5; x <- 0 until 3)
      yield (x * 1000.0 + 0.1, y * 500.0 - 0.25, math.Pi * (x + 1) / (y + 1), x - y * 0.5)
    val df = rows.toDF("x", "y", "v1", "v2")
    // banded: 5 y-rows in bands of 2 -> 3 granules, written from tasks
    val dir = Files.createTempDirectory("graft_ncd_").toString + "/bands"
    NetCdfGrid.writeGrid2dDistributed(df.repartition(7), dir, "x", "y",
      Seq("v1", "v2"), bandRows = 2, Map("source" -> "graft"))
    assert(Files.list(Paths.get(dir)).toArray.map(_.toString).count(_.endsWith(".nc")) === 3)
    val back = NetCdfGrid.readGrid2d(spark, s"$dir/*.nc", "x", "y", Seq("v1", "v2"))
      .select("x", "y", "v1", "v2")
    val got = back.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got === rows.toSet)

    // a single band covering all ys must equal the driver-side writer's file
    val dirOne = Files.createTempDirectory("graft_ncd_").toString
    NetCdfGrid.writeGrid2dDistributed(df.repartition(4), dirOne, "x", "y",
      Seq("v1", "v2"), bandRows = 99, Map("source" -> "graft"))
    val single = Files.createTempDirectory("graft_ncw_").toString + "/grid.nc"
    NetCdfGrid.writeGrid2d(df, single, "x", "y", Seq("v1", "v2"), Map("source" -> "graft"))
    assert(java.util.Arrays.equals(
      Files.readAllBytes(Paths.get(dirOne, "part-00000.nc")),
      Files.readAllBytes(Paths.get(single))), "one-band granule != driver-sink bytes")
  }

  test("N-d: per-slice granule sink roundtrips a (t, y, x) cube through readGridNd") {
    import spark.implicits._
    val rows = for { it <- 0 until 3; iy <- 0 until 4; ix <- 0 until 5 }
      yield (2000.0 + it, 100.0 * iy, 10.0 * ix, 0.25 + it * 100 + iy * 10 + ix)
    val df = rows.toDF("t", "y", "x", "v").withColumn("w", org.apache.spark.sql.functions.col("v") * -1.5)
    val dir = Files.createTempDirectory("graft_nc3_").toString
    NetCdfGrid.writeGridNdDistributed(df.repartition(7), dir, Seq("t", "y", "x"),
      Seq("v", "w"), Map("source" -> "graft"))
    // one granule per t-slice, each a self-contained (t=1, y, x) dataset
    assert(Files.list(Paths.get(dir)).toArray.map(_.toString).count(_.endsWith(".nc")) === 3)
    val one = NetCdf3.parse(Files.readAllBytes(Paths.get(dir, "part-00001.nc")))
    assert(one.shape("v") === Seq(1, 4, 5))
    assert(one.readDoubles("t").toSeq === Seq(2001.0))
    val back = NetCdfGrid.readGridNd(spark, s"$dir/*.nc", Seq("t", "y", "x"), Seq("v", "w"))
    assert(back.columns.toSeq === Seq("source_file", "t", "y", "x", "v", "w"))
    assert(back.count() === 60)
    assert(back.filter(org.apache.spark.sql.functions.col("w") =!= org.apache.spark.sql.functions.col("v") * -1.5).count() === 0)
    val got = back.select("t", "y", "x", "v").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got === rows.toSet)
  }

  test("windowed granule scan: out-of-window granules skip their data payload") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // payloads (100x100 doubles = 80 KB/granule) dwarf the 8 KB header
    // chunk so the byte accounting shows real skipping
    val rows = for { it <- 0 until 4; iy <- 0 until 100; ix <- 0 until 100 }
      yield (2000.0 + it, 100.0 * iy, 10.0 * ix, 0.5 + it * 100 + iy * 10 + ix)
    val df = rows.toDF("t", "y", "x", "v")
    val dir = Files.createTempDirectory("graft_ncw_").toString
    NetCdfGrid.writeGridNdDistributed(df.repartition(5), dir, Seq("t", "y", "x"), Seq("v"))
    val stats = new NetCdfGrid.GranuleWindowStats(spark)
    // t in [2001, 2002] -> 2 of the 4 per-date granules carry data
    val got = NetCdfGrid.readGridNdWindow(spark, s"$dir/*.nc", Seq("t", "y", "x"),
      Seq("v"), Map("t" -> (2001.0, 2002.0), "y" -> (0.0, 250.0)), stats)
    val want = NetCdfGrid.readGridNd(spark, s"$dir/*.nc", Seq("t", "y", "x"), Seq("v"))
      .filter(col("t") >= 2001.0 && col("t") <= 2002.0 && col("y") <= 250.0)
    assert(got.columns.toSeq === want.columns.toSeq)
    // ONE action: accumulators count a single pass
    val gotRows = got.collect()
    assert(gotRows.map(_.toSeq.drop(1)).toSet ===
      want.collect().map(_.toSeq.drop(1)).toSet)
    assert(gotRows.length === 2 * 3 * 100)
    assert(stats.filesPlanned.value === 4L && stats.filesRead.value === 2L,
      s"read ${stats.filesRead.value}/${stats.filesPlanned.value}")
    // skipped granules fetched only header + axes, not their payloads
    val totalBytes = Files.list(Paths.get(dir)).toArray.map(p =>
      Files.size(p.asInstanceOf[java.nio.file.Path])).sum
    assert(stats.bytesRead.value < totalBytes,
      s"bytes ${stats.bytesRead.value} vs archive $totalBytes")
  }

  test("windowed granule scan prunes NetCDF-4 (HDF5) granules by coords too") {
    import org.apache.spark.sql.functions.col
    val dir = Files.createTempDirectory("graft_ncw4_").toString
    // two HDF5-container granules, each a (y, x) tile at a different y band
    def granule(name: String, y0: Double, bias: Double): Unit =
      Files.write(Paths.get(s"$dir/$name"), Hdf5Lite.write(Seq(
        Hdf5Lite.H5Var("y", Seq(2), doubles = Array(y0, y0 + 1.0)),
        Hdf5Lite.H5Var("x", Seq(3), doubles = Array(10.0, 20.0, 30.0)),
        Hdf5Lite.H5Var("z", Seq(2, 3), doubles = Array.tabulate(6)(i => bias + i))),
        chunkRows = 1, deflate = 6))
    granule("lo.nc", 0.0, 100.0)
    granule("hi.nc", 50.0, 900.0)
    val stats = new NetCdfGrid.GranuleWindowStats(spark)
    val got = NetCdfGrid.readGridNdWindow(spark, s"$dir/*.nc", Seq("y", "x"),
      Seq("z"), Map("y" -> (40.0, 60.0), "x" -> (20.0, 30.0)), stats)
    // ONE action: accumulators count a single pass
    val g = got.collect()
    assert(g.length === 4 && g.forall(_.getString(0).endsWith("hi.nc")))
    assert(!g.exists(_.getDouble(2) === 10.0), "x=10 outside the window")
    assert(g.map(_.getDouble(3)).sum === (901.0 + 902.0 + 904.0 + 905.0))
    // lo.nc was fetched (HDF5 needs the file) but its DATA never decoded
    assert(stats.filesPlanned.value === 2L && stats.filesRead.value === 1L)
  }

  test("ConfigExpr dispatches .nc globs: layout discovery, window pushdown, provenance") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.core.ConfigExpr
    val rows = for { it <- 0 until 3; iy <- 0 until 3; ix <- 0 until 4 }
      yield (10.0 + it, 100.0 * iy, 10.0 * ix, it * 100.0 + iy * 10 + ix)
    val df = rows.toDF("t", "y", "x", "v")
    val dir = Files.createTempDirectory("graft_nccfg_").toString
    NetCdfGrid.writeGridNdDistributed(df, dir, Seq("t", "y", "x"), Seq("v"))
    // dim-range triples (pushed) + a non-dim triple (residual only)
    val got = ConfigExpr.load(spark, ConfigExpr.DataConfig(
      source = s"$dir/*.nc",
      where = Seq(ConfigExpr.Where("t", ">=", 11.0), ConfigExpr.Where("v", "<", 150.0)),
      sourceColumn = Some("granule"),
      colSelect = Seq("t", "y", "x", "v", "granule")))
    val g = got.collect()
    assert(got.columns.toSeq === Seq("t", "y", "x", "v", "granule"))
    assert(g.forall(r => r.getDouble(0) >= 11.0 && r.getDouble(3) < 150.0))
    assert(g.map(_.getString(4)).forall(_.endsWith(".nc")))
    val want = rows.filter(r => r._1 >= 11.0 && r._4 < 150.0).map(r => (r._1, r._2, r._3, r._4))
    assert(g.map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
      === want.toSet)
    // positional rename disables the pushdown but not correctness
    val renamed = ConfigExpr.load(spark, ConfigExpr.DataConfig(
      source = s"$dir/*.nc",
      newColumnNames = Some(Seq("tt", "yy", "xx", "vv")),
      where = Seq(ConfigExpr.Where("tt", "==", 12.0))))
    assert(renamed.columns.toSeq === Seq("tt", "yy", "xx", "vv"))
    assert(renamed.count() === 12L)
  }

  test("granule append: new dates become new files, existing granules untouched") {
    import spark.implicits._
    def cube(ts: Seq[Double]) =
      (for { t <- ts; iy <- 0 until 3; ix <- 0 until 4 }
        yield (t, 10.0 * iy, 1.0 * ix, t + iy + ix)).toDF("t", "y", "x", "v")
    val dir = Files.createTempDirectory("graft_nca_").toString
    NetCdfGrid.writeGridNdDistributed(cube(Seq(5.0, 6.0)), dir, Seq("t", "y", "x"), Seq("v"))
    val before = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".nc")).sorted
    val mtimes = before.map(p => Files.getLastModifiedTime(Paths.get(p)))
    NetCdfGrid.appendGridNdDistributed(cube(Seq(7.0)), dir, Seq("t", "y", "x"), Seq("v"))
    val after = Files.list(Paths.get(dir)).toArray.map(_.toString)
      .filter(_.endsWith(".nc")).sorted
    assert(after.length === 3 && after.startsWith(before))
    assert(before.map(p => Files.getLastModifiedTime(Paths.get(p))).toSeq === mtimes.toSeq,
      "existing granules untouched")
    val back = NetCdfGrid.readGridNd(spark, s"$dir/*.nc", Seq("t", "y", "x"), Seq("v"))
    assert(back.count() === 3 * 3 * 4)
    assert(back.select("t").distinct().collect().map(_.getDouble(0)).sorted.toSeq
      === Seq(5.0, 6.0, 7.0))
    // overlap and mismatched tail axes raise loudly
    val e1 = intercept[IllegalArgumentException](
      NetCdfGrid.appendGridNdDistributed(cube(Seq(6.0)), dir, Seq("t", "y", "x"), Seq("v")))
    assert(e1.getMessage.contains("overlap"))
    val bad = (for { iy <- 0 until 2; ix <- 0 until 4 }
      yield (8.0, 10.0 * iy, 1.0 * ix, 0.0)).toDF("t", "y", "x", "v")
    val e2 = intercept[IllegalArgumentException](
      NetCdfGrid.appendGridNdDistributed(bad, dir, Seq("t", "y", "x"), Seq("v")))
    assert(e2.getMessage.contains("axis differs"))
  }

  test("writeGrid2d -> readGrid2d roundtrip preserves doubles bit-exactly") {
    import spark.implicits._
    val rows = for (y <- 0 until 4; x <- 0 until 3)
      yield (x * 1000.0 + 0.1, y * 500.0 - 0.25, math.Pi * (x + 1) / (y + 1), x - y * 0.5)
    val df = rows.toDF("x", "y", "v1", "v2")
    val path = Files.createTempDirectory("graft_ncw_").toString + "/grid.nc"
    NetCdfGrid.writeGrid2d(df, path, "x", "y", Seq("v1", "v2"), Map("source" -> "graft"))
    val back = NetCdfGrid.readGrid2d(spark, path, "x", "y", Seq("v1", "v2"))
      .select("x", "y", "v1", "v2")
    val got = back.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet
    assert(got === rows.toSet)
  }
}
