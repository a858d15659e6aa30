package graft.sources

import graft.SparkTestBase
import graft.core.ConfigExpr
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}

class Hdf5Spec extends AnyFunSuite with SparkTestBase {
  import Hdf5Lite.H5Var

  private val ugly = Array(0.0, -0.0, 1.5, -2.25, Double.NaN,
    Double.PositiveInfinity, Double.NegativeInfinity, Double.MinPositiveValue,
    1.7976931348623157e308, math.Pi)
  private val uglyL = Array(0L, -1L, Long.MaxValue, Long.MinValue, 42L,
    -999999999999L, 1L, 2L, 3L, 4L)

  test("byte-level roundtrip is bit-exact for doubles (NaN/Inf/denormal) and longs") {
    val img = Hdf5Lite.write(Seq(
      H5Var("zz_vals", Seq(10), doubles = ugly),
      H5Var("ids", Seq(10), longs = uglyL),
      H5Var("grid", Seq(2, 5), doubles = Array.tabulate(10)(_ * 1.25))))
    val back = Hdf5Lite.read(img).map(v => v.name -> v).toMap
    assert(back.keySet === Set("zz_vals", "ids", "grid"))
    assert(back("zz_vals").doubles.map(java.lang.Double.doubleToRawLongBits) ===
      ugly.map(java.lang.Double.doubleToRawLongBits), "bit-exact doubles")
    assert(back("ids").longs === uglyL)
    assert(back("grid").shape === Seq(2, 5))
    assert(back("grid").doubles === Array.tabulate(10)(_ * 1.25))
  }

  test("structural goldens: signature, superblock v0, EOF address, sorted symbol entries") {
    val img = Hdf5Lite.write(Seq(
      H5Var("b", Seq(2), doubles = Array(1.0, 2.0)),
      H5Var("a", Seq(2), longs = Array(3L, 4L))))
    assert(img.take(8) === Array(0x89, 'H', 'D', 'F', '\r', '\n', 0x1a, '\n').map(_.toByte))
    assert(img(8) === 0.toByte, "superblock version 0")
    assert(img(13) === 8.toByte && img(14) === 8.toByte, "8-byte offsets/lengths")
    val eof = java.nio.ByteBuffer.wrap(img, 40, 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN).getLong
    assert(eof === img.length.toLong, "EOF address == file size")
    val s = new String(img.map(b => if (b >= 32 && b < 127) b.toChar else '.'))
    assert(s.contains("HEAP") && s.contains("TREE") && s.contains("SNOD"))
    // entries come back name-sorted regardless of input order
    assert(Hdf5Lite.read(img).map(_.name) === Seq("a", "b"))
  }

  test("chunked + gzip roundtrip is bit-exact, including ragged edge chunks") {
    val vals = Array.tabulate(103)(i => math.sin(i * 0.7) * (i % 5))
    val ids = Array.tabulate(103)(i => i * 7L - 350L)
    val grid = Array.tabulate(60)(i => i * 0.25 - 7.0)
    for (deflate <- Seq(0, 6)) {
      val img = Hdf5Lite.write(Seq(
        H5Var("v", Seq(103), doubles = vals),
        H5Var("ids", Seq(103), longs = ids),
        H5Var("g", Seq(6, 10), doubles = grid)),
        chunkRows = 16, deflate = deflate)
      val back = Hdf5Lite.read(img).map(v => v.name -> v).toMap
      assert(back("v").doubles.map(java.lang.Double.doubleToRawLongBits) ===
        vals.map(java.lang.Double.doubleToRawLongBits), s"deflate=$deflate doubles")
      assert(back("ids").longs === ids, s"deflate=$deflate longs")
      assert(back("g").shape === Seq(6, 10))
      assert(back("g").doubles === grid, s"deflate=$deflate 2-d")
    }
    // compression actually engages: repetitive data shrinks the file
    val rep = Array.fill(4096)(1.0)
    val plain = Hdf5Lite.write(Seq(H5Var("r", Seq(4096), doubles = rep)), chunkRows = 1024)
    val gz = Hdf5Lite.write(Seq(H5Var("r", Seq(4096), doubles = rep)), chunkRows = 1024, deflate = 6)
    assert(gz.length < plain.length / 4, s"gzip ${gz.length} vs plain ${plain.length}")
  }

  test("reader rejects non-HDF5 and newer-superblock files with clear errors") {
    val notH5 = "PAR1 something".getBytes
    val e1 = intercept[IllegalArgumentException](Hdf5Lite.read(notH5))
    assert(e1.getMessage.contains("signature"))
    val img = Hdf5Lite.write(Seq(H5Var("x", Seq(1), doubles = Array(1.0))))
    img(8) = 2 // pretend superblock v2
    val e2 = intercept[IllegalArgumentException](Hdf5Lite.read(img))
    assert(e2.getMessage.contains("superblock v2"))
  }

  test("Spark roundtrip: writeFile -> Hdf5Table.read preserves values and types") {
    import spark.implicits._
    val df = Seq((1L, 0.5, 10.0), (2L, -1.5, 20.0), (3L, 2.25, 30.0))
      .toDF("id", "z", "w")
    val path = Files.createTempDirectory("h5spec_").resolve("t.h5").toString
    Hdf5Table.writeFile(df, path)
    val back = Hdf5Table.read(spark, path)
    assert(back.schema("id").dataType.typeName === "long")
    assert(back.schema("z").dataType.typeName === "double")
    val got = back.select("id", "z", "w").collect().map(r =>
      (r.getLong(0), r.getDouble(1), r.getDouble(2))).toSet
    assert(got === Set((1L, 0.5, 10.0), (2L, -1.5, 20.0), (3L, 2.25, 30.0)))
  }

  test("granule-parallel export + scan: one file per partition, set-equal data") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, i * 0.5)).toDF("id", "v").repartition(7)
    val dir = Files.createTempDirectory("h5gran_").toString
    Hdf5Table.writeGranules(df, dir)
    val files = Files.list(Paths.get(dir)).toArray.map(_.toString).filter(_.endsWith(".h5"))
    assert(files.length > 1 && files.length <= 7, s"expected multi-granule export, got ${files.length}")
    val back = Hdf5Table.read(spark, s"$dir/*.h5")
    assert(back.select("source_file").distinct().count() === files.length.toLong)
    val got = back.select("id", "v").as[(Long, Double)].collect().toSet
    assert(got === (1 to 1000).map(i => (i.toLong, i * 0.5)).toSet)
  }

  test("ConfigExpr.load dispatches .h5 with where / col_select / source column") {
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, i * 1.0)).toDF("id", "v")
    val path = Files.createTempDirectory("h5cfg_").resolve("obs.h5").toString
    Hdf5Table.writeFile(df, path)
    val out = ConfigExpr.load(spark, ConfigExpr.DataConfig(
      source = path,
      where = Seq(ConfigExpr.Where("v", ">=", 50.0)),
      sourceColumn = Some("src"),
      colSelect = Seq("id", "v", "src")))
    val rows = out.collect()
    assert(rows.length === 51)
    assert(rows.forall(_.getString(2) == "obs.h5"))
  }

  test("writeFile rejects non-numeric columns with a parquet hint") {
    import spark.implicits._
    val df = Seq((1L, "text")).toDF("id", "s")
    val path = Files.createTempDirectory("h5bad_").resolve("bad.h5").toString
    val e = intercept[Exception](Hdf5Table.writeFile(df, path))
    assert(e.getMessage.contains("numeric columns only"))
  }
}
