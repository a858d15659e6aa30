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

  test("multi-node chunk B-tree: > 64 chunks roundtrip via a level-1 internal node") {
    // 1000 rows at chunkRows 5 -> 200 chunks = 4 leaves under one internal
    val vals = Array.tabulate(1000)(i => math.sin(i * 0.013) * (1 + i % 11))
    val ids = Array.tabulate(1000)(i => i * 13L - 6500L)
    for (deflate <- Seq(0, 6)) {
      val img = Hdf5Lite.write(Seq(
        H5Var("v", Seq(1000), doubles = vals),
        H5Var("ids", Seq(1000), longs = ids)), chunkRows = 5, deflate = deflate)
      val back = Hdf5Lite.read(img).map(v => v.name -> v).toMap
      assert(back("v").doubles.map(java.lang.Double.doubleToRawLongBits) ===
        vals.map(java.lang.Double.doubleToRawLongBits), s"deflate=$deflate")
      assert(back("ids").longs === ids, s"deflate=$deflate")
    }
    // 2-d, ragged edge, 103 chunks -> 2 leaves
    val grid = Array.tabulate(515 * 3)(i => i * 0.25 - 7.0)
    val img2 = Hdf5Lite.write(Seq(H5Var("g", Seq(515, 3), doubles = grid)),
      chunkRows = 5, deflate = 6)
    assert(Hdf5Lite.read(img2).head.doubles === grid)
    // > 4096 chunks: a LEVEL-2 internal node appears and roundtrips
    val big = Array.tabulate(5000)(i => i * 0.5 - 1250.0)
    val img3 = Hdf5Lite.write(Seq(H5Var("x", Seq(5000), doubles = big)), chunkRows = 1)
    assert(Hdf5Lite.read(img3).head.doubles === big)
    // structural: a node with level byte 2 exists (sig TREE, type 1)
    val hasL2 = (0 until img3.length - 6).exists(i =>
      img3(i) == 'T' && img3(i + 1) == 'R' && img3(i + 2) == 'E' && img3(i + 3) == 'E' &&
        img3(i + 4) == 1 && img3(i + 5) == 2)
    assert(hasL2, "expected a level-2 chunk B-tree node")
  }

  test("grouped write: datasets nest under one group, names come back path-qualified") {
    val img = Hdf5Lite.write(Seq(
      H5Var("vals", Seq(4), doubles = Array(1.0, 2.0, 3.0, 4.0)),
      H5Var("ids", Seq(4), longs = Array(9L, 8L, 7L, 6L))), group = "df")
    val back = Hdf5Lite.read(img).map(v => v.name -> v).toMap
    assert(back.keySet === Set("df/vals", "df/ids"))
    assert(back("df/vals").doubles === Array(1.0, 2.0, 3.0, 4.0))
    assert(back("df/ids").longs === Array(9L, 8L, 7L, 6L))
    // flat write stays byte-identical with the group machinery in place
    val flat = Hdf5Lite.write(Seq(H5Var("x", Seq(2), doubles = Array(1.0, 2.0))))
    assert(Hdf5Lite.read(flat).map(_.name) === Seq("x"))
  }

  test("fixed-length string datasets roundtrip (pandas axis-label dtype)") {
    val names = Array("alpha", "b", "gamma_longer", "")
    val img = Hdf5Lite.write(Seq(
      H5Var("axis0", Seq(4), strings = names),
      H5Var("v", Seq(4), doubles = Array(1.0, 2.0, 3.0, 4.0))))
    val back = Hdf5Lite.read(img).map(v => v.name -> v).toMap
    assert(back("axis0").strings === names)
    assert(back("v").doubles === Array(1.0, 2.0, 3.0, 4.0))
  }

  test("pandas-HDFStore-fixed roundtrip: mixed double/long frame under a key") {
    import spark.implicits._
    val df = Seq((1L, 0.5, 10.0, 100L), (2L, -1.5, 20.0, 200L), (3L, 2.25, 30.0, 300L))
      .toDF("id", "z", "w", "cnt")
    val path = Files.createTempDirectory("h5pd_").resolve("store.h5").toString
    Hdf5Table.writePandasFixed(df, path, key = "obs")
    val back = Hdf5Table.readPandasFixed(spark, path, key = "obs")
    assert(back.columns.toSeq === Seq("index", "id", "z", "w", "cnt"))
    assert(back.schema("id").dataType.typeName === "long")
    assert(back.schema("z").dataType.typeName === "double")
    val got = back.select("index", "id", "z", "w", "cnt").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getLong(4))).toSet
    assert(got === Set((0L, 1L, 0.5, 10.0, 100L), (1L, 2L, -1.5, 20.0, 200L),
      (2L, 3L, 2.25, 30.0, 300L)))
    // the granule reader refuses the pandas shape with a pointer to the right API
    val e = intercept[IllegalArgumentException](Hdf5Table.read(spark, path).collect())
    assert(e.getMessage.contains("readPandasFixed"))
    // ConfigExpr.load with `table` = the read_hdf(key) path
    val viaCfg = ConfigExpr.load(spark, ConfigExpr.DataConfig(
      source = path, table = Some("obs"),
      where = Seq(ConfigExpr.Where("z", ">", 0.0)),
      colSelect = Seq("id", "z")))
    assert(viaCfg.collect().map(r => (r.getLong(0), r.getDouble(1))).toSet ===
      Set((1L, 0.5), (3L, 2.25)))
  }

  test("multi-key store file: export/import rounds the reference store shape") {
    import spark.implicits._
    val rd = Seq((0.0, 0.0, 5L, "GraftGPR", true), (100.0, 0.0, 7L, "GraftSGPR", false))
      .toDF("x", "y", "num_obs", "model", "optimise_success")
    val preds = Seq((0.0, 0.0, 1.5), (100.0, 0.0, -0.5)).toDF("x", "y", "f_star")
    val dir = Files.createTempDirectory("h5store_").toString
    val store = new graft.io.ResultStore(spark, s"$dir/store")
    store.overwrite("run_details", rd)
    store.overwrite("preds", preds)
    val h5 = s"$dir/results.h5"
    store.exportH5(h5, Seq("run_details", "preds", "missing_table"))
    assert(Hdf5Table.pandasKeys(spark, h5) === Seq("preds", "run_details"))
    val back = Hdf5Table.readPandasFixed(spark, h5, "preds")
    assert(back.select("x", "y", "f_star").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).toSet ===
      Set((0.0, 0.0, 1.5), (100.0, 0.0, -0.5)))
    val rdBack = Hdf5Table.readPandasFixed(spark, h5, "run_details")
    assert(rdBack.schema("num_obs").dataType.typeName === "long")
    assert(rdBack.schema("model").dataType.typeName === "string")
    assert(rdBack.select("model").collect().map(_.getString(0)).sorted ===
      Array("GraftGPR", "GraftSGPR"))
    // booleans ride the long block as 0/1 (run_details' optimise flag)
    assert(rdBack.select("num_obs", "optimise_success").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet === Set((5L, 1L), (7L, 0L)))
    // import into a fresh store: every key becomes a table again
    val store2 = new graft.io.ResultStore(spark, s"$dir/store2")
    assert(store2.importH5(spark, h5) === Seq("preds", "run_details"))
    assert(store2.table("run_details").count() === 2L)
    assert(store2.table("preds").select("f_star").collect().map(_.getDouble(0)).sorted
      === Array(-0.5, 1.5))
  }

  test("missing key / format='table' stores raise errors naming the fix") {
    import spark.implicits._
    val df = Seq((1L, 0.5)).toDF("id", "z")
    val path = Files.createTempDirectory("h5key_").resolve("store.h5").toString
    Hdf5Table.writePandasFixed(df, path, key = "right")
    val e = intercept[IllegalArgumentException](
      Hdf5Table.readPandasFixed(spark, path, key = "wrong"))
    assert(e.getMessage.contains("no dataset 'wrong/axis0'") &&
      e.getMessage.contains("right/axis0"))
  }

  test("attributes roundtrip on datasets and groups (string / long / double / pickled bytes)") {
    import Hdf5Lite.H5Attr
    val img = Hdf5Lite.writeKeys(
      Seq("k" -> Seq(H5Var("v", Seq(2), doubles = Array(1.0, 2.0),
        attrs = Seq(H5Attr.str("CLASS", "ARRAY"), H5Attr.long("NROWS", 2L),
          H5Attr(name = "scale", doublesVal = Array(0.5, 2.5), scalar = false))))),
      groupAttrs = Map(
        "k" -> Seq(H5Attr.str("pandas_type", "frame_table"),
          H5Attr.bytes("data_columns", PickleLite.pickle(List("a", "b"))))))
    val (reads, gattrs) = Hdf5Lite.readAll(img)
    val v = reads.find(_.name == "k/v").get
    assert(v.doubles.toSeq === Seq(1.0, 2.0))
    assert(v.attr("CLASS").get.stringVal === "ARRAY")
    assert(v.attr("NROWS").get.longVal === 2L)
    assert(v.attr("scale").get.doublesVal.toSeq === Seq(0.5, 2.5))
    assert(gattrs("k").find(_.name == "pandas_type").get.stringVal === "frame_table")
    val dc = gattrs("k").find(_.name == "data_columns").get.bytesVal
    assert(PickleLite.unpickle(dc) === Vector("a", "b"))
  }

  test("PickleLite: protocol-2 roundtrip of pandas storer metadata shapes") {
    val cases: Seq[Any] = Seq(
      Vector("a", "bb", "ccc"),
      Vector.empty[String],
      Vector((1L, Vector("x", "y"))),
      Vector((0L, "index")),
      None, true, 300L, 7L, "solo")
    for (c <- cases) {
      val got = PickleLite.unpickle(PickleLite.pickle(c))
      val want = c match { case null | None => None case v => v }
      assert(got === want, s"case $c")
    }
  }

  test("PickleLite: decodes protocol-0 list-of-strings (legacy PyTables attrs)") {
    // hand-written protocol-0 pickle of ['a', 'bb'] per public pickletools
    val p0 = "(lp0\nS'a'\np1\naS'bb'\np2\na.".getBytes("US-ASCII")
    assert(PickleLite.unpickle(p0) === Vector("a", "bb"))
  }

  test("pandas-table (format='table') roundtrip: mixed double/long/string/bool frame") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.5, "alpha", true),
      (2L, -2.25, "b", false),
      (3L, Double.NaN, "ccc", true)
    ).toDF("id", "z", "tag", "ok")
    for ((chunk, defl) <- Seq((0, 0), (2, 6))) {
      val path = Files.createTempDirectory("h5t_").resolve("t.h5").toString
      Hdf5Table.writePandasTable(df, path, key = "obs", chunkRows = chunk, deflate = defl)
      val back = Hdf5Table.readPandasTable(spark, path, key = "obs")
      assert(back.columns.toSeq === Seq("index", "id", "z", "tag", "ok"))
      val got = back.orderBy("index").collect()
      assert(got.map(_.getLong(0)).toSeq === Seq(0L, 1L, 2L))
      assert(got.map(_.getLong(1)).toSeq === Seq(1L, 2L, 3L))
      assert(java.lang.Double.isNaN(got(2).getDouble(2)) && got(1).getDouble(2) === -2.25)
      assert(got.map(_.getString(3)).toSeq === Seq("alpha", "b", "ccc"))
      assert(got.map(_.getLong(4)).toSeq === Seq(1L, 0L, 1L), s"bools as 0/1 (chunk=$chunk)")
    }
  }

  test("pandas-table where: chunk-wise pruning matches full-read + filter") {
    import spark.implicits._
    // 64 sorted rows in chunks of 8: a selective range predicate touches
    // few chunks; an unsorted column predicate still returns exact rows
    val df = (0 until 64).map(i => (i.toLong, i * 0.5, (i * 37 % 64).toLong))
      .toDF("id", "z", "scattered")
    val path = Files.createTempDirectory("h5t_").resolve("w.h5").toString
    Hdf5Table.writePandasTable(df, path, key = "obs", chunkRows = 8, deflate = 1)

    val stats = new Hdf5Table.WhereStats
    val got = Hdf5Table.readPandasTableWhere(spark, path, key = "obs",
      where = Seq(Hdf5Table.TableWhere("z", ">=", 10.0), Hdf5Table.TableWhere("z", "<", 14.0)),
      stats = stats)
    val full = Hdf5Table.readPandasTable(spark, path, key = "obs")
      .filter(col("z") >= 10.0 && col("z") < 14.0)
    assert(got.orderBy("index").collect().toSeq === full.orderBy("index").collect().toSeq)
    assert(stats.chunksTotal === 8)
    // rows 20..27 span exactly two 8-row chunks
    assert(stats.chunksMaterialized === 2, s"materialized ${stats.chunksMaterialized} of 8")

    // equality on a long column + string-free AND combine
    val s2 = new Hdf5Table.WhereStats
    val got2 = Hdf5Table.readPandasTableWhere(spark, path, key = "obs",
      where = Seq(Hdf5Table.TableWhere("scattered", "==", 0L)), stats = s2)
    assert(got2.select("id").collect().map(_.getLong(0)).sorted.toSeq === Seq(0L))
    assert(s2.chunksMaterialized === 1)

    // where column absent -> loud error
    val e = intercept[IllegalArgumentException] {
      Hdf5Table.readPandasTableWhere(spark, path, key = "obs",
        where = Seq(Hdf5Table.TableWhere("nope", ">", 1.0))).count()
    }
    assert(e.getMessage.contains("where column"))
  }

  test("pandas-table structural goldens: compound members, FIELD names, storer attrs") {
    import spark.implicits._
    val df = Seq((10L, 1.5, "xyz")).toDF("id", "z", "tag")
    val path = Files.createTempDirectory("h5t_").resolve("g.h5").toString
    Hdf5Table.writePandasTable(df, path, key = "df", chunkRows = 8, deflate = 1)
    val bytes = Files.readAllBytes(Paths.get(path))
    val (reads, gattrs) = Hdf5Lite.readAll(bytes)
    val t = reads.find(_.name == "df/table").get
    assert(t.isCompound)
    // members: index@0 then schema order with packed offsets
    assert(t.members.map(m => (m.name, m.offset, m.cls)) === Seq(
      ("index", 0, 0), ("id", 8, 0), ("z", 16, 1), ("tag", 24, 3)))
    assert(t.members.last.size === 3, "string member width = max byte length")
    assert(t.attr("CLASS").get.stringVal === "TABLE")
    assert(t.attr("NROWS").get.longVal === 1L)
    assert(t.attr("FIELD_0_NAME").get.stringVal === "index")
    assert(t.attr("FIELD_2_NAME").get.stringVal === "z")
    val ga = gattrs("df")
    assert(ga.find(_.name == "pandas_type").get.stringVal === "frame_table")
    assert(ga.find(_.name == "table_type").get.stringVal === "appendable_frame")
    assert(PickleLite.unpickle(ga.find(_.name == "data_columns").get.bytesVal) ===
      Vector("id", "z", "tag"))
    assert(PickleLite.unpickle(ga.find(_.name == "non_index_axes").get.bytesVal) ===
      Vector((1L, Vector("id", "z", "tag"))))
  }

  test("pandas-table data_columns=false: values_block ARRAY members expand via pickled kind attrs") {
    import spark.implicits._
    val df = Seq(
      (1L, 0.5, 2.5, "aa", true),
      (2L, -1.5, 3.5, "bbb", false)
    ).toDF("id", "z", "w", "tag", "ok")
    val path = Files.createTempDirectory("h5b_").resolve("b.h5").toString
    Hdf5Table.writePandasTable(df, path, key = "df", chunkRows = 4, deflate = 3,
      dataColumns = false)
    // structural: blocks not per-column members
    val t = Hdf5Lite.readAll(Files.readAllBytes(Paths.get(path)))._1
      .find(_.name == "df/table").get
    assert(t.members.map(m => (m.name, m.arity)) === Seq(
      ("index", 1), ("values_block_0", 2), ("values_block_1", 2), ("values_block_2", 1)))
    assert(PickleLite.unpickle(t.attr("values_block_0_kind").get.bytesVal) === Vector("z", "w"))
    assert(PickleLite.unpickle(t.attr("values_block_1_kind").get.bytesVal) ===
      Vector("id", "ok"), "long block carries id + bool")
    // roundtrip: columns come back named from the kind attrs
    val back = Hdf5Table.readPandasTable(spark, path, key = "df")
    assert(back.columns.toSeq === Seq("index", "z", "w", "id", "ok", "tag"))
    val got = back.orderBy("index").collect()
    assert(got.map(_.getDouble(1)).toSeq === Seq(0.5, -1.5))
    assert(got.map(_.getDouble(2)).toSeq === Seq(2.5, 3.5))
    assert(got.map(_.getLong(3)).toSeq === Seq(1L, 2L))
    assert(got.map(_.getLong(4)).toSeq === Seq(1L, 0L))
    assert(got.map(_.getString(5)).toSeq === Seq("aa", "bbb"))
  }

  test("multi-key format='table' store: exportH5(table) writes the reference's own layout; importH5 reads it back") {
    import spark.implicits._
    val rd = Seq((0.0, 0.0, 5L, "GraftGPR"), (100.0, 0.0, 7L, "GraftSGPR"))
      .toDF("x", "y", "num_obs", "model")
    val preds = Seq((0.0, 0.0, 1.5), (100.0, 0.0, -0.5)).toDF("x", "y", "f_star")
    val dir = Files.createTempDirectory("h5tk_").toString
    val store = new graft.io.ResultStore(spark, s"$dir/store")
    store.overwrite("run_details", rd)
    store.overwrite("preds", preds)
    val h5 = s"$dir/results_table.h5"
    store.exportH5(h5, Seq("run_details", "preds"), format = "table")
    // both keys discoverable; each group is a compound key/table dataset
    assert(Hdf5Table.pandasKeys(spark, h5) === Seq("preds", "run_details"))
    val (reads, gattrs) = Hdf5Lite.readAll(Files.readAllBytes(Paths.get(h5)))
    assert(reads.count(r => r.name.endsWith("/table") && r.isCompound) === 2)
    assert(gattrs("preds").find(_.name == "pandas_type").get.stringVal === "frame_table")
    // import round-trips both frames through the shape dispatch
    val store2 = new graft.io.ResultStore(spark, s"$dir/store2")
    assert(store2.importH5(spark, h5) === Seq("preds", "run_details"))
    assert(store2.table("preds").select("x", "y", "f_star").collect()
      .map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2))).toSet ===
      Set((0.0, 0.0, 1.5), (100.0, 0.0, -0.5)))
    assert(store2.table("run_details").select("model").collect().map(_.getString(0)).sorted ===
      Array("GraftGPR", "GraftSGPR"))
  }

  test("readPandasKey dispatches fixed vs table stores; ConfigExpr.load reads both") {
    import spark.implicits._
    val df = Seq((1L, 0.5), (2L, 1.5)).toDF("id", "z")
    val fixedPath = Files.createTempDirectory("h5k_").resolve("f.h5").toString
    val tablePath = Files.createTempDirectory("h5k_").resolve("t.h5").toString
    Hdf5Table.writePandasFixed(df, fixedPath, key = "df")
    Hdf5Table.writePandasTable(df, tablePath, key = "df")
    for (p <- Seq(fixedPath, tablePath)) {
      val got = Hdf5Table.readPandasKey(spark, p, "df")
        .select("id", "z").orderBy("id").collect().map(r => (r.getLong(0), r.getDouble(1)))
      assert(got.toSeq === Seq((1L, 0.5), (2L, 1.5)), p)
      val viaConfig = ConfigExpr.load(spark, ConfigExpr.DataConfig(
        source = p, table = Some("df")))
      assert(viaConfig.select("id", "z").orderBy("id").collect()
        .map(r => (r.getLong(0), r.getDouble(1))).toSeq === Seq((1L, 0.5), (2L, 1.5)), p)
    }
    // fixed reader on a table store points at the right API
    val e = intercept[IllegalArgumentException](
      Hdf5Table.readPandasTable(spark, fixedPath, key = "df"))
    assert(e.getMessage.contains("readPandasFixed"))
  }

  test("fixed-format stores now carry the pandas BlockManagerFixed attribute set") {
    import spark.implicits._
    val df = Seq((1L, 0.5)).toDF("id", "z")
    val path = Files.createTempDirectory("h5a_").resolve("f.h5").toString
    Hdf5Table.writePandasFixed(df, path, key = "df")
    val (reads, gattrs) = Hdf5Lite.readAll(Files.readAllBytes(Paths.get(path)))
    val ga = gattrs("df")
    assert(ga.find(_.name == "pandas_type").get.stringVal === "frame")
    assert(ga.find(_.name == "nblocks").get.longVal === 2L)
    assert(ga.find(_.name == "axis0_variety").get.stringVal === "regular")
    val axis0 = reads.find(_.name == "df/axis0").get
    assert(axis0.attr("kind").get.stringVal === "string")
    assert(axis0.attr("CLASS").get.stringVal === "ARRAY")
    val blk = reads.find(_.name == "df/block0_values").get
    assert(blk.attr("transposed").get.longVal === 1L)
  }

  test("reader follows object-header continuation blocks (attribute-heavy real files)") {
    val vals = Array(1.5, -2.5, 3.25)
    val img = Hdf5Lite.write(Seq(H5Var("v", Seq(3), doubles = vals)))
    // dataset OH position for one var 'v': superblock 96 + root OH 40 +
    // heap (32 + 16) + btree 48 + SNOD 328
    val oh = 96 + 40 + 48 + 48 + 328
    val bb = java.nio.ByteBuffer.wrap(img).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(img(oh) === 1.toByte && bb.getShort(oh + 2) === 4.toShort, "v1 OH, 4 messages")
    assert(bb.getShort(oh + 16) === 0x0001.toShort, "dataspace first")
    assert(bb.getShort(oh + 40) === 0x0003.toShort, "datatype second")
    // surgery: move messages 2..4 (datatype 32 + fillvalue 16 + layout 32
    // = 80 bytes) into a continuation block appended at EOF, and replace
    // them with one continuation message — the layout attribute-heavy
    // h5py/PyTables writers produce when the header overflows
    val contAddr = img.length
    val img2 = java.util.Arrays.copyOf(img, img.length + 80)
    System.arraycopy(img, oh + 40, img2, contAddr, 80)
    val b2 = java.nio.ByteBuffer.wrap(img2).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b2.putShort(oh + 2, 5.toShort)       // now 5 messages incl. the continuation
    b2.putInt(oh + 8, 48)                // block 0 ends right after it
    b2.putShort(oh + 40, 0x0010.toShort) // continuation message
    b2.putShort(oh + 42, 16.toShort)
    b2.putInt(oh + 44, 0)
    b2.putLong(oh + 48, contAddr.toLong)
    b2.putLong(oh + 56, 80L)
    val back = Hdf5Lite.read(img2)
    assert(back.map(_.name) === Seq("v"))
    assert(back.head.doubles.toSeq === vals.toSeq)
  }

  test("reader rejects non-HDF5 and newer-superblock files with clear errors") {
    val notH5 = "PAR1 something".getBytes
    val e1 = intercept[IllegalArgumentException](Hdf5Lite.read(notH5))
    assert(e1.getMessage.contains("signature"))
    val img = Hdf5Lite.write(Seq(H5Var("x", Seq(1), doubles = Array(1.0))))
    img(8) = 4 // pretend a future superblock version (v2/v3 now parse)
    val e2 = intercept[IllegalArgumentException](Hdf5Lite.read(img))
    assert(e2.getMessage.contains("superblock v4"))
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

/** `libver='latest'` profile fixtures, hand-assembled byte-by-byte from
  * the public HDF5 File Format Specification (superblock v3, 'OHDR'
  * object headers, compact Link messages, v2 attributes, layout v4 chunk
  * indexes) — the container has no h5py, so these ARE the conformance
  * vectors, the same approach as NetCdfSpec's hand-built CDF-2 file.
  */
class Hdf5LatestSpec extends AnyFunSuite with SparkTestBase {
  import java.nio.{ByteBuffer, ByteOrder}

  /** little-endian image builder with positioned writes */
  private final class B(size: Int) {
    val buf: ByteBuffer = ByteBuffer.allocate(size).order(ByteOrder.LITTLE_ENDIAN)
    def at(p: Int): B = { buf.position(p); this }
    def u8(vs: Int*): B = { vs.foreach(v => buf.put(v.toByte)); this }
    def ascii(s: String): B = { s.foreach(c => buf.put(c.toByte)); this }
    def u16(v: Int): B = { buf.putShort(v.toShort); this }
    def u32(v: Int): B = { buf.putInt(v); this }
    def u64(v: Long): B = { buf.putLong(v); this }
    def f64(v: Double): B = { buf.putDouble(v); this }
    def raw(b: Array[Byte]): B = { buf.put(b); this }
    def bytes: Array[Byte] = buf.array()
  }
  private val UNDEF = -1L

  private def sigV3(b: B, rootOh: Long, eof: Long): Unit = {
    b.at(0).u8(0x89).ascii("HDF").u8('\r', '\n', 0x1a, '\n')
    b.u8(3, 8, 8, 0)          // version 3, offsets 8, lengths 8, flags
    b.u64(0L).u64(UNDEF)      // base addr, superblock extension
    b.u64(eof).u64(rootOh)    // EOF, root group OBJECT HEADER address
    b.u32(0)                  // checksum (not validated by the reader)
  }

  /** OHDR with flags 0 (1-byte chunk0 size): returns bytes consumed. */
  private def ohdr(b: B, at: Int, msgs: Seq[(Int, Array[Byte])]): Int = {
    val msgBytes = msgs.map(_._2.length + 4).sum
    require(msgBytes < 256, "test builder: 1-byte chunk0 only")
    b.at(at).ascii("OHDR").u8(2, 0).u8(msgBytes)
    msgs.foreach { case (t, body) => b.u8(t).u16(body.length).u8(0).raw(body) }
    b.u32(0) // checksum (not validated)
    7 + msgBytes + 4
  }

  private def linkMsg(name: String, ohAddr: Long): Array[Byte] = {
    val bb = new B(2 + 1 + name.length + 8)
    bb.u8(1, 0)                // version 1, flags: 1-byte name length
    bb.u8(name.length).ascii(name).u64(ohAddr)
    bb.bytes
  }

  private def dspaceV2(dims: Seq[Int]): Array[Byte] = {
    val bb = new B(4 + dims.length * 8)
    bb.u8(2, dims.length, 0, if (dims.isEmpty) 0 else 1) // ver, rank, flags, type
    dims.foreach(d => bb.u64(d.toLong))
    bb.bytes
  }

  private def dtypeF64: Array[Byte] = {
    val bb = new B(20)
    bb.u8(0x11, 0x20, 0x3f, 0).u32(8).u16(0).u16(64)
    bb.u8(52, 11, 0, 52).u32(1023)
    bb.bytes
  }

  private def attrV2Str(name: String, value: String): Array[Byte] = {
    val dt = new B(8).u8(0x13, 0, 0, 0).u32(value.length).bytes
    val ds = new B(4).u8(2, 0, 0, 0).bytes // v2 scalar dataspace
    val bb = new B(8 + name.length + 1 + dt.length + ds.length + value.length)
    bb.u8(2, 0).u16(name.length + 1).u16(dt.length).u16(ds.length)
    bb.ascii(name).u8(0).raw(dt).raw(ds).ascii(value)
    bb.bytes
  }

  private def gzip(raw: Array[Byte]): Array[Byte] = {
    val d = new java.util.zip.Deflater(6)
    d.setInput(raw); d.finish()
    val o = new java.io.ByteArrayOutputStream()
    val tmp = new Array[Byte](8192)
    while (!d.finished()) o.write(tmp, 0, d.deflate(tmp))
    d.end()
    o.toByteArray
  }

  test("superblock v3 + OHDR + compact links + v2 attribute + layout v4 contiguous") {
    val img = new B(4096)
    val rootOh = 48
    val dsOh = 128
    val dataAddr = 320L
    // layout v4 class 1 contiguous
    val layout = new B(18).u8(4, 1).u64(dataAddr).u64(24L).bytes
    sigV3(img, rootOh, 4096L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(3)),
      0x03 -> dtypeF64,
      0x08 -> layout,
      0x0C -> attrV2Str("unit", "mK")))
    img.at(dataAddr.toInt).f64(1.5).f64(-2.5).f64(3.25)

    val (reads, gattrs) = Hdf5Lite.readAll(img.bytes)
    assert(reads.map(_.name) === Seq("v"))
    assert(reads.head.doubles.toSeq === Seq(1.5, -2.5, 3.25))
    assert(reads.head.attr("unit").get.stringVal === "mK")
    assert(gattrs.contains("")) // root group attrs recorded (empty)
  }

  test("OHDR group nesting via compact links, group attrs captured") {
    val img = new B(4096)
    val rootOh = 48
    val grpOh = 128
    val dsOh = 256
    val dataAddr = 460L
    val layout = new B(18).u8(4, 1).u64(dataAddr).u64(16L).bytes
    sigV3(img, rootOh, 4096L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("g", grpOh)))
    ohdr(img, grpOh, Seq(
      0x0C -> attrV2Str("pandas_type", "frame"),
      0x06 -> linkMsg("data", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(2)),
      0x03 -> dtypeF64,
      0x08 -> layout))
    img.at(dataAddr.toInt).f64(7.0).f64(8.0)

    val (reads, gattrs) = Hdf5Lite.readAll(img.bytes)
    assert(reads.map(_.name) === Seq("g/data"))
    assert(reads.head.doubles.toSeq === Seq(7.0, 8.0))
    assert(gattrs("g").find(_.name == "pandas_type").get.stringVal === "frame")
  }

  test("layout v4 implicit chunk index reads consecutive chunks") {
    val img = new B(4096)
    val rootOh = 48
    val dsOh = 128
    val dataAddr = 300L
    // chunked class 2: flags 0, ndims 1, dim len 4, dims {2}, index 2, addr
    val layout = new B(2 + 1 + 1 + 1 + 4 + 1 + 8)
      .u8(4, 2, 0, 1, 4).u32(2).u8(2).u64(dataAddr).bytes
    sigV3(img, rootOh, 4096L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(4)),
      0x03 -> dtypeF64,
      0x08 -> layout))
    img.at(dataAddr.toInt).f64(1.0).f64(2.0).f64(3.0).f64(4.0)

    val reads = Hdf5Lite.read(img.bytes)
    assert(reads.head.doubles.toSeq === Seq(1.0, 2.0, 3.0, 4.0))
  }

  test("layout v4 fixed-array chunk index with gzip-filtered chunks (ragged edge)") {
    val img = new B(8192)
    val rootOh = 48
    val dsOh = 128
    val fahd = 400
    val fadb = 440
    // raw chunks: 4 doubles each, edge chunk zero-padded
    val c0raw = new B(32).f64(1.0).f64(2.0).f64(3.0).f64(4.0).bytes
    val c1raw = new B(32).f64(5.0).f64(6.0).f64(0.0).f64(0.0).bytes
    val c0 = gzip(c0raw); val c1 = gzip(c1raw)
    val chunk0At = 600; val chunk1At = 700
    // filter pipeline v2: deflate, 1 client value
    val filters = new B(12).u8(2, 1).u16(1).u16(1).u16(1).u32(6).bytes
    // layout v4 class 2: flags 0, ndims 1, dimlen 4, dims {4}, index 3 (+page bits), FAHD
    val layout = new B(2 + 1 + 1 + 1 + 4 + 1 + 1 + 8)
      .u8(4, 2, 0, 1, 4).u32(4).u8(3).u8(10).u64(fahd.toLong).bytes
    sigV3(img, rootOh, 8192L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(6)),
      0x03 -> dtypeF64,
      0x0B -> filters,
      0x08 -> layout))
    // FAHD: client 1 (filtered), entry size 16 (addr 8 + size 4 + mask 4)
    img.at(fahd).ascii("FAHD").u8(0, 1, 16, 10).u64(2L).u64(fadb.toLong).u32(0)
    // FADB: entries (addr, size, mask)
    img.at(fadb).ascii("FADB").u8(0, 1).u64(fahd.toLong)
      .u64(chunk0At.toLong).u32(c0.length).u32(0)
      .u64(chunk1At.toLong).u32(c1.length).u32(0)
      .u32(0)
    img.at(chunk0At).raw(c0)
    img.at(chunk1At).raw(c1)

    val reads = Hdf5Lite.read(img.bytes)
    assert(reads.head.shape === Seq(6))
    assert(reads.head.doubles.toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("layout v4 PAGED fixed-array chunk index (page bitmap + per-page checksums)") {
    val img = new B(8192)
    val rootOh = 48
    val dsOh = 128
    val fahd = 400
    val fadb = 440
    // 1-d shape 12, chunks of 2 -> 6 chunks; pageBits 1 -> pageSize 2,
    // 3 pages of (2 entries + checksum) after the bitmap + checksum
    val layout = new B(2 + 1 + 1 + 1 + 4 + 1 + 1 + 8)
      .u8(4, 2, 0, 1, 4).u32(2).u8(3).u8(1).u64(fahd.toLong).bytes
    sigV3(img, rootOh, 8192L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(12)),
      0x03 -> dtypeF64,
      0x08 -> layout))
    // FAHD: client 0 (unfiltered), entry size 8, page bits 1, 6 entries
    img.at(fahd).ascii("FAHD").u8(0, 0, 8, 1).u64(6L).u64(fadb.toLong).u32(0)
    // FADB header + bitmap (1 byte: all 3 pages allocated) + checksum,
    // then pages: [e0 e1 csum][e2 e3 csum][e4 e5 csum]
    val chunkAt = Array.tabulate(6)(i => 600 + i * 16)
    val b = img.at(fadb).ascii("FADB").u8(0, 0).u64(fahd.toLong)
      .u8(0x07).u32(0) // page bitmap + data-block checksum
    (0 until 3).foreach { p =>
      b.u64(chunkAt(2 * p).toLong).u64(chunkAt(2 * p + 1).toLong).u32(0)
    }
    (0 until 6).foreach { i =>
      img.at(chunkAt(i)).f64(i * 10.0).f64(i * 10.0 + 1)
    }
    val reads = Hdf5Lite.read(img.bytes)
    assert(reads.head.shape === Seq(12))
    assert(reads.head.doubles.toSeq === (0 until 6).flatMap(i => Seq(i * 10.0, i * 10.0 + 1)))
  }

  test("layout v4 single-chunk index, filtered") {
    val img = new B(4096)
    val rootOh = 48
    val dsOh = 128
    val raw = new B(24).f64(9.0).f64(8.0).f64(7.0).bytes
    val comp = gzip(raw)
    val chunkAt = 400
    val filters = new B(12).u8(2, 1).u16(1).u16(1).u16(1).u32(6).bytes
    // single chunk (index 1) with filter flag 0x02: size + mask before addr
    val layout = new B(2 + 1 + 1 + 1 + 4 + 1 + 8 + 4 + 8)
      .u8(4, 2, 2, 1, 4).u32(3).u8(1).u64(comp.length.toLong).u32(0)
      .u64(chunkAt.toLong).bytes
    sigV3(img, rootOh, 4096L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(3)),
      0x03 -> dtypeF64,
      0x0B -> filters,
      0x08 -> layout))
    img.at(chunkAt).raw(comp)
    assert(Hdf5Lite.read(img.bytes).head.doubles.toSeq === Seq(9.0, 8.0, 7.0))
  }

  // ---- extensible-array chunk index (resizable datasets) ----

  test("writeExtensible roundtrip: inline index-block elements only") {
    val vals = Array.tabulate(7)(i => i * 1.5)
    val img = Hdf5Lite.writeExtensible("v", vals, chunkElems = 2)
    val r = Hdf5Lite.read(img).head
    assert(r.shape === Seq(7))
    assert(r.doubles.toSeq === vals.toSeq)
  }

  test("writeExtensible roundtrip: direct data blocks (chunks past the index block)") {
    val vals = Array.tabulate(401)(i => math.sin(i.toDouble))
    val img = Hdf5Lite.writeExtensible("v", vals, chunkElems = 2) // 201 chunks: 4 inline + dblocks
    val r = Hdf5Lite.read(img).head
    assert(r.shape === Seq(401))
    assert(r.doubles.toSeq === vals.toSeq)
  }

  test("writeExtensible roundtrip: super blocks engaged (1000+ chunks)") {
    val vals = Array.tabulate(2501)(i => (i * 7 % 101).toDouble)
    val img = Hdf5Lite.writeExtensible("v", vals, chunkElems = 2) // 1251 chunks -> EASBs
    val r = Hdf5Lite.read(img).head
    assert(r.shape === Seq(2501))
    assert(r.doubles.toSeq === vals.toSeq)
    assert(new String(img.slice(0, 8), "ISO-8859-1").contains("HDF"))
  }

  test("extensible array with FILTERED client: per-chunk stored size honored") {
    // hand-built: idxElmts 2 covers both chunks inline; client 1 elements
    // are (addr 8, size 4, mask 4). minElmts/minPtrs small but unused.
    val img = new B(8192)
    val rootOh = 48
    val dsOh = 128
    val eahd = 400
    val eaib = 480
    val c0raw = new B(32).f64(1.0).f64(2.0).f64(3.0).f64(4.0).bytes
    val c1raw = new B(32).f64(5.0).f64(6.0).f64(0.0).f64(0.0).bytes
    val c0 = gzip(c0raw); val c1 = gzip(c1raw)
    val chunk0At = 600; val chunk1At = 760
    val filters = new B(12).u8(2, 1).u16(1).u16(1).u16(1).u32(6).bytes
    // layout v4 class 2, index 4 (EA): 5 param bytes then header address
    val layout = new B(2 + 1 + 1 + 1 + 4 + 1 + 5 + 8)
      .u8(4, 2, 0, 1, 4).u32(4).u8(4).u8(32, 2, 4, 4, 10).u64(eahd.toLong).bytes
    sigV3(img, rootOh, 8192L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(6)),
      0x03 -> dtypeF64,
      0x0B -> filters,
      0x08 -> layout))
    // EAHD: client 1, elem size 16, maxBits 32, idxElmts 2, minElmts 4, minPtrs 4, pageBits 10
    img.at(eahd).ascii("EAHD").u8(0, 1, 16, 32, 2, 4, 4, 10)
      .u64(0L).u64(0L).u64(0L).u64(0L).u64(2L).u64(2L)
      .u64(eaib.toLong).u32(0)
    // EAIB: 2 inline (addr,size,mask) elements, 6 direct dblk addrs, sblk addrs
    val nsblkAddrs = (2 + 32 - 2) - 4 // nsblksHdr - iblkNsblks for minElmts=4, minPtrs=4
    val b = img.at(eaib).ascii("EAIB").u8(0, 1).u64(eahd.toLong)
      .u64(chunk0At.toLong).u32(c0.length).u32(0)
      .u64(chunk1At.toLong).u32(c1.length).u32(0)
    (0 until 6 + nsblkAddrs).foreach(_ => b.u64(UNDEF))
    b.u32(0)
    img.at(chunk0At).raw(c0)
    img.at(chunk1At).raw(c1)
    val r = Hdf5Lite.read(img.bytes).head
    assert(r.shape === Seq(6))
    assert(r.doubles.toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
  }

  test("extensible array PAGED data block (per-page element runs + checksums)") {
    // idxElmts 1, minElmts 4, minPtrs 2, pageBits 1 -> pageNelmts 2: the
    // first data block holds 4 elements as 2 pages of (2 elems + csum)
    val img = new B(8192)
    val rootOh = 48
    val dsOh = 128
    val eahd = 400
    val eaib = 480
    val eadb = 560
    val layout = new B(2 + 1 + 1 + 1 + 4 + 1 + 5 + 8)
      .u8(4, 2, 0, 1, 4).u32(2).u8(4).u8(32, 1, 2, 4, 1).u64(eahd.toLong).bytes
    sigV3(img, rootOh, 8192L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(10)),
      0x03 -> dtypeF64,
      0x08 -> layout))
    // EAHD: client 0, elem size 8, maxBits 32, idxElmts 1, minElmts 4, minPtrs 2, pageBits 1
    img.at(eahd).ascii("EAHD").u8(0, 0, 8, 32, 1, 4, 2, 1)
      .u64(0L).u64(0L).u64(1L).u64(0L).u64(5L).u64(5L)
      .u64(eaib.toLong).u32(0)
    // iblkNsblks = 2*log2(2) = 2; ndblkAddrs = 2; nsblkAddrs = (2+32-2)-2 = 30
    val chunkAt = Array.tabulate(5)(i => 800 + i * 16)
    val b = img.at(eaib).ascii("EAIB").u8(0, 0).u64(eahd.toLong)
      .u64(chunkAt(0).toLong)          // 1 inline element
      .u64(eadb.toLong).u64(UNDEF)     // direct dblk addrs (sblk0 dblk, sblk1 dblk)
    (0 until 30).foreach(_ => b.u64(UNDEF))
    b.u32(0)
    // EADB paged: sig, ver, client, hdr addr, block offset (4 bytes for
    // maxBits 32), dblock checksum, then [e1 e2 csum][e3 e4 csum]
    img.at(eadb).ascii("EADB").u8(0, 0).u64(eahd.toLong)
      .u8(1, 0, 0, 0) // block offset = element index 1
      .u32(0)
      .u64(chunkAt(1).toLong).u64(chunkAt(2).toLong).u32(0)
      .u64(chunkAt(3).toLong).u64(chunkAt(4).toLong).u32(0)
    (0 until 5).foreach(i => img.at(chunkAt(i)).f64(i * 10.0).f64(i * 10.0 + 1))
    val r = Hdf5Lite.read(img.bytes).head
    assert(r.shape === Seq(10))
    assert(r.doubles.toSeq === (0 until 5).flatMap(i => Seq(i * 10.0, i * 10.0 + 1)))
  }

  // ---- version-2 B-tree chunk index (multiple unlimited dims) ----

  test("v2 B-tree chunk index, depth 0: records in the root leaf") {
    val img = new B(8192)
    val rootOh = 48
    val dsOh = 128
    val bthd = 400
    val btlf = 448
    // 2-d 4x4, chunks 2x2 -> 4 chunks; type-10 records: addr + 2 scaled offsets
    val layout = new B(2 + 1 + 1 + 1 + 8 + 1 + 6 + 8)
      .u8(4, 2, 0, 2, 4).u32(2).u32(2).u8(5).u32(512).u8(85, 40).u64(bthd.toLong).bytes
    sigV3(img, rootOh, 8192L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(4, 4)),
      0x03 -> dtypeF64,
      0x08 -> layout))
    val chunkAt = Array.tabulate(4)(i => 600 + i * 32)
    // BTHD: type 10, node size 512, record size 24, depth 0
    img.at(bthd).ascii("BTHD").u8(0, 10).u32(512).u16(24).u16(0).u8(85, 40)
      .u64(btlf.toLong).u16(4).u64(4L).u32(0)
    val b = img.at(btlf).ascii("BTLF").u8(0, 10)
    // records in chunk order (order is irrelevant to the reader)
    Seq((0, 0), (0, 1), (1, 0), (1, 1)).zipWithIndex.foreach { case ((r0, c0), i) =>
      b.u64(chunkAt(i).toLong).u64(r0.toLong).u64(c0.toLong)
    }
    b.u32(0)
    // chunk i holds doubles 100*i + {0..3}, laid out row-major within chunk
    (0 until 4).foreach(i =>
      img.at(chunkAt(i)).f64(100.0 * i).f64(100.0 * i + 1).f64(100.0 * i + 2).f64(100.0 * i + 3))
    val r = Hdf5Lite.read(img.bytes).head
    assert(r.shape === Seq(4, 4))
    // chunk (0,0) -> rows 0-1 cols 0-1, etc.
    assert(r.doubles.toSeq === Seq(
      0.0, 1.0, 100.0, 101.0,
      2.0, 3.0, 102.0, 103.0,
      200.0, 201.0, 300.0, 301.0,
      202.0, 203.0, 302.0, 303.0))
  }

  test("v2 B-tree chunk index, depth 1: internal node + two leaves, filtered records") {
    val img = new B(8192)
    val rootOh = 48
    val dsOh = 128
    val bthd = 400
    val btin = 448
    val leaf0 = 520
    val leaf1 = 640
    // 1-d shape 6, chunks of 2 -> 3 chunks, gzip filtered
    // type-11 record: addr(8) + size(szLen) + mask(4) + 1 scaled offset(8)
    // record size 24 -> szLen = 24-12-8 = 4
    val c = (0 until 3).map(i => gzip(new B(16).f64(10.0 * i).f64(10.0 * i + 1).bytes))
    val chunkAt = Array.tabulate(3)(i => 800 + i * 48)
    val filters = new B(12).u8(2, 1).u16(1).u16(1).u16(1).u32(6).bytes
    val layout = new B(2 + 1 + 1 + 1 + 4 + 1 + 6 + 8)
      .u8(4, 2, 0, 1, 4).u32(2).u8(5).u32(512).u8(85, 40).u64(bthd.toLong).bytes
    sigV3(img, rootOh, 8192L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(6)),
      0x03 -> dtypeF64,
      0x0B -> filters,
      0x08 -> layout))
    // BTHD: type 11, node size 512, record size 24, depth 1, root = BTIN with 1 record
    img.at(bthd).ascii("BTHD").u8(0, 11).u32(512).u16(24).u16(1).u8(85, 40)
      .u64(btin.toLong).u16(1).u64(3L).u32(0)
    def rec(b: B, i: Int): B =
      b.u64(chunkAt(i).toLong).u32(c(i).length).u32(0).u64(i.toLong)
    // BTIN: 1 record (chunk 1), then 2 child pointers:
    // addr(8) + nrec(1 byte: maxNrecSize for (512-10)/24=20 leaf recs)
    val bIn = img.at(btin).ascii("BTIN").u8(0, 11)
    rec(bIn, 1)
    bIn.u64(leaf0.toLong).u8(1).u64(leaf1.toLong).u8(1).u32(0)
    rec(img.at(leaf0).ascii("BTLF").u8(0, 11), 0).u32(0)
    rec(img.at(leaf1).ascii("BTLF").u8(0, 11), 2).u32(0)
    (0 until 3).foreach(i => img.at(chunkAt(i)).raw(c(i)))
    val r = Hdf5Lite.read(img.bytes).head
    assert(r.shape === Seq(6))
    assert(r.doubles.toSeq === Seq(0.0, 1.0, 10.0, 11.0, 20.0, 21.0))
  }

  test("granule column pruning: non-selected datasets are never decoded") {
    // 'junk' declares float16 — decoding it ALWAYS raises — so a read
    // that succeeds proves the pruned dataset was skipped entirely
    val img = new B(4096)
    val rootOh = 48
    val goodOh = 160
    val badOh = 280
    sigV3(img, rootOh, 4096L)
    ohdr(img, rootOh, Seq(
      0x06 -> linkMsg("vals", goodOh),
      0x06 -> linkMsg("junk", badOh)))
    ohdr(img, goodOh, Seq(
      0x01 -> dspaceV2(Seq(3)),
      0x03 -> dtypeF64,
      0x08 -> new B(2 + 8 + 8).u8(4, 1).u64(600L).u64(24L).bytes))
    val dtypeF16 = new B(20).u8(0x11, 0x20, 0x3f, 0).u32(2).u16(0).u16(16)
      .u8(10, 6, 0, 10).u32(15).bytes
    ohdr(img, badOh, Seq(
      0x01 -> dspaceV2(Seq(3)),
      0x03 -> dtypeF16,
      0x08 -> new B(2 + 8 + 8).u8(4, 1).u64(700L).u64(6L).bytes))
    img.at(600).f64(1.5).f64(2.5).f64(3.5)

    val e = intercept[IllegalArgumentException](Hdf5Lite.read(img.bytes))
    assert(e.getMessage.contains("float2"))
    assert(Hdf5Lite.read(img.bytes, _ == "vals").map(_.name) === Seq("vals"))

    val dir = java.nio.file.Files.createTempDirectory("h5prune_")
    java.nio.file.Files.write(dir.resolve("g.h5"), img.bytes)
    val pruned = Hdf5Table.read(spark, dir.resolve("g.h5").toString, Seq("vals"))
    assert(pruned.columns.toSeq === Seq("source_file", "vals"))
    assert(pruned.select("vals").collect().map(_.getDouble(0)).sorted.toSeq === Seq(1.5, 2.5, 3.5))
    // the ConfigExpr loader pushes colSelect (+ where columns) down
    val via = ConfigExpr.load(spark, ConfigExpr.DataConfig(
      source = dir.resolve("g.h5").toString,
      where = Seq(ConfigExpr.Where("vals", ">", 2.0)),
      colSelect = Seq("vals")))
    assert(via.collect().map(_.getDouble(0)).sorted.toSeq === Seq(2.5, 3.5))
  }

  test("lzf-filtered chunks (h5py filter id 32000) decode through the pipeline") {
    val img = new B(4096)
    val rootOh = 48
    val dsOh = 128
    val raw = new B(32).f64(4.0).f64(5.0).f64(6.0).f64(7.0).bytes
    val comp = LzfLite.compress(raw)
    assert(comp != null)
    val chunkAt = 500
    // filter pipeline v2: id 32000 (>= 256 -> name length present, 0 here)
    val filters = new B(10).u8(2, 1).u16(32000).u16(0).u16(1).u16(0).bytes
    val layout = new B(2 + 1 + 1 + 1 + 4 + 1 + 8 + 4 + 8)
      .u8(4, 2, 2, 1, 4).u32(4).u8(1).u64(comp.length.toLong).u32(0)
      .u64(chunkAt.toLong).bytes
    sigV3(img, rootOh, 4096L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(4)),
      0x03 -> dtypeF64,
      0x0B -> filters,
      0x08 -> layout))
    img.at(chunkAt).raw(comp)
    assert(Hdf5Lite.read(img.bytes).head.doubles.toSeq === Seq(4.0, 5.0, 6.0, 7.0))
  }

  // ---- dense (fractal-heap) link and attribute storage ----

  /** FRHP header with width 4, start block 512, max direct 4096,
    * maxHeapBits 32 (4-byte offsets), maxManaged 4096 (2-byte lengths),
    * heap ID length 7; `rows` = current rows of the root (0 = direct).
    */
  private def frhp(b: B, at: Int, rootAddr: Long, rows: Int): Unit = {
    b.at(at).ascii("FRHP").u8(0)
    b.u16(7).u16(0).u8(0)      // heap ID len, filter len, flags
    b.u32(4096)                // max managed object size
    b.u64(0L).u64(UNDEF)       // next huge id, huge btree
    b.u64(0L).u64(UNDEF)       // free space, fs manager
    b.u64(4096L).u64(4096L)    // managed space, allocated space
    b.u64(0L).u64(3L)          // iterator offset, n managed
    b.u64(0L).u64(0L)          // huge size/count
    b.u64(0L).u64(0L)          // tiny size/count
    b.u16(4)                   // table width
    b.u64(512L).u64(4096L)     // starting block size, max direct size
    b.u16(32).u16(0)           // max heap size bits, starting rows
    b.u64(rootAddr)            // root block address
    b.u16(rows)                // current rows (0 = root is direct)
    b.u32(0)                   // checksum (not validated)
  }

  /** serialized v1 Link message body (what the heap stores). */
  private def linkBody(name: String, oh: Long): Array[Byte] =
    new B(3 + name.length + 8).u8(1, 0).u8(name.length).ascii(name).u64(oh).bytes

  /** managed heap ID: type 0, 4-byte offset, 2-byte length. */
  private def heapId(b: B, off: Int, len: Int): B =
    b.u8(0).u32(off).u16(len)

  test("dense link storage: fractal heap + type-5 name index, root direct block") {
    val img = new B(8192)
    val rootOh = 48
    val heapHdr = 120
    val fhdb = 280
    val bthd = 900
    val btlf = 960
    val dsOh = Array(1200L, 1300L, 1400L)
    // three datasets behind dense links
    sigV3(img, rootOh, 8192L)
    val linkInfo = new B(2 + 8 + 8).u8(0, 0).u64(heapHdr.toLong).u64(bthd.toLong).bytes
    ohdr(img, rootOh, Seq(0x02 -> linkInfo))
    dsOh.zipWithIndex.foreach { case (oh, i) =>
      ohdr(img, oh.toInt, Seq(
        0x01 -> dspaceV2(Seq(2)),
        0x03 -> dtypeF64,
        0x08 -> new B(2 + 8 + 8).u8(4, 1).u64(2000L + i * 16).u64(16L).bytes))
      img.at(2000 + i * 16).f64(i * 10.0).f64(i * 10.0 + 1)
    }
    frhp(img, heapHdr, fhdb.toLong, rows = 0)
    // direct block: prefix 17 bytes (sig+ver+hdr addr+4-byte block offset)
    img.at(fhdb).ascii("FHDB").u8(0).u64(heapHdr.toLong).u32(0)
    val bodies = Seq(linkBody("va", dsOh(0)), linkBody("vb", dsOh(1)), linkBody("vc", dsOh(2)))
    var off = 17
    val ids = bodies.map { body =>
      img.at(fhdb + off).raw(body)
      val r = (off, body.length); off += body.length; r
    }
    // name index: BTHD type 5, record = hash(4) + heap ID(7), depth 0
    img.at(bthd).ascii("BTHD").u8(0, 5).u32(512).u16(11).u16(0).u8(85, 40)
      .u64(btlf.toLong).u16(3).u64(3L).u32(0)
    val leaf = img.at(btlf).ascii("BTLF").u8(0, 5)
    ids.foreach { case (o, l) => leaf.u32(0xabcd); heapId(leaf, o, l) }
    leaf.u32(0)

    val reads = Hdf5Lite.read(img.bytes)
    assert(reads.map(_.name) === Seq("va", "vb", "vc"))
    assert(reads.map(_.doubles.toSeq) === Seq(Seq(0.0, 1.0), Seq(10.0, 11.0), Seq(20.0, 21.0)))
  }

  test("dense attributes: indirect-root fractal heap + type-8 name index") {
    val img = new B(8192)
    val rootOh = 48
    val dsOh = 128
    val heapHdr = 300
    val fhib = 460
    val fhdb = 600
    val bthd = 1200
    val btlf = 1260
    val dataAddr = 2000L
    sigV3(img, rootOh, 8192L)
    ohdr(img, rootOh, Seq(0x06 -> linkMsg("v", dsOh)))
    val attrInfo = new B(2 + 8 + 8).u8(0, 0).u64(heapHdr.toLong).u64(bthd.toLong).bytes
    ohdr(img, dsOh, Seq(
      0x01 -> dspaceV2(Seq(2)),
      0x03 -> dtypeF64,
      0x15 -> attrInfo,
      0x08 -> new B(2 + 8 + 8).u8(4, 1).u64(dataAddr).u64(16L).bytes))
    img.at(dataAddr.toInt).f64(5.5).f64(6.5)
    // indirect root, 2 rows x width 4: entry (0,0) -> the one direct block
    frhp(img, heapHdr, fhib.toLong, rows = 2)
    val ib = img.at(fhib).ascii("FHIB").u8(0).u64(heapHdr.toLong).u32(0)
    ib.u64(fhdb.toLong)
    (1 until 8).foreach(_ => ib.u64(UNDEF))
    ib.u32(0)
    img.at(fhdb).ascii("FHDB").u8(0).u64(heapHdr.toLong).u32(0)
    val attrs = Seq(attrV2Str("units", "meters"), attrV2Str("long_name", "height"))
    var off = 17
    val ids = attrs.map { body =>
      img.at(fhdb + off).raw(body)
      val r = (off, body.length); off += body.length; r
    }
    // name index: BTHD type 8, record = heap ID(8: 7 + pad) + flags(1) +
    // corder(4) + hash(4) = 17 bytes
    img.at(bthd).ascii("BTHD").u8(0, 8).u32(512).u16(17).u16(0).u8(85, 40)
      .u64(btlf.toLong).u16(2).u64(2L).u32(0)
    val leaf = img.at(btlf).ascii("BTLF").u8(0, 8)
    ids.foreach { case (o, l) =>
      heapId(leaf, o, l).u8(0)       // 7-byte ID + pad to the record's 8
      leaf.u8(0).u32(0).u32(0xbeef)  // message flags, corder, hash
    }
    leaf.u32(0)

    val r = Hdf5Lite.read(img.bytes).head
    assert(r.doubles.toSeq === Seq(5.5, 6.5))
    assert(r.attrs.map(a => a.name -> new String(a.bytesVal, "UTF-8")).toMap ===
      Map("units" -> "meters", "long_name" -> "height"))
  }
}
