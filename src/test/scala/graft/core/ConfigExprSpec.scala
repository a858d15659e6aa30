package graft.core

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class ConfigExprSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  import ConfigExpr._

  private val df = Seq(
    (1, 10.0, "a"), (2, 20.0, "b"), (3, 30.0, "a"), (4, 40.0, "c")
  ).toDF("id", "v", "g")

  test("where triples: all six comparators") {
    assert(df.filter(whereToColumn(Where("v", ">=", 20.0))).count() === 3)
    assert(df.filter(whereToColumn(Where("v", ">", 20.0))).count() === 2)
    assert(df.filter(whereToColumn(Where("v", "==", 20.0))).count() === 1)
    assert(df.filter(whereToColumn(Where("v", "!=", 20.0))).count() === 3)
    assert(df.filter(whereToColumn(Where("v", "<=", 20.0))).count() === 2)
    assert(df.filter(whereToColumn(Where("v", "<", 20.0))).count() === 1)
    intercept[IllegalArgumentException](whereToColumn(Where("v", "~", 1)))
  }

  test("combine_where AND vs OR") {
    val ws = Seq(Where("v", ">=", 20.0), Where("g", "==", "a"))
    assert(df.filter(combineWhere(ws)).count() === 1) // AND: only id=3
    assert(df.filter(combineWhere(ws, or = true)).count() === 4)
  }

  test("row_select with negate") {
    val rs = Seq(RowSelect(Seq(Where("g", "==", "a")), negate = true))
    assert(df.filter(rowSelectColumn(rs)).select("id").as[Int].collect().sorted.toSeq === Seq(2, 4))
  }

  test("config_func whitelist: operators and named functions; eval-strings rejected") {
    val out = applyColFuncs(df, Seq(
      ColFunc("v2", "*", Seq("v"), Seq(2.0)),
      ColFunc("ratio", "/", Seq("v2", "v")),
      ColFunc("r", "sqrt", Seq("v"))))
    val r = out.orderBy("id").head()
    assert(r.getDouble(3) === 20.0 && r.getDouble(4) === 2.0 && math.abs(r.getDouble(5) - math.sqrt(10)) < 1e-12)
    intercept[IllegalArgumentException] {
      applyColFuncs(df, Seq(ColFunc("bad", "lambda x: x", Seq("v"))))
    }
  }

  test("multi-output (tuple-key) col_funcs assign several columns at once") {
    // mirrors test_add_multiple_columns_from_multi_output_function
    // (reference tests/test_dataloader.py:86-103)
    val out = applyColFuncs(df, Seq(
      ColFunc(out = "", func = "divmod", colArgs = Seq("v"), args = Seq(7),
        outs = Seq("q", "r"))))
    val rows = out.orderBy("id").select("q", "r").collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(1L, 2L, 4L, 5L))
    assert(rows.map(_.getDouble(1)).toSeq === Seq(3.0, 6.0, 2.0, 5.0))
    // arity mismatch rejected like the reference's assert
    intercept[IllegalArgumentException] {
      applyColFuncs(df, Seq(ColFunc(out = "", func = "divmod", colArgs = Seq("v"),
        args = Seq(7), outs = Seq("only_one"))))
    }
    // multi-output projection pair
    val xy = applyColFuncs(
      Seq((10.0, 75.0)).toDF("lon", "lat"),
      Seq(ColFunc(out = "", func = "lon_lat_to_xy", colArgs = Seq("lon", "lat"),
        outs = Seq("x", "y")))).head()
    assert(math.abs(xy.getDouble(2) - graft.functions.Laea.fwdX(10.0, 75.0)) < 1e-12)
    assert(math.abs(xy.getDouble(3) - graft.functions.Laea.fwdY(10.0, 75.0)) < 1e-12)
  }

  test("col_kwargs resolve by declared parameter name") {
    val d2 = Seq((10.0, 75.0)).toDF("my_lon", "my_lat")
    val out = applyColFuncs(d2, Seq(
      ColFunc(out = "x", func = "laea_x",
        colKwargs = Map("lon" -> "my_lon", "lat" -> "my_lat")))).head()
    assert(math.abs(out.getDouble(2) - graft.functions.Laea.fwdX(10.0, 75.0)) < 1e-12)
    intercept[IllegalArgumentException] { // missing kwarg
      applyColFuncs(d2, Seq(ColFunc(out = "x", func = "laea_x",
        colKwargs = Map("lon" -> "my_lon"))))
    }
    intercept[IllegalArgumentException] { // function without declared params
      applyColFuncs(d2, Seq(ColFunc(out = "x", func = "sqrt",
        colKwargs = Map("x" -> "my_lon"))))
    }
  }

  test("dms_to_float parses 'deg minutes direction' strings (utils.py doctest values)") {
    val d2 = Seq("74 0.1878 N", " 140 0.1198 W").toDF("s")
    val out = applyColFuncs(d2, Seq(ColFunc(out = "v", func = "dms_to_float", colArgs = Seq("s"))))
      .select("v").as[Double].collect()
    // doctest prints rounded values (74.00313 / -140.001997); compare exact
    assert(math.abs(out(0) - (74.0 + 0.1878 / 60.0)) < 1e-12)
    assert(math.abs(out(1) - -(140.0 + 0.1198 / 60.0)) < 1e-12, s"got ${out(1)}")
  }

  test("new_column_names: positional full rename after scan") {
    val dir = Files.createTempDirectory("cfgrename_").toString
    df.write.mode("overwrite").parquet(s"$dir/t.parquet")
    val out = ConfigExpr.load(spark, DataConfig(
      source = s"$dir/t.parquet",
      newColumnNames = Some(Seq("ident", "value", "grp")),
      where = Seq(Where("value", ">=", 20.0)),
      colSelect = Seq("ident", "grp")))
    assert(out.columns.toSeq === Seq("ident", "grp"))
    assert(out.count() === 3)
  }

  test("load: suffix dispatch, where pushdown, col_funcs order, per-file source column") {
    val dir = Files.createTempDirectory("cfgload_").toString
    df.write.mode("overwrite").parquet(s"$dir/t.parquet")
    val cfg = DataConfig(
      source = s"$dir/t.parquet",
      where = Seq(Where("v", ">", 10.0)),
      colFuncs = Seq(ColFunc("v10", "*", Seq("v"), Seq(10.0))),
      rowSelect = Seq(RowSelect(Seq(Where("v10", "<=", 300.0)))), // uses the created column
      colSelect = Seq("id", "v10"))
    val got = load(spark, cfg).orderBy("id").collect().map(r => (r.getInt(0), r.getDouble(1)))
    assert(got.toSeq === Seq((2, 200.0), (3, 300.0)))
  }

  test("load csv with source column from filename") {
    val dir = Files.createTempDirectory("cfgcsv_").toString
    Seq((1, 2.0)).toDF("a", "b").write.mode("overwrite").option("header", "true").csv(s"$dir/f.csv")
    val got = load(spark, DataConfig(source = s"$dir/f.csv", sourceColumn = Some("src")))
    assert(got.columns.contains("src"))
    assert(got.select("src").head().getString(0).endsWith(".csv"))
  }

  test("datetime float-days round trip") {
    val d = Seq("2020-03-05").toDF("date")
    val out = applyColFuncs(d, Seq(
      ColFunc("t", "date_to_float_days", Seq("date")),
      ColFunc("back", "float_days_to_date", Seq("t"))))
    val r = out.head()
    assert(r.getDouble(1) === 18326.0) // reference expert CSV t value for 2020-03-05
    assert(r.getDate(2).toString === "2020-03-05")
  }

  test("cumsum needs explicit order (and optionally partition) columns") {
    import spark.implicits._
    val d3 = Seq((1, "a", 2.0), (2, "a", 3.0), (1, "b", 5.0), (2, "b", 7.0))
      .toDF("ord", "grp", "v")
    // partitioned + ordered: per-group running sums, no global window
    val got = applyColFuncs(d3, Seq(ColFunc("cs", "cumsum", Seq("v", "ord", "grp"))))
      .orderBy("grp", "ord").collect().map(_.getDouble(3)).toSeq
    assert(got === Seq(2.0, 5.0, 5.0, 12.0))
    // a value-only cumsum (the old global unpartitioned window) is rejected
    val err = intercept[IllegalArgumentException] {
      applyColFuncs(d3, Seq(ColFunc("cs", "cumsum", Seq("v")))).collect()
    }
    assert(err.getMessage.contains("single partition"))
  }
}
