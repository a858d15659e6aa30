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
}
