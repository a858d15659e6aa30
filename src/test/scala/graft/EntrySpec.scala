package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() must return rows; every catalog query
  * must at least plan (analysis) against sf0.001.
  */
class EntrySpec extends AnyFunSuite with SparkTestBase {

  test("entry() produces predictions (driver smoke contract)") {
    val df = SparkEntry.entry(spark)
    assert(df.columns.contains("f*"))
    assert(df.count() > 0)
  }

  test("every catalog query plans and returns a schema on sf0.001") {
    for ((name, fn) <- SparkEntry.queries) {
      val df = fn(spark, "/root/testdata/sf0.001")
      assert(df.schema.fields.nonEmpty, s"$name has empty schema")
    }
  }

  test("oracle map keys are a subset of query keys") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle entries without queries: $missing")
  }
}
