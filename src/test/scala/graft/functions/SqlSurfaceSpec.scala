package graft.functions

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** The SQL surface of the custom expressions: `registerAll` exposes every
  * kernel as a temp function, so plain `spark.sql(...)` queries (the BI /
  * ad-hoc path) can use the engine's primitives without the Scala API.
  */
class SqlSurfaceSpec extends AnyFunSuite with SparkTestBase {

  test("cell_encode / cell_parent / laea round-trip through spark.sql") {
    val r = spark.sql(
      """SELECT
        |  cell_encode(150000.0D, -250000.0D, 100000.0D, -800000.0D, -800000.0D) AS cell,
        |  cell_parent(cell_encode(150000.0D, -250000.0D, 100000.0D, -800000.0D, -800000.0D), 2) AS parent,
        |  laea_lon(laea_x(10.0D, 75.0D), laea_y(10.0D, 75.0D)) AS lon,
        |  laea_lat(laea_x(10.0D, 75.0D), laea_y(10.0D, 75.0D)) AS lat
        |""".stripMargin).head()
    assert(r.getLong(0) === Cells.encode(150000.0, -250000.0, 100000.0, -800000.0, -800000.0))
    assert(r.getLong(1) === Cells.parent(r.getLong(0), 2))
    assert(math.abs(r.getDouble(2) - 10.0) < 1e-9)
    assert(math.abs(r.getDouble(3) - 75.0) < 1e-9)
  }

  test("text kernels through spark.sql: simhash64 / hamming64 / minhash_sig / winnow") {
    val r = spark.sql(
      """SELECT
        |  hamming64(simhash64('the quick brown fox'), simhash64('the quick brown fox')) AS same,
        |  hamming64(simhash64('the quick brown fox'), simhash64('a completely different doc')) AS diff,
        |  size(minhash_sig('abcdefgh', 16, 4)) AS k,
        |  size(winnow_fingerprint('abcdefghijklmnop', 4, 3)) AS nfp
        |""".stripMargin).head()
    assert(r.getInt(0) === 0)
    assert(r.getInt(1) > 0)
    assert(r.getInt(2) === 16)
    assert(r.getInt(3) >= 1)
  }
}
