package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Column-level API over the custom Catalyst expressions, plus SQL
  * registration. `import graft.functions._` alongside
  * `org.apache.spark.sql.functions._`.
  */
package object functions {

  private def col(e: Expression): Column = ColumnBridge.column(e)
  private def expr(c: Column): Expression = ColumnBridge.expression(c)

  /** int64 tile id of the grid cell containing (x, y); reference bin
    * arithmetic floor((v - origin)/res) per axis, packed (see Cells).
    */
  def cell_encode(x: Column, y: Column, res: Double, x0: Double = 0.0, y0: Double = 0.0): Column =
    col(CellEncode(expr(x), expr(y), res, x0, y0))

  /** array of the 9 cell ids in the 3x3 neighborhood of (x, y)'s cell. */
  def cell_neighbors(x: Column, y: Column, res: Double, x0: Double = 0.0, y0: Double = 0.0): Column =
    col(CellNeighbors(expr(x), expr(y), res, x0, y0))

  /** coarser H3-style prefix of a cell id (axis indices >> level). */
  def cell_parent(cell: Column, level: Int): Column = col(CellParent(expr(cell), level))

  /** WGS84 lon/lat (deg) -> EASE2 meters (LAEA lat_0=90, lon_0=0). */
  def laea_x(lon: Column, lat: Column): Column = col(LaeaX(expr(lon), expr(lat)))
  def laea_y(lon: Column, lat: Column): Column = col(LaeaY(expr(lon), expr(lat)))

  /** EASE2 meters -> WGS84 lon/lat (deg). */
  def laea_lon(x: Column, y: Column): Column = col(LaeaLon(expr(x), expr(y)))
  def laea_lat(x: Column, y: Column): Column = col(LaeaLat(expr(x), expr(y)))

  /** constraint bijectors (softplus / scaled sigmoid) as columns. */
  def softplus_fwd(c: Column, shift: Double = 0.0): Column =
    col(BijectorExpr(expr(c), gp.Bijectors.Softplus(shift), inverse = false))
  def softplus_inv(c: Column, shift: Double = 0.0): Column =
    col(BijectorExpr(expr(c), gp.Bijectors.Softplus(shift), inverse = true))
  def sigmoid_fwd(c: Column, low: Double, high: Double): Column =
    col(BijectorExpr(expr(c), gp.Bijectors.SigmoidScaled(low, high), inverse = false))
  def sigmoid_inv(c: Column, low: Double, high: Double): Column =
    col(BijectorExpr(expr(c), gp.Bijectors.SigmoidScaled(low, high), inverse = true))

  /** ray-cast point-in-polygon; rings are flat [lon,lat,...] arrays. */
  def point_in_polygon(lon: Column, lat: Column, rings: Array[Array[Double]]): Column =
    col(PointInPolygon(expr(lon), expr(lat), rings))

  /** MinHash signature (k seeds, char shingles) of a string column. */
  def minhash_sig(c: Column, k: Int = 64, shingle: Int = 5): Column =
    col(MinHashSig(expr(c), k, shingle))

  /** 64-bit SimHash over whitespace tokens. */
  def simhash64(c: Column): Column = col(SimHash64(expr(c)))

  /** Hamming distance between two int64 signatures. */
  def hamming64(a: Column, b: Column): Column = col(Hamming64(expr(a), expr(b)))

  /** random-hyperplane LSH sign buckets (one int64 per plane group). */
  def hyperplane_lsh(vec: Column, planes: Array[Array[Double]], planesPerGroup: Int): Column =
    col(HyperplaneLsh(expr(vec), planes, planesPerGroup))

  /** winnowing fingerprints (k-gram size, window). */
  def winnow_fingerprint(c: Column, k: Int = 8, window: Int = 4): Column =
    col(WinnowFingerprint(expr(c), k, window))

  private def litD(e: Expression, name: String): Double = e match {
    case l: Literal => l.value match {
      case n: Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case other => throw new IllegalArgumentException(s"$name must be numeric literal, got $other")
    }
    case other => throw new IllegalArgumentException(s"$name must be a literal, got $other")
  }
  private def litI(e: Expression, name: String): Int = litD(e, name).toInt

  /** Register all custom expressions for SQL use (temp functions). */
  def registerAll(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("cell_encode", es => es match {
      case Seq(x, y, r) => CellEncode(x, y, litD(r, "res"), 0.0, 0.0)
      case Seq(x, y, r, x0, y0) => CellEncode(x, y, litD(r, "res"), litD(x0, "x0"), litD(y0, "y0"))
      case _ => throw new IllegalArgumentException("cell_encode(x, y, res[, x0, y0])")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("cell_neighbors", es => es match {
      case Seq(x, y, r) => CellNeighbors(x, y, litD(r, "res"), 0.0, 0.0)
      case Seq(x, y, r, x0, y0) => CellNeighbors(x, y, litD(r, "res"), litD(x0, "x0"), litD(y0, "y0"))
      case _ => throw new IllegalArgumentException("cell_neighbors(x, y, res[, x0, y0])")
    }, "scala_udf")
    reg.createOrReplaceTempFunction("cell_parent",
      es => CellParent(es.head, litI(es(1), "level")), "scala_udf")
    reg.createOrReplaceTempFunction("laea_x", es => LaeaX(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("laea_y", es => LaeaY(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("laea_lon", es => LaeaLon(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("laea_lat", es => LaeaLat(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("simhash64", es => SimHash64(es.head), "scala_udf")
    reg.createOrReplaceTempFunction("hamming64", es => Hamming64(es.head, es(1)), "scala_udf")
    reg.createOrReplaceTempFunction("minhash_sig",
      es => MinHashSig(es.head, litI(es(1), "k"), litI(es(2), "shingle")), "scala_udf")
    reg.createOrReplaceTempFunction("winnow_fingerprint",
      es => WinnowFingerprint(es.head, litI(es(1), "k"), litI(es(2), "window")), "scala_udf")
  }
}
