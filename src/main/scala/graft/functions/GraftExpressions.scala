package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions (SURVEY.md §4 "custom Catalyst work actually
  * required"): cell/tile encoding, LAEA (EASE2) projection, constraint
  * bijectors, point-in-polygon, and the text-hashing kernels. All scalar,
  * null-intolerant, and codegen'd where they sit on the hot path (cell
  * encode, projection, hashing); CodegenFallback only for the small-side
  * helpers (neighbor explode runs on the expert table).
  */

private object Lit {
  /** Render a Scala Double as a Java double literal for codegen. */
  def d(v: Double): String =
    if (v.isNaN) "Double.NaN"
    else if (v == Double.PositiveInfinity) "Double.POSITIVE_INFINITY"
    else if (v == Double.NegativeInfinity) "Double.NEGATIVE_INFINITY"
    else java.lang.Double.toString(v) + "D"
}

/** Tile id of the grid cell containing (x, y): reference bin arithmetic
  * floor((v - v0)/res) per axis (GPSat/dataprepper.py:337-352), packed into
  * one int64 (see [[Cells]]).
  */
case class CellEncode(x: Expression, y: Expression, res: Double, x0: Double, y0: Double)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {
  override def left: Expression = x
  override def right: Expression = y
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_encode"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Cells.encode(a.asInstanceOf[Double], b.asInstanceOf[Double], res, x0, y0)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.Cells.encode($a, $b, ${Lit.d(res)}, ${Lit.d(x0)}, ${Lit.d(y0)})")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(x = l, y = r)
}

/** 3x3 neighbor-cell ids around (x, y) — the explode set for the
  * cell-bucketed radius join (SURVEY.md §2.4). Runs on the (small) expert
  * side, so CodegenFallback is acceptable.
  */
case class CellNeighbors(x: Expression, y: Expression, res: Double, x0: Double, y0: Double)
    extends BinaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def left: Expression = x
  override def right: Expression = y
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_neighbors"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    new GenericArrayData(Cells.neighbors(a.asInstanceOf[Double], b.asInstanceOf[Double], res, x0, y0))
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(x = l, y = r)
}

/** Coarser H3-style prefix of a cell id (per-axis index >> level), for
  * range partitioning at scale.
  */
case class CellParent(cell: Expression, level: Int)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  override def child: Expression = cell
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cell_parent"
  override protected def nullSafeEval(c: Any): Any = Cells.parent(c.asInstanceOf[Long], level)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Cells.parent($c, $level)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(cell = c)
}

/** WGS84 -> EASE2 (LAEA, lat_0=90 lon_0=0) x/y; see [[Laea]]. */
case class LaeaX(lon: Expression, lat: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {
  override def left: Expression = lon
  override def right: Expression = lat
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "laea_x"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Laea.fwdX(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Laea.fwdX($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(lon = l, lat = r)
}

case class LaeaY(lon: Expression, lat: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {
  override def left: Expression = lon
  override def right: Expression = lat
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "laea_y"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Laea.fwdY(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Laea.fwdY($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(lon = l, lat = r)
}

case class LaeaLon(x: Expression, y: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {
  override def left: Expression = x
  override def right: Expression = y
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "laea_lon"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Laea.invLon(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Laea.invLon($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(x = l, y = r)
}

case class LaeaLat(x: Expression, y: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {
  override def left: Expression = x
  override def right: Expression = y
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "laea_lat"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Laea.invLat(a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Laea.invLat($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(x = l, y = r)
}

/** Constraint bijectors as column expressions — parity transforms for
  * stored hyperparameters (GPSat/utils.py:2320-2400). Cold path.
  */
case class BijectorExpr(child: Expression, bijector: graft.gp.Bijector, inverse: Boolean)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  override def inputTypes = Seq(DoubleType)
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = if (inverse) "bijector_inv" else "bijector_fwd"
  override protected def nullSafeEval(v: Any): Any = {
    val x = v.asInstanceOf[Double]
    if (inverse) bijector.inv(x) else bijector.fwd(x)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Ray-casting point-in-polygon over broadcast rings (flat lon/lat pairs) —
  * the Catalyst analog of the reference ocean mask
  * (examples/inline_example.py:263-266).
  */
case class PointInPolygon(lon: Expression, lat: Expression, rings: Array[Array[Double]])
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {
  override def left: Expression = lon
  override def right: Expression = lat
  override def inputTypes = Seq(DoubleType, DoubleType)
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "point_in_polygon"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    PointInPolygonKernel.contains(a.asInstanceOf[Double], b.asInstanceOf[Double], rings)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ringsRef = ctx.addReferenceObj("rings", rings, "double[][]")
    defineCodeGen(ctx, ev, (a, b) =>
      s"graft.functions.PointInPolygonKernel.contains($a, $b, $ringsRef)")
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(lon = l, lat = r)
}

/** MinHash signature of a string (char-shingle, k seeds) — the per-row
  * kernel of the MinHash/LSH near-dup pipeline.
  */
case class MinHashSig(child: Expression, k: Int, shingle: Int)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextHash.minhash(v.asInstanceOf[UTF8String].toString, k, shingle))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHash.minhash($c.toString(), $k, $shingle))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** 64-bit SimHash over whitespace tokens. */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"
  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhash(v.asInstanceOf[UTF8String].toString)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextHash.simhash($c.toString())")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Hamming distance between two 64-bit signatures. */
case class Hamming64(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes with Serializable {
  override def inputTypes = Seq(LongType, LongType)
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hamming64"
  override protected def nullSafeEval(a: Any, b: Any): Any =
    TextHash.hamming64(a.asInstanceOf[Long], b.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"java.lang.Long.bitCount($a ^ $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression =
    copy(left = l, right = r)
}

/** Winnowing fingerprints (Schleimer et al. 2003) of a string. */
case class WinnowFingerprint(child: Expression, k: Int, window: Int)
    extends UnaryExpression with ImplicitCastInputTypes with Serializable {
  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnow_fingerprint"
  override protected def nullSafeEval(v: Any): Any =
    new GenericArrayData(TextHash.winnow(v.asInstanceOf[UTF8String].toString, k, window))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"new org.apache.spark.sql.catalyst.util.GenericArrayData(" +
        s"graft.functions.TextHash.winnow($c.toString(), $k, $window))")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** Sign-pattern buckets for random-hyperplane (cosine) LSH: one int64
  * bucket per plane group. Replaces the unrolled per-component column
  * arithmetic that blew past Janino's 64 KB method limit — the plane set
  * rides along as a reference object, the dot products run as a tight
  * JVM loop.
  */
case class HyperplaneLsh(child: Expression, planes: Array[Array[Double]], planesPerGroup: Int)
    extends UnaryExpression with ImplicitCastInputTypes with CodegenFallback {
  require(planes.length % planesPerGroup == 0, "planes must divide into groups")
  override def inputTypes = Seq(ArrayType(DoubleType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "hyperplane_lsh"
  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val dim = arr.numElements()
    val vec = new Array[Double](dim)
    var i = 0
    while (i < dim) { vec(i) = arr.getDouble(i); i += 1 }
    val nGroups = planes.length / planesPerGroup
    val out = new Array[Long](nGroups)
    var g = 0
    while (g < nGroups) {
      var bits = 0L
      var p = 0
      while (p < planesPerGroup) {
        val plane = planes(g * planesPerGroup + p)
        var dot = 0.0
        var j = 0
        val lim = math.min(dim, plane.length)
        while (j < lim) { dot += vec(j) * plane(j); j += 1 }
        if (dot >= 0) bits |= (1L << p)
        p += 1
      }
      out(g) = bits
      g += 1
    }
    new GenericArrayData(out)
  }
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
