package graft.functions

/** Static, codegen-callable math kernels backing the custom Catalyst
  * expressions. Pure JVM, zero Spark deps. Scala objects expose static
  * forwarders, so generated Java code can call e.g.
  * `graft.functions.Laea.fwdX(lon, lat)` directly.
  */

/** Ellipsoidal Lambert azimuthal equal-area projection, north polar aspect
  * (lat_0 = 90, WGS84) — the EASE2 grid projection of the reference
  * (GPSat/utils.py:565-663, pyproj `+proj=laea +lat_0=90 +lon_0=0
  * +ellps=WGS84`). Formulas: Snyder (1987) "Map Projections — A Working
  * Manual", pp. 187-190. Validated against the reference doctest values
  * (utils.py:598-599: fwd(-105.01621, 39.57422) = (-5254767.014984061,
  * 1409604.1043472202); utils.py:646-648: inv(1e6, 2e6) =
  * (153.434948822922, 69.86894542225777)).
  */
object Laea {
  private val A = 6378137.0
  private val F = 1.0 / 298.257223563
  private val E2 = F * (2.0 - F)
  private val E = math.sqrt(E2)
  private val Deg2Rad = math.Pi / 180.0
  private val Rad2Deg = 180.0 / math.Pi

  private def q(phi: Double): Double = {
    val s = math.sin(phi)
    (1.0 - E2) * (s / (1.0 - E2 * s * s) - (1.0 / (2.0 * E)) * math.log((1.0 - E * s) / (1.0 + E * s)))
  }

  private val Qp = q(math.Pi / 2.0)

  // authalic-latitude series coefficients (Snyder eq. 3-18)
  private val C1 = E2 / 3.0 + 31.0 * E2 * E2 / 180.0 + 517.0 * E2 * E2 * E2 / 5040.0
  private val C2 = 23.0 * E2 * E2 / 360.0 + 251.0 * E2 * E2 * E2 / 3780.0
  private val C3 = 761.0 * E2 * E2 * E2 / 45360.0

  /** WGS84 lon/lat (degrees) -> EASE2 x (meters), lon_0 = 0. */
  def fwdX(lon: Double, lat: Double): Double = {
    val rho = A * math.sqrt(Qp - q(lat * Deg2Rad))
    rho * math.sin(lon * Deg2Rad)
  }

  /** WGS84 lon/lat (degrees) -> EASE2 y (meters), lon_0 = 0. */
  def fwdY(lon: Double, lat: Double): Double = {
    val rho = A * math.sqrt(Qp - q(lat * Deg2Rad))
    -rho * math.cos(lon * Deg2Rad)
  }

  /** EASE2 x/y (meters) -> WGS84 lon (degrees). */
  def invLon(x: Double, y: Double): Double = math.atan2(x, -y) * Rad2Deg

  /** EASE2 x/y (meters) -> WGS84 lat (degrees). Authalic series start plus
    * two Snyder (1987) eq. 3-16 iterations => machine-precision agreement
    * with the reference's pyproj transform.
    */
  def invLat(x: Double, y: Double): Double = {
    val rho = math.hypot(x, y)
    val qq = Qp - (rho / A) * (rho / A)
    val ratio = math.max(-1.0, math.min(1.0, qq / Qp))
    val beta = math.asin(ratio)
    var phi = beta + C1 * math.sin(2.0 * beta) + C2 * math.sin(4.0 * beta) + C3 * math.sin(6.0 * beta)
    var it = 0
    while (it < 2 && math.abs(phi) < math.Pi / 2.0 - 1e-12) {
      val s = math.sin(phi)
      val oneMe2s2 = 1.0 - E2 * s * s
      val delta = oneMe2s2 * oneMe2s2 / (2.0 * math.cos(phi)) *
        (qq / (1.0 - E2) - s / oneMe2s2 + (1.0 / (2.0 * E)) * math.log((1.0 - E * s) / (1.0 + E * s)))
      phi += delta
      it += 1
    }
    phi * Rad2Deg
  }
}

/** Int64 grid-cell tile id: the H3-analog cell encoding used for tile
  * assignment and for bucketing the radius spatial join. The per-axis index
  * replicates the reference's bin arithmetic floor((v - v0)/res)
  * (GPSat/dataprepper.py:337-352), packed so that ids are SQL-expressible
  * with plain arithmetic:
  *   id = (ix + 2^20) * 2^21 + (iy + 2^20)
  * A coarser "parent" prefix (per-axis index >> level) provides the
  * H3-style hierarchical prefix used for range partitioning.
  */
object Cells {
  val Offset: Long = 1L << 20
  val Stride: Long = 1L << 21

  def axisIndex(v: Double, origin: Double, res: Double): Long =
    math.floor((v - origin) / res).toLong

  def encode(x: Double, y: Double, res: Double, x0: Double, y0: Double): Long =
    (axisIndex(x, x0, res) + Offset) * Stride + (axisIndex(y, y0, res) + Offset)

  def cellX(cell: Long): Long = cell / Stride - Offset
  def cellY(cell: Long): Long = cell % Stride - Offset

  def pack(ix: Long, iy: Long): Long = (ix + Offset) * Stride + (iy + Offset)

  /** Coarser prefix: shift both axis indices right by `level` bits. */
  def parent(cell: Long, level: Int): Long =
    pack(cellX(cell) >> level, cellY(cell) >> level)

  /** The 3x3 neighborhood (including self) of the cell containing (x, y) —
    * the explode set for the cell-bucketed radius join (SURVEY.md §2.4:
    * join experts' neighbor cells to observations' cells, then refine by
    * exact distance).
    */
  def neighbors(x: Double, y: Double, res: Double, x0: Double, y0: Double): Array[Long] = {
    val ix = axisIndex(x, x0, res)
    val iy = axisIndex(y, y0, res)
    val out = new Array[Long](9)
    var k = 0
    var dx = -1
    while (dx <= 1) {
      var dy = -1
      while (dy <= 1) {
        out(k) = pack(ix + dx, iy + dy)
        k += 1
        dy += 1
      }
      dx += 1
    }
    out
  }
}

/** Ray-casting point-in-polygon over a set of rings; the Catalyst analog of
  * the reference's `globe.is_ocean(lat, lon)` prediction-grid mask
  * (examples/inline_example.py:263-266). Rings are flat [lon0, lat0, lon1,
  * lat1, ...] arrays; a point is "in" if it falls inside an odd number of
  * ring crossings of any ring (even-odd rule per ring, OR across rings).
  */
object PointInPolygonKernel {
  def contains(lon: Double, lat: Double, rings: Array[Array[Double]]): Boolean = {
    var r = 0
    while (r < rings.length) {
      if (containsRing(lon, lat, rings(r))) return true
      r += 1
    }
    false
  }

  def containsRing(lon: Double, lat: Double, ring: Array[Double]): Boolean = {
    val n = ring.length / 2
    var inside = false
    var i = 0
    var j = n - 1
    while (i < n) {
      val xi = ring(2 * i); val yi = ring(2 * i + 1)
      val xj = ring(2 * j); val yj = ring(2 * j + 1)
      if (((yi > lat) != (yj > lat)) &&
          (lon < (xj - xi) * (lat - yi) / (yj - yi) + xi)) inside = !inside
      j = i
      i += 1
    }
    inside
  }
}

/** Deterministic 64-bit hashing kernels for the text/dedup operators:
  * splitmix64 mixing, char-shingle MinHash signatures, token SimHash,
  * and winnowing fingerprints. All pure functions of their inputs — safe
  * for distributed, order-independent execution.
  */
object TextHash {

  /** splitmix64 finalizer — a well-mixed 64-bit permutation. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** FNV-1a 64-bit over a char range of a string. */
  def fnv1a(s: String, from: Int, until: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    while (i < until) {
      h ^= s.charAt(i).toLong
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def fnv1a(s: String): Long = fnv1a(s, 0, s.length)

  /** MinHash signature: k minima over char `shingle`-gram hashes, one per
    * seed. Shorter-than-shingle docs hash the whole string. Returns length-k
    * array; empty string gives the seed-mixed empty hash (deterministic).
    */
  def minhash(s: String, k: Int, shingle: Int): Array[Long] = {
    val sig = Array.fill(k)(Long.MaxValue)
    val n = s.length
    if (n == 0) {
      var j = 0
      while (j < k) { sig(j) = mix64(j.toLong); j += 1 }
      return sig
    }
    val last = math.max(0, n - shingle)
    var i = 0
    while (i <= last) {
      val base = fnv1a(s, i, math.min(n, i + shingle))
      var j = 0
      while (j < k) {
        val h = mix64(base ^ mix64(j.toLong))
        if (h < sig(j)) sig(j) = h
        j += 1
      }
      i += 1
    }
    sig
  }

  /** 64-bit SimHash over whitespace-delimited tokens. */
  def simhash(s: String): Long = {
    val votes = new Array[Int](64)
    var start = -1
    var i = 0
    val n = s.length
    while (i <= n) {
      val isSep = i == n || Character.isWhitespace(s.charAt(i))
      if (!isSep && start < 0) start = i
      else if (isSep && start >= 0) {
        val h = mix64(fnv1a(s, start, i))
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
        start = -1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming64(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** Winnowing document fingerprint (Schleimer et al., SIGMOD 2003):
    * k-gram rolling hashes, minimum per sliding window of `window` hashes,
    * distinct minima returned sorted. Robust to local edits.
    */
  /** k-gram rolling hashes — the hashing half of the winnow split (the
    * selection half is TextAnalysis.winnowFromHashes, the declarative
    * window-min stage the q30 oracle pins).
    */
  def rollingHashes(s: String, k: Int): Array[Long] = {
    val n = s.length
    if (n < k) return Array(mix64(fnv1a(s)))
    Array.tabulate(n - k + 1)(i => mix64(fnv1a(s, i, i + k)))
  }

  def winnow(s: String, k: Int, window: Int): Array[Long] = {
    val hs = rollingHashes(s, k)
    val m = hs.length
    if (m == 1) return hs
    if (m <= window) return Array(hs.min)
    val picked = scala.collection.mutable.SortedSet.empty[Long]
    var w = 0
    while (w + window <= m) {
      var best = Long.MaxValue
      var j = w
      while (j < w + window) { if (hs(j) < best) best = hs(j); j += 1 }
      picked += best
      w += 1
    }
    picked.toArray
  }
}
