package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Pure-JVM NumPy `.npy` (format 1.0/2.0) codec — the reference's legacy
  * array reader path (`DataLoader.load` on .npy, GPSat/dataloader.py:
  * 782-1007 routes legacy numpy/pickle stores). Implemented from the
  * public NEP-1 / numpy.lib.format spec: magic `\\x93NUMPY`, version,
  * little-endian header length, then a Python-literal header dict
  * `{'descr': '<f8', 'fortran_order': False, 'shape': (n,[ m,])}` padded
  * to 64 bytes, then the raw C-order array bytes.
  *
  * Scope: 0-2 dimensional `<f8 <f4 <i8 <i4 |b1` arrays, C or Fortran
  * order (Fortran reads un-transpose to row-major); pickled object
  * arrays raise naming the dtype.
  */
object NpyLite {

  private val Magic: Array[Byte] =
    Array(0x93.toByte, 'N'.toByte, 'U'.toByte, 'M'.toByte, 'P'.toByte, 'Y'.toByte)

  final case class Npy(shape: Seq[Int], doubles: Array[Double] = null,
                       longs: Array[Long] = null) {
    def asDoubles: Array[Double] = if (doubles != null) doubles else longs.map(_.toDouble)
  }

  def read(bytes: Array[Byte]): Npy = {
    require(bytes.length >= 10 && bytes.take(6).sameElements(Magic),
      "not a .npy file (magic mismatch)")
    val major = bytes(6).toInt
    require(major == 1 || major == 2, s".npy format $major.x not supported")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val (headerLen, headerOff) =
      if (major == 1) ((buf.getShort(8).toInt & 0xffff), 10)
      else (buf.getInt(8), 12)
    val header = new String(bytes, headerOff, headerLen, "ISO-8859-1")
    def field(key: String): String = {
      val i = header.indexOf(s"'$key'")
      require(i >= 0, s".npy header missing '$key': $header")
      header.substring(header.indexOf(':', i) + 1)
    }
    val descr = {
      val v = field("descr").trim
      require(v.startsWith("'") || v.startsWith("\""), s"structured descr not supported: $v")
      v.substring(1, v.indexOf(v.charAt(0), 1))
    }
    val fortran = field("fortran_order").trim.startsWith("True")
    val shapeStr = field("shape")
    val shape = "\\d+".r.findAllIn(shapeStr.substring(0, shapeStr.indexOf(')'))).map(_.toInt).toSeq
    require(shape.length <= 2, s".npy rank ${shape.length} not supported (0-2d)")
    val n = shape.product
    val data = headerOff + headerLen
    // fortran_order=True (column-major storage): element (r, c) of an
    // (R, C) array lives at flat index c*R + r; map reads back to C order
    val idx: Int => Int =
      if (!fortran || shape.length < 2) identity
      else { val Seq(rr, cc) = shape; i => (i % cc) * rr + i / cc }
    descr match {
      case "<f8" | "=f8" | "f8" =>
        Npy(shape, doubles = Array.tabulate(n)(i => buf.getDouble(data + idx(i) * 8)))
      case "<f4" | "=f4" | "f4" =>
        Npy(shape, doubles = Array.tabulate(n)(i => buf.getFloat(data + idx(i) * 4).toDouble))
      case "<i8" | "=i8" | "i8" =>
        Npy(shape, longs = Array.tabulate(n)(i => buf.getLong(data + idx(i) * 8)))
      case "<i4" | "=i4" | "i4" =>
        Npy(shape, longs = Array.tabulate(n)(i => buf.getInt(data + idx(i) * 4).toLong))
      case "|b1" =>
        Npy(shape, longs = Array.tabulate(n)(i => (bytes(data + idx(i)) & 0x1).toLong))
      case d => throw new IllegalArgumentException(
        s".npy dtype '$d' not supported (<f8/<f4/<i8/<i4/|b1; '|O' means a " +
          "pickled object array — re-export numerically)")
    }
  }

  /** Serialize one array as .npy format 1.0 (doubles XOR longs). */
  def write(shape: Seq[Int], doubles: Array[Double] = null,
            longs: Array[Long] = null): Array[Byte] = {
    require((doubles != null) ^ (longs != null), "exactly one of doubles/longs")
    val n = shape.product
    require(n == (if (doubles != null) doubles.length else longs.length), "shape != data")
    val descr = if (doubles != null) "<f8" else "<i8"
    val shapeTxt = shape match {
      case Seq(a) => s"($a,)"
      case s => s.mkString("(", ", ", ")")
    }
    val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shapeTxt, }"
    val headerLen = {
      val raw = 10 + dict.length + 1 // magic+ver+len + dict + newline
      ((raw + 63) / 64) * 64 - 10    // pad total preamble to 64-multiple
    }
    // loud errors instead of Int overflow / u16 wrap for out-of-scope sizes
    require(headerLen <= 0xFFFF, s".npy header of $headerLen bytes exceeds the format-1.0 u16 limit")
    require(n <= (Int.MaxValue - 10 - headerLen) / 8,
      s".npy write of $n elements exceeds the 2 GB single-buffer limit")
    val out = ByteBuffer.allocate(10 + headerLen + n * 8).order(ByteOrder.LITTLE_ENDIAN)
    out.put(Magic).put(1.toByte).put(0.toByte)
    out.putShort(headerLen.toShort)
    out.put(dict.getBytes("ISO-8859-1"))
    while (out.position() < 10 + headerLen - 1) out.put(' '.toByte)
    out.put('\n'.toByte)
    if (doubles != null) doubles.foreach(out.putDouble) else longs.foreach(out.putLong)
    out.array()
  }
}
