package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal pure-JVM codec for the classic NetCDF-3 on-disk format (CDF-1 /
  * CDF-2, the public format spec in the NetCDF User's Guide appendix) —
  * enough to ingest and emit the gridded granules real GPSat users feed
  * through xarray (reference `DataLoader.load` netcdf branch,
  * GPSat/dataloader.py:1124-1158, and the gridded netCDF sink,
  * dataloader.py:775-780). No third-party dependency; big-endian,
  * 4-byte-aligned, non-record variables (satellite grid granules are
  * fixed-shape; the unlimited/record dimension is parsed but not required).
  *
  * Supported nc_types: NC_BYTE(1), NC_CHAR(2), NC_SHORT(3), NC_INT(4),
  * NC_FLOAT(5), NC_DOUBLE(6).
  */
object NetCdf3 {

  final case class NcDim(name: String, length: Int)
  final case class NcVar(name: String, dimIds: Seq[Int], ncType: Int,
                         attrs: Map[String, Any], vsize: Long, begin: Long)
  final case class NcFile(dims: Seq[NcDim], gattrs: Map[String, Any],
                          vars: Seq[NcVar], bytes: Array[Byte]) {
    def variable(name: String): NcVar =
      vars.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"variable '$name' not in ${vars.map(_.name)}"))
    def shape(name: String): Seq[Int] = variable(name).dimIds.map(dims(_).length)

    /** Read a whole non-record variable as doubles (row-major / C order). */
    def readDoubles(name: String): Array[Double] = {
      val v = variable(name)
      val n = shape(name).foldLeft(1L)(_ * _).toInt
      decodeDoubles(v.ncType, n, bytes, v.begin.toInt, v.vsize.toInt)
    }
  }

  /** Decode `n` values of `ncType` from `raw[off, off+len)` (big-endian,
    * the on-disk layout) — shared by [[NcFile.readDoubles]] and ranged
    * readers that fetch a variable's byte extent without the whole file.
    */
  def decodeDoubles(ncType: Int, n: Int, raw: Array[Byte], off: Int, len: Int): Array[Double] = {
    val buf = ByteBuffer.wrap(raw, off, len).order(ByteOrder.BIG_ENDIAN)
    val out = new Array[Double](n)
    var i = 0
    ncType match {
      case 1 => while (i < n) { out(i) = buf.get().toDouble; i += 1 }
      case 3 => while (i < n) { out(i) = buf.getShort().toDouble; i += 1 }
      case 4 => while (i < n) { out(i) = buf.getInt().toDouble; i += 1 }
      case 5 => while (i < n) { out(i) = buf.getFloat().toDouble; i += 1 }
      case 6 => while (i < n) { out(i) = buf.getDouble(); i += 1 }
      case t => throw new IllegalArgumentException(s"nc_type $t not numeric")
    }
    out
  }

  private val TagDim = 0x0A
  private val TagVar = 0x0B
  private val TagAtt = 0x0C

  // ------------------------------------------------------------------ read

  def parse(bytes: Array[Byte]): NcFile = {
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    require(buf.get() == 'C' && buf.get() == 'D' && buf.get() == 'F', "not a NetCDF classic file")
    val version = buf.get()
    require(version == 1 || version == 2, s"unsupported CDF version $version (HDF5-backed NetCDF-4 not supported)")
    buf.getInt() // numrecs (or STREAMING); record vars not materialised here

    def name(): String = {
      val len = buf.getInt()
      val b = new Array[Byte](len)
      buf.get(b)
      skipPad(buf, len)
      new String(b, StandardCharsets.UTF_8)
    }
    def tagged(expected: Int): Int = {
      val tag = buf.getInt()
      val n = buf.getInt()
      require(tag == expected || (tag == 0 && n == 0), s"bad tag $tag (expected $expected)")
      n
    }
    def attList(): Map[String, Any] = {
      val n = tagged(TagAtt)
      (0 until n).map { _ =>
        val nm = name()
        val t = buf.getInt()
        val ne = buf.getInt()
        val v: Any = t match {
          case 2 =>
            val b = new Array[Byte](ne); buf.get(b); skipPad(buf, ne)
            new String(b, StandardCharsets.UTF_8)
          case 1 => val a = Array.fill(ne)(buf.get()); skipPad(buf, ne); a.toSeq
          case 3 => val a = Array.fill(ne)(buf.getShort()); skipPad(buf, 2 * ne); a.toSeq
          case 4 => Array.fill(ne)(buf.getInt()).toSeq
          case 5 => Array.fill(ne)(buf.getFloat()).toSeq
          case 6 => Array.fill(ne)(buf.getDouble()).toSeq
          case o => throw new IllegalArgumentException(s"attr nc_type $o")
        }
        nm -> v
      }.toMap
    }

    val nDims = tagged(TagDim)
    val dims = (0 until nDims).map(_ => NcDim(name(), buf.getInt()))
    val gattrs = attList()
    val nVars = tagged(TagVar)
    val vars = (0 until nVars).map { _ =>
      val nm = name()
      val nd = buf.getInt()
      val dimIds = (0 until nd).map(_ => buf.getInt())
      val attrs = attList()
      val t = buf.getInt()
      val vsize = buf.getInt().toLong & 0xFFFFFFFFL
      val begin = if (version == 1) buf.getInt().toLong & 0xFFFFFFFFL else buf.getLong()
      NcVar(nm, dimIds, t, attrs, vsize, begin)
    }
    NcFile(dims, gattrs, vars, bytes)
  }

  private def skipPad(buf: ByteBuffer, len: Int): Unit = {
    val pad = (4 - (len % 4)) % 4
    buf.position(buf.position() + pad)
  }

  // ----------------------------------------------------------------- write

  /** One variable to write: name, dim names (outer-first / C order), and
    * double payload of product(dim lengths) values.
    */
  final case class WVar(name: String, dimNames: Seq[String], data: Array[Double],
                        attrs: Map[String, String] = Map.empty)

  /** Serialize dims + NC_DOUBLE variables as a CDF-1 classic file. */
  def write(dims: Seq[NcDim], variables: Seq[WVar],
            gattrs: Map[String, String] = Map.empty): Array[Byte] = {
    val dimIdx = dims.map(_.name).zipWithIndex.toMap
    def padded(len: Int): Int = len + ((4 - (len % 4)) % 4)
    def nameBytes(s: String): Int = 4 + padded(s.getBytes(StandardCharsets.UTF_8).length)
    def attBytes(as: Map[String, String]): Int =
      8 + as.map { case (k, v) => nameBytes(k) + 8 + padded(v.getBytes(StandardCharsets.UTF_8).length) }.sum

    // header size
    var size = 4 + 4 // magic + numrecs
    size += 8 + dims.map(d => nameBytes(d.name) + 4).sum // dim list
    size += attBytes(gattrs)
    size += 8 + variables.map(v =>
      nameBytes(v.name) + 4 + 4 * v.dimNames.length + attBytes(v.attrs) + 4 + 4 + 4).sum
    val headerSize = size

    val begins = new Array[Long](variables.length)
    var offset = headerSize.toLong
    variables.zipWithIndex.foreach { case (v, i) =>
      val n = v.dimNames.map(dn => dims(dimIdx(dn)).length.toLong).product
      require(n == v.data.length, s"${v.name}: dims give $n values, got ${v.data.length}")
      begins(i) = offset
      offset += 8L * n // doubles are already 4-aligned
    }

    val out = ByteBuffer.allocate(offset.toInt).order(ByteOrder.BIG_ENDIAN)
    out.put('C'.toByte).put('D'.toByte).put('F'.toByte).put(1.toByte)
    out.putInt(0) // numrecs
    def putName(s: String): Unit = {
      val b = s.getBytes(StandardCharsets.UTF_8)
      out.putInt(b.length); out.put(b)
      (0 until (4 - (b.length % 4)) % 4).foreach(_ => out.put(0.toByte))
    }
    def putAtts(as: Map[String, String]): Unit = {
      if (as.isEmpty) { out.putInt(0); out.putInt(0) }
      else {
        out.putInt(TagAtt); out.putInt(as.size)
        as.foreach { case (k, v) =>
          putName(k); out.putInt(2) // NC_CHAR
          val b = v.getBytes(StandardCharsets.UTF_8)
          out.putInt(b.length); out.put(b)
          (0 until (4 - (b.length % 4)) % 4).foreach(_ => out.put(0.toByte))
        }
      }
    }
    if (dims.isEmpty) { out.putInt(0); out.putInt(0) }
    else { out.putInt(TagDim); out.putInt(dims.size); dims.foreach { d => putName(d.name); out.putInt(d.length) } }
    putAtts(gattrs)
    if (variables.isEmpty) { out.putInt(0); out.putInt(0) }
    else {
      out.putInt(TagVar); out.putInt(variables.size)
      variables.zipWithIndex.foreach { case (v, i) =>
        putName(v.name)
        out.putInt(v.dimNames.length)
        v.dimNames.foreach(dn => out.putInt(dimIdx(dn)))
        putAtts(v.attrs)
        out.putInt(6) // NC_DOUBLE
        out.putInt((8L * v.data.length).toInt) // vsize
        out.putInt(begins(i).toInt)
      }
    }
    require(out.position() == headerSize, s"header accounting bug: ${out.position()} vs $headerSize")
    variables.foreach(v => v.data.foreach(out.putDouble))
    out.array()
  }
}
