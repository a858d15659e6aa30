package graft.sources

import graft.SparkTestBase
import graft.core.ConfigExpr
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

class NpySpec extends AnyFunSuite with SparkTestBase {

  test("write -> read roundtrips 1-d/2-d doubles and longs bit-exactly") {
    val d = Array(0.0, -0.0, 1.5, Double.NaN, Double.PositiveInfinity, math.Pi)
    val back = NpyLite.read(NpyLite.write(Seq(6), doubles = d))
    assert(back.shape === Seq(6))
    assert(back.doubles.map(java.lang.Double.doubleToRawLongBits) ===
      d.map(java.lang.Double.doubleToRawLongBits))
    val l = Array(Long.MinValue, -1L, 0L, 42L, Long.MaxValue, 7L)
    val back2 = NpyLite.read(NpyLite.write(Seq(2, 3), longs = l))
    assert(back2.shape === Seq(2, 3) && back2.longs === l)
  }

  test("header parse: hand-built little-endian f4/i4/b1 files per NEP-1") {
    // hand-assemble a v1.0 file with an <f4 (3,) payload
    def mk(descr: String, payload: Array[Byte], shape: String): Array[Byte] = {
      val dict = s"{'descr': '$descr', 'fortran_order': False, 'shape': $shape, }"
      val headerLen = ((10 + dict.length + 1 + 63) / 64) * 64 - 10
      val bb = java.nio.ByteBuffer.allocate(10 + headerLen + payload.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(0x93.toByte).put("NUMPY".getBytes).put(1.toByte).put(0.toByte)
      bb.putShort(headerLen.toShort)
      bb.put(dict.getBytes)
      while (bb.position() < 10 + headerLen - 1) bb.put(' '.toByte)
      bb.put('\n'.toByte)
      bb.put(payload)
      bb.array()
    }
    val f4 = java.nio.ByteBuffer.allocate(12).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putFloat(1.25f).putFloat(-2.5f).putFloat(3.75f).array()
    assert(NpyLite.read(mk("<f4", f4, "(3,)")).doubles.toSeq === Seq(1.25, -2.5, 3.75))
    val i4 = java.nio.ByteBuffer.allocate(8).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putInt(-7).putInt(9).array()
    assert(NpyLite.read(mk("<i4", i4, "(2,)")).longs.toSeq === Seq(-7L, 9L))
    assert(NpyLite.read(mk("|b1", Array[Byte](1, 0, 1), "(3,)")).longs.toSeq === Seq(1L, 0L, 1L))
  }

  test("loud errors: object dtype, wrong magic") {
    def mk(dict: String): Array[Byte] = {
      val headerLen = ((10 + dict.length + 1 + 63) / 64) * 64 - 10
      val bb = java.nio.ByteBuffer.allocate(10 + headerLen + 8)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put(0x93.toByte).put("NUMPY".getBytes).put(1.toByte).put(0.toByte)
      bb.putShort(headerLen.toShort)
      bb.put(dict.getBytes)
      while (bb.position() < 10 + headerLen - 1) bb.put(' '.toByte)
      bb.put('\n'.toByte)
      bb.array()
    }
    val e2 = intercept[IllegalArgumentException](NpyLite.read(
      mk("{'descr': '|O', 'fortran_order': False, 'shape': (1,), }")))
    assert(e2.getMessage.contains("pickled object"))
    val e3 = intercept[IllegalArgumentException](NpyLite.read("PKjunk".getBytes))
    assert(e3.getMessage.contains("magic"))
  }

  test("ConfigExpr.load dispatches .npy with renames / where / col_select") {
    val dir = Files.createTempDirectory("npy_")
    val p = dir.resolve("arr.npy")
    Files.write(p, NpyLite.write(Seq(4, 2),
      doubles = Array(1.0, 10.0, 2.0, 20.0, 3.0, 30.0, 4.0, 40.0)))
    val df = ConfigExpr.load(spark, ConfigExpr.DataConfig(
      source = p.toString,
      newColumnNames = Some(Seq("index", "a", "b")),
      where = Seq(ConfigExpr.Where("a", ">=", 2.0)),
      colSelect = Seq("a", "b")))
    assert(df.columns.toSeq === Seq("a", "b"))
    assert(df.orderBy("a").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSeq ===
      Seq((2.0, 20.0), (3.0, 30.0), (4.0, 40.0)))
  }

  test("fortran_order=True files (REAL numpy output) un-transpose to row-major") {
    import java.util.Base64
    // np.save(np.asfortranarray([[1.5,2.5,3.5],[4.5,5.5,6.5]]))
    val f8 = Base64.getDecoder.decode(
      "k05VTVBZAQB2AHsnZGVzY3InOiAnPGY4JywgJ2ZvcnRyYW5fb3JkZXInOiBUcnVlLCAnc2hhcGUnOiAoMiwgMyksIH0gICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAoAAAAAAAD4PwAAAAAAABJAAAAAAAAABEAAAAAAAAAWQAAAAAAAAAxAAAAAAAAAGkA=")
    val a = NpyLite.read(f8)
    assert(a.shape === Seq(2, 3))
    assert(a.doubles.toSeq === Seq(1.5, 2.5, 3.5, 4.5, 5.5, 6.5))
    // np.save(np.asfortranarray([[1,2],[3,4],[5,6]], int64))
    val i8 = Base64.getDecoder.decode(
      "k05VTVBZAQB2AHsnZGVzY3InOiAnPGk4JywgJ2ZvcnRyYW5fb3JkZXInOiBUcnVlLCAnc2hhcGUnOiAoMywgMiksIH0gICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgICAgIAoBAAAAAAAAAAMAAAAAAAAABQAAAAAAAAACAAAAAAAAAAQAAAAAAAAABgAAAAAAAAA=")
    val b = NpyLite.read(i8)
    assert(b.shape === Seq(3, 2))
    assert(b.longs.toSeq === Seq(1L, 2L, 3L, 4L, 5L, 6L))
  }
}