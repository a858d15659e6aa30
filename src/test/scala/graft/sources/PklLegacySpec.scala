package graft.sources

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files
import java.util.Base64

/** Conformance vectors for the numpy-pickle subset: the base64 blobs were
  * produced by REAL CPython 3.11 + numpy 1.26 (`pickle.dumps` of dicts of
  * 2-d arrays at protocols 2, 4 and 5, plus Fortran-order and
  * float32/int64 variants) — the engine's pure-JVM unpickler must decode
  * genuine numpy output, not just its own writer's.
  */
class PklLegacySpec extends AnyFunSuite with SparkTestBase {

  // {"20200301": [[1.5, nan], [2.5, 3.0]], "20200302": [[4.0, 5.5], [nan, 6.0]]}
  private val proto2 =
    "gAJ9cQAoWAgAAAAyMDIwMDMwMXEBY251bXB5LmNvcmUubXVsdGlhcnJheQpfcmVjb25zdHJ1Y3QKcQJjbnVtcHkKbmRhcnJheQpxA0sAhXEEY19jb2RlY3MKZW5jb2RlCnEFWAEAAABicQZYBgAAAGxhdGluMXEHhnEIUnEJh3EKUnELKEsBSwJLAoZxDGNudW1weQpkdHlwZQpxDVgCAAAAZjhxDomIh3EPUnEQKEsDWAEAAAA8cRFOTk5K/////0r/////SwB0cRJiiWgFWCIAAAAAAAAAAADDuD8AAAAAAADDuH8AAAAAAAAEQAAAAAAAAAhAcRNoB4ZxFFJxFXRxFmJYCAAAADIwMjAwMzAycRdoAmgDSwCFcRhoCYdxGVJxGihLAUsCSwKGcRtoEIloBVghAAAAAAAAAAAAEEAAAAAAAAAWQAAAAAAAAMO4fwAAAAAAABhAcRxoB4ZxHVJxHnRxH2J1Lg=="
  private val proto4 =
    "gASVBAEAAAAAAAB9lCiMCDIwMjAwMzAxlIwVbnVtcHkuY29yZS5tdWx0aWFycmF5lIwMX3JlY29uc3RydWN0lJOUjAVudW1weZSMB25kYXJyYXmUk5RLAIWUQwFilIeUUpQoSwFLAksChpRoBYwFZHR5cGWUk5SMAmY4lImIh5RSlChLA4wBPJROTk5K/////0r/////SwB0lGKJQyAAAAAAAAD4PwAAAAAAAPh/AAAAAAAABEAAAAAAAAAIQJR0lGKMCDIwMjAwMzAylGgEaAdLAIWUaAmHlFKUKEsBSwJLAoaUaBGJQyAAAAAAAAAQQAAAAAAAABZAAAAAAAAA+H8AAAAAAAAYQJR0lGJ1Lg=="
  private val proto5 =
    "gAWV6gAAAAAAAAB9lCiMCDIwMjAwMzAxlIwSbnVtcHkuY29yZS5udW1lcmljlIwLX2Zyb21idWZmZXKUk5QoliAAAAAAAAAAAAAAAAAA+D8AAAAAAAD4fwAAAAAAAARAAAAAAAAACECUjAVudW1weZSMBWR0eXBllJOUjAJmOJSJiIeUUpQoSwOMATyUTk5OSv////9K/////0sAdJRiSwJLAoaUjAFDlHSUUpSMCDIwMjAwMzAylGgEKJYgAAAAAAAAAAAAAAAAABBAAAAAAAAAFkAAAAAAAAD4fwAAAAAAABhAlGgLSwJLAoaUaA90lFKUdS4="
  // {"20210101": asfortranarray([[1,2,3],[4,5,6]])}
  private val fortran =
    "gAJ9cQBYCAAAADIwMjEwMTAxcQFjbnVtcHkuY29yZS5tdWx0aWFycmF5Cl9yZWNvbnN0cnVjdApxAmNudW1weQpuZGFycmF5CnEDSwCFcQRjX2NvZGVjcwplbmNvZGUKcQVYAQAAAGJxBlgGAAAAbGF0aW4xcQeGcQhScQmHcQpScQsoSwFLAksDhnEMY251bXB5CmR0eXBlCnENWAIAAABmOHEOiYiHcQ9ScRAoSwNYAQAAADxxEU5OTkr/////Sv////9LAHRxEmKIaAVYMQAAAAAAAAAAAMOwPwAAAAAAABBAAAAAAAAAAEAAAAAAAAAUQAAAAAAAAAhAAAAAAAAAGEBxE2gHhnEUUnEVdHEWYnMu"
  // {"20220215": float32 [[1.5, 2.5]], "20220216": int64 [[7, 8]]}
  private val dtypes =
    "gAJ9cQAoWAgAAAAyMDIyMDIxNXEBY251bXB5LmNvcmUubXVsdGlhcnJheQpfcmVjb25zdHJ1Y3QKcQJjbnVtcHkKbmRhcnJheQpxA0sAhXEEY19jb2RlY3MKZW5jb2RlCnEFWAEAAABicQZYBgAAAGxhdGluMXEHhnEIUnEJh3EKUnELKEsBSwFLAoZxDGNudW1weQpkdHlwZQpxDVgCAAAAZjRxDomIh3EPUnEQKEsDWAEAAAA8cRFOTk5K/////0r/////SwB0cRJiiWgFWAkAAAAAAMOAPwAAIEBxE2gHhnEUUnEVdHEWYlgIAAAAMjAyMjAyMTZxF2gCaANLAIVxGGgJh3EZUnEaKEsBSwFLAoZxG2gNWAIAAABpOHEciYiHcR1ScR4oSwNoEU5OTkr/////Sv////9LAHRxH2KJaAVYEAAAAAcAAAAAAAAACAAAAAAAAABxIGgHhnEhUnEidHEjYnUu"

  private def decode(b64: String): Map[String, PickleLite.NdArray] =
    PickleLite.unpickle(Base64.getDecoder.decode(b64)) match {
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, v) => String.valueOf(k) -> v.asInstanceOf[PickleLite.NdArray] }.toMap
    }

  test("real numpy pickles decode at protocols 2, 4 and 5 (identical values)") {
    for ((b64, proto) <- Seq((proto2, 2), (proto4, 4), (proto5, 5))) {
      val m = decode(b64)
      assert(m.keySet === Set("20200301", "20200302"), s"protocol $proto")
      val a = m("20200301")
      assert(a.shape === Seq(2, 2), s"protocol $proto")
      val v = a.doubles
      assert(v(0) === 1.5 && v(1).isNaN && v(2) === 2.5 && v(3) === 3.0, s"protocol $proto")
      val b = m("20200302").doubles
      assert(b(0) === 4.0 && b(1) === 5.5 && b(2).isNaN && b(3) === 6.0, s"protocol $proto")
    }
  }

  test("fortran-order and float32/int64 arrays normalize to row-major doubles") {
    val f = decode(fortran)("20210101")
    assert(f.shape === Seq(2, 3) && f.fortran)
    assert(f.doubles.toSeq === Seq(1.0, 2.0, 3.0, 4.0, 5.0, 6.0))
    val d = decode(dtypes)
    assert(d("20220215").doubles.toSeq === Seq(1.5, 2.5))
    assert(d("20220216").doubles.toSeq === Seq(7.0, 8.0))
  }

  test("engine pickle(Map[ndarray]) is decodable by its own reader AND matches numpy's opcode shape") {
    val m = scala.collection.mutable.LinkedHashMap[Any, Any](
      "20230101" -> PickleLite.NdArray(Seq(2, 2), "<f8", fortran = false,
        data = {
          val bb = java.nio.ByteBuffer.allocate(32).order(java.nio.ByteOrder.LITTLE_ENDIAN)
          Seq(9.5, Double.NaN, -1.25, 4.0).foreach(bb.putDouble)
          bb.array()
        }))
    val bytes = PickleLite.pickle(m)
    val back = decode(Base64.getEncoder.encodeToString(bytes))
    val v = back("20230101").doubles
    assert(v(0) === 9.5 && v(1).isNaN && v(2) === -1.25 && v(3) === 4.0)
    // the writer speaks numpy's own reduce dialect
    val s = new String(bytes, "ISO-8859-1")
    assert(s.contains("numpy.core.multiarray\n_reconstruct")
      && s.contains("_codecs\nencode") && s.contains("dtype"))
  }

  test("readPklDict: rows per (idx0, idx1, date), NaN drops, multi-source concat") {
    val dir = Files.createTempDirectory("pkl_")
    val f1 = dir.resolve("a.pkl"); Files.write(f1, Base64.getDecoder.decode(proto2))
    val f2 = dir.resolve("b.pkl"); Files.write(f2, Base64.getDecoder.decode(fortran))
    val df = PklLegacy.readPklDictSources(spark,
      Seq("sat_a" -> Seq(f1.toString), "sat_b" -> Seq(f2.toString)), valueName = "obs")
    assert(df.columns.toSeq === Seq("idx0", "idx1", "date", "obs", "source"))
    val rows = df.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getDate(2).toString, r.getDouble(3), r.getString(4))).toSet
    // proto2: 8 cells, 2 NaN -> 6 rows; fortran: 6 cells -> 6 rows
    assert(rows.size === 12)
    assert(rows.contains((0L, 0L, "2020-03-01", 1.5, "sat_a")))
    assert(rows.contains((1L, 0L, "2020-03-01", 2.5, "sat_a")))
    assert(rows.contains((1L, 1L, "2020-03-02", 6.0, "sat_a")))
    assert(!rows.exists { case (i0, i1, d, _, s) =>
      s == "sat_a" && d == "2020-03-01" && i0 == 0L && i1 == 1L }, "NaN cell dropped")
    assert(rows.contains((1L, 2L, "2021-01-01", 6.0, "sat_b")), "fortran un-transposed")

    // ConfigExpr .pkl suffix dispatch with where pushdown order
    val via = graft.core.ConfigExpr.load(spark, graft.core.ConfigExpr.DataConfig(
      source = f1.toString,
      where = Seq(graft.core.ConfigExpr.Where("obs", ">", 3.5)),
      colSelect = Seq("idx0", "idx1", "obs")))
    assert(via.collect().map(_.getDouble(2)).sorted.toSeq === Seq(4.0, 5.5, 6.0))
  }
}
