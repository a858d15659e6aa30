package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pickled pandas DataFrame stores. The read-side conformance fixtures are
  * REAL CPython pickles (CPython 3.11 + pandas 2.2.2 + numpy 1.26.4,
  * embedded base64): protocol 2 and 5 dumps plus a hand-assembled pre-1.x
  * "0.14.1" BlockManager state that the same pandas verifiably reads back.
  * The write side's bytes were validated against `pd.read_pickle` (exact
  * dtypes: float64/int64/int32/bool/object) when the writer was built.
  */
class PklFrameSpec extends AnyFunSuite with SparkTestBase {

  // pandas 2.2.2 / protocol 2: columns a,b float64 (ONE consolidated
  // 2-column block), n int64, m int32, flag bool, s object with a None
  private val f1P2 =
    "gAJjcGFuZGFzLmNvcmUuZnJhbWUKRGF0YUZyYW1lCnEAKYFxAX1xAihYBAAAAF9tZ3JxA2Nw" +
    "YW5kYXMuY29yZS5pbnRlcm5hbHMubWFuYWdlcnMKQmxvY2tNYW5hZ2VyCnEEKGNwYW5kYXMu" +
    "X2xpYnMuaW50ZXJuYWxzCl91bnBpY2tsZV9ibG9jawpxBWNudW1weS5jb3JlLm11bHRpYXJy" +
    "YXkKX3JlY29uc3RydWN0CnEGY251bXB5Cm5kYXJyYXkKcQdLAIVxCGNfY29kZWNzCmVuY29k" +
    "ZQpxCVgBAAAAYnEKWAYAAABsYXRpbjFxC4ZxDFJxDYdxDlJxDyhLAUsCSwSGcRBjbnVtcHkK" +
    "ZHR5cGUKcRFYAgAAAGY4cRKJiIdxE1JxFChLA1gBAAAAPHEVTk5OSv////9K/////0sAdHEW" +
    "YoloCVhDAAAAAAAAAAAAw7g/AAAAAAAAAsOAAAAAAAAACEAAAAAAAADDuH8AAAAAAAAkQAAA" +
    "AAAAADRAAAAAAAAAPkAAAAAAAABEQHEXaAuGcRhScRl0cRpiY19fYnVpbHRpbl9fCnNsaWNl" +
    "CnEbSwBLAksBh3EcUnEdSwKHcR5ScR9oBWgGaAdLAIVxIGgNh3EhUnEiKEsBSwFLBIZxI2gR" +
    "WAIAAABpOHEkiYiHcSVScSYoSwNoFU5OTkr/////Sv////9LAHRxJ2KJaAlYKAAAAAcAAAAA" +
    "AAAAw7jDv8O/w7/Dv8O/w7/DvwkAAAAAAAAACgAAAAAAAABxKGgLhnEpUnEqdHErYmgbSwJL" +
    "A0sBh3EsUnEtSwKHcS5ScS9oBWgGaAdLAIVxMGgNh3ExUnEyKEsBSwFLBIZxM2gRWAIAAABp" +
    "NHE0iYiHcTVScTYoSwNoFU5OTkr/////Sv////9LAHRxN2KJaAlYEAAAAAEAAAACAAAAAwAA" +
    "AAQAAABxOGgLhnE5UnE6dHE7YmgbSwNLBEsBh3E8UnE9SwKHcT5ScT9oBWgGaAdLAIVxQGgN" +
    "h3FBUnFCKEsBSwFLBIZxQ2gRWAIAAABiMXFEiYiHcUVScUYoSwNYAQAAAHxxR05OTkr/////" +
    "Sv////9LAHRxSGKJaAlYBAAAAAEAAQFxSWgLhnFKUnFLdHFMYmgbSwRLBUsBh3FNUnFOSwKH" +
    "cU9ScVBoBWgGaAdLAIVxUWgNh3FSUnFTKEsBSwFLBIZxVGgRWAIAAABPOHFViYiHcVZScVco" +
    "SwNoR05OTkr/////Sv////9LP3RxWGKJXXFZKFgBAAAAeHFaWAIAAAB5eXFbTlgDAAAAenp6" +
    "cVxldHFdYmgbSwVLBksBh3FeUnFfSwKHcWBScWF0cWJdcWMoY3BhbmRhcy5jb3JlLmluZGV4" +
    "ZXMuYmFzZQpfbmV3X0luZGV4CnFkY3BhbmRhcy5jb3JlLmluZGV4ZXMuYmFzZQpJbmRleApx" +
    "ZX1xZihYBAAAAGRhdGFxZ2gGaAdLAIVxaGgNh3FpUnFqKEsBSwaFcWtoV4ldcWwoWAEAAABh" +
    "cW1YAQAAAGJxblgBAAAAbnFvWAEAAABtcXBYBAAAAGZsYWdxcVgBAAAAc3FyZXRxc2JYBAAA" +
    "AG5hbWVxdE51hnF1UnF2aGRjcGFuZGFzLmNvcmUuaW5kZXhlcy5yYW5nZQpSYW5nZUluZGV4" +
    "CnF3fXF4KGh0TlgFAAAAc3RhcnRxeUsAWAQAAABzdG9wcXpLBFgEAAAAc3RlcHF7SwF1hnF8" +
    "UnF9ZYZxflJxf1gEAAAAX3R5cHGAWAkAAABkYXRhZnJhbWVxgVgJAAAAX21ldGFkYXRhcYJd" +
    "cYNYBQAAAGF0dHJzcYR9cYVYBgAAAF9mbGFnc3GGfXGHWBcAAABhbGxvd3NfZHVwbGljYXRl" +
    "X2xhYmVsc3GIiHN1Yi4="

  // pandas 2.2.2 / protocol 5: datetime64[ns] column (DatetimeArray /
  // NDArrayBacked), float32 via _frombuffer, named float64 index
  private val f2P5 =
    "gAWVGwQAAAAAAACMEXBhbmRhcy5jb3JlLmZyYW1llIwJRGF0YUZyYW1llJOUKYGUfZQojARf" +
    "bWdylIwecGFuZGFzLmNvcmUuaW50ZXJuYWxzLm1hbmFnZXJzlIwMQmxvY2tNYW5hZ2VylJOU" +
    "jBZwYW5kYXMuX2xpYnMuaW50ZXJuYWxzlIwPX3VucGlja2xlX2Jsb2NrlJOUjBNwYW5kYXMu" +
    "X2xpYnMuYXJyYXlzlIwcX19weXhfdW5waWNrbGVfTkRBcnJheUJhY2tlZJSTlIwccGFuZGFz" +
    "LmNvcmUuYXJyYXlzLmRhdGV0aW1lc5SMDURhdGV0aW1lQXJyYXmUk5RKHwbxBE6HlFKUjAVu" +
    "dW1weZSMBWR0eXBllJOUjAJNOJSJiIeUUpQoSwSMATyUTk5OSv////9K/////0sAfZQoQwJu" +
    "c5RLAUsBSwF0lIaUdJRijBVudW1weS5jb3JlLm11bHRpYXJyYXmUjAxfcmVjb25zdHJ1Y3SU" +
    "k5RoFIwHbmRhcnJheZSTlEsAhZRDAWKUh5RSlChLAUsBSwOGlGgWjAJNOJSJiIeUUpQoSwRo" +
    "Gk5OTkr/////Sv////9LAH2UKEMCbnOUSwFLAUsBdJSGlHSUYolDGAAADsgHBfgVAABdWZxT" +
    "+BUAAKzqMKL4FZR0lGJ9lCiMBV9mcmVxlE6MBl9jYWNoZZR9lIwEdW5pdJSMAm5zlHN1h5Ri" +
    "jAhidWlsdGluc5SMBXNsaWNllJOUSwBLAUsBh5RSlEsCh5RSlGgLjBJudW1weS5jb3JlLm51" +
    "bWVyaWOUjAtfZnJvbWJ1ZmZlcpSTlCiWDAAAAAAAAAAAAAA/AADAPwAAIECUaBaMAmY0lImI" +
    "h5RSlChLA2gaTk5OSv////9K/////0sAdJRiSwFLA4aUjAFDlHSUUpRoPUsBSwJLAYeUUpRL" +
    "AoeUUpSGlF2UKIwYcGFuZGFzLmNvcmUuaW5kZXhlcy5iYXNllIwKX25ld19JbmRleJSTlGhU" +
    "jAVJbmRleJSTlH2UKIwEZGF0YZRoImgkSwCFlGgmh5RSlChLAUsChZRoFowCTziUiYiHlFKU" +
    "KEsDjAF8lE5OTkr/////Sv////9LP3SUYoldlCiMAXSUjAF2lGV0lGKMBG5hbWWUTnWGlFKU" +
    "aFZoWH2UKGhaaEQolhgAAAAAAAAAAAAAAAAAWUAAAAAAAABpQAAAAAAAwHJAlGgWjAJmOJSJ" +
    "iIeUUpQoSwNoGk5OTkr/////Sv////9LAHSUYksDhZRoS3SUUpRoaIwGb2JzX2lklHWGlFKU" +
    "ZYaUUpSMBF90eXCUjAlkYXRhZnJhbWWUjAlfbWV0YWRhdGGUXZSMBWF0dHJzlH2UjAZfZmxh" +
    "Z3OUfZSMF2FsbG93c19kdXBsaWNhdGVfbGFiZWxzlIhzdWIu"

  // pre-1.x BlockManager NEWOBJ + "0.14.1" __setstate__ form (pandas'
  // own pickle_compat reads this exact stream back)
  private val legacy0141 =
    "gAJjcGFuZGFzLmNvcmUuZnJhbWUKRGF0YUZyYW1lCimBfShYBQAAAF9kYXRhcQBjcGFuZGFz" +
    "LmNvcmUuaW50ZXJuYWxzLm1hbmFnZXJzCkJsb2NrTWFuYWdlcgopgShdcQAoY3BhbmRhcy5j" +
    "b3JlLmluZGV4ZXMuYmFzZQpfbmV3X0luZGV4CnEBY3BhbmRhcy5jb3JlLmluZGV4ZXMuYmFz" +
    "ZQpJbmRleApxAn1xAyhYBAAAAGRhdGFxBGNudW1weS5jb3JlLm11bHRpYXJyYXkKX3JlY29u" +
    "c3RydWN0CnEFY251bXB5Cm5kYXJyYXkKcQZLAIVxB2NfY29kZWNzCmVuY29kZQpxCFgBAAAA" +
    "YnEJWAYAAABsYXRpbjFxCoZxC1JxDIdxDVJxDihLAUsDhXEPY251bXB5CmR0eXBlCnEQWAIA" +
    "AABPOHERiYiHcRJScRMoSwNYAQAAAHxxFE5OTkr/////Sv////9LP3RxFWKJXXEWKFgBAAAA" +
    "YXEXWAEAAABrcRhYAQAAAHNxGWV0cRpiWAQAAABuYW1lcRtOdYZxHFJxHWgBY3BhbmRhcy5j" +
    "b3JlLmluZGV4ZXMucmFuZ2UKUmFuZ2VJbmRleApxHn1xHyhoG05YBQAAAHN0YXJ0cSBLAFgE" +
    "AAAAc3RvcHEhSwNYBAAAAHN0ZXBxIksBdYZxI1JxJGVdcSUoaAVoBksAhXEmaAyHcSdScSgo" +
    "SwFLAUsDhnEpaBBYAgAAAGY4cSqJiIdxK1JxLChLA1gBAAAAPHEtTk5OSv////9K/////0sA" +
    "dHEuYoloCFgZAAAAAAAAAAAAw7A/AAAAAAAAAEAAAAAAAAASQHEvaAqGcTBScTF0cTJiaAVo" +
    "BksAhXEzaAyHcTRScTUoSwFLAUsDhnE2aBBYAgAAAGk4cTeJiIdxOFJxOShLA2gtTk5OSv//" +
    "//9K/////0sAdHE6YoloCFgYAAAABQAAAAAAAAAGAAAAAAAAAAcAAAAAAAAAcTtoCoZxPFJx" +
    "PXRxPmJoBWgGSwCFcT9oDIdxQFJxQShLAUsBSwOGcUJoE4ldcUMoWAEAAABwcUROWAIAAABx" +
    "cXFFZXRxRmJlXXFHKGgBaAJ9cUgoaARoBWgGSwCFcUloDIdxSlJxSyhLAUsBhXFMaBOJXXFN" +
    "aBdhdHFOYmgbTnWGcU9ScVBoAWgCfXFRKGgEaAVoBksAhXFSaAyHcVNScVQoSwFLAYVxVWgT" +
    "iV1xVmgYYXRxV2JoG051hnFYUnFZaAFoAn1xWihoBGgFaAZLAIVxW2gMh3FcUnFdKEsBSwGF" +
    "cV5oE4ldcV9oGWF0cWBiaBtOdYZxYVJxYmV9cWNYBgAAADAuMTQuMXFkfXFlKFgEAAAAYXhl" +
    "c3FmaABYBgAAAGJsb2Nrc3FnXXFoKH1xaShYBgAAAHZhbHVlc3FqaChYCAAAAG1ncl9sb2Nz" +
    "cWtoBWgGSwCFcWxoDIdxbVJxbihLAUsBhXFvaDmJaAhYCAAAAAAAAAAAAAAAcXBoCoZxcVJx" +
    "cnRxc2J1fXF0KGhqaDVoa2gFaAZLAIVxdWgMh3F2UnF3KEsBSwGFcXhoOYloCFgIAAAAAQAA" +
    "AAAAAABxeWgKhnF6UnF7dHF8YnV9cX0oaGpoQWhraAVoBksAhXF+aAyHcX9ScYAoSwFLAYVx" +
    "gWg5iWgIWAgAAAACAAAAAAAAAHGCaAqGcYNScYR0cYVidWV1c3RxhmJYBAAAAF90eXBxAFgJ" +
    "AAAAZGF0YWZyYW1lcQB1Yi4="

  private def decode(b64: String) = {
    val frame = PickleLite.unpickle(java.util.Base64.getDecoder.decode(b64))
      .asInstanceOf[PickleLite.PdFrame]
    PklLegacy.frameRows(frame)
  }

  test("real pandas protocol-2 pickle: consolidated blocks, all dtypes, None") {
    val (schema, rows) = decode(f1P2)
    assert(schema.simpleString ===
      "struct<a:double,b:double,n:bigint,m:int,flag:boolean,s:string>")
    assert(rows.length === 4)
    assert(rows(0).toSeq === Seq(1.5, 10.0, 7L, 1, true, "x"))
    assert(rows(1).toSeq === Seq(-2.25, 20.0, -8L, 2, false, "yy"))
    assert(rows(2).toSeq === Seq(3.0, 30.0, 9L, 3, true, null))
    assert(rows(3)(0).asInstanceOf[Double].isNaN) // np.nan survives
    assert(rows(3).drop(1).toSeq === Seq(40.0, 10L, 4, true, "zzz"))
  }

  test("real pandas protocol-5 pickle: datetime64[ns], float32, named index") {
    val (schema, rows) = decode(f2P5)
    assert(schema.simpleString === "struct<obs_id:double,t:timestamp,v:float>")
    assert(rows.map(_(0)).toSeq === Seq(100.0, 200.0, 300.0))
    // 2020-03-01/02/03 00:00 UTC
    val epochs = rows.map(_(1).asInstanceOf[java.sql.Timestamp].getTime)
    assert(epochs.toSeq === Seq(1583020800000L, 1583107200000L, 1583193600000L))
    assert(rows.map(_(2)).toSeq === Seq(0.5f, 1.5f, 2.5f))
  }

  test("pre-1.x 0.14.1 BlockManager state decodes (mgr_locs placement)") {
    val (schema, rows) = decode(legacy0141)
    assert(schema.simpleString === "struct<a:double,k:bigint,s:string>")
    assert(rows.map(_.toSeq).toSeq === Seq(
      Seq(1.0, 5L, "p"), Seq(2.0, 6L, null), Seq(4.5, 7L, "qq")))
  }

  test("isFramePickle tells frames from dict stores") {
    assert(PklLegacy.isFramePickle(
      java.util.Base64.getDecoder.decode(f1P2).take(64)))
    val dict = PickleLite.pickle(scala.collection.mutable.LinkedHashMap[Any, Any](
      "20200301" -> PickleLite.NdArray(Seq(1, 1), "<f8", fortran = false,
        Array.fill(8)(0.toByte))))
    assert(!PklLegacy.isFramePickle(dict.take(64)))
  }

  test("writer roundtrip through Spark: schema and values survive") {
    val schema = StructType(Seq(
      StructField("x", DoubleType), StructField("n", LongType),
      StructField("m", IntegerType), StructField("f", BooleanType),
      StructField("s", StringType)))
    val rows = Seq(
      Row(1.5, 7L, 1, true, "ab"), Row(-0.25, -8L, 2, false, null),
      Row(3.25, 9L, 3, true, "zzz"))
    val dir = java.nio.file.Files.createTempDirectory("pkl_frame_")
    val path = dir.resolve("frame.pkl").toString
    java.nio.file.Files.write(dir.resolve("frame.pkl"),
      PklLegacy.framePickleBytes(schema, rows))
    val back = PklLegacy.readPklFrames(spark, Seq(path))
    assert(back.schema.map(f => (f.name, f.dataType)) ===
      schema.map(f => (f.name, f.dataType)))
    assert(back.collect().map(_.toSeq).toSet === rows.map(_.toSeq).toSet)
  }

  test("distributed granule sink: one pickle per key, glob scan parity") {
    import spark.implicits._
    val df = (0 until 40).map(i =>
      (18322.0 + i % 4, i.toDouble, math.sin(i.toDouble), s"doc$i"))
      .toDF("t", "x", "v", "tag")
    val dir = java.nio.file.Files.createTempDirectory("pkl_gran_").toString
    PklLegacy.writePklFramesDistributed(df, dir, "t")
    val files = new java.io.File(dir).listFiles().map(_.getName).sorted
    assert(files.toSeq === Seq("18322.0.pkl", "18323.0.pkl", "18324.0.pkl", "18325.0.pkl"))
    val back = PklLegacy.readPklFrames(spark, Seq(s"$dir/*.pkl"))
    assert(back.count() === 40)
    assert(back.collect().map(_.toSeq).toSet === df.collect().map(_.toSeq).toSet)
  }

  test("ConfigExpr .pkl dispatch routes frames to the frame reader") {
    import spark.implicits._
    val df = Seq((1.0, 10L, "a"), (2.0, 20L, "b")).toDF("x", "n", "s")
    val dir = java.nio.file.Files.createTempDirectory("pkl_cfg_")
    java.nio.file.Files.write(dir.resolve("frame.pkl"),
      PklLegacy.framePickleBytes(df.schema, df.collect().toSeq))
    val got = graft.core.ConfigExpr.load(spark, graft.core.ConfigExpr.DataConfig(
      source = dir.resolve("frame.pkl").toString, colSelect = Seq("x", "s")))
    assert(got.columns.toSeq === Seq("x", "s"))
    assert(got.collect().map(_.toSeq).toSet === Set(Seq(1.0, "a"), Seq(2.0, "b")))
  }
}
