package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class BloscSpec extends AnyFunSuite {

  private def payloads: Seq[(String, Array[Byte])] = Seq(
    "empty-ish" -> Array[Byte](1, 2, 3),
    "zeros" -> new Array[Byte](4096),
    "runs" -> Array.tabulate(10000)(i => ((i / 97) % 251).toByte),
    "doubles" -> {
      val bb = java.nio.ByteBuffer.allocate(8 * 3000)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until 3000).foreach(i => bb.putDouble(math.sin(i * 0.01) * 1000))
      bb.array()
    },
    "incompressible" -> {
      var x = 123456789L
      Array.fill(5000) { x = x * 6364136223846793005L + 1442695040888963407L; (x >>> 33).toByte }
    },
    "multiblock" -> Array.tabulate(600 * 1024)(i => ((i * 31 + i / 1000) % 253).toByte)
  )

  test("lz4 block codec: compress -> decompress roundtrips every payload shape") {
    for ((label, p) <- payloads) {
      val c = Lz4Lite.compress(p)
      val back = Lz4Lite.decompress(c, 0, c.length, p.length)
      assert(java.util.Arrays.equals(back, p), label)
    }
  }

  test("lz4 decompressor handles extended literal/match lengths and overlap (offset 1)") {
    // long zero run -> offset-1 overlapping match with extended match length
    val p = new Array[Byte](100000)
    val c = Lz4Lite.compress(p)
    assert(c.length < 500, s"run-length input must compress hard, got ${c.length}")
    assert(java.util.Arrays.equals(Lz4Lite.decompress(c, 0, c.length, p.length), p))
    // >=15 literals forces the extended-literal path
    val lits = Array.tabulate(40)(i => (i * 17 + 3).toByte)
    val c2 = Lz4Lite.compress(lits)
    assert(java.util.Arrays.equals(Lz4Lite.decompress(c2, 0, c2.length, lits.length), lits))
  }

  test("blosc frame roundtrip: lz4/zlib x shuffle on/off x payload shapes") {
    for {
      (label, p) <- payloads
      codec <- Seq(BloscLite.CodecLz4, BloscLite.CodecZlib)
      shuf <- Seq(true, false)
      typesize <- Seq(1, 8)
    } {
      val frame = BloscLite.compress(p, typesize, codec, byteShuffle = shuf)
      val back = BloscLite.decompress(frame, s"$label/$codec/$shuf/$typesize")
      assert(java.util.Arrays.equals(back, p), s"$label codec=$codec shuffle=$shuf ts=$typesize")
    }
  }

  test("blosc memcpy flag: raw frames decode; foreign split guesses fall back safely") {
    val p = Array.tabulate(1000)(i => (i % 121).toByte)
    // hand-build a memcpy frame: version, versionlz, flags bit1, typesize,
    // nbytes, blocksize, cbytes, then the raw bytes
    val out = java.nio.ByteBuffer.allocate(16 + p.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put(2.toByte).put(1.toByte).put(0x2.toByte).put(8.toByte)
    out.putInt(p.length).putInt(p.length).putInt(16 + p.length)
    out.put(p)
    assert(java.util.Arrays.equals(BloscLite.decompress(out.array(), "memcpy"), p))
  }

  test("blosc rejects unsupported codecs and bit-shuffle with named errors") {
    val p = Array.tabulate(300)(_.toByte)
    val frame = BloscLite.compress(p, 8, BloscLite.CodecLz4)
    val snappy = frame.clone()
    snappy(2) = ((BloscLite.CodecSnappy << 5) | (snappy(2) & 0x1f)).toByte
    val e1 = intercept[IllegalArgumentException](BloscLite.decompress(snappy, "z"))
    assert(e1.getMessage.contains("lz4=1, zlib=3, zstd=4"))
    val bitshuf = frame.clone()
    bitshuf(2) = (bitshuf(2) | 0x4).toByte
    val e2 = intercept[IllegalArgumentException](BloscLite.decompress(bitshuf, "b"))
    assert(e2.getMessage.contains("bit-shuffle"))
  }
}
