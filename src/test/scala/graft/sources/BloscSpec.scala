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

  test("blosclz opcode vectors: literal runs, short/extended/far matches, overlap") {
    def d(stream: Array[Int], outLen: Int): Array[Byte] = {
      val b = stream.map(_.toByte)
      BloscLzLite.decompress(b, 0, b.length, outLen, "vec")
    }
    // literal run: token n-1 then n bytes
    assert(d(Array(4, 'h', 'e', 'l', 'l', 'o'), 5) === "hello".getBytes)
    // short match with overlap: "abc" + len-6 dist-2 (ref = out start)
    assert(d(Array(2, 'a', 'b', 'c', (4 << 5) | 0, 2), 9) === "abcabcabc".getBytes)
    // extended length: lenBits 7, add-255 byte 0 -> L = 9, dist 1 (period 2)
    assert(d(Array(1, 'a', 'b', (7 << 5) | 0, 0, 1), 11) === "abababababa".getBytes)
    // far match: 8200 literals then L=5 from distance 8191 back
    val lits = Array.tabulate(8200)(i => (i * 37 + i / 251) % 256)
    val stream = Array.newBuilder[Int]
    var s = 0
    while (s < 8200) { // literal runs of 32
      val run = math.min(32, 8200 - s)
      stream += run - 1
      (0 until run).foreach(k => stream += lits(s + k))
      s += run
    }
    stream += ((3 << 5) | 31); stream += 255; stream += 0; stream += 0 // L=5, D=8191
    val out = d(stream.result(), 8205)
    assert(out.take(8200) === lits.map(_.toByte))
    assert(out.drop(8200) === lits.slice(8200 - 8192, 8200 - 8192 + 5).map(_.toByte))
  }

  test("blosclz encoder roundtrips through its own decoder and the blosc frame") {
    val shapes = Seq(
      Array.tabulate(5000)(i => (i % 17).toByte),                       // periodic
      ("the quick brown fox jumps over the lazy dog. " * 400).getBytes, // text
      Array.tabulate(20000)(i => ((i / 100) % 251).toByte),             // long runs, far dists
      Array.tabulate(64)(_.toByte))                                     // short
    shapes.foreach { p =>
      val c = BloscLzLite.compress(p)
      if (c != null)
        assert(BloscLzLite.decompress(c, 0, c.length, p.length, "rt") === p, s"len ${p.length}")
      for (shuffle <- Seq(true, false)) {
        val frame = BloscLite.compress(p, 8, BloscLite.CodecBloscLz, byteShuffle = shuffle)
        assert(BloscLite.decompress(frame, "frame") === p, s"frame len ${p.length} sh=$shuffle")
      }
    }
  }

  test("snappy opcode vectors: varint preamble, literals, copy1/copy2, overlap") {
    def d(stream: Array[Int], outLen: Int): Array[Byte] = {
      val b = stream.map(_.toByte)
      SnappyLite.decompress(b, 0, b.length, outLen, "vec")
    }
    // varint 5, literal tag (len 5): ((5-1)<<2)|0 = 16
    assert(d(Array(5, 16, 'h', 'e', 'l', 'l', 'o'), 5) === "hello".getBytes)
    // "abc" + copy2 len 6 dist 3 -> "abcabcabc": varint 9, literal 3,
    // copy2 tag ((6-1)<<2)|2 = 22, offset 3 LE
    assert(d(Array(9, 8, 'a', 'b', 'c', 22, 3, 0), 9) === "abcabcabc".getBytes)
    // copy1: len 4..11, 11-bit offset: "ab" + copy1 len 4 dist 2 -> "ababab"
    // tag ((4-4)<<2)|1 | (high<<5) = 1; offset byte 2
    assert(d(Array(6, 4, 'a', 'b', 1, 2), 6) === "ababab".getBytes)
    // 61-byte literal (1 extra length byte): tag (60<<2)|0 = 240, len byte 60
    val lits = Array.tabulate(61)(i => 32 + (i % 90))
    assert(d(Array(61, 240, 60) ++ lits, 61) === lits.map(_.toByte))
  }

  test("snappy and lzf encoders roundtrip; lzf-filtered HDF5 chunks decode") {
    val shapes = Seq(
      Array.tabulate(5000)(i => (i % 17).toByte),
      ("sphinx of black quartz judge my vow. " * 300).getBytes,
      Array.tabulate(20000)(i => ((i / 64) % 251).toByte))
    shapes.foreach { p =>
      val sc = SnappyLite.compress(p)
      if (sc != null)
        assert(SnappyLite.decompress(sc, 0, sc.length, p.length, "rt") === p)
      val lc = LzfLite.compress(p)
      if (lc != null)
        assert(LzfLite.decompress(lc, 0, lc.length, p.length, "rt") === p)
      val frame = BloscLite.compress(p, 8, BloscLite.CodecSnappy, byteShuffle = true)
      assert(BloscLite.decompress(frame, "snappy-frame") === p)
    }
    // lzf per-opcode vectors (same grammar family as blosclz, distance+1)
    def dl(stream: Array[Int], outLen: Int): Array[Byte] = {
      val b = stream.map(_.toByte)
      LzfLite.decompress(b, 0, b.length, outLen, "vec")
    }
    assert(dl(Array(4, 'h', 'e', 'l', 'l', 'o'), 5) === "hello".getBytes)
    // "abc" + match len 6 dist 3: ctrl (4<<5)|0 = 128, low byte 2 (dist-1)
    assert(dl(Array(2, 'a', 'b', 'c', 128, 2), 9) === "abcabcabc".getBytes)
    // extended length: (7<<5), ext 0 -> len 9, dist 1
    assert(dl(Array(1, 'a', 'b', 224, 0, 1), 11) === "abababababa".getBytes)

    // chunk-payload shape check (the Hdf5LatestSpec fixture covers the
    // full filter-pipeline integration)
    val chunkRaw = java.nio.ByteBuffer.allocate(256).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 32).foreach(i => chunkRaw.putDouble((i % 7) * 1.0))
    val lz = LzfLite.compress(chunkRaw.array())
    assert(lz != null && LzfLite.decompress(lz, 0, lz.length, 256, "h5") === chunkRaw.array())
  }

  test("blosc rejects unsupported codecs and bit-shuffle with named errors") {
    val p = Array.tabulate(300)(_.toByte)
    val frame = BloscLite.compress(p, 8, BloscLite.CodecLz4)
    val unknown = frame.clone()
    unknown(2) = ((5 << 5) | (unknown(2) & 0x1f)).toByte // codec id 5: unassigned
    val e1 = intercept[IllegalArgumentException](BloscLite.decompress(unknown, "z"))
    assert(e1.getMessage.contains("not recognised"))
    val bitshuf = frame.clone()
    bitshuf(2) = (bitshuf(2) | 0x4).toByte
    val e2 = intercept[IllegalArgumentException](BloscLite.decompress(bitshuf, "b"))
    assert(e2.getMessage.contains("bit-shuffle"))
  }
}
