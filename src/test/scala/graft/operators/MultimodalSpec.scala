package graft.operators

import graft.SparkTestBase
import graft.sources.{ObsDoc, ObsDocs, Span}
import org.scalatest.funsuite.AnyFunSuite

class MultimodalSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._
  implicit val s: org.apache.spark.sql.SparkSession = spark

  private val docs = Seq(
    ObsDoc("d0", Seq(Span("text", "hdr", "", 0), Span("media", "", "swath://a.png", 1))),
    ObsDoc("d1", Seq(Span("text", "hdr", "", 0))), // no media span
    ObsDoc("d2", Seq(Span("media", "", "swath://b.png", 0), Span("media", "", "swath://c.png", 1)))
  ).toDF()

  test("mediaTable extracts exactly the media spans with content-addressed payloads") {
    val m = Multimodal.mediaTable(docs).collect().sortBy(_.media_ref)
    assert(m.map(r => (r.doc_id, r.media_ref)).toSeq ===
      Seq(("d0", "swath://a.png"), ("d2", "swath://b.png"), ("d2", "swath://c.png")))
    assert(m.forall(_.content.nonEmpty), "fetch stub yields content-addressed bytes")
    assert(m.forall(_.media_kind == "image"))
    // content-addressed: same ref -> same bytes, different refs differ
    assert(!m(0).content.sameElements(m(1).content))
    assert(Multimodal.DecodeStub.fetchBytes("swath://a.png").sameElements(m(0).content))
  }

  test("decodeFeatures: deterministic shapes/embeddings, schema stable across partitionings") {
    val many = ObsDocs.synthesize(spark, 300, 7).toDF()
    val feats1 = Multimodal.decodeFeatures(Multimodal.mediaTable(many)).collect()
    val feats2 = Multimodal.decodeFeatures(Multimodal.mediaTable(many.repartition(13))).collect()
    assert(feats1.nonEmpty)
    assert(feats1.forall(f => f.width >= 64 && f.height >= 64 && f.n_frames >= 1 && f.embedding.length == 8))
    // determinism + parallelism-independence: same rows either way
    val k1 = feats1.map(f => (f.doc_id, f.media_ref, f.width, f.height, f.n_frames, f.embedding)).toSet
    val k2 = feats2.map(f => (f.doc_id, f.media_ref, f.width, f.height, f.n_frames, f.embedding)).toSet
    assert(k1 === k2)
    // ~2/3 of synthesized docs carry a media span
    assert(feats1.length > 150 && feats1.length < 250)
  }

  test("DecodeStub arithmetic is the documented SQL-expressible checksum") {
    val ref = "swath://42"
    val bytes = Multimodal.DecodeStub.fetchBytes(ref)
    assert(bytes.sameElements(ref.getBytes("UTF-8")))
    val s1 = bytes.map(b => (b & 0xff).toLong).sum
    val (w, h, f, emb) = Multimodal.DecodeStub.newContext().decode(bytes)
    assert(w === 64 + (s1 % 64).toInt * 16)
    assert(h === 64 + ((s1 * 31 + bytes.length) % 64).toInt * 16)
    assert(f === 1 + (s1 % 8).toInt)
    assert(emb === Seq.tabulate(8)(k => ((s1 * (k + 1)) % 1000).toFloat / 1000.0f))
  }

  private def pngBytes(w: Int, h: Int, rgb: Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) { var x = 0; while (x < w) { img.setRGB(x, y, rgb); x += 1 }; y += 1 }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("RealDecoders: PNG decodes for real — exact dimensions and channel means") {
    val p = Multimodal.RealDecoders.probe(pngBytes(13, 7, 0x4080C0))
    assert(p.kind === "image")
    assert((p.width, p.height, p.channels) === ((13, 7, 3)))
    assert(p.mean.toSeq === Seq(0x40.toDouble, 0x80.toDouble, 0xC0.toDouble))
  }

  test("RealDecoders: JPEG decodes for real (lossy — means within tolerance)") {
    val img = new java.awt.image.BufferedImage(16, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 16) img.setRGB(x, y, 0x646464)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val p = Multimodal.RealDecoders.probe(bos.toByteArray)
    assert(p.kind === "image" && p.width === 16 && p.height === 16)
    p.mean.foreach(m => assert(math.abs(m - 100.0) < 3.0, s"jpeg mean $m"))
  }

  test("RealDecoders: WAV PCM decodes for real — rate, frames, duration, sine RMS") {
    val rate = 8000
    val n = 8000
    val amp = 0.5
    val pcm = new Array[Byte](n * 2)
    var i = 0
    while (i < n) {
      val s = (math.sin(2 * math.Pi * 440.0 * i / rate) * amp * 32767).toInt.toShort
      pcm(i * 2) = (s & 0xff).toByte
      pcm(i * 2 + 1) = ((s >> 8) & 0xff).toByte
      i += 1
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val p = Multimodal.RealDecoders.probe(bos.toByteArray)
    assert(p.kind === "audio")
    assert(p.sampleRate === rate && p.channels === 1 && p.nFrames === n.toLong)
    assert(math.abs(p.durationMs - 1000.0) < 1e-6)
    assert(math.abs(p.rms - amp / math.sqrt(2)) < 0.01, s"rms ${p.rms}")
  }

  test("probeMedia: unknown payloads degrade to kind=unknown, not task failure") {
    val rows = Seq(
      Multimodal.MediaRow("d0", "png://x", pngBytes(4, 4, 0xFF0000), "image"),
      Multimodal.MediaRow("d1", "bogus://y", Array[Byte](1, 2, 3), "image")).toDS()
    val out = Multimodal.probeMedia(rows).collect().map(p => p.media_ref -> p.kind).toMap
    assert(out === Map("png://x" -> "image", "bogus://y" -> "unknown"))
  }

  private def gradientPng(w: Int, h: Int, invert: Boolean = false): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val g0 = ((x.toDouble / w) * 255).toInt
        val g = if (invert) 255 - g0 else g0
        img.setRGB(x, y, (g << 16) | (g << 8) | g); x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("aHash64 golden: top-black / bottom-white splits the grid at bit 32") {
    val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64)
      img.setRGB(x, y, if (y < 32) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    assert(Multimodal.aHash64(bos.toByteArray) === Some(0xFFFFFFFF00000000L))
    assert(Multimodal.aHash64(Array[Byte](9, 9, 9)) === None)
  }

  test("resizeImages: real bilinear rescale — target dims, constant colour preserved, junk drops") {
    val rows = Seq(
      Multimodal.MediaRow("d0", "png://c", pngBytes(13, 7, 0x4080C0), "image"),
      Multimodal.MediaRow("d1", "bogus://x", Array[Byte](1, 2, 3), "image")).toDS()
    val resized = Multimodal.resizeImages(rows, 8, 6).collect()
    assert(resized.map(_.media_ref).toSeq === Seq("png://c"))
    val p = Multimodal.RealDecoders.probe(resized.head.content)
    assert((p.width, p.height) === ((8, 6)))
    // bilinear of a constant is the constant: exact channel means survive
    assert(p.mean.toSeq === Seq(0x40.toDouble, 0x80.toDouble, 0xC0.toDouble))
  }

  test("sampleFrames: every-Nth-frame fan-out matches the stub decode replay") {
    val media = Multimodal.mediaTable(docs)
    val got = Multimodal.sampleFrames(media, everyN = 2).collect()
      .map(f => (f.media_ref, f.frame_idx) -> f.frame_sig).toMap
    val want = media.collect().flatMap { r =>
      val s1 = r.content.map(_ & 0xff).map(_.toLong).sum
      val frames = 1 + (s1 % 8).toInt
      (0 until frames by 2).map(i => (r.media_ref, i) -> (s1 * (i + 7)) % 100000L)
    }.toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("aHash64 robustness: lossy JPEG re-encode of the same picture stays within hamming 5") {
    val img = new java.awt.image.BufferedImage(64, 64, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 64; x <- 0 until 64) {
      val g = ((x + y) * 255 / 126)
      img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, fmt, bos); bos.toByteArray
    }
    val (Some(hp), Some(hj)) = (Multimodal.aHash64(enc("png")), Multimodal.aHash64(enc("jpg")))
    val ham = java.lang.Long.bitCount(hp ^ hj)
    assert(ham <= 5, s"png-vs-jpeg hamming $ham")
  }

  test("audioHash64 golden: loud first half / silent second half splits at bit 32") {
    val n = 6400
    val pcm = new Array[Byte](n * 2)
    for (i <- 0 until n / 2) {
      val v: Short = if (i % 2 == 0) 8000 else -8000
      pcm(2 * i) = (v & 0xff).toByte; pcm(2 * i + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    assert(Multimodal.audioHash64(bos.toByteArray) === Some(0x00000000FFFFFFFFL))
    assert(Multimodal.audioHash64(Array[Byte](1, 2, 3)) === None)
    assert(Multimodal.audioHash64(pngBytes(4, 4, 0x112233)) === None,
      "an image payload has no PCM fingerprint")
  }

  test("imageNearDupPairs: a rescale of the same picture matches, an inverted one does not") {
    val rows = Seq(
      Multimodal.MediaRow("a", "img://base", gradientPng(64, 64), "image"),
      Multimodal.MediaRow("b", "img://scaled", gradientPng(128, 96), "image"), // same picture, other resolution
      Multimodal.MediaRow("c", "img://inverted", gradientPng(64, 64, invert = true), "image"),
      Multimodal.MediaRow("d", "bogus://junk", Array[Byte](1, 2), "image")    // undecodable -> dropped
    ).toDS()
    val pairs = Multimodal.imageNearDupPairs(rows, maxHamming = 5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs === Set(("img://base", "img://scaled")), s"got $pairs")
  }
}
