package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata, processed in batch by typed `mapPartitions` (the
  * Scala analog of pandas-batched UDFs: amortise per-batch setup — a real
  * decoder would hold its native context per partition, not per row).
  *
  * Two decode paths:
  *  - [[RealDecoders]] / [[probeMedia]] — REAL decoding for the formats
  *    the JDK itself ships codecs for: PNG/JPEG/BMP/GIF via `ImageIO`
  *    (width/height + exact per-channel means) and RIFF/WAVE PCM via
  *    `javax.sound.sampled` (sample rate, channels, frames, duration,
  *    RMS). No external libraries; pinned end-to-end by the q56 oracle
  *    (constant-colour PNG encode -> decode roundtrip).
  *  - [[DecodeStub]] — a deterministic stand-in for codecs the JDK lacks
  *    (video containers, webp, ...): produces the right shapes, and its
  *    arithmetic is SQL-expressible so q33 oracle-pins the pipeline.
  */
object Multimodal {

  final case class MediaRow(doc_id: String, media_ref: String, content: Array[Byte],
                            media_kind: String)
  final case class MediaFeatures(doc_id: String, media_ref: String,
                                 width: Int, height: Int, n_frames: Int,
                                 embedding: Seq[Float])

  /** Extract media spans from obs-docs into a typed media table; the binary
    * payload is a deterministic stand-in for fetched bytes (content-addressed
    * by media_ref, as a real object-store fetch would be).
    */
  def mediaTable(docs: DataFrame)(implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    docs
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .filter(col("s.kind") === "media")
      .select(col("doc_id"), col("s.media_ref").as("media_ref"))
      .as[(String, String)]
      .map { case (id, ref) => MediaRow(id, ref, DecodeStub.fetchBytes(ref), "image") }
  }

  /** Batched decode + feature extraction over partitions. */
  def decodeFeatures(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-partition decoder context (the expensive part in a real decoder)
      val ctx = DecodeStub.newContext()
      rows.map { r =>
        val (w, h, frames, emb) = ctx.decode(r.content)
        MediaFeatures(r.doc_id, r.media_ref, w, h, frames, emb)
      }
    }
  }

  /** One probed media payload: images fill (width, height, mean RGB);
    * audio fills (channels, sample_rate, n_frames, duration_ms, rms).
    */
  final case class MediaProbe(doc_id: String, media_ref: String, kind: String,
                              width: Int, height: Int, channels: Int,
                              sample_rate: Int, n_frames: Long,
                              duration_ms: Double, mean: Seq[Double], rms: Double)

  /** REAL decode over partitions for the JDK-codec formats (see
    * [[RealDecoders]]); unknown payloads come back kind="unknown" rather
    * than failing the batch.
    */
  def probeMedia(media: Dataset[MediaRow])(implicit spark: SparkSession): Dataset[MediaProbe] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val p = RealDecoders.probe(r.content)
        MediaProbe(r.doc_id, r.media_ref, p.kind, p.width, p.height, p.channels,
          p.sampleRate, p.nFrames, p.durationMs, p.mean.toSeq, p.rms)
      }
    }
  }

  /** Pure-JDK media decoding: `ImageIO` (PNG/JPEG/BMP/GIF) and
    * `javax.sound.sampled` (RIFF/WAVE PCM). These are full real codecs —
    * the stub below remains only for formats the JDK cannot decode.
    */
  object RealDecoders {
    final case class Probe(kind: String, width: Int, height: Int, channels: Int,
                           sampleRate: Int, nFrames: Long, durationMs: Double,
                           mean: Array[Double], rms: Double)
    private val Unknown = Probe("unknown", 0, 0, 0, 0, 0L, 0.0, Array.empty, 0.0)

    def probe(content: Array[Byte]): Probe =
      if (content.length >= 12 && content(0) == 'R' && content(1) == 'I' &&
        content(2) == 'F' && content(3) == 'F' && content(8) == 'W' &&
        content(9) == 'A' && content(10) == 'V' && content(11) == 'E') probeWav(content)
      else probeImage(content)

    private def probeImage(content: Array[Byte]): Probe = {
      val img =
        try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
        catch { case _: Exception => null }
      if (img == null) Unknown
      else {
        val w = img.getWidth
        val h = img.getHeight
        var (sr, sg, sb) = (0.0, 0.0, 0.0)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
            x += 1
          }
          y += 1
        }
        val n = w.toDouble * h
        Probe("image", w, h, 3, 0, 1L, 0.0, Array(sr / n, sg / n, sb / n), 0.0)
      }
    }

    private def probeWav(content: Array[Byte]): Probe =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        val fmt = in.getFormat
        val frames = in.getFrameLength
        val rate = fmt.getSampleRate.toDouble
        // RMS over 16-bit little-endian PCM (the WAV default)
        val rms =
          if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian) 0.0
          else {
            val bytes = in.readAllBytes()
            var acc = 0.0
            var i = 0
            while (i + 1 < bytes.length) {
              val s = ((bytes(i + 1) << 8) | (bytes(i) & 0xff)).toShort / 32768.0
              acc += s * s
              i += 2
            }
            math.sqrt(acc / math.max(1, bytes.length / 2))
          }
        Probe("audio", 0, 0, fmt.getChannels, fmt.getSampleRate.toInt, frames,
          frames * 1000.0 / rate, Array(rms), rms)
      } catch { case _: Exception => Unknown }
  }

  /** Deterministic fake decoder for formats the JDK cannot decode
    * (??? -> replace with an FFmpeg/JNI binding; JDK-codec formats
    * already decode for real via [[RealDecoders]]). The fake's
    * arithmetic is a plain byte-sum checksum
    * (NOT a bit mixer) on purpose: it is SQL-expressible, so the decode
    * output itself is pinned by the q33 DuckDB oracle end-to-end — the
    * fetched "payload" is the UTF-8 bytes of the media_ref (a
    * content-addressed fetch stand-in the oracle can reproduce).
    */
  object DecodeStub {
    def fetchBytes(ref: String): Array[Byte] = ref.getBytes("UTF-8")

    final class Context {
      def decode(content: Array[Byte]): (Int, Int, Int, Seq[Float]) = {
        var s1 = 0L
        var i = 0
        while (i < content.length) { s1 += content(i) & 0xff; i += 1 }
        val n = content.length
        val w = 64 + (s1 % 64).toInt * 16
        val ht = 64 + ((s1 * 31 + n) % 64).toInt * 16
        val frames = 1 + (s1 % 8).toInt
        val emb = Seq.tabulate(8)(k => ((s1 * (k + 1)) % 1000).toFloat / 1000.0f)
        (w, ht, frames, emb)
      }
    }
    def newContext(): Context = new Context
  }

  /** 64-bit average-hash (aHash) perceptual fingerprint of an image
    * payload: decode (any JDK codec), reduce to an 8x8 grid of mean
    * luminances (Rec.601 weights; proportional pixel binning maps any
    * resolution onto the same grid), set bit `cy*8+cx` iff that cell's
    * mean exceeds the global mean. Re-encodes and rescales of the same
    * picture land at small hamming distance — the standard image
    * near-dup key. None for undecodable payloads.
    */
  def aHash64(content: Array[Byte]): Option[Long] = {
    val img =
      try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      catch { case _: Exception => null }
    if (img == null || img.getWidth == 0 || img.getHeight == 0) return None
    val w = img.getWidth
    val h = img.getHeight
    val sums = new Array[Double](64)
    val counts = new Array[Long](64)
    var y = 0
    while (y < h) {
      val cy = (y.toLong * 8 / h).toInt
      var x = 0
      while (x < w) {
        val cx = (x.toLong * 8 / w).toInt
        val rgb = img.getRGB(x, y)
        val lum = 0.299 * ((rgb >> 16) & 0xff) + 0.587 * ((rgb >> 8) & 0xff) +
          0.114 * (rgb & 0xff)
        val c = cy * 8 + cx
        sums(c) += lum
        counts(c) += 1
        x += 1
      }
      y += 1
    }
    val means = Array.tabulate(64)(i => if (counts(i) == 0) 0.0 else sums(i) / counts(i))
    val mean = means.sum / 64
    var bits = 0L
    var i = 0
    while (i < 64) { if (means(i) > mean) bits |= 1L << i; i += 1 }
    Some(bits)
  }

  /** REAL image resize via Java2D bilinear scaling, re-encoded as PNG —
    * the thumbnail / input-normalization step before feature extraction.
    * Undecodable payloads drop (there is nothing to resize). Per-partition
    * typed pass like every decode stage; constant-colour images resize to
    * the exact same channel means (bilinear of a constant is the
    * constant), which the spec pins through [[probeMedia]].
    */
  def resizeImages(media: Dataset[MediaRow], width: Int, height: Int)
                  (implicit spark: SparkSession): Dataset[MediaRow] = {
    require(width > 0 && height > 0, s"bad target ${width}x$height")
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.content))
          catch { case _: Exception => null }
        if (img == null) None
        else {
          val out = new java.awt.image.BufferedImage(width, height,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          Some(r.copy(content = bos.toByteArray))
        }
      }
    }
  }

  /** One sampled frame of a video-like payload. */
  final case class FrameSample(doc_id: String, media_ref: String,
                               frame_idx: Int, frame_sig: Long)

  /** Frame sampling: every `everyN`-th frame of each clip fans out to its
    * own row — the one-to-many expansion a video pipeline needs before
    * per-frame feature extraction. The JDK ships no video codec, so the
    * DECODE itself is the documented deterministic stub (frame count and
    * per-frame signature from the byte-sum checksum — SQL-expressible, so
    * the whole fan-out is oracle-pinned end-to-end); the Spark-side
    * plumbing — typed mapPartitions, per-frame row schema, partition-local
    * expansion with no shuffle — is the real scale path an FFmpeg/JNI
    * binding would drop into.
    */
  def sampleFrames(media: Dataset[MediaRow], everyN: Int = 2)
                  (implicit spark: SparkSession): Dataset[FrameSample] = {
    require(everyN >= 1, s"everyN must be >= 1, got $everyN")
    import spark.implicits._
    media.mapPartitions { rows =>
      val ctx = DecodeStub.newContext()
      rows.flatMap { r =>
        val (_, _, frames, _) = ctx.decode(r.content)
        var s1 = 0L
        var i = 0
        while (i < r.content.length) { s1 += r.content(i) & 0xff; i += 1 }
        (0 until frames by everyN).iterator.map(idx =>
          FrameSample(r.doc_id, r.media_ref, idx, (s1 * (idx + 7)) % 100000L))
      }
    }
  }

  /** 64-bit audio energy fingerprint — the WAV twin of [[aHash64]]:
    * decode 16-bit little-endian PCM via `javax.sound`, split the sample
    * stream into 64 proportional windows, set bit `w` iff window `w`'s
    * mean-square energy exceeds the mean of the window energies. Loud
    * and quiet passages survive re-encoding; hamming distance keys audio
    * near-dup exactly like the image path. None for undecodable or
    * non-16-bit-LE payloads.
    */
  def audioHash64(content: Array[Byte]): Option[Long] = {
    val bytes =
      try {
        val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(content))
        val fmt = in.getFormat
        // PCM_SIGNED required: a 16-bit PCM_UNSIGNED stream would decode
        // "validly" with every sample offset by 32768 — a wrong but
        // plausible-looking fingerprint instead of the documented None
        if (fmt.getSampleSizeInBits != 16 || fmt.isBigEndian ||
          fmt.getEncoding != javax.sound.sampled.AudioFormat.Encoding.PCM_SIGNED) null
        else in.readAllBytes()
      } catch { case _: Exception => null }
    if (bytes == null || bytes.length < 2) return None
    val n = bytes.length / 2
    val sums = new Array[Double](64)
    val counts = new Array[Long](64)
    var i = 0
    while (i < n) {
      val s = (((bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)).toShort).toDouble
      val w = (i.toLong * 64 / n).toInt
      sums(w) += s * s
      counts(w) += 1
      i += 1
    }
    val means = Array.tabulate(64)(w => if (counts(w) == 0) 0.0 else sums(w) / counts(w))
    val mean = means.sum / 64
    var bits = 0L
    var w = 0
    while (w < 64) { if (means(w) > mean) bits |= 1L << w; w += 1 }
    Some(bits)
  }

  /** Per-image aHash table (doc_id, media_ref, ahash); undecodable
    * payloads are dropped (they have no perceptual identity to match).
    * One typed mapPartitions pass — the decode cost IS the job; the
    * 8-byte hash is all that ever reaches a shuffle.
    */
  def imageHashes(media: Dataset[MediaRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => aHash64(r.content).map(h => (r.doc_id, r.media_ref, h)))
    }.toDF("doc_id", "media_ref", "ahash")
  }

  /** Image near-duplicate pairs: hamming(aHash) <= maxHamming through the
    * SAME pigeonhole banding as SimHash text near-dup
    * ([[graft.operators.Dedup.simhashPairsFromSig]]) — candidate
    * generation is an equi join on (band index, band value) with the
    * bucket-size skew cap, so the image table shuffles 8-byte signatures,
    * never pixels.
    */
  def imageNearDupPairs(media: Dataset[MediaRow], maxHamming: Int = 5,
                        maxBucketSize: Int = 1000)
                       (implicit spark: SparkSession): DataFrame =
    Dedup.simhashPairsFromSig(
      imageHashes(media).select(col("media_ref").as("id"), col("ahash").as("sig")),
      maxHamming, maxBucketSize)

  /** Per-clip audio fingerprint table (doc_id, media_ref, audiohash) —
    * the [[imageHashes]] analog over [[audioHash64]]; non-PCM payloads
    * drop. Near-dup pairs compose through the same
    * `Dedup.simhashPairsFromSig` banding on the `audiohash` column.
    */
  def audioHashes(media: Dataset[MediaRow])(implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap(r => audioHash64(r.content).map(h => (r.doc_id, r.media_ref, h)))
    }.toDF("doc_id", "media_ref", "audiohash")
  }
}
