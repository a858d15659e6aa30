package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata, processed in batch by typed `mapPartitions` (the
  * Scala analog of pandas-batched UDFs: amortise per-batch setup — a real
  * decoder would hold its native context per partition, not per row).
  *
  * The actual image/audio decode is STUBBED — this container carries no
  * media libraries — behind `DecodeStub`: a deterministic fake that
  * produces the right shapes. Everything Spark-side (schema, partitioning,
  * batch processing, feature schema) is real and tested; swapping
  * `DecodeStub` for a JNI/FFMpeg decoder changes no plan.
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

  /** Deterministic fake decoder: ??? -> replace with a real image/audio
    * decoder binding. The fake's arithmetic is a plain byte-sum checksum
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
}
