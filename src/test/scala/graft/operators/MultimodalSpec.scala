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
}
