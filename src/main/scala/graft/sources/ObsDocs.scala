package graft.sources

import graft.functions.{laea_x, laea_y, TextHash}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One span of an interleaved text + media observation document
  * (BASELINE.json input_hint). Array position is the invariant order.
  */
final case class Span(kind: String, text: String, media_ref: String, offset: Int)

/** The engine's input row: an observation document. */
final case class ObsDoc(doc_id: String, spans: Seq[Span])

/** Deterministic synthesis + span projection for the obs-doc observation
  * table (FIXTURES.md §1-2). Synthesis is distributed (spark.range) and a
  * pure function of (id, seed) — same output at any parallelism, any scale.
  *
  * Document shape (kinds/order vary per doc so the span-sequence invariant
  * is non-trivial):
  *   0: text  header "obs station=<s> rev=<r>"
  *   1: text  reading "lon=..;lat=..;t=..;z=..;source=.."  (the observation)
  *   2: media swath-image pointer (present for ~2/3 of docs)
  *   3: text  trailing note (present for ~1/3 of docs)
  */
object ObsDocs {

  /** mix-based uniform double in [0, 1). */
  private def u01(h: Long): Double = (h >>> 11).toDouble / (1L << 53).toDouble

  /** Deterministic smooth field sampled by the observations: the "truth"
    * the GP interpolates. Smooth on ~500 km lengthscales over EASE2 meters.
    */
  def truthField(x: Double, y: Double, t: Double): Double =
    0.20 * math.sin(x / 4.0e5) * math.cos(y / 4.0e5) +
      0.10 * math.sin((x + y) / 7.0e5 + (t - 18322.0) / 4.0) +
      0.15

  def makeDoc(i: Long, seed: Long): ObsDoc = {
    def h(k: Long): Long = TextHash.mix64(i * 1315423911L ^ seed ^ TextHash.mix64(k))
    // Arctic placement: lat in [60, 90), lon in [-180, 180); uniform lat
    // concentrates points toward the pole (area density ~ 1/r), giving the
    // polar-tile skew the north rule calls out.
    val lat = 60.0 + 30.0 * u01(h(1))
    val lon = -180.0 + 360.0 * u01(h(2))
    val t = 18322.0 + (h(3) >>> 32) % 9 // 2020-03-01 .. 2020-03-09, float days
    val x = graft.functions.Laea.fwdX(lon, lat)
    val y = graft.functions.Laea.fwdY(lon, lat)
    val noise = (u01(h(4)) - 0.5) * 0.06
    val z = truthField(x, y, t) + noise
    val source = ("A", "B", "C").productElement(((h(5) >>> 33) % 3).toInt).toString
    val station = (h(6) >>> 40) % 512
    val reading = f"lon=$lon%.6f;lat=$lat%.6f;t=$t%.1f;z=$z%.6f;source=$source"

    val b = Seq.newBuilder[Span]
    var off = 0
    b += Span("text", s"obs station=$station rev=${(h(7) >>> 50)}", "", off); off += 1
    b += Span("text", reading, "", off); off += 1
    if ((h(8) >>> 35) % 3 != 0L) { // ~2/3 of docs carry a media span
      b += Span("media", "", f"swath://tile/${(h(9) >>> 30) % 100000}%05d.png", off); off += 1
    }
    if ((h(10) >>> 35) % 3 == 0L) { // ~1/3 carry a trailing note
      b += Span("text", s"qc flag=${(h(11) >>> 55)}", "", off); off += 1
    }
    ObsDoc(f"doc-$i%09d", b.result())
  }

  /** Distributed deterministic synthesis of `nDocs` documents. */
  def synthesize(spark: SparkSession, nDocs: Long, seed: Long = 42L,
                 numPartitions: Int = 0): Dataset[ObsDoc] = {
    import spark.implicits._
    val base = if (numPartitions > 0) spark.range(0, nDocs, 1, numPartitions) else spark.range(nDocs)
    base.map(i => makeDoc(i, seed))
  }

  /** Span projection: obs_docs -> observation rows. Declarative built-ins
    * only (filter + str_to_map on the reading span), and the full `spans`
    * payload is carried through untouched — the per-row span-sequence
    * invariant (kind, text, media_ref, order) holds on the output
    * (reference analog: `_modify_df` never reorders, dataloader.py:1681-1799).
    *
    * Output: doc_id, lon, lat, t, z, source, x, y, spans.
    */
  def extractObs(docs: DataFrame): DataFrame = {
    // the reading is the first text span whose text carries a serialized
    // observation; filter(...) keeps array order, element_at picks it.
    val reading = element_at(
      filter(col("spans"), s => s.getField("kind") === "text" && s.getField("text").startsWith("lon=")), 1)
    val kv = expr("str_to_map(__reading.text, ';', '=')")
    docs
      .withColumn("__reading", reading)
      .filter(col("__reading").isNotNull)
      .withColumn("__kv", kv)
      .select(
        col("doc_id"),
        col("__kv")("lon").cast("double").as("lon"),
        col("__kv")("lat").cast("double").as("lat"),
        col("__kv")("t").cast("double").as("t"),
        col("__kv")("z").cast("double").as("z"),
        col("__kv")("source").as("source"),
        col("spans"))
      .withColumn("x", laea_x(col("lon"), col("lat")))
      .withColumn("y", laea_y(col("lon"), col("lat")))
  }

  /** Inverse span projection: exploded span rows (doc_id, pos, kind,
    * text, media_ref, offset) back into per-document `spans` arrays. The
    * sequence is reconstructed from each span's OWN position (array_sort
    * on the collected structs by pos), NOT from row arrival order — so
    * the per-row span-sequence invariant (kind, text, media_ref, order)
    * holds after ANY shuffle/repartition of the exploded rows; one
    * partial-aggregated groupBy on doc_id is the only exchange.
    */
  def reassembleSpans(exploded: DataFrame): DataFrame =
    exploded.groupBy("doc_id").agg(
      array_sort(collect_list(struct(col("pos"), col("kind"), col("text"),
        col("media_ref"), col("offset")))).as("_ps"))
      .select(col("doc_id"), transform(col("_ps"), p =>
        struct(p("kind").as("kind"), p("text").as("text"),
          p("media_ref").as("media_ref"), p("offset").as("offset"))).as("spans"))
}
