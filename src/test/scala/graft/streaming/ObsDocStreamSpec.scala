package graft.streaming

import graft.SparkTestBase
import graft.sources.{ObsDoc, ObsDocs, Span}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

case class StreamDoc(doc_id: String, spans: Seq[Span], event_time: Timestamp)

class ObsDocStreamSpec extends AnyFunSuite with SparkTestBase {
  import spark.implicits._

  test("streaming span projection + windowed tile binning matches the batch aggregate") {
    implicit val sqlCtx = spark.sqlContext
    val docs = (0L until 300L).map { i =>
      val d = ObsDocs.makeDoc(i, 42)
      StreamDoc(d.doc_id, d.spans, new Timestamp(1700000000000L + (i % 7) * 60000))
    }
    val input = MemoryStream[StreamDoc]
    val obs = ObsDocStream.extractObs(input.toDF())
    val binned = ObsDocStream.binStream(obs, gridRes = 500000.0,
      watermark = "1 minute", window = "10 minutes")
    val q = binned.writeStream.outputMode("complete")
      .format("memory").queryName("binned_stream")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      input.addData(docs.take(150): _*)
      q.processAllAvailable()
      input.addData(docs.drop(150): _*)
      q.processAllAvailable()
      val got = spark.table("binned_stream")
        .groupBy("cell", "t", "source").agg(sum("z_sum").as("z_sum"), sum("n").as("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)) -> (r.getDouble(3), r.getLong(4))).toMap

      // batch equivalent over the same docs
      val batch = ObsDocs.extractObs(docs.map(d => ObsDoc(d.doc_id, d.spans)).toDF())
        .groupBy(graft.functions.cell_encode(col("x"), col("y"), 500000.0, -4500000.0, -4500000.0).as("cell"),
          col("t"), col("source"))
        .agg(sum("z").as("z_sum"), count(lit(1)).as("n"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2)) -> (r.getDouble(3), r.getLong(4))).toMap

      assert(got.keySet === batch.keySet)
      for ((k, (zs, n)) <- batch) {
        assert(got(k)._2 === n, s"count at $k")
        assert(math.abs(got(k)._1 - zs) < 1e-9, s"sum at $k")
      }
    } finally q.stop()
  }

  test("archiveToZarr: micro-batches append days idempotently under replay") {
    implicit val sqlCtx = spark.sqlContext
    def day(t: Double) =
      for { iy <- 0 until 3; ix <- 0 until 4 }
        yield (t, 10.0 * iy, 1.0 * ix, t + iy * 10 + ix)
    val input = MemoryStream[(Double, Double, Double, Double)]
    val dir = java.nio.file.Files.createTempDirectory("stream_zarr_")
      .resolve("arch.zarr").toString
    val ckpt = java.nio.file.Files.createTempDirectory("stream_ckpt_").toString
    val slices = input.toDF().toDF("t", "y", "x", "v")
    val q = ObsDocStream.archiveToZarr(slices, dir, Seq("t", "y", "x"), Seq("v"), ckpt)
    try {
      input.addData(day(100.0): _*)
      q.processAllAvailable()
      assert(graft.sources.ZarrGrid.dimAxis(spark, dir, "t").toSeq === Seq(100.0))
      // at-least-once replay: day 100 arrives AGAIN alongside day 101
      input.addData(day(101.0) ++ day(100.0): _*)
      q.processAllAvailable()
      input.addData(day(102.0): _*)
      q.processAllAvailable()
    } finally q.stop()
    val back = graft.sources.ZarrGrid.readGridNd(spark, dir, Seq("t", "y", "x"), Seq("v"))
    assert(back.count() === 3 * 3 * 4)
    val want = (day(100.0) ++ day(101.0) ++ day(102.0)).toSet
    assert(back.collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet === want)
  }

  test("archiveToNetCdf: granule files append idempotently under replay") {
    implicit val sqlCtx = spark.sqlContext
    def day(t: Double) =
      for { iy <- 0 until 3; ix <- 0 until 4 }
        yield (t, 10.0 * iy, 1.0 * ix, t - iy * 2 + ix)
    val input = MemoryStream[(Double, Double, Double, Double)]
    val dir = java.nio.file.Files.createTempDirectory("stream_nc_").toString + "/arch"
    val ckpt = java.nio.file.Files.createTempDirectory("stream_nc_ckpt_").toString
    val slices = input.toDF().toDF("t", "y", "x", "v")
    val q = ObsDocStream.archiveToNetCdf(slices, dir, Seq("t", "y", "x"), Seq("v"), ckpt)
    try {
      input.addData(day(200.0): _*)
      q.processAllAvailable()
      assert(graft.sources.NetCdfGrid.archivedDim0(spark, dir, "t") === Set(200.0))
      // at-least-once replay: day 200 arrives AGAIN alongside day 201
      input.addData(day(201.0) ++ day(200.0): _*)
      q.processAllAvailable()
      assert(graft.sources.NetCdfGrid.archivedDim0(spark, dir, "t") === Set(200.0, 201.0))
    } finally q.stop()
    val back = graft.sources.NetCdfGrid.readGridNd(spark, dir + "/*.nc",
      Seq("t", "y", "x"), Seq("v"))
    assert(back.count() === 2 * 3 * 4)
    val want = (day(200.0) ++ day(201.0)).toSet
    assert(back.select("t", "y", "x", "v").collect().map(r =>
      (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))).toSet === want)
  }

  test("streaming exact dedup: same content within the watermark drops, batch-parity key") {
    implicit val sqlCtx = spark.sqlContext
    val ts = new Timestamp(1700000000000L)
    val base = ObsDocs.makeDoc(1L, 42)
    val other = ObsDocs.makeDoc(2L, 42)
    val input = MemoryStream[StreamDoc]
    val deduped = ObsDocStream.dedupStream(input.toDF(), watermark = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      input.addData(
        StreamDoc("a", base.spans, ts),
        StreamDoc("b", base.spans, new Timestamp(ts.getTime + 1000)), // same CONTENT -> dropped
        StreamDoc("c", other.spans, new Timestamp(ts.getTime + 2000)))
      q.processAllAvailable()
      input.addData(
        StreamDoc("d", base.spans, new Timestamp(ts.getTime + 3000))) // still in horizon -> dropped
      q.processAllAvailable()
      val kept = spark.table("dedup_stream").select("doc_id").as[String].collect().sorted
      assert(kept.toSeq === Seq("a", "c"), s"got ${kept.toSeq}")
    } finally q.stop()
  }

  test("dedupStreamAgainstArchive: archived content drops, fresh passes, in-stream repeats drop") {
    implicit val sqlCtx = spark.sqlContext
    val ts = new Timestamp(1700000000000L)
    val archivedDoc = ObsDocs.makeDoc(1L, 42)
    val freshDoc = ObsDocs.makeDoc(2L, 42)
    val freshDoc2 = ObsDocs.makeDoc(3L, 42)
    // static archive: content strings matching xxhash64(to_json(spans))
    val archive = Seq(Tuple1(archivedDoc)).toDF("d")
      .select(to_json(col("d.spans")).as("content"))
    val input = MemoryStream[StreamDoc]
    val deduped = ObsDocStream.dedupStreamAgainstArchive(
      input.toDF(), archive, "content",
      expectedArchiveItems = 100L, fpp = 0.001, watermark = "10 minutes")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("arch_dedup_stream")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      input.addData(
        StreamDoc("a", archivedDoc.spans, ts),                              // in archive -> dropped
        StreamDoc("b", freshDoc.spans, new Timestamp(ts.getTime + 1000)),   // new -> kept
        StreamDoc("c", freshDoc.spans, new Timestamp(ts.getTime + 2000)))   // in-batch repeat -> dropped
      q.processAllAvailable()
      input.addData(
        StreamDoc("d", archivedDoc.spans, new Timestamp(ts.getTime + 3000)), // archived -> dropped
        StreamDoc("e", freshDoc2.spans, new Timestamp(ts.getTime + 4000)))   // new -> kept
      q.processAllAvailable()
      val kept = spark.table("arch_dedup_stream").select("doc_id").as[String].collect().sorted
      assert(kept.toSeq === Seq("b", "e"), s"got ${kept.toSeq}")
    } finally q.stop()
  }

  case class EdgePoint(x: Double, y: Double, t: Double, z: Double,
                       source: String, event_time: Timestamp)

  test("routeToTiles: stream-static radius join matches the batch radiusJoin exactly") {
    implicit val sqlCtx = spark.sqlContext
    val ts = new Timestamp(1700000000000L)
    val experts = Seq((0.0, 0.0, 10L), (250.0, 0.0, 11L), (1000.0, 1000.0, 12L))
      .toDF("ex", "ey", "expert_id")
    val input = MemoryStream[EdgePoint]
    val routed = ObsDocStream.routeToTiles(input.toDF(), experts, radius = 300.0)
    val q = routed.writeStream.outputMode("append")
      .format("memory").queryName("route_stream")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    val pts = Seq(
      EdgePoint(100.0, 0.0, 1.0, 1.5, "A", ts),   // near experts 10 AND 11
      EdgePoint(260.0, 10.0, 1.0, 2.5, "A", ts),  // near 11 (and 10 at ~278)
      EdgePoint(5000.0, 5000.0, 1.0, 3.5, "A", ts)) // matches nothing
    try {
      input.addData(pts: _*)
      q.processAllAvailable()
      val got = spark.table("route_stream").select("z", "expert_id").collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toSet
      val batchDf = pts.map(p => (p.x, p.y, p.t, p.z, p.source, p.event_time))
        .toDF("x", "y", "t", "z", "source", "event_time")
      val batch = graft.operators.SpatialJoin.radiusJoin(
        batchDf, experts, graft.operators.SpatialJoin.RadiusJoinConfig(
          radius = 300.0, leftX = "x", leftY = "y",
          rightX = "ex", rightY = "ey", rightPrefix = ""))
        .select("z", "expert_id").collect()
        .map(r => (r.getDouble(0), r.getLong(1))).toSet
      assert(got === batch && got.nonEmpty)
      assert(!got.exists(_._1 == 3.5), "out-of-radius obs routes nowhere")
    } finally q.stop()
  }

  test("binStream batch-parity edge semantics: out-of-range drops, v == extent lands in last bin") {
    implicit val sqlCtx = spark.sqlContext
    val ts = new Timestamp(1700000000000L)
    val input = MemoryStream[EdgePoint]
    // grid [0, 10] at res 1 -> 10 bins, indices 0..9
    val binned = ObsDocStream.binStream(input.toDF(), gridRes = 1.0,
      origin = 0.0, extent = 10.0, watermark = "1 minute", window = "10 minutes")
    val q = binned.writeStream.outputMode("complete")
      .format("memory").queryName("edge_stream")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      input.addData(
        EdgePoint(10.0, 10.0, 1.0, 1.0, "A", ts),  // exactly at extent -> LAST bin (9,9)
        EdgePoint(10.5, 5.0, 1.0, 1.0, "A", ts),   // beyond extent -> dropped
        EdgePoint(-0.1, 5.0, 1.0, 1.0, "A", ts),   // below origin -> dropped
        EdgePoint(0.0, 0.0, 1.0, 1.0, "A", ts))    // at origin -> bin (0,0)
      q.processAllAvailable()
      val cells = spark.table("edge_stream").select("cell").collect().map(_.getLong(0)).toSet
      def cell(ix: Long, iy: Long): Long = (ix + 1048576L) * 2097152L + (iy + 1048576L)
      assert(cells === Set(cell(9, 9), cell(0, 0)),
        s"expected last-bin clamp + in-range only, got $cells")
      // same points through batch Binning.binDataBy land in the same cells
      val batchDf = Seq((10.0, 10.0, 1.0), (10.5, 5.0, 1.0), (-0.1, 5.0, 1.0), (0.0, 0.0, 1.0))
        .toDF("x", "y", "z")
      val batch = graft.operators.Binning.binDataBy(batchDf, graft.operators.Binning.BinConfig(
        valCol = "z", gridRes = 1.0, xRange = (0.0, 10.0), yRange = (0.0, 10.0)))
        .select("x", "y").collect().map(r => (r.getDouble(0), r.getDouble(1))).toSet
      assert(batch === Set((9.5, 9.5), (0.5, 0.5)))
    } finally q.stop()
  }

  test("stateless text-quality gate runs unchanged on a stream: quality + langId + PII + repetition + sampling") {
    implicit val sqlCtx = spark.sqlContext
    val ts = new Timestamp(1700000000000L)
    val input = MemoryStream[(Long, String, Timestamp)]
    // the batch operators compose directly on the streaming frame -- all
    // are per-row expressions (no shuffle, no state), so the SAME code
    // serves batch backfill and live ingest
    val gated = graft.operators.TextAnalysis.deterministicSample(
      graft.operators.TextAnalysis.redactPii(
        graft.operators.TextAnalysis.langId(
          graft.operators.TextAnalysis.repetitionMetrics(
            graft.operators.TextAnalysis.qualityScore(
              input.toDF().toDF("doc_id", "text", "event_time"), "text")
              .filter(col("quality_score") > 0.2),
            "doc_id", "text").filter(col("top_token_frac") < 0.9),
          "text"), "text"),
      "doc_id", frac = 1.0)
    val q = gated.writeStream.outputMode("append")
      .format("memory").queryName("quality_gate_stream")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      val good = "the quick brown fox jumps over the lazy dog and runs far away to the hills today with many other animals in tow"
      input.addData(
        (1L, good, ts),
        (2L, "a a a a a a a a a a a a a a a a a a a a", new Timestamp(ts.getTime + 1000)), // repetition-killed
        (3L, good + " mail bob@example.org now", new Timestamp(ts.getTime + 2000)))
      q.processAllAvailable()
      val rows = spark.table("quality_gate_stream")
        .select("doc_id", "text_redacted").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(rows.keySet === Set(1L, 3L), s"got ${rows.keySet}")
      assert(rows(3L).contains("<EMAIL>") && !rows(3L).contains("@"))
      // batch run over the same rows selects the same survivors
      val batchIn = Seq((1L, good), (2L, "a a a a a a a a a a a a a a a a a a a a"),
        (3L, good + " mail bob@example.org now")).toDF("doc_id", "text")
      val batch = graft.operators.TextAnalysis.deterministicSample(
        graft.operators.TextAnalysis.redactPii(
          graft.operators.TextAnalysis.langId(
            graft.operators.TextAnalysis.repetitionMetrics(
              graft.operators.TextAnalysis.qualityScore(batchIn, "text")
                .filter(col("quality_score") > 0.2),
              "doc_id", "text").filter(col("top_token_frac") < 0.9),
            "text"), "text"),
        "doc_id", frac = 1.0)
      assert(batch.select("doc_id").collect().map(_.getLong(0)).toSet === rows.keySet)
    } finally q.stop()
  }

  test("packStream: flatMapGroupsWithState packing continues bins across micro-batches, batch parity") {
    implicit val sqlCtx = spark.sqlContext
    // two chunks, token counts chosen so a bin is part-filled at the batch
    // boundary: chunk 0 docs (4,5,2,9), chunk 1 docs (7,3,6)
    val rows = Seq(
      (0L, 0L, 4L), (1L, 0L, 5L), (10L, 1L, 7L),        // batch 1
      (2L, 0L, 2L), (3L, 0L, 9L), (11L, 1L, 3L), (12L, 1L, 6L)) // batch 2
    val input = MemoryStream[(Long, Long, Long)]
    val packed = ObsDocStream.packStream(
      input.toDF().toDF("doc_id", "chunk", "n_tokens"), budget = 10L)
    val q = packed.writeStream.outputMode("append")
      .format("memory").queryName("pack_stream")
      .trigger(Trigger.ProcessingTime("1 second")).start()
    try {
      input.addData(rows.take(3): _*)
      q.processAllAvailable()
      input.addData(rows.drop(3): _*)
      q.processAllAvailable()
      val got = spark.table("pack_stream")
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
      // chunk 0: 4 -> bin0 fill4; 5 -> bin0 fill9; (next batch) 2 -> 9+2>10
      // bin1 fill2; 9 -> bin2 fill9. chunk 1: 7 -> bin0; 3 -> bin0 fill10
      // (CROSS-BATCH continuation); 6 -> bin1.
      assert(got === Seq((0L, 0L, 4L), (1L, 0L, 9L), (2L, 1L, 2L), (3L, 2L, 9L),
        (10L, 0L, 7L), (11L, 0L, 10L), (12L, 1L, 6L)))
      // parity: the batch operator over the same rows in one pass agrees
      val batchIn = rows.toDF("doc_id", "c", "n")
      val batch = graft.operators.TextAnalysis.packSequences(
          batchIn, "doc_id", col("n"), col("c"), budget = 10L)
        .orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
      assert(batch === got)
    } finally q.stop()
  }
}
