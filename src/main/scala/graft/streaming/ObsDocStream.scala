package graft.streaming

import graft.functions.{laea_x, laea_y}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming ingestion for the obs-doc table. The reference engine is
  * strictly batch (SURVEY.md §2.10) — its "incremental" behavior is resume
  * via anti-join — but a continuously-arriving observation feed is the
  * natural 100 TB ingest shape, so the library ships the streaming half of
  * the pipeline: obs-doc stream -> span projection -> cell/tile binning
  * with event-time watermarking. The output (per-tile partial aggregates)
  * appends to the same binned table the batch OI job reads, making the
  * batch fit incremental at the tile level.
  *
  * All transforms are the SAME declarative expressions as the batch path
  * (ObsDocs.extractObs / Binning.binDataBy semantics) — Structured
  * Streaming just changes the source/sink; watermark + append mode keep
  * state bounded.
  */
object ObsDocStream {

  /** Span projection on a streaming DataFrame of obs docs
    * (doc_id, spans, event_time). Same expressions as the batch
    * `ObsDocs.extractObs`, plus the event-time column carried through.
    */
  def extractObs(docs: DataFrame): DataFrame = {
    val reading = element_at(
      filter(col("spans"), s => s.getField("kind") === "text" && s.getField("text").startsWith("lon=")), 1)
    docs
      .withColumn("__reading", reading)
      .filter(col("__reading").isNotNull)
      .withColumn("__kv", expr("str_to_map(__reading.text, ';', '=')"))
      .select(
        col("doc_id"),
        col("event_time"),
        col("__kv")("lon").cast("double").as("lon"),
        col("__kv")("lat").cast("double").as("lat"),
        col("__kv")("t").cast("double").as("t"),
        col("__kv")("z").cast("double").as("z"),
        col("__kv")("source").as("source"),
        col("spans"))
      .withColumn("x", laea_x(col("lon"), col("lat")))
      .withColumn("y", laea_y(col("lon"), col("lat")))
  }

  /** Streaming exact dedup — the streaming half of `Dedup.exact`: drop
    * documents whose CONTENT (the canonical-JSON spans payload) already
    * arrived inside the watermark horizon. The state store keys on the
    * same 8-byte `xxhash64` the batch operator shuffles on, so state is
    * 8 bytes + timestamp per distinct document and is evicted by the
    * watermark — bounded regardless of stream length. Collision class =
    * the batch operator's (documented there).
    */
  def dedupStream(docs: DataFrame, watermark: String = "10 minutes"): DataFrame =
    docs
      .withColumn("__text_hash", xxhash64(to_json(col("spans"))))
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")

  /** Streaming incremental dedup against a STATIC archive — the streaming
    * half of [[graft.operators.Dedup.dedupAgainstArchive]], composed with
    * [[dedupStream]]'s in-stream dedup:
    *
    *  1. a Bloom filter over the archive's 8-byte content hashes (one
    *     batch treeAggregate at stream start, broadcast) screens every
    *     arriving row STATELESSLY — bloom-negative rows are definitely
    *     new and never touch a join;
    *  2. bloom-positive rows (true dupes + fpp of the stream) confirm
    *     against the distinct archive hash table via a stream-static
    *     left_outer join + null filter (the supported anti-join form);
    *  3. the survivors pass through the same watermark-bounded
    *     `dropDuplicatesWithinWatermark` as [[dedupStream]], so in-batch
    *     repeats are also dropped.
    *
    * Content identity = `xxhash64(to_json(spans))`, identical to
    * [[dedupStream]] and the batch operator; streaming state stays
    * 8 bytes + timestamp per distinct NEW document, watermark-evicted,
    * regardless of archive size.
    */
  def dedupStreamAgainstArchive(docs: DataFrame, archive: DataFrame,
                                archiveContentCol: String,
                                expectedArchiveItems: Long = 1000000L,
                                fpp: Double = 0.01,
                                watermark: String = "10 minutes"): DataFrame = {
    val archHash = archive
      .select(xxhash64(col(archiveContentCol)).as("__h")).distinct()
    val bloom = archHash.stat.bloomFilter("__h", expectedArchiveItems, fpp)
    val bloomBc = docs.sparkSession.sparkContext.broadcast(bloom)
    val maybeDup = udf((h: Long) => bloomBc.value.mightContainLong(h))
    val hashed = docs.withColumn("__h", xxhash64(to_json(col("spans"))))
    val fresh = hashed.filter(!maybeDup(col("__h")))
    val confirmed = hashed.filter(maybeDup(col("__h")))
      .join(archHash.withColumn("__dup", lit(1)), Seq("__h"), "left_outer")
      .filter(col("__dup").isNull).drop("__dup")
    fresh.unionByName(confirmed)
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark("__h")
      .drop("__h")
  }

  /** Streaming tile routing — the stream-static half of `local_select`
    * (SURVEY §2.4): every arriving observation joins the (small, static)
    * expert grid through the SAME cell-bucketed radius join as the batch
    * path ([[graft.operators.SpatialJoin.radiusJoin]] — the expert side
    * neighbor-explodes and broadcasts, the stream side never shuffles),
    * emitting one row per (obs, expert tile within `radius`). Feeding a
    * per-tile incremental fit is then a plain grouped sink. Pure
    * stream-static equi join + refine filter: no streaming state at all.
    */
  def routeToTiles(obs: DataFrame, experts: DataFrame, radius: Double,
                   expertX: String = "ex", expertY: String = "ey"): DataFrame =
    graft.operators.SpatialJoin.radiusJoin(obs, experts,
      graft.operators.SpatialJoin.RadiusJoinConfig(
        radius = radius, leftX = "x", leftY = "y",
        rightX = expertX, rightY = expertY, rightPrefix = ""))

  /** Windowed tile aggregation: per (event-time window, tile cell, t,
    * source) partial sums. Append-mode-safe via the watermark; the
    * batch-side bin mean is sum/count, so partials merge exactly.
    */
  def binStream(obs: DataFrame, gridRes: Double = 50000.0,
                origin: Double = -4500000.0,
                extent: Double = 4500000.0,
                watermark: String = "10 minutes",
                window: String = "5 minutes"): DataFrame = {
    // same edge semantics as batch Binning.binDataBy: out-of-range points
    // drop, and the rightmost bin is closed on both sides (v == extent
    // lands in the last bin), so streaming partials land in exactly the
    // cells the batch bin table would contain.
    val n = ((extent - origin) / gridRes).toLong
    require(n > 0, "grid_res larger than range")
    val inRange = col("x").between(origin, extent) && col("y").between(origin, extent)
    val ix = least(floor((col("x") - lit(origin)) / gridRes), lit(n - 1)).cast("long")
    val iy = least(floor((col("y") - lit(origin)) / gridRes), lit(n - 1)).cast("long")
    // same packing constants as the batch CellEncode path — referenced from
    // graft.functions.Cells so streaming and batch cell ids cannot drift
    val cell = (ix + graft.functions.Cells.Offset) * graft.functions.Cells.Stride +
      (iy + graft.functions.Cells.Offset)
    obs
      .filter(inRange)
      .withWatermark("event_time", watermark)
      .groupBy(
        org.apache.spark.sql.functions.window(col("event_time"), window),
        cell.as("cell"),
        col("t"), col("source"))
      .agg(sum("z").as("z_sum"), count(lit(1)).as("n"),
        min("z").as("z_min"), max("z").as("z_max"))
  }

  /** Streaming ARCHIVE sink: each micro-batch's first-dim slices append
    * to a growing zarr store through the SAME executor-parallel
    * [[graft.sources.ZarrGrid.appendGridNdDistributed]] as batch — and
    * idempotently: slices whose dim-0 value is already archived are
    * dropped before the append, so at-least-once replay after a restart
    * cannot double-append a day. Batches must carry COMPLETE slices
    * (upstream, a watermark/window close is what finalizes a day); a
    * gapped lattice raises the batch sink's loud error.
    */
  def archiveToZarr(slices: DataFrame, dir: String, dimCols: Seq[String],
                    varNames: Seq[String], checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    slices.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val p = new org.apache.hadoop.fs.Path(dir)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        val exists = fs.exists(new org.apache.hadoop.fs.Path(s"$dir/.zgroup")) ||
          fs.exists(new org.apache.hadoop.fs.Path(s"$dir/zarr.json"))
        val fresh =
          if (!exists) batch.toDF()
          else {
            val have = graft.sources.ZarrGrid.dimAxis(spark, dir, dimCols.head).toSeq
            if (have.isEmpty) batch.toDF()
            else batch.toDF().filter(!col(dimCols.head).isin(have: _*))
          }
        if (!fresh.isEmpty) {
          if (!exists)
            graft.sources.ZarrGrid.writeGridNdDistributed(fresh, dir, dimCols, varNames)
          else
            graft.sources.ZarrGrid.appendGridNdDistributed(fresh, dir, dimCols, varNames)
        }
      }
      .start()

  /** [[archiveToZarr]]'s netCDF twin: micro-batches append per-slice
    * granule files through the batch
    * [[graft.sources.NetCdfGrid.appendGridNdDistributed]] sink,
    * idempotently — already-archived dim-0 values (probed by the
    * distributed ranged-header sweep) drop before the append, so
    * at-least-once replay cannot double-append a granule.
    */
  def archiveToNetCdf(slices: DataFrame, dir: String, dimCols: Seq[String],
                      varNames: Seq[String], checkpoint: String)
  : org.apache.spark.sql.streaming.StreamingQuery =
    slices.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        val spark = batch.sparkSession
        val have = graft.sources.NetCdfGrid.archivedDim0(spark, dir, dimCols.head)
        val fresh =
          if (have.isEmpty) batch.toDF()
          else batch.toDF().filter(!col(dimCols.head).isin(have.toSeq: _*))
        if (!fresh.isEmpty) {
          if (have.isEmpty)
            graft.sources.NetCdfGrid.writeGridNdDistributed(fresh, dir, dimCols, varNames)
          else
            graft.sources.NetCdfGrid.appendGridNdDistributed(fresh, dir, dimCols, varNames)
        }
      }
      .start()

  /** Persistent per-chunk packer state: the currently-open bin index and
    * its token fill. 16 bytes per ACTIVE chunk — the packer's whole
    * streaming footprint.
    */
  final case class PackState(bin: Long, fill: Long)

  /** Streaming greedy sequence packing — the continuous half of
    * [[graft.operators.TextAnalysis.packSequences]]: documents arrive as
    * (doc_id, chunk, n_tokens) and are packed into fixed `budget`-token
    * bins per chunk, with the open bin's (index, fill) carried ACROSS
    * micro-batches in `flatMapGroupsWithState` custom state, so a bin
    * that was part-filled in one batch keeps filling in the next — the
    * training-batch constructor that never re-reads the corpus.
    *
    * In-batch order is ascending doc_id per chunk (micro-batches are
    * sorted in-group before packing); across batches, order is arrival
    * order — feeding the same rows in one batch or many yields the SAME
    * packing when batch boundaries respect doc_id order (spec-checked
    * against the batch operator). State is 16 bytes per active chunk and
    * independent of document count; chunks that stop arriving can be
    * evicted by recreating the query with a timeout if the chunk key
    * space is unbounded.
    */
  def packStream(docs: DataFrame, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    val spark = docs.sparkSession
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode, GroupState}
    docs.selectExpr("CAST(doc_id AS LONG) doc_id", "CAST(chunk AS LONG) chunk",
        "CAST(n_tokens AS LONG) n_tokens")
      .as[(Long, Long, Long)]
      .groupByKey(_._2)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (chunk: Long, rows: Iterator[(Long, Long, Long)], state: GroupState[PackState]) => {
          var st = state.getOption.getOrElse(PackState(-1L, 0L))
          val out = rows.toArray.sortBy(_._1).map { case (id, _, n) =>
            st =
              if (st.bin < 0) PackState(0L, n)
              else if (st.fill + n <= budget) PackState(st.bin, st.fill + n)
              else PackState(st.bin + 1L, n)
            (id, chunk, n, st.bin, st.fill)
          }
          state.update(st)
          out.iterator
        })
      .toDF("doc_id", "chunk", "n_tokens", "bin", "bin_fill")
  }
}
