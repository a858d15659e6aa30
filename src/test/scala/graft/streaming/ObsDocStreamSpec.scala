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
}
