package graft

import graft.core.JsonConfig
import graft.io.ResultStore
import graft.plans.GpSatPipeline
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Config-driven CLI — the spark-submit analog of the reference's
  * `python -m GPSat... <config.json>` entry points: parse the JSON run
  * config, register the config identity, run the full pipeline (resumable:
  * rerunning with the same store skips completed experts), write result
  * tables + snapshot lineage.
  *
  * Usage: GpSatCli <config.json> <storeDir> [localCores]
  */
object GpSatCli {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GpSatCli <config.json> <storeDir> [localCores]")
    val json = Files.readString(Paths.get(args(0)))
    val storeDir = args(1)
    val cores = if (args.length > 2) args(2) else "32"

    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("gpsatspark")
      .config("spark.sql.shuffle.partitions", (cores.toInt * 8).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.registerAll(spark)

    val cfg = JsonConfig.parsePipeline(json)
    val store = new ResultStore(spark, storeDir)
    val configId = store.configId(JsonConfig.canonical(json))
    val summary = GpSatPipeline.runAll(spark, store,
      cfg.copy(oi = cfg.oi.copy(configId = configId)))
    println(s"config_id=$configId tiles=${summary.tiles} skipped=${summary.skipped} " +
      s"pred_rows=${summary.predRows} fit_seconds=${summary.fitSeconds}")
    JsonConfig.exportH5Path(json).foreach { p =>
      store.exportH5(p, Seq("run_details", "preds", "lengthscales", "kernel_variance",
        "likelihood_variance", "lengthscales_SMOOTHED", "kernel_variance_SMOOTHED",
        "likelihood_variance_SMOOTHED"), JsonConfig.exportH5Format(json))
      println(s"exported_h5=$p")
    }
    spark.stop()
  }
}
