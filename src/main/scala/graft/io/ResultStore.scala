package graft.io

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths, StandardOpenOption}

/** Result-table catalog with snapshot-append semantics — the engine's
  * checkpoint store (reference: one HDF5 file of named tables with buffered
  * appends, GPSat/dataloader.py:644-704, local_experts.py:499-550).
  *
  * Locally this is a directory of parquet tables plus a `_snapshots.jsonl`
  * lineage log (one line per append: table, batch id, rows, wall time,
  * run-info). On a production cluster the same call sites bind 1:1 to
  * Iceberg (`df.writeTo(tbl).append()`, snapshot summary = run-info);
  * nothing upstream depends on the storage engine — resume is a left-anti
  * join against the `run_details` TABLE, not against files.
  */
final class ResultStore(spark: SparkSession, root: String) {
  Files.createDirectories(Paths.get(root))

  private def path(table: String) = s"$root/$table"

  def exists(table: String): Boolean = Files.exists(Paths.get(path(table), "_SUCCESS"))

  def table(name: String): DataFrame = spark.read.parquet(path(name))

  private def logSnapshot(name: String, t0: Long, runInfo: Map[String, String]): Unit = {
    val info = (runInfo ++ Map(
      "table" -> name,
      "ts_ms" -> t0.toString,
      "wall_ms" -> (System.currentTimeMillis() - t0).toString)).map {
      case (k, v) => s""""$k":"${v.replace("\"", "'")}""""
    }.mkString("{", ",", "}")
    Files.write(Paths.get(root, "_snapshots.jsonl"), (info + "\n").getBytes,
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)
  }

  /** Append a batch (one Iceberg-snapshot analog) with lineage metadata. */
  def append(name: String, df: DataFrame, runInfo: Map[String, String] = Map.empty): Unit = {
    val t0 = System.currentTimeMillis()
    df.write.mode(SaveMode.Append).parquet(path(name))
    logSnapshot(name, t0, runInfo)
  }

  def overwrite(name: String, df: DataFrame, runInfo: Map[String, String] = Map.empty): Unit = {
    val t0 = System.currentTimeMillis()
    df.write.mode(SaveMode.Overwrite).parquet(path(name))
    logSnapshot(name, t0, runInfo + ("mode" -> "overwrite"))
  }

  /** Results reader (reference `get_results_from_h5file`,
    * GPSat/local_experts.py:1467-1620): read a result table and left-join
    * the expert-location attributes onto it on the coordinate columns,
    * suffixing colliding names with `_expert_location`.
    */
  def tableWithExpertLocs(name: String, expertTable: String = "run_details",
                          coordsCol: Seq[String] = Seq("x", "y", "t")): DataFrame = {
    val t = table(name)
    var e = table(expertTable).dropDuplicates(coordsCol)
    for (c <- e.columns if !coordsCol.contains(c) && t.columns.contains(c))
      e = e.withColumnRenamed(c, c + "_expert_location")
    t.join(e, coordsCol, "left")
  }

  /** Export result tables into ONE multi-key `.h5` — the reference's
    * store-file shape (one HDF5 file with run_details / preds / ... keys,
    * local_experts.py:499-550), so a reference user's downstream
    * `pd.read_hdf(file, key)` tooling reads this engine's results directly.
    * Double/long/string columns; driver-side single-file write, the honest
    * cost for result-store-sized tables.
    */
  /** Export store tables to ONE reference-shaped multi-key `.h5`.
    * `format = "table"` writes the PyTables format='table' layout the
    * reference itself uses for its result stores (`write_to_hdf`,
    * GPSat/dataloader.py:644-704); "fixed" (default) writes the
    * BlockManagerFixed layout.
    */
  def exportH5(outPath: String, tables: Seq[String], format: String = "fixed"): Unit = {
    val present = tables.filter(exists)
    require(present.nonEmpty, s"none of ${tables.mkString(",")} exist in $root")
    format match {
      case "fixed" => graft.sources.Hdf5Table.writePandasFixedKeys(
        present.map(t => t -> table(t)), outPath)
      case "table" => graft.sources.Hdf5Table.writePandasTableKeys(
        present.map(t => t -> table(t)), outPath, chunkRows = 512, deflate = 6)
      case o => throw new IllegalArgumentException(
        s"export format '$o' not supported (fixed/table)")
    }
  }

  /** Import every key of a reference-shaped multi-key `.h5` store as
    * overwrite-mode tables (the migration path INTO this engine).
    */
  def importH5(spark: SparkSession, h5Path: String): Seq[String] = {
    val keys = graft.sources.Hdf5Table.pandasKeys(spark, h5Path)
    keys.foreach { k =>
      // readPandasKey dispatches format='fixed' vs format='table' by shape
      overwrite(k, graft.sources.Hdf5Table.readPandasKey(spark, h5Path, k).drop("index"),
        Map("imported_from" -> h5Path))
    }
    keys
  }

  /** Config identity (reference `get_previous_oi_config`, utils.py:1136-1273):
    * exact canonical-JSON equality against previously stored configs; a match
    * reuses its idx, otherwise max(idx) + 1 is assigned and appended.
    */
  def configId(configJson: String): Int = {
    import spark.implicits._
    if (exists("oi_config")) {
      val prev = table("oi_config")
      val hit = prev.filter(col("config") === configJson).select("idx").collect()
      if (hit.nonEmpty) return hit.head.getInt(0)
      val next = prev.agg(max("idx")).head().getInt(0) + 1
      append("oi_config", Seq((next, java.time.Instant.now.toString, configJson))
        .toDF("idx", "datetime", "config"))
      next
    } else {
      append("oi_config", Seq((0, java.time.Instant.now.toString, configJson))
        .toDF("idx", "datetime", "config"))
      0
    }
  }
}
