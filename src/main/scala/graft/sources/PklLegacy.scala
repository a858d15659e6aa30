package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Legacy pickled-dict stores — the reference's `read_from_pkl_dict`
  * (GPSat/dataloader.py:782-932): each `.pkl` file is a Python dict of
  * {"YYYYMMDD..." -> 2-d numpy array}; every (row, col, date) cell becomes
  * one observation row, NaN cells drop, and the originating source name
  * rides along. Output columns: `idx0`, `idx1`, `date` (DateType),
  * `<valueName>` (the reference's default_name, "obs"), `source`.
  *
  * Decoding runs EXECUTOR-side, one task per granule file (binaryFile
  * scan + the pure-JVM [[PickleLite]] numpy unpickler) — the multi-file
  * shape of the legacy archives; nothing is collected to the driver.
  */
object PklLegacy {

  /** Single-source form: `files` all belong to one source named
    * `sourceName` (the reference's str/list call shapes with
    * default_name).
    */
  def readPklDict(spark: SparkSession, files: Seq[String],
                  valueName: String = "obs", sourceName: String = "obs"): DataFrame =
    readPklDictSources(spark, Seq(sourceName -> files), valueName)

  /** Dict form: (source name, its files) groups, concatenated — the
    * reference's `pkl_files` dict call shape.
    */
  def readPklDictSources(spark: SparkSession, groups: Seq[(String, Seq[String])],
                         valueName: String = "obs"): DataFrame = {
    require(groups.nonEmpty && groups.forall(_._2.nonEmpty), "no pickle files given")
    val schema = StructType(Seq(
      StructField("idx0", LongType, nullable = false),
      StructField("idx1", LongType, nullable = false),
      StructField("date", DateType, nullable = false),
      StructField(valueName, DoubleType, nullable = false),
      StructField("source", StringType, nullable = false)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    groups.map { case (name, files) =>
      spark.read.format("binaryFile").load(files: _*)
        .select(col("path"), col("content"))
        .flatMap { r =>
          val path = r.getString(0)
          val dict = PickleLite.unpickle(r.getAs[Array[Byte]](1)) match {
            case m: scala.collection.Map[_, _] => m.toSeq
            case other => throw new IllegalArgumentException(
              s"$path: expected a pickled dict of arrays, got ${other.getClass.getName}")
          }
          dict.iterator.flatMap { case (k, v) =>
            val key = String.valueOf(k)
            require(key.length >= 8 && key.take(8).forall(_.isDigit),
              s"$path: key '$key' is not YYYYMMDD-prefixed")
            // the reference's HARDCODED key_to_date (dataloader.py:838)
            val date = java.sql.Date.valueOf(
              s"${key.substring(0, 4)}-${key.substring(4, 6)}-${key.substring(6, 8)}")
            val a = v match {
              case nd: PickleLite.NdArray => nd
              case other => throw new IllegalArgumentException(
                s"$path: value for '$key' is ${other.getClass.getName}, expected ndarray")
            }
            require(a.shape.length == 2, s"$path: '$key' array is ${a.shape.length}-d, expected 2-d")
            val Seq(nr, nc) = a.shape
            val flat = a.doubles
            (0 until nr * nc).iterator
              .filterNot(i => java.lang.Double.isNaN(flat(i)))
              .map(i => Row((i / nc).toLong, (i % nc).toLong, date, flat(i), name))
          }
        }(enc)
    }.reduce(_ unionByName _)
  }
}
