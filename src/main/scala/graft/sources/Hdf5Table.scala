package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Columnar `.h5` table source/sink over [[Hdf5Lite]] — the Spark analog of
  * the reference's HDF5 store lifecycle (`DataLoader.load` on .h5,
  * GPSat/dataloader.py:563-624: `pd.read_hdf(path, key, where=...)`).
  * A table is stored as one 1-d dataset per column, all equal length (the
  * columnar equivalent of the reference's fixed-format HDFStore frame).
  *
  * Scale shape mirrors NetCdfGrid: granule FILES are the unit of
  * parallelism. `read` scans a path glob with Spark's binaryFile source
  * (one task per granule, no driver-side I/O) and decodes each granule
  * with the pure-JVM codec inside `flatMap`; a directory of granules reads
  * as one declarative scan. `writeGranules` writes one `.h5` file PER
  * PARTITION from the executors — a 100-TB table exports without ever
  * collecting to the driver; `writeFile` writes a single small file (the
  * reference's per-run result-store shape).
  */
object Hdf5Table {

  /** Read every matching `.h5` granule into one DataFrame. All granules
    * must carry the same column set; long-typed columns stay LongType,
    * float columns DoubleType, plus a `source_file` provenance column.
    */
  def read(spark: SparkSession, pathGlob: String): DataFrame = {
    // schema discovery from ONE granule (driver reads a single file header,
    // same cost shape as Spark's own parquet schema inference)
    val fs = new org.apache.hadoop.fs.Path(pathGlob)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val first = {
      val glob = fs.globStatus(new org.apache.hadoop.fs.Path(pathGlob))
      require(glob != null && glob.nonEmpty, s"no files match $pathGlob")
      val p = glob.map(_.getPath).minBy(_.toString)
      val in = fs.open(p)
      try {
        val len = fs.getFileStatus(p).getLen.toInt
        val bytes = new Array[Byte](len)
        in.readFully(0, bytes)
        Hdf5Lite.read(bytes)
      } finally in.close()
    }
    val colsSorted = first.sortBy(_.name)
    val schema = StructType(
      StructField("source_file", StringType, nullable = false) +:
        colsSorted.map(c => StructField(c.name,
          if (c.longs != null) LongType else DoubleType, nullable = false)))
    val names = colsSorted.map(_.name)
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spark.read.format("binaryFile").load(pathGlob)
      .select(col("path"), col("content"))
      .flatMap { r =>
        val path = r.getString(0)
        val byName = Hdf5Lite.read(r.getAs[Array[Byte]](1)).map(c => c.name -> c).toMap
        require(names.forall(byName.contains),
          s"$path: columns ${byName.keys.toSeq.sorted} != expected $names")
        val cols = names.map(byName)
        val n = cols.head.shape.product
        require(cols.forall(_.shape.product == n), s"$path: ragged columns")
        (0 until n).iterator.map { i =>
          // explicit Any: Long/Double branches must NOT unify (Scala would
          // silently widen the Long to Double and break the BIGINT column)
          Row.fromSeq(path +: cols.map[Any](c =>
            if (c.longs != null) java.lang.Long.valueOf(c.longs(i))
            else java.lang.Double.valueOf(c.doubles(i))))
        }
      }(enc)
  }

  private def toVars(schema: StructType, rows: Iterator[Row]): Seq[Hdf5Lite.H5Var] = {
    val doubleIdx = schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == DoubleType || f.dataType == FloatType => i
    }.toSet
    val longIdx = schema.fields.zipWithIndex.collect {
      case (f, i) if f.dataType == LongType || f.dataType == IntegerType => i
    }.toSet
    require(schema.fields.indices.forall(i => doubleIdx(i) || longIdx(i)),
      s"unsupported column types in ${schema.simpleString}: numeric columns only " +
        "(stringly columns belong in parquet)")
    val dBuf = doubleIdx.map(i => i -> scala.collection.mutable.ArrayBuilder.make[Double]).toMap
    val lBuf = longIdx.map(i => i -> scala.collection.mutable.ArrayBuilder.make[Long]).toMap
    rows.foreach { r =>
      doubleIdx.foreach(i => dBuf(i) += (r.get(i) match {
        case d: Double => d
        case f: Float => f.toDouble
      }))
      longIdx.foreach(i => lBuf(i) += (r.get(i) match {
        case l: Long => l
        case v: Int => v.toLong
      }))
    }
    schema.fields.zipWithIndex.toSeq.map { case (f, i) =>
      if (doubleIdx(i)) {
        val arr = dBuf(i).result()
        Hdf5Lite.H5Var(f.name, Seq(arr.length), doubles = arr)
      } else {
        val arr = lBuf(i).result()
        Hdf5Lite.H5Var(f.name, Seq(arr.length), longs = arr)
      }
    }
  }

  /** Write a small table to ONE `.h5` file (driver-side collect — the
    * honest cost for result-store-sized outputs, as with NetCdf3 grids).
    */
  def writeFile(df: DataFrame, path: String): Unit = {
    val rows = df.collect()
    require(rows.nonEmpty, "empty table")
    Files.write(Paths.get(path), Hdf5Lite.write(toVars(df.schema, rows.iterator)))
  }

  /** Write one `.h5` granule per partition from the executors (no driver
    * collect): `dir/part-NNNNN.h5` through the Hadoop FileSystem API, so
    * the same call exports to local paths, HDFS, or an object store —
    * a 100-TB table exports as embarrassingly parallel granule writes.
    * Empty partitions write nothing.
    */
  def writeGranules(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val bytes = Hdf5Lite.write(toVars(schema, rows))
        val p = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.h5")
        val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
      }
    }
  }
}
