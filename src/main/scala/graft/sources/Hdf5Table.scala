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
    require(!first.exists(_.name.endsWith("/axis0")),
      s"$pathGlob holds a pandas HDFStore frame (found an axis0 dataset) — " +
        "use Hdf5Table.readPandasFixed(spark, path, key) for those")
    val colsSorted = first.sortBy(_.name)
    val schema = StructType(
      StructField("source_file", StringType, nullable = false) +:
        colsSorted.map(c => StructField(c.name,
          if (c.longs != null) LongType
          else if (c.strings != null) StringType
          else DoubleType, nullable = false)))
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
            else if (c.strings != null) c.strings(i)
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

  // ------------------------------------------------ pandas HDFStore fixed

  /** Read a `pd.HDFStore` format='fixed' frame (`df.to_hdf(path, key)`,
    * what the reference's canonical store calls produce —
    * GPSat/dataloader.py:563-624 reads them back with `pd.read_hdf`) into a
    * DataFrame. Layout per the public pandas io/pytables.py
    * BlockManagerFixed format: `key/axis0` = column names, `key/axis1` =
    * row index, and one pair per dtype block — `key/block{i}_items` (the
    * block's columns) + `key/block{i}_values` shaped
    * (n_block_columns, n_rows). The row index comes back as an `index`
    * column; the remaining columns follow axis0 order. Driver-side single
    * file read — the honest cost for result-store-sized frames; big tables
    * belong in parquet or `.h5` granule directories.
    */
  def readPandasFixed(spark: SparkSession, path: String, key: String = "df"): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    val byName = Hdf5Lite.read(bytes).map(v => v.name -> v).toMap
    def get(n: String): Hdf5Lite.H5Read = byName.getOrElse(s"$key/$n",
      throw new IllegalArgumentException(
        s"$path: no dataset '$key/$n' — present: ${byName.keys.toSeq.sorted.mkString(", ")}" +
          (if (byName.contains(s"$key/table"))
            " (a 'table' dataset exists: this is a PyTables format='table' store; " +
              "rewrite with format='fixed')"
          else "")))
    val axis0 = get("axis0")
    require(axis0.strings != null, s"$path: $key/axis0 must be a string dataset")
    val colNames = axis0.strings.toSeq
    val axis1 = get("axis1")
    val nRows = axis1.shape.product

    // per-column source: (block values dataset, row-major offset)
    val colSlice = scala.collection.mutable.Map.empty[String, (Hdf5Lite.H5Read, Int)]
    var bi = 0
    while (byName.contains(s"$key/block${bi}_items")) {
      val items = get(s"block${bi}_items")
      require(items.strings != null, s"$path: $key/block${bi}_items must be strings")
      val values = get(s"block${bi}_values")
      require(values.shape == Seq(items.strings.length, nRows),
        s"$path: $key/block${bi}_values shape ${values.shape.mkString("x")} != " +
          s"${items.strings.length}x$nRows (blocks store (n_block_columns, n_rows))")
      items.strings.zipWithIndex.foreach { case (c, j) =>
        colSlice(c) = (values, j * nRows)
      }
      bi += 1
    }
    require(colNames.forall(colSlice.contains),
      s"$path: axis0 columns ${colNames.filterNot(colSlice.contains)} missing from blocks")

    def typeOf(v: Hdf5Lite.H5Read) =
      if (v.longs != null) LongType else if (v.strings != null) StringType else DoubleType
    val indexIsLong = axis1.longs != null
    val schema = StructType(
      StructField("index", if (indexIsLong) LongType else DoubleType, nullable = false) +:
        colNames.map(c => StructField(c, typeOf(colSlice(c)._1), nullable = false)))
    val rows = new java.util.ArrayList[Row](nRows)
    var i = 0
    while (i < nRows) {
      val vals = new Array[Any](colNames.length + 1)
      vals(0) = if (indexIsLong) axis1.longs(i) else axis1.doubles(i)
      var j = 0
      while (j < colNames.length) {
        val (v, off) = colSlice(colNames(j))
        vals(j + 1) =
          if (v.longs != null) v.longs(off + i)
          else if (v.strings != null) v.strings(off + i)
          else v.doubles(off + i)
        j += 1
      }
      rows.add(Row.fromSeq(vals.toSeq))
      i += 1
    }
    spark.createDataFrame(rows, schema)
  }

  /** Write a small DataFrame as a pandas-HDFStore-fixed-shaped `.h5`
    * (axis0/axis1/block layout under one `key` group): double columns form
    * block0, long columns block1; the index is a RangeIndex 0..n-1 (the
    * pandas default). Round-trips through [[readPandasFixed]]; string
    * columns are rejected (pandas format='fixed' pickles those — parquet
    * is the right home).
    */
  def writePandasFixed(df: DataFrame, path: String, key: String = "df"): Unit =
    Files.write(Paths.get(path), Hdf5Lite.write(pandasFrameVars(df), group = key))

  /** Several frames in ONE `.h5`, one HDFStore key each — the reference's
    * result-store file shape (run_details / preds / ... side by side,
    * local_experts.py:499-550).
    */
  def writePandasFixedKeys(keyed: Seq[(String, DataFrame)], path: String): Unit =
    Files.write(Paths.get(path),
      Hdf5Lite.writeKeys(keyed.map { case (k, df) => k -> pandasFrameVars(df) }))

  /** The HDFStore keys present in a `.h5` file (every group holding an
    * axis0 dataset — the pandas frame marker).
    */
  def pandasKeys(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    Hdf5Lite.read(bytes).map(_.name).collect {
      case n if n.endsWith("/axis0") => n.stripSuffix("/axis0")
    }.sorted
  }

  private def pandasFrameVars(df: DataFrame): Seq[Hdf5Lite.H5Var] = {
    val rows = df.collect()
    require(rows.nonEmpty, "empty table")
    val n = rows.length
    // consolidate by storage type, pandas-block style: double / long /
    // fixed-string blocks, schema order preserved within each
    val dbl = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Double])]
    val lng = scala.collection.mutable.ArrayBuffer.empty[(String, Array[Long])]
    val str = scala.collection.mutable.ArrayBuffer.empty[(String, Array[String])]
    df.schema.fields.zipWithIndex.foreach { case (f, i) =>
      f.dataType match {
        case DoubleType | FloatType => dbl += f.name -> rows.map(_.get(i) match {
          case d: Double => d
          case fl: Float => fl.toDouble
        })
        case LongType | IntegerType => lng += f.name -> rows.map(_.get(i) match {
          case l: Long => l
          case v: Int => v.toLong
        })
        // booleans ride the long block as 0/1 (full |b1 bool-block parity
        // would need a 1-byte dtype; downstream read_hdf sees ints)
        case BooleanType => lng += f.name -> rows.map(r => if (r.getBoolean(i)) 1L else 0L)
        case StringType => str += f.name -> rows.map(_.getString(i))
        case other => throw new IllegalArgumentException(
          s"${f.name}: $other not supported in an HDFStore frame " +
            "(double/long/string/bool columns only — complex types belong in parquet)")
      }
    }
    val blocks = Seq.newBuilder[Hdf5Lite.H5Var]
    var bi = 0
    def items(names: Seq[String]): Hdf5Lite.H5Var =
      Hdf5Lite.H5Var(s"block${bi}_items", Seq(names.length), strings = names.toArray)
    if (dbl.nonEmpty) {
      blocks += items(dbl.map(_._1).toSeq)
      blocks += Hdf5Lite.H5Var(s"block${bi}_values", Seq(dbl.length, n),
        doubles = dbl.flatMap(_._2).toArray)
      bi += 1
    }
    if (lng.nonEmpty) {
      blocks += items(lng.map(_._1).toSeq)
      blocks += Hdf5Lite.H5Var(s"block${bi}_values", Seq(lng.length, n),
        longs = lng.flatMap(_._2).toArray)
      bi += 1
    }
    if (str.nonEmpty) {
      blocks += items(str.map(_._1).toSeq)
      blocks += Hdf5Lite.H5Var(s"block${bi}_values", Seq(str.length, n),
        strings = str.flatMap(_._2).toArray)
      bi += 1
    }
    Seq(
      Hdf5Lite.H5Var("axis0", Seq(df.columns.length), strings = df.columns),
      Hdf5Lite.H5Var("axis1", Seq(n), longs = Array.tabulate(n)(_.toLong))) ++
      blocks.result()
  }

  /** Write one `.h5` granule per partition from the executors (no driver
    * collect): `dir/part-NNNNN.h5` through the Hadoop FileSystem API, so
    * the same call exports to local paths, HDFS, or an object store —
    * a 100-TB table exports as embarrassingly parallel granule writes.
    * Empty partitions write nothing.
    */
  def writeGranules(df: DataFrame, dir: String): Unit = {
    val schema = df.schema
    // tasks write with the SESSION's Hadoop conf (credentials, fs.* tuning),
    // not a default-constructed Configuration
    val confB = df.sparkSession.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(
        df.sparkSession.sessionState.newHadoopConf()))
    df.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val bytes = Hdf5Lite.write(toVars(schema, rows))
        val p = new org.apache.hadoop.fs.Path(dir, f"part-$pid%05d.h5")
        val fs = p.getFileSystem(confB.value.value)
        val out = fs.create(p, true)
        try out.write(bytes) finally out.close()
      }
    }
  }
}
