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

  // ------------------------------------------------------------------
  // Pickled pandas DATAFRAME stores (`pd.to_pickle(df)` — the other
  // legacy container `pd.read_pickle` serves, dataloader.py:563-624's
  // arbitrary-.pkl acceptance). The pure-JVM [[PickleLite]] unpickler
  // decodes the DataFrame/BlockManager/_unpickle_block/_new_Index
  // constructor graph (pandas ≥1.x reduce form AND the pre-1.x
  // "0.14.1" BlockManager state) into a [[PickleLite.PdFrame]]; here
  // it becomes Spark rows. Non-range row indexes surface as a leading
  // column (index name, or "index").
  // ------------------------------------------------------------------

  import PickleLite.{NdArray, ObjArray, PdBlock, PdFrame, PdIndex, PdRange, PySlice}

  /** True when the head bytes of a .pkl look like a pickled pandas
    * DataFrame (the class GLOBAL sits within the first opcodes for every
    * protocol) rather than a dict-of-arrays store.
    */
  def isFramePickle(head: Array[Byte]): Boolean =
    new String(head, "ISO-8859-1").contains("pandas.core.frame")

  /** (column name, spark type, per-row extractor) for one frame column
    * backed by `block` at block-local row `c`.
    */
  private def columnReader(block: PdBlock, c: Int): (DataType, Int => Any) =
    block.values match {
      case ObjArray(shape, values, fortran) =>
        val (k, n) = blockDims(shape)
        val get = (r: Int) => values(if (fortran) r * k + c else c * n + r) match {
          case null | None => null
          case s: String => s
          case other => throw new IllegalArgumentException(
            s"object column holds ${other.getClass.getName}; only str/None supported")
        }
        (StringType, get)
      case nd: NdArray =>
        val (k, n) = blockDims(nd.shape)
        val bb = java.nio.ByteBuffer.wrap(nd.data)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        def idx(r: Int): Int = if (nd.fortran) r * k + c else c * n + r
        nd.descr.replaceAll("^[<|=]", "") match {
          case "f8" => (DoubleType, r => bb.getDouble(idx(r) * 8))
          case "f4" => (FloatType, r => bb.getFloat(idx(r) * 4))
          case "i8" => (LongType, r => bb.getLong(idx(r) * 8))
          case "i4" => (IntegerType, r => bb.getInt(idx(r) * 4))
          case "i2" => (ShortType, r => bb.getShort(idx(r) * 2))
          case "i1" => (ByteType, r => bb.get(idx(r)))
          case "u1" => (ShortType, r => (bb.get(idx(r)) & 0xff).toShort)
          case "b1" => (BooleanType, r => bb.get(idx(r)) != 0)
          case m if m.startsWith("M8") =>
            val toMicros: Long => Long = m match {
              case "M8[ns]" | "M8" => _ / 1000L
              case "M8[us]" => identity
              case "M8[ms]" => _ * 1000L
              case "M8[s]"  => _ * 1000000L
              case o => throw new IllegalArgumentException(s"datetime64 unit '$o'")
            }
            (TimestampType, r => {
              val v = bb.getLong(idx(r) * 8)
              if (v == Long.MinValue) null // NaT
              else {
                val us = toMicros(v)
                val ts = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
                ts.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
                ts
              }
            })
          case o => throw new IllegalArgumentException(
            s"frame column dtype '${nd.descr}' not supported")
        }
      case other => throw new IllegalArgumentException(
        s"block values ${other.getClass.getName} not supported")
    }

  /** (block rows, frame rows) from a block-values shape. */
  private def blockDims(shape: Seq[Int]): (Int, Int) = shape match {
    case Seq(k, n) => (k, n)
    case Seq(n) => (1, n)
    case s => throw new IllegalArgumentException(s"block values rank ${s.length}")
  }

  private def placementPositions(p: Any): Seq[Int] = p match {
    case PySlice(start, stop, step) => (start until stop by step).map(_.toInt)
    case nd: NdArray => nd.doubles.map(_.toInt).toSeq
    case xs: scala.collection.Seq[_] =>
      xs.toSeq.map { case l: Long => l.toInt; case i: Int => i }
    case other => throw new IllegalArgumentException(s"block placement: $other")
  }

  /** Decode one frame into (schema, row values) — shared by the schema
    * probe (driver) and the per-file scan (executors).
    */
  private[sources] def frameRows(frame: PdFrame): (StructType, IndexedSeq[Array[Any]]) = {
    require(frame.axes.length == 2, s"DataFrame with ${frame.axes.length} axes")
    val colLabels = frame.axes.head.values match {
      case ObjArray(_, values, _) => values.map {
        case s: String => s
        case o => throw new IllegalArgumentException(
          s"non-string column label ${o} not supported")
      }
      case other => throw new IllegalArgumentException(
        s"column axis ${other.getClass.getName} not supported (string labels only)")
    }
    val nRows = frame.axes(1).values match {
      case PdRange(start, stop, step) => ((stop - start + step - 1) / step).toInt
      case ObjArray(shape, _, _) => shape.product
      case nd: NdArray => nd.shape.product
      case other => throw new IllegalArgumentException(s"row index: $other")
    }
    // map each frame column to (type, extractor) through the placements
    val byPos = new Array[(DataType, Int => Any)](colLabels.size)
    frame.blocks.foreach { b =>
      placementPositions(b.placement).zipWithIndex.foreach { case (pos, c) =>
        require(pos >= 0 && pos < byPos.length, s"block placement $pos out of range")
        byPos(pos) = columnReader(b, c)
      }
    }
    require(byPos.forall(_ != null), "frame blocks do not cover all columns")
    // non-range row index rides as a leading column
    val indexCol: Option[(String, DataType, Int => Any)] = frame.axes(1) match {
      case PdIndex("RangeIndex", _, _) => scala.None
      case ix =>
        val nm = ix.name.getOrElse("index")
        val (dt, get) = columnReader(PdBlock(ix.values, PySlice(0, 1, 1)), 0)
        Some((nm, dt, get))
    }
    val schema = StructType(
      indexCol.map(c => StructField(c._1, c._2, nullable = true)).toSeq ++
        colLabels.indices.map(i =>
          StructField(colLabels(i), byPos(i)._1, nullable = true)))
    val rows = (0 until nRows).map { r =>
      val vals = new Array[Any](schema.length)
      var o = 0
      indexCol.foreach { c => vals(0) = c._3(r); o = 1 }
      var i = 0
      while (i < byPos.length) { vals(o + i) = byPos(i)._2(r); i += 1 }
      vals
    }
    (schema, rows)
  }

  private def readDriverBytes(spark: SparkSession, file: String): Array[Byte] = {
    val p0 = new org.apache.hadoop.fs.Path(file)
    val fs = p0.getFileSystem(spark.sessionState.newHadoopConf())
    val p = fs.globStatus(p0) match { // the probe path may be a glob
      case null => p0
      case hits if hits.isEmpty => p0
      case hits => hits.minBy(_.getPath.toString).getPath
    }
    val len = fs.getFileStatus(p).getLen.toInt
    val in = fs.open(p)
    try { val b = new Array[Byte](len); in.readFully(0, b, 0, len); b }
    finally in.close()
  }

  /** Pickled pandas DataFrame files as one Spark DataFrame: the schema is
    * probed from the FIRST file driver-side; decoding then runs
    * executor-side, one task per granule file (every file must share the
    * probe's schema — loud error otherwise).
    */
  def readPklFrames(spark: SparkSession, files: Seq[String]): DataFrame = {
    require(files.nonEmpty, "no pickle files given")
    val (schema, _) = frameRows(asFrame(PickleLite.unpickle(
      readDriverBytes(spark, files.head)), files.head))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    spark.read.format("binaryFile").load(files: _*)
      .select(col("path"), col("content"))
      .flatMap { r =>
        val path = r.getString(0)
        val (s, rows) = frameRows(asFrame(
          PickleLite.unpickle(r.getAs[Array[Byte]](1)), path))
        require(s == schema,
          s"$path: frame schema ${s.simpleString} differs from ${schema.simpleString}")
        rows.iterator.map(Row.fromSeq(_))
      }(enc)
  }

  private def asFrame(v: Any, path: String): PdFrame = v match {
    case f: PdFrame => f
    case other => throw new IllegalArgumentException(
      s"$path: expected a pickled DataFrame, got ${other.getClass.getName}")
  }

  /** Encode rows as a pandas-compatible DataFrame pickle (protocol 2,
    * one block per column, RangeIndex rows) — readable by
    * `pd.read_pickle` and by [[readPklFrames]].
    */
  def framePickleBytes(schema: StructType, rows: Seq[Row]): Array[Byte] = {
    val n = rows.length
    val blocks = schema.fields.zipWithIndex.map { case (f, i) =>
      val values: Any = f.dataType match {
        case StringType =>
          ObjArray(Seq(1, n), rows.map(_.getAs[String](i)))
        case dt =>
          val bb = java.nio.ByteBuffer.allocate(n * 8)
            .order(java.nio.ByteOrder.LITTLE_ENDIAN)
          // integer/bool dtypes have no NaN — a null cell would silently
          // change the column's meaning (pandas promotes to float/object),
          // so refuse loudly instead
          def noNull(r: Row): Row = {
            require(!r.isNullAt(i),
              s"column ${f.name}: null in a ${dt.simpleString} column — " +
                "int/bool frame-pickle columns cannot hold nulls")
            r
          }
          val descr = dt match {
            case DoubleType =>
              rows.foreach(r => bb.putDouble(
                if (r.isNullAt(i)) Double.NaN else r.getDouble(i))); "f8"
            case FloatType =>
              rows.foreach(r => bb.putFloat(
                if (r.isNullAt(i)) Float.NaN else r.getFloat(i))); "f4"
            case LongType =>
              rows.foreach(r => bb.putLong(noNull(r).getLong(i))); "i8"
            case IntegerType =>
              rows.foreach(r => bb.putInt(noNull(r).getInt(i))); "i4"
            case BooleanType =>
              rows.foreach(r => bb.put(
                if (noNull(r).getBoolean(i)) 1.toByte else 0.toByte)); "b1"
            case other => throw new IllegalArgumentException(
              s"column ${f.name}: $other not supported in a frame pickle")
          }
          bb.flip()
          val data = new Array[Byte](bb.remaining()); bb.get(data)
          NdArray(Seq(1, n), s"<$descr", fortran = false, data)
      }
      PdBlock(values, PySlice(i, i + 1, 1))
    }
    PickleLite.pickle(PdFrame(blocks.toSeq, Seq(
      PdIndex("Index", scala.None,
        ObjArray(Seq(schema.length), schema.fieldNames.toSeq)),
      PdIndex("RangeIndex", scala.None, PdRange(0, n, 1)))))
  }

  /** Driver-side single-file export (the legacy container is one pickle
    * stream — inherently a one-writer file; for granule archives use
    * [[writePklFramesDistributed]], one file per group key).
    */
  def writePklFrame(df: DataFrame, path: String): Unit = {
    val bytes = framePickleBytes(df.schema, df.collect().toSeq)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(df.sparkSession.sessionState.newHadoopConf())
    fs.setWriteChecksum(false)
    val out = fs.create(p, true)
    try out.write(bytes) finally out.close()
  }

  /** Executor-parallel granule sink: one `<dir>/<key>.pkl` DataFrame
    * pickle per distinct `byCol` value, written from the tasks (the
    * multi-file legacy-archive shape; each granule is a one-writer file,
    * the fan-out across granules is the parallelism).
    */
  def writePklFramesDistributed(df: DataFrame, dir: String, byCol: String): Unit = {
    val spark = df.sparkSession
    val hconf = spark.sessionState.newHadoopConf()
    val confB = spark.sparkContext.broadcast(
      new org.apache.spark.util.SerializableConfiguration(hconf))
    val dataSchema = df.schema // the key column stays in each granule
    val dataCols = dataSchema.fieldNames
    val keyed = df.repartition(col(byCol)).sortWithinPartitions(byCol)
    keyed.queryExecution.toRdd // force analysis before the closure below
    val dirP = new org.apache.hadoop.fs.Path(dir)
    val fs0 = dirP.getFileSystem(hconf)
    fs0.mkdirs(dirP)
    keyed.select(col(byCol).cast("string").as("_key"), struct(dataCols.map(col): _*).as("_row"))
      .foreachPartition { it: Iterator[Row] =>
        val conf = confB.value.value
        def flush(k: String, rows: Seq[Row]): Unit = {
          val p = new org.apache.hadoop.fs.Path(s"$dir/$k.pkl")
          val fs = p.getFileSystem(conf)
          fs.setWriteChecksum(false)
          val out = fs.create(p, true)
          try out.write(framePickleBytes(dataSchema, rows))
          finally out.close()
        }
        // rows arrive key-sorted: write each granule the moment its run
        // closes, so peak memory is ONE granule, not the whole partition
        var curKey: String = null
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        it.foreach { r =>
          val k = r.getString(0)
          if (k != curKey) {
            if (curKey != null) { flush(curKey, buf.toSeq); buf.clear() }
            curKey = k
          }
          buf += r.getStruct(1)
        }
        if (curKey != null) flush(curKey, buf.toSeq)
      }
  }
}
