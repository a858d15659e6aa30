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
  def read(spark: SparkSession, pathGlob: String): DataFrame =
    read(spark, pathGlob, Nil)

  /** [[read]] decoding ONLY `columns` (column pruning pushed into the
    * granule codec: unrequested datasets cost a header walk per granule,
    * never a chunk decode — the `.h5` analog of a pruned parquet
    * ReadSchema). Empty = all columns.
    */
  def read(spark: SparkSession, pathGlob: String, columns: Seq[String]): DataFrame = {
    val colSet = columns.toSet
    def keep(n: String): Boolean = colSet.isEmpty || colSet.contains(n)
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
        Hdf5Lite.read(bytes, keep)
      } finally in.close()
    }
    require(colSet.isEmpty || first.map(_.name).toSet == colSet,
      s"$pathGlob: requested columns ${colSet.toSeq.sorted.mkString(", ")} but the first " +
        s"granule holds ${first.map(_.name).sorted.mkString(", ")}")
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
        val byName = Hdf5Lite.read(r.getAs[Array[Byte]](1),
          n => colSet.isEmpty || colSet.contains(n)).map(c => c.name -> c).toMap
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
  def readPandasFixed(spark: SparkSession, path: String, key: String = "df"): DataFrame =
    pandasFixedFromReads(spark, Hdf5Lite.read(readFileBytes(spark, path)), path, key)

  private def pandasFixedFromReads(spark: SparkSession, reads: Seq[Hdf5Lite.H5Read],
                                   path: String, key: String): DataFrame = {
    val byName = reads.map(v => v.name -> v).toMap
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
    * pandas default). The group and datasets carry the pandas/PyTables
    * attribute set of the documented BlockManagerFixed layout
    * (`pandas_type='frame'`, `nblocks`, per-axis `kind`, pytables
    * CLASS/FLAVOR markers) — validated by engine round-trip + structural
    * goldens only, NOT against live PyTables (unavailable here).
    * Round-trips through [[readPandasFixed]]; string
    * columns are rejected (pandas format='fixed' pickles those — parquet
    * is the right home).
    */
  def writePandasFixed(df: DataFrame, path: String, key: String = "df"): Unit = {
    val (vars, gattrs) = pandasFrameVars(df)
    Files.write(Paths.get(path), Hdf5Lite.write(vars, group = key, groupAttrs = gattrs))
  }

  // ------------------------------------------------ pandas HDFStore table

  /** Read a `pd.HDFStore` format='table' frame — the layout the reference
    * itself WRITES for every results table (`write_to_hdf`,
    * GPSat/dataloader.py:644-704: `to_hdf(..., format='table',
    * data_columns=True)`) and selects from with `where`
    * (`read_hdf`, :563-624). Per the public pandas io/pytables.py +
    * PyTables docs, a data-columns table is ONE 1-d chunked dataset
    * `key/table` of compound (record) datatype whose members are `index`
    * plus one scalar member per column; storer metadata rides as pickled
    * HDF5 attributes on the group and table.
    *
    * The row index comes back as an `index` column, remaining columns in
    * member order — the same convention as [[readPandasFixed]]. Scalar
    * members (int/float/fixed-string) map 1:1; `values_block_N` ARRAY
    * members (format='table' with data_columns=False) expand into their
    * columns, named by the pickled `values_block_N_kind` table attribute.
    * Driver-side single-file read — the honest cost for
    * result-store-sized frames.
    */
  def readPandasTable(spark: SparkSession, path: String, key: String = "df"): DataFrame =
    pandasTableFromReads(spark, Hdf5Lite.read(readFileBytes(spark, path)), path, key)

  /** One `where` triple for [[readPandasTableWhere]] — the reference's
    * `store.select(key, where=...)` predicate shape
    * (GPSat/dataloader.py:1161-1192). Triples AND together.
    */
  final case class TableWhere(col: String, comp: String, value: Any)

  /** Pruning evidence for specs: how many storage chunks were scanned vs
    * how many had a matching row (and therefore materialized Rows).
    */
  final class WhereStats {
    var chunksTotal = 0
    var chunksMaterialized = 0
  }

  /** [[readPandasTable]] with server-side `where` semantics: predicates
    * evaluate chunk-by-chunk against the member bytes (only the
    * predicate columns' fields are decoded for non-matching records), and
    * a chunk with no matching record materializes NO rows — the pandas
    * `store.select(key, where=...)` analog
    * (GPSat/dataloader.py:1161-1192). Identical row set to
    * `readPandasTable(...).filter(where)`.
    */
  def readPandasTableWhere(spark: SparkSession, path: String, key: String = "df",
                           where: Seq[TableWhere] = Nil,
                           stats: WhereStats = null): DataFrame =
    pandasTableFromReads(spark, Hdf5Lite.read(readFileBytes(spark, path)), path, key,
      where, stats)

  /** [[readPandasKey]] with `where` pushdown: table layouts prune
    * chunk-wise; fixed layouts read fully (the caller's Spark filter
    * applies the predicate there).
    */
  def readPandasKeyWhere(spark: SparkSession, path: String, key: String = "df",
                         where: Seq[TableWhere] = Nil): DataFrame = {
    val reads = Hdf5Lite.read(readFileBytes(spark, path))
    if (reads.exists(_.name == s"$key/table"))
      pandasTableFromReads(spark, reads, path, key, where, null)
    else pandasFixedFromReads(spark, reads, path, key)
  }

  private def pandasTableFromReads(spark: SparkSession, reads: Seq[Hdf5Lite.H5Read],
                                   path: String, key: String,
                                   where: Seq[TableWhere] = Nil,
                                   stats: WhereStats = null): DataFrame = {
    val byName = reads.map(v => v.name -> v).toMap
    val table = byName.getOrElse(s"$key/table",
      throw new IllegalArgumentException(
        s"$path: no dataset '$key/table' — present: ${byName.keys.toSeq.sorted.mkString(", ")}" +
          (if (byName.contains(s"$key/axis0"))
            " (an axis0 dataset exists: this is a format='fixed' store; " +
              "use readPandasFixed)"
          else "")))
    require(table.isCompound, s"$path: $key/table is not a compound-typed dataset")
    val n = table.shape.product
    val recordSize = if (n == 0) 0 else table.raw.length / n
    val members = table.members
    val bb = java.nio.ByteBuffer.wrap(table.raw).order(java.nio.ByteOrder.LITTLE_ENDIAN)

    def typeOf(m: Hdf5Lite.H5Member) = m.cls match {
      case 0 => LongType
      case 1 => DoubleType
      case 3 => StringType
    }
    // column plan: scalar members map 1:1; ARRAY members (values_block_N,
    // the data_columns=False layout) expand into their columns, named by
    // the table's pickled `<member>_kind` attribute
    val colPlan: Seq[(String, Hdf5Lite.H5Member, Int)] = members.flatMap { m =>
      val isBlock = m.name.matches("values_block_\\d+")
      if (!isBlock && m.arity == 1) Seq((if (m.name == "index") "index" else m.name, m, 0))
      else {
        val kind = table.attr(s"${m.name}_kind").getOrElse(
          throw new IllegalArgumentException(
            s"$path: array member '${m.name}' (arity ${m.arity}) has no " +
              s"'${m.name}_kind' attribute naming its columns"))
        val names = PickleLite.unpickle(kind.bytesVal) match {
          case xs: scala.collection.Seq[_] => xs.toSeq.map(String.valueOf(_))
          case other => throw new IllegalArgumentException(
            s"$path: ${m.name}_kind unpickled to $other, expected a list of names")
        }
        require(names.length == m.arity,
          s"$path: ${m.name}_kind names ${names.length} columns, member arity is ${m.arity}")
        names.zipWithIndex.map { case (c, j) => (c, m, j) }
      }
    }
    val schema = StructType(colPlan.map { case (cn, m, _) =>
      StructField(cn, typeOf(m), nullable = false) })

    def memberValue(i: Int, m: Hdf5Lite.H5Member, j: Int): Any = {
      val off = i * recordSize + m.offset + j * m.size
      m.cls match {
        case 0 =>
          require(m.size == 8 || m.size == 4, s"${m.name}: int${m.size} member not supported")
          if (m.size == 8) bb.getLong(off) else bb.getInt(off).toLong
        case 1 =>
          require(m.size == 8 || m.size == 4, s"${m.name}: float${m.size} member not supported")
          if (m.size == 8) bb.getDouble(off) else bb.getFloat(off).toDouble
        case 3 =>
          var l = 0
          while (l < m.size && table.raw(off + l) != 0) l += 1
          new String(table.raw, off, l, "UTF-8")
      }
    }

    // where plan: (member, array slot, comparator) per triple, ANDed
    val wherePlan = where.map { w =>
      val (_, m, j) = colPlan.find(_._1 == w.col).getOrElse(
        throw new IllegalArgumentException(
          s"$path: where column '${w.col}' not in ${colPlan.map(_._1).mkString(", ")}"))
      def cmpNum(x: Double): Boolean = {
        val t = w.value match {
          case d: Double => d
          case f: Float => f.toDouble
          case l: Long => l.toDouble
          case i: Int => i.toDouble
          case other => throw new IllegalArgumentException(
            s"$path: where value $other for numeric column '${w.col}'")
        }
        w.comp match {
          case ">=" => x >= t; case ">" => x > t; case "==" => x == t
          case "!=" => x != t; case "<=" => x <= t; case "<" => x < t
          case c => throw new IllegalArgumentException(s"comp: $c is not valid")
        }
      }
      def cmpStr(x: String): Boolean = {
        val t = String.valueOf(w.value)
        w.comp match {
          case ">=" => x >= t; case ">" => x > t; case "==" => x == t
          case "!=" => x != t; case "<=" => x <= t; case "<" => x < t
          case c => throw new IllegalArgumentException(s"comp: $c is not valid")
        }
      }
      (i: Int) => memberValue(i, m, j) match {
        case d: Double => cmpNum(d)
        case l: Long => cmpNum(l.toDouble)
        case s: String => cmpStr(s)
      }
    }
    def passes(i: Int): Boolean = wherePlan.forall(_(i))

    // storage-chunk spans: predicates evaluate span-by-span so a chunk
    // with no matching record materializes no Rows (PyTables-where shape)
    val spans: Seq[(Int, Int)] =
      if (table.chunkStarts.nonEmpty)
        (table.chunkStarts :+ n).sliding(2).map(p => (p(0), math.min(p(1), n))).toSeq
      else Seq((0, n))
    val rows = new java.util.ArrayList[Row](if (where.isEmpty) n else 64)
    spans.foreach { case (s0, s1) =>
      if (stats != null) stats.chunksTotal += 1
      var any = false
      var i = s0
      while (i < s1) {
        if (where.isEmpty || passes(i)) {
          rows.add(Row.fromSeq(colPlan.map[Any] { case (_, m, j) => memberValue(i, m, j) }))
          any = true
        }
        i += 1
      }
      if (any && stats != null) stats.chunksMaterialized += 1
    }
    spark.createDataFrame(rows, schema)
  }

  /** Write a small DataFrame as a PyTables-table-shaped `.h5` under `key`:
    * one chunked compound dataset `key/table` with members (index, each
    * column as its own scalar field — the `data_columns=True` layout the
    * reference writes), group + table attributes mirroring pandas'
    * documented storer metadata (`pandas_type='frame_table'`,
    * `FIELD_N_NAME`, pickled `data_columns` / `non_index_axes`, ...).
    * Round-trips through [[readPandasTable]]; the attribute set follows
    * the public pandas/PyTables layout but is validated by engine
    * round-trip + structural goldens only (no live PyTables here).
    * Booleans ride as int64 0/1 (documented divergence from PyTables'
    * 1-byte bool).
    */
  def writePandasTable(df: DataFrame, path: String, key: String = "df",
                       chunkRows: Int = 512, deflate: Int = 0,
                       dataColumns: Boolean = true): Unit = {
    val (comp, groupAttrs) = pandasTableParts(df, dataColumns)
    Files.write(Paths.get(path), Hdf5Lite.writeKeys(
      Nil, chunkRows = chunkRows, deflate = deflate,
      groupAttrs = Map(key -> groupAttrs), compounds = Seq(key -> comp)))
  }

  /** Several format='table' frames in ONE `.h5`, one HDFStore key each —
    * the reference's result-store file in its OWN on-disk format
    * (`write_to_hdf`, GPSat/dataloader.py:644-704 + local_experts.py:
    * 499-550 keep run_details / preds / ... side by side, all
    * format='table').
    */
  def writePandasTableKeys(keyed: Seq[(String, DataFrame)], path: String,
                           chunkRows: Int = 512, deflate: Int = 0,
                           dataColumns: Boolean = true): Unit = {
    val built = keyed.map { case (k, df) => k -> pandasTableParts(df, dataColumns) }
    Files.write(Paths.get(path), Hdf5Lite.writeKeys(
      Nil, chunkRows = chunkRows, deflate = deflate,
      groupAttrs = built.map { case (k, (_, ga)) => k -> ga }.toMap,
      compounds = built.map { case (k, (comp, _)) => k -> comp }))
  }

  /** (compound dataset, group attrs) of one format='table' frame. */
  private def pandasTableParts(df: DataFrame, dataColumns: Boolean)
      : (Hdf5Lite.H5CompoundVar, Seq[Hdf5Lite.H5Attr]) = {
    val rows = df.collect()
    require(rows.nonEmpty, "empty table")
    val n = rows.length
    def clsOf(dt: org.apache.spark.sql.types.DataType, i: Int): (Int, Int) = dt match {
      case DoubleType | FloatType => (1, 8)
      case LongType | IntegerType | BooleanType => (0, 8)
      case StringType =>
        (3, math.max(1, rows.map(r => r.getString(i).getBytes("UTF-8").length).max))
      case other => throw new IllegalArgumentException(
        s"$other not supported in a format='table' frame " +
          "(double/long/string/bool columns only)")
    }
    // one member per source-column group: data_columns=true -> each column
    // its own scalar member (the layout the reference writes);
    // data_columns=false -> typed values_block_N ARRAY members
    final case class Spec(member: String, cls: Int, size: Int, cols: Seq[Int])
    val specs: Seq[Spec] =
      if (dataColumns)
        df.schema.fields.zipWithIndex.map { case (f, i) =>
          val (c, s) = clsOf(f.dataType, i); Spec(f.name, c, s, Seq(i))
        }.toSeq
      else {
        val byClass = df.schema.fields.zipWithIndex.map { case (f, i) =>
          (clsOf(f.dataType, i), i)
        }
        val dbl = byClass.collect { case ((1, _), i) => i }.toSeq
        val lng = byClass.collect { case ((0, _), i) => i }.toSeq
        val str = byClass.collect { case ((3, _), i) => i }.toSeq
        val strW = if (str.isEmpty) 1 else byClass.collect { case ((3, w), _) => w }.max
        Seq((1, 8, dbl), (0, 8, lng), (3, strW, str)).filter(_._3.nonEmpty)
          .zipWithIndex.map { case ((c, s, cols), bi) =>
            Spec(s"values_block_$bi", c, s, cols) }
      }
    var offset = 8
    val fields = specs.map { sp =>
      val m = Hdf5Lite.H5Member(sp.member, offset, sp.cls, sp.size, sp.cols.length)
      offset += sp.size * sp.cols.length
      m
    }
    val recordSize = offset
    val members = Hdf5Lite.H5Member("index", 0, 0, 8) +: fields
    val data = java.nio.ByteBuffer.allocate(n * recordSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    rows.zipWithIndex.foreach { case (r, ri) =>
      val base = ri * recordSize
      data.putLong(base, ri.toLong) // RangeIndex
      specs.zip(fields).foreach { case (sp, m) =>
        sp.cols.zipWithIndex.foreach { case (i, j) =>
          val off = base + m.offset + j * m.size
          df.schema.fields(i).dataType match {
            case DoubleType => data.putDouble(off, r.getDouble(i))
            case FloatType => data.putDouble(off, r.getFloat(i).toDouble)
            case LongType => data.putLong(off, r.getLong(i))
            case IntegerType => data.putLong(off, r.getInt(i).toLong)
            case BooleanType => data.putLong(off, if (r.getBoolean(i)) 1L else 0L)
            case StringType =>
              val b = r.getString(i).getBytes("UTF-8")
              var k = 0
              while (k < b.length) { data.put(off + k, b(k)); k += 1 }
            case _ => ()
          }
        }
      }
    }
    val colNames = df.schema.fieldNames.toSeq
    import Hdf5Lite.H5Attr
    val tableAttrs =
      Seq(H5Attr.str("CLASS", "TABLE"), H5Attr.str("VERSION", "2.7"),
        H5Attr.str("TITLE", ""), H5Attr.long("NROWS", n.toLong),
        H5Attr.str("index_kind", "integer")) ++
        members.zipWithIndex.map { case (m, i) => H5Attr.str(s"FIELD_${i}_NAME", m.name) } ++
        specs.flatMap { sp =>
          Seq(H5Attr.bytes(s"${sp.member}_kind",
            PickleLite.pickle(sp.cols.map(df.schema.fieldNames(_)).toList)),
            H5Attr.str(s"${sp.member}_dtype", sp.cls match {
              case 1 => "float64"
              case 3 => "object"
              case _ => "int64"
            }))
        }
    val groupAttrs = Seq(
      H5Attr.str("CLASS", "GROUP"), H5Attr.str("TITLE", ""), H5Attr.str("VERSION", "1.0"),
      H5Attr.str("pandas_type", "frame_table"), H5Attr.str("pandas_version", "0.15.2"),
      H5Attr.str("table_type", "appendable_frame"),
      H5Attr.str("encoding", "UTF-8"), H5Attr.str("errors", "strict"),
      H5Attr.str("nan_rep", "nan"),
      H5Attr.bytes("index_cols", PickleLite.pickle(List((0L, "index")))),
      H5Attr.bytes("values_cols", PickleLite.pickle(specs.map(_.member).toList)),
      H5Attr.bytes("data_columns",
        PickleLite.pickle(if (dataColumns) colNames.toList else Nil)),
      H5Attr.bytes("non_index_axes", PickleLite.pickle(List((1L, colNames.toList)))),
      H5Attr.bytes("levels", PickleLite.pickle(None)))
    (Hdf5Lite.H5CompoundVar(
      "table", n, recordSize, members, data.array(), attrs = tableAttrs),
      groupAttrs)
  }

  /** Read ONE HDFStore frame under `key`, whichever layout it is stored in
    * (`format='table'` -> [[readPandasTable]]; `format='fixed'` ->
    * [[readPandasFixed]]) — the `pd.read_hdf(path, key)` dispatch.
    */
  def readPandasKey(spark: SparkSession, path: String, key: String = "df"): DataFrame = {
    // one file read + one HDF5 parse, shared with the layout-specific reader
    val reads = Hdf5Lite.read(readFileBytes(spark, path))
    if (reads.exists(_.name == s"$key/table")) pandasTableFromReads(spark, reads, path, key)
    else pandasFixedFromReads(spark, reads, path, key)
  }

  /** Whole-file bytes via the session Hadoop filesystem (works for any
    * scheme the session can reach, not just local paths).
    */
  private def readFileBytes(spark: SparkSession, path: String): Array[Byte] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen.toInt
    val bytes = new Array[Byte](len)
    val in = fs.open(p)
    try in.readFully(0, bytes) finally in.close()
    bytes
  }

  /** Several frames in ONE `.h5`, one HDFStore key each — the reference's
    * result-store file shape (run_details / preds / ... side by side,
    * local_experts.py:499-550).
    */
  def writePandasFixedKeys(keyed: Seq[(String, DataFrame)], path: String): Unit = {
    val built = keyed.map { case (k, df) => k -> pandasFrameVars(df) }
    Files.write(Paths.get(path),
      Hdf5Lite.writeKeys(built.map { case (k, (vars, _)) => k -> vars },
        groupAttrs = built.map { case (k, (_, ga)) => k -> ga }.toMap))
  }

  /** The HDFStore keys present in a `.h5` file: every group holding an
    * `axis0` dataset (format='fixed' frame marker) or a `table` dataset
    * (format='table' marker).
    */
  def pandasKeys(spark: SparkSession, path: String): Seq[String] = {
    Hdf5Lite.read(readFileBytes(spark, path)).map(_.name).collect {
      case n if n.endsWith("/axis0") => n.stripSuffix("/axis0")
      case n if n.endsWith("/table") => n.stripSuffix("/table")
    }.distinct.sorted
  }

  /** (datasets with pandas attrs, group attrs) of one fixed-format frame. */
  private def pandasFrameVars(df: DataFrame): (Seq[Hdf5Lite.H5Var], Seq[Hdf5Lite.H5Attr]) = {
    import Hdf5Lite.H5Attr
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
    // pytables ARRAY markers every value/axis dataset carries
    def arrayAttrs(kind: String, extra: Seq[H5Attr] = Nil): Seq[H5Attr] =
      Seq(H5Attr.str("CLASS", "ARRAY"), H5Attr.str("VERSION", "2.4"),
        H5Attr.str("FLAVOR", "numpy"), H5Attr.str("kind", kind)) ++ extra
    val transposed = Seq(H5Attr.long("transposed", 1L)) // blocks store (ncols, nrows)

    val blocks = Seq.newBuilder[Hdf5Lite.H5Var]
    var bi = 0
    def items(names: Seq[String]): Hdf5Lite.H5Var =
      Hdf5Lite.H5Var(s"block${bi}_items", Seq(names.length), strings = names.toArray,
        attrs = arrayAttrs("string"))
    if (dbl.nonEmpty) {
      blocks += items(dbl.map(_._1).toSeq)
      blocks += Hdf5Lite.H5Var(s"block${bi}_values", Seq(dbl.length, n),
        doubles = dbl.flatMap(_._2).toArray, attrs = arrayAttrs("float64", transposed))
      bi += 1
    }
    if (lng.nonEmpty) {
      blocks += items(lng.map(_._1).toSeq)
      blocks += Hdf5Lite.H5Var(s"block${bi}_values", Seq(lng.length, n),
        longs = lng.flatMap(_._2).toArray, attrs = arrayAttrs("int64", transposed))
      bi += 1
    }
    if (str.nonEmpty) {
      blocks += items(str.map(_._1).toSeq)
      blocks += Hdf5Lite.H5Var(s"block${bi}_values", Seq(str.length, n),
        strings = str.flatMap(_._2).toArray, attrs = arrayAttrs("string", transposed))
      bi += 1
    }
    val vars = Seq(
      Hdf5Lite.H5Var("axis0", Seq(df.columns.length), strings = df.columns,
        attrs = arrayAttrs("string") :+ H5Attr.str("name", "columns")),
      Hdf5Lite.H5Var("axis1", Seq(n), longs = Array.tabulate(n)(_.toLong),
        attrs = arrayAttrs("integer") :+ H5Attr.str("name", "rows"))) ++
      blocks.result()
    // group attrs: the documented pandas BlockManagerFixed storer markers
    val groupAttrs = Seq(
      H5Attr.str("CLASS", "GROUP"), H5Attr.str("TITLE", ""), H5Attr.str("VERSION", "1.0"),
      H5Attr.str("pandas_type", "frame"), H5Attr.str("pandas_version", "0.15.2"),
      H5Attr.str("encoding", "UTF-8"), H5Attr.str("errors", "strict"),
      H5Attr.long("ndim", 2L), H5Attr.long("nblocks", bi.toLong),
      H5Attr.str("axis0_variety", "regular"), H5Attr.str("axis1_variety", "regular")) ++
      (0 until bi).map(i => H5Attr.str(s"block${i}_items_variety", "regular"))
    (vars, groupAttrs)
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
