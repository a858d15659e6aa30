package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The declarative config-as-query surface (reference JSON configs,
  * GPSat/config_dataclasses.py): `where` triples, `row_select` with negate,
  * `col_funcs` via a whitelisted function registry (the safe
  * re-implementation of `config_func`, GPSat/utils.py:311-493 — a fixed
  * whitelist instead of eval), and the scan -> filter -> project loader
  * micro-lifecycle (`DataLoader.load`, dataloader.py:1681-1799; order
  * matters: add_cols can create the columns row_select uses).
  */
object ConfigExpr {

  /** `{col, comp, val}` triple (dataloader.py:1011-1272). */
  final case class Where(col: String, comp: String, value: Any)

  def whereToColumn(w: Where): Column = {
    val c = col(w.col)
    val v = lit(w.value)
    w.comp match {
      case ">=" => c >= v
      case ">"  => c > v
      case "==" => c === v
      case "!=" => c =!= v
      case "<=" => c <= v
      case "<"  => c < v
      case other => throw new IllegalArgumentException(s"comp: $other is not valid")
    }
  }

  /** AND (default) / OR fold (`combine_where`, dataloader.py:1172-1176). */
  /** Closed-interval windows implied by AND-combined numeric triples, per
    * column — the WIDENING a pruning scan may safely apply (strict </>
    * become closed bounds; the caller's residual filter restores
    * exactness). Non-range comps and non-numeric values contribute
    * nothing.
    */
  def whereRanges(ws: Seq[Where]): Map[String, (Double, Double)] = {
    def num(v: Any): Option[Double] = v match {
      case d: Double => Some(d)
      case f: Float => Some(f.toDouble)
      case i: Int => Some(i.toDouble)
      case l: Long => Some(l.toDouble)
      case _ => None
    }
    ws.groupBy(_.col).flatMap { case (c, ts) =>
      var lo = Double.NegativeInfinity
      var hi = Double.PositiveInfinity
      var any = false
      ts.foreach { t =>
        num(t.value).foreach { v =>
          t.comp match {
            case ">=" | ">" => lo = math.max(lo, v); any = true
            case "<=" | "<" => hi = math.min(hi, v); any = true
            case "==" => lo = math.max(lo, v); hi = math.min(hi, v); any = true
            case _ => ()
          }
        }
      }
      if (any) Some(c -> (lo, hi)) else None
    }
  }

  def combineWhere(ws: Seq[Where], or: Boolean = false): Column =
    if (ws.isEmpty) lit(true)
    else ws.map(whereToColumn).reduce((a, b) => if (or) a || b else a && b)

  /** `row_select` entry: triples and/or named bool funcs, with negate
    * (row_select_bool, dataloader.py:137-227).
    */
  final case class RowSelect(wheres: Seq[Where], negate: Boolean = false)

  def rowSelectColumn(rs: Seq[RowSelect]): Column =
    if (rs.isEmpty) lit(true)
    else rs.map { r =>
      val c = combineWhere(r.wheres)
      if (r.negate) !c else c
    }.reduce(_ && _)

  /** The `config_func` whitelist: operator strings become Catalyst binary
    * ops; named functions resolve from this fixed registry (never eval).
    * Signature: (column args, literal args) -> Column.
    */
  val funcRegistry: Map[String, (Seq[Column], Seq[Any]) => Column] = Map(
    // binary operator strings (utils.py:400-430)
    ">=" -> ((cs, as_) => cs.head >= litOf(cs, as_)),
    ">" -> ((cs, as_) => cs.head > litOf(cs, as_)),
    "<=" -> ((cs, as_) => cs.head <= litOf(cs, as_)),
    "<" -> ((cs, as_) => cs.head < litOf(cs, as_)),
    "==" -> ((cs, as_) => cs.head === litOf(cs, as_)),
    "!=" -> ((cs, as_) => cs.head =!= litOf(cs, as_)),
    "+" -> ((cs, as_) => cs.head + litOf(cs, as_)),
    "-" -> ((cs, as_) => cs.head - litOf(cs, as_)),
    "*" -> ((cs, as_) => cs.head * litOf(cs, as_)),
    "/" -> ((cs, as_) => cs.head / litOf(cs, as_)),
    // named functions
    "abs" -> ((cs, _) => abs(cs.head)),
    "exp" -> ((cs, _) => exp(cs.head)),
    "log" -> ((cs, _) => log(cs.head)),
    "sqrt" -> ((cs, _) => sqrt(cs.head)),
    "floor" -> ((cs, _) => floor(cs.head)),
    "ceil" -> ((cs, _) => ceil(cs.head)),
    // cumsum(value, orderCol, partitionCols...) — the order column is
    // REQUIRED (and partition columns strongly recommended): an
    // unpartitioned window moves the whole table to one reducer, which is
    // a scale-killer on a large table (a global row-order cumsum is not a
    // distributable operation).
    "cumsum" -> ((cs, _) => {
      require(cs.length >= 2,
        "config_func 'cumsum' needs explicit (value, order) columns — and " +
          "partition columns as 3rd+ args for any non-fixture table; a " +
          "global unordered cumsum would run on a single partition")
      val w0 = if (cs.length > 2)
        org.apache.spark.sql.expressions.Window.partitionBy(cs.drop(2): _*)
      else org.apache.spark.sql.expressions.Window.partitionBy()
      sum(cs.head).over(w0.orderBy(cs(1)).rowsBetween(Long.MinValue, 0))
    }),
    // datetime <-> float days (examples/inline_example.py:140; datetime_utils.py:143-181)
    "date_to_float_days" -> ((cs, _) => datediff(cs.head.cast("date"), lit("1970-01-01").cast("date")).cast("double")),
    "float_days_to_date" -> ((cs, _) => date_add(lit("1970-01-01").cast("date"), cs.head.cast("int"))),
    // EASE2 projection
    "laea_x" -> ((cs, _) => graft.functions.laea_x(cs.head, cs(1))),
    "laea_y" -> ((cs, _) => graft.functions.laea_y(cs.head, cs(1))),
    "laea_lon" -> ((cs, _) => graft.functions.laea_lon(cs.head, cs(1))),
    "laea_lat" -> ((cs, _) => graft.functions.laea_lat(cs.head, cs(1))),
    // DMS "deg minutes N|S|E|W" string -> signed float degrees
    // (convert_lon_lat_str, GPSat/utils.py:1885-1930)
    "dms_to_float" -> ((cs, _) => {
      val parts = split(regexp_replace(trim(cs.head), "\\s+", " "), " ")
      val deg = element_at(parts, 1).cast("double")
      val minutes = element_at(parts, 2).cast("double") / 60.0
      val dir = element_at(parts, 3)
      when(dir === "S" || dir === "W", -(deg + minutes)).otherwise(deg + minutes)
    }))

  /** Multi-output functions — the reference's tuple-key `col_func_dict`
    * entries (DataLoader.add_cols, dataloader.py:121-134): one function
    * call assigns several columns at once.
    */
  val multiFuncRegistry: Map[String, (Seq[Column], Seq[Any]) => Seq[Column]] = Map(
    "lon_lat_to_xy" -> ((cs, _) => Seq(
      graft.functions.laea_x(cs.head, cs(1)), graft.functions.laea_y(cs.head, cs(1)))),
    "xy_to_lon_lat" -> ((cs, _) => Seq(
      graft.functions.laea_lon(cs.head, cs(1)), graft.functions.laea_lat(cs.head, cs(1)))),
    "divmod" -> ((cs, as_) => Seq(
      floor(cs.head / lit(as_.head)), pmod(cs.head, lit(as_.head)))))

  /** Declared parameter order per function that accepts the reference's
    * `col_kwargs` form (config_func, GPSat/utils.py:311-493): keyword column
    * arguments resolve by name into the slots after the positional col_args.
    */
  val funcParamNames: Map[String, Seq[String]] = Map(
    "laea_x" -> Seq("lon", "lat"), "laea_y" -> Seq("lon", "lat"),
    "laea_lon" -> Seq("x", "y"), "laea_lat" -> Seq("x", "y"),
    "lon_lat_to_xy" -> Seq("lon", "lat"), "xy_to_lon_lat" -> Seq("x", "y"),
    "+" -> Seq("x", "y"), "-" -> Seq("x", "y"), "*" -> Seq("x", "y"), "/" -> Seq("x", "y"))

  private def litOf(cs: Seq[Column], as_ : Seq[Any]): Column =
    if (cs.length > 1) cs(1) else lit(as_.head)

  /** One `col_funcs` entry: output column(s) from func + col args + literal
    * args. `outs` non-empty selects the multi-output (tuple-key) form;
    * `colKwargs` passes columns by parameter name (col_kwargs).
    */
  final case class ColFunc(out: String, func: String, colArgs: Seq[String] = Seq.empty,
                           args: Seq[Any] = Seq.empty,
                           outs: Seq[String] = Seq.empty,
                           colKwargs: Map[String, String] = Map.empty)

  def applyColFuncs(df: DataFrame, fns: Seq[ColFunc]): DataFrame =
    fns.foldLeft(df) { (d, f) =>
      val positional = f.colArgs.map(col)
      val kwargCols =
        if (f.colKwargs.isEmpty) Seq.empty
        else {
          val names = funcParamNames.getOrElse(f.func,
            throw new IllegalArgumentException(s"config_func '${f.func}' does not accept col_kwargs"))
          names.drop(positional.length).map(nm => col(f.colKwargs.getOrElse(nm,
            throw new IllegalArgumentException(s"col_kwargs missing parameter '$nm' for '${f.func}'"))))
        }
      val cs = positional ++ kwargCols
      if (f.outs.nonEmpty) {
        val fn = multiFuncRegistry.getOrElse(f.func,
          throw new IllegalArgumentException(s"multi-output config_func '${f.func}' is not in the whitelist"))
        val vals = fn(cs, f.args)
        require(vals.length == f.outs.length,
          s"columns: ${f.outs.mkString(",")} have length ${f.outs.length} " +
            s"but function '${f.func}' returned ${vals.length} values")
        f.outs.zip(vals).foldLeft(d) { case (dd, (o, v)) => dd.withColumn(o, v) }
      } else {
        val fn = funcRegistry.getOrElse(f.func,
          throw new IllegalArgumentException(s"config_func '${f.func}' is not in the whitelist"))
        d.withColumn(f.out, fn(cs, f.args))
      }
    }

  /** Data-load config: the `DataLoader.load` equivalent. */
  final case class DataConfig(
      source: String, // path; format from suffix (csv/tsv/parquet/json)
      where: Seq[Where] = Seq.empty,
      colFuncs: Seq[ColFunc] = Seq.empty,
      rowSelect: Seq[RowSelect] = Seq.empty,
      colSelect: Seq[String] = Seq.empty,
      fileRegex: Option[String] = None, // multi-file scan filter
      sourceColumn: Option[String] = None, // per-file provenance column
      newColumnNames: Option[Seq[String]] = None, // positional full rename
                                                  // (dataloader.py:428-432)
      table: Option[String] = None) // HDFStore key for pandas .h5 frames
                                    // (read_hdf's `key`/`table` arg; both
                                    // format='fixed' and format='table'
                                    // layouts dispatch by store shape)

  /** suffix -> format dispatch (dataloader.py:28-35) + scan -> where ->
    * col_funcs -> row_select -> col_select, in reference order
    * (`_modify_df`, dataloader.py:1681-1799). `where` is applied at the
    * source so Catalyst pushes it into the scan.
    */
  def load(spark: SparkSession, cfg: DataConfig): DataFrame = {
    val suffix = cfg.source.replaceAll("^.*\\.", "").toLowerCase
    // HDF5 goes through the pure-JVM granule codec (the reference's
    // canonical store suffix, dataloader.py:28-35 "h5"/"hdf5" -> read_hdf)
    if (suffix == "h5" || suffix == "hdf5") {
      // `table` set -> ONE pandas-HDFStore frame under that key (fixed or
      // table layout); unset -> columnar granule scan (directory/glob)
      var df = cfg.table match {
        case Some(key) =>
          // `where` pushdown (the reference's server-side store.select
          // where, dataloader.py:1161-1192): safe only while the triples
          // still name STORE columns — i.e. no positional rename pending;
          // table layouts prune chunk-wise, fixed layouts read fully.
          // The Spark-side filter below still applies (no-op on the
          // surviving rows), keeping both layouts semantically identical.
          val pushable = cfg.where.nonEmpty && cfg.newColumnNames.isEmpty
          var d = (if (pushable)
            graft.sources.Hdf5Table.readPandasKeyWhere(spark, cfg.source, key,
              cfg.where.map(w => graft.sources.Hdf5Table.TableWhere(w.col, w.comp, w.value)))
          else graft.sources.Hdf5Table.readPandasKey(spark, cfg.source, key)).drop("index")
          cfg.sourceColumn.foreach { c =>
            d = d.withColumn(c, regexp_extract(lit(cfg.source), "([^/]+)$", 1))
          }
          d
        case None =>
          // column pruning into the granule codec: safe only when the
          // downstream steps cannot reference columns outside
          // colSelect + where (no col_funcs / row_select / rename)
          val pruned =
            if (cfg.colSelect.nonEmpty && cfg.colFuncs.isEmpty && cfg.rowSelect.isEmpty &&
              cfg.newColumnNames.isEmpty)
              (cfg.colSelect ++ cfg.where.map(_.col)).distinct
                .filterNot(cfg.sourceColumn.contains)
            else Nil
          val d = graft.sources.Hdf5Table.read(spark, cfg.source, pruned)
          cfg.sourceColumn match {
            case Some(c) => d.withColumn(c, regexp_extract(col("source_file"), "([^/]+)$", 1))
                .drop("source_file")
            case None => d.drop("source_file")
          }
      }
      cfg.newColumnNames.foreach(ns => df = df.toDF(ns: _*))
      if (cfg.where.nonEmpty) df = df.filter(combineWhere(cfg.where))
      df = applyColFuncs(df, cfg.colFuncs)
      if (cfg.rowSelect.nonEmpty) df = df.filter(rowSelectColumn(cfg.rowSelect))
      if (cfg.colSelect.nonEmpty) df = df.select(cfg.colSelect.map(col): _*)
      return df
    }
    // legacy numpy array file (dataloader.py:782-1007 legacy route):
    // 1-d -> (index, value); 2-d (n, m) -> (index, c0..c{m-1});
    // `new_column_names` renames positionally as everywhere else
    if (suffix == "npy") {
      val p = new org.apache.hadoop.fs.Path(cfg.source)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val len = fs.getFileStatus(p).getLen.toInt
      val bytes = new Array[Byte](len)
      val in = fs.open(p)
      try in.readFully(0, bytes) finally in.close()
      val a = graft.sources.NpyLite.read(bytes)
      val isLong = a.longs != null
      import org.apache.spark.sql.types._
      val vt = if (isLong) LongType else DoubleType
      val (schema, rows) = a.shape match {
        case Seq(n) =>
          (StructType(Seq(StructField("index", LongType, nullable = false),
            StructField("value", vt, nullable = false))),
            (0 until n).map(i => org.apache.spark.sql.Row(i.toLong,
              if (isLong) a.longs(i) else a.doubles(i))))
        case Seq(n, m) =>
          (StructType(StructField("index", LongType, nullable = false) +:
            (0 until m).map(j => StructField(s"c$j", vt, nullable = false))),
            (0 until n).map(i => org.apache.spark.sql.Row.fromSeq(
              i.toLong +: (0 until m).map[Any](j =>
                if (isLong) a.longs(i * m + j) else a.doubles(i * m + j)))))
        case s => throw new IllegalArgumentException(s"$p: .npy rank ${s.length}")
      }
      import scala.jdk.CollectionConverters._
      var df = spark.createDataFrame(rows.asJava, schema)
      cfg.sourceColumn.foreach { c =>
        df = df.withColumn(c, regexp_extract(lit(cfg.source), "([^/]+)$", 1))
      }
      cfg.newColumnNames.foreach(ns => df = df.toDF(ns: _*))
      if (cfg.where.nonEmpty) df = df.filter(combineWhere(cfg.where))
      df = applyColFuncs(df, cfg.colFuncs)
      if (cfg.rowSelect.nonEmpty) df = df.filter(rowSelectColumn(cfg.rowSelect))
      if (cfg.colSelect.nonEmpty) df = df.select(cfg.colSelect.map(col): _*)
      return df
    }
    // legacy pickled stores: either a dict-of-2d-arrays store
    // (read_from_pkl_dict, dataloader.py:782-932 — (idx0, idx1, date,
    // obs, source) rows, NaN cells dropped at the source) or a pickled
    // pandas DataFrame (`pd.read_pickle`, dataloader.py:563-624) —
    // told apart by the DataFrame class GLOBAL in the head bytes
    if (suffix == "pkl") {
      val head = {
        val p = new org.apache.hadoop.fs.Path(cfg.source)
        val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
        val n = math.min(fs.getFileStatus(p).getLen, 512L).toInt
        val in = fs.open(p)
        try { val b = new Array[Byte](n); in.readFully(0, b, 0, n); b }
        finally in.close()
      }
      var df =
        if (graft.sources.PklLegacy.isFramePickle(head))
          graft.sources.PklLegacy.readPklFrames(spark, Seq(cfg.source))
        else graft.sources.PklLegacy.readPklDict(spark, Seq(cfg.source))
      cfg.sourceColumn.foreach { c =>
        df = df.withColumn(c, regexp_extract(lit(cfg.source), "([^/]+)$", 1))
      }
      cfg.newColumnNames.foreach(ns => df = df.toDF(ns: _*))
      if (cfg.where.nonEmpty) df = df.filter(combineWhere(cfg.where))
      df = applyColFuncs(df, cfg.colFuncs)
      if (cfg.rowSelect.nonEmpty) df = df.filter(rowSelectColumn(cfg.rowSelect))
      if (cfg.colSelect.nonEmpty) df = df.select(cfg.colSelect.map(col): _*)
      return df
    }
    // netCDF granules (dataloader.py:1124-1158 `netcdf` -> xr.open_dataset
    // -> to_dataframe -> reset_index): layout discovered from the first
    // granule's header, then the chunk-parallel granule scan. Numeric
    // range triples on DIM columns push a granule-level window (ranged
    // header reads skip out-of-window payloads) when no rename is
    // pending; the residual filter keeps exact semantics.
    if (suffix == "nc") {
      val (dims, vars) = graft.sources.NetCdfGrid.granuleLayout(spark, cfg.source)
      var df =
        if (cfg.newColumnNames.isEmpty && cfg.where.nonEmpty) {
          val ranges = whereRanges(cfg.where.filter(w => dims.contains(w.col)))
          if (ranges.nonEmpty)
            graft.sources.NetCdfGrid.readGridNdWindow(spark, cfg.source, dims, vars, ranges)
          else graft.sources.NetCdfGrid.readGridNd(spark, cfg.source, dims, vars)
        } else graft.sources.NetCdfGrid.readGridNd(spark, cfg.source, dims, vars)
      // positional rename covers the DATA columns (dims + vars), like the
      // flat-file dispatch renames scanned columns before provenance
      cfg.newColumnNames.foreach { ns =>
        val dataCols = df.columns.filter(_ != "source_file").toSeq
        require(ns.length == dataCols.length,
          s"new_column_names has ${ns.length} names for ${dataCols.length} columns")
        df = df.select(dataCols.zip(ns).map { case (o, n) => col(o).as(n) } :+
          col("source_file"): _*)
      }
      cfg.sourceColumn.foreach(c => df = df.withColumn(c,
        regexp_extract(col("source_file"), "([^/]+)$", 1)))
      df = df.drop("source_file")
      if (cfg.where.nonEmpty) df = df.filter(combineWhere(cfg.where))
      df = applyColFuncs(df, cfg.colFuncs)
      if (cfg.rowSelect.nonEmpty) df = df.filter(rowSelectColumn(cfg.rowSelect))
      if (cfg.colSelect.nonEmpty) df = df.select(cfg.colSelect.map(col): _*)
      return df
    }
    // zarr store directory (dataloader.py:28-35 `zarr` -> xr.open_zarr):
    // to_dataframe layout from the chunk-parallel scan. Numeric range
    // triples on DIM columns push into the scan as a chunk window (only
    // intersecting chunk files / shard inner chunks are read) when no
    // rename is pending; the residual filter below keeps the exact
    // semantics (strict </> trim the closed-interval window).
    if (suffix == "zarr") {
      var df =
        if (cfg.newColumnNames.isEmpty && cfg.where.nonEmpty) {
          val dims = graft.sources.ZarrGrid.storeDims(spark, cfg.source).toSet
          val ranges = whereRanges(cfg.where.filter(w => dims.contains(w.col)))
          if (ranges.nonEmpty)
            graft.sources.ZarrGrid.readStoreWindow(spark, cfg.source, ranges)
          else graft.sources.ZarrGrid.readStore(spark, cfg.source)
        } else graft.sources.ZarrGrid.readStore(spark, cfg.source)
      cfg.sourceColumn.foreach { c =>
        df = df.withColumn(c, regexp_extract(lit(cfg.source), "([^/]+)$", 1))
      }
      cfg.newColumnNames.foreach(ns => df = df.toDF(ns: _*))
      if (cfg.where.nonEmpty) df = df.filter(combineWhere(cfg.where))
      df = applyColFuncs(df, cfg.colFuncs)
      if (cfg.rowSelect.nonEmpty) df = df.filter(rowSelectColumn(cfg.rowSelect))
      if (cfg.colSelect.nonEmpty) df = df.select(cfg.colSelect.map(col): _*)
      return df
    }
    val fmt = suffix match {
      case "csv" => "csv"
      case "tsv" => "csv"
      case "parquet" | "pq" => "parquet"
      case "json" => "json"
      case other => throw new IllegalArgumentException(s"unsupported source suffix: $other")
    }
    var reader = spark.read.format(fmt)
    if (fmt == "csv") reader = reader.option("header", "true").option("inferSchema", "true")
    if (cfg.source.endsWith(".tsv")) reader = reader.option("sep", "\t")
    cfg.fileRegex.foreach(r => reader = reader.option("pathGlobFilter", r))
    var df = reader.load(cfg.source)
    // positional rename applies to the scanned columns, before the
    // provenance column and any filter (read_flat_files order)
    cfg.newColumnNames.foreach(ns => df = df.toDF(ns: _*))
    cfg.sourceColumn.foreach(c => df = df.withColumn(c,
      regexp_extract(input_file_name(), "([^/]+)$", 1)))
    if (cfg.where.nonEmpty) df = df.filter(combineWhere(cfg.where))
    df = applyColFuncs(df, cfg.colFuncs)
    if (cfg.rowSelect.nonEmpty) df = df.filter(rowSelectColumn(cfg.rowSelect))
    if (cfg.colSelect.nonEmpty) df = df.select(cfg.colSelect.map(col): _*)
    df
  }
}
