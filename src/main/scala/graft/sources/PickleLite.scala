package graft.sources

import java.io.ByteArrayOutputStream

/** Minimal Python-pickle codec for (a) the object attributes PyTables
  * stores on HDFStore groups/tables (reference result stores are written
  * with `pd.to_hdf(format='table')`, GPSat/dataloader.py:644-704, whose
  * storer metadata — `data_columns`, `non_index_axes`, `values_cols`, ...
  * — is pickled into HDF5 attributes), and (b) the legacy
  * dict-of-2d-numpy-arrays stores `read_from_pkl_dict` loads
  * (GPSat/dataloader.py:782-932).
  *
  * Implemented from the public pickle protocol documentation (PEP 307 /
  * PEP 3154 / CPython `pickletools`): the ENCODER emits protocol 2 for
  * the value shapes pandas metadata uses (str, int, list, 2-tuple, None,
  * bool) plus dicts and [[NdArray]] values — the latter byte-compatible
  * with numpy's own reduce (`_reconstruct` + `ndarray.__setstate__`, data
  * framed through the `_codecs.encode(..., 'latin1')` protocol-2 idiom).
  * The DECODER additionally accepts protocol 0/1/4/5 opcodes (memo,
  * frames, STACK_GLOBAL, BINBYTES) so pickles from any CPython protocol
  * parse. Object construction is allow-listed: `_reconstruct`,
  * `numpy.dtype`, `_codecs.encode`, and `numpy` scalar wrappers;
  * anything else raises naming the callable.
  */
object PickleLite {

  /** A decoded (or to-encode) numpy ndarray: little-endian `descr` like
    * "&lt;f8"/"&lt;i8", C or Fortran element order, raw data bytes.
    */
  final case class NdArray(shape: Seq[Int], descr: String, fortran: Boolean,
                           data: Array[Byte]) {
    private def le = java.nio.ByteBuffer.wrap(data).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    private def n = shape.product
    /** Row-major (C-order) doubles, whatever the stored order/dtype. */
    def doubles: Array[Double] = {
      val bb = le
      val flat = descr.replaceAll("^[<|=]", "") match {
        case "f8" => Array.tabulate(n)(i => bb.getDouble(i * 8))
        case "f4" => Array.tabulate(n)(i => bb.getFloat(i * 4).toDouble)
        case "i8" => Array.tabulate(n)(i => bb.getLong(i * 8).toDouble)
        case "i4" => Array.tabulate(n)(i => bb.getInt(i * 4).toDouble)
        case d => throw new IllegalArgumentException(s"ndarray dtype '$descr' not supported")
      }
      if (!fortran || shape.length < 2) flat
      else { // transpose Fortran storage back to C order
        require(shape.length == 2, "fortran order beyond 2-d not supported")
        val Seq(r, c) = shape
        Array.tabulate(n)(i => flat((i % c) * r + i / c))
      }
    }
  }

  /** An object-dtype ndarray: the items ride as a pickled list (numpy's
    * own representation — raw buffers can't hold PyObject pointers).
    */
  final case class ObjArray(shape: Seq[Int], values: Seq[Any],
                            fortran: Boolean = false)

  /** `builtins.slice(start, stop, step)` — pandas block placements. */
  final case class PySlice(start: Long, stop: Long, step: Long)

  /** One pandas Block: `values` is an [[NdArray]] (2-d, block-column
    * major) or [[ObjArray]]; `placement` a [[PySlice]] or index array
    * locating its rows among the frame's columns.
    */
  final case class PdBlock(values: Any, placement: Any)

  /** A pandas Index: `cls` is the terminal class name ("RangeIndex",
    * "Index", ...), `values` an [[NdArray]]/[[ObjArray]]/[[PdRange]].
    */
  final case class PdIndex(cls: String, name: Option[String], values: Any)
  final case class PdRange(start: Long, stop: Long, step: Long)

  /** A decoded pandas DataFrame: BlockManager blocks + axes
    * (axes(0) = column labels, axes(1) = row index).
    */
  final case class PdFrame(blocks: Seq[PdBlock], axes: Seq[PdIndex])

  private final case class GlobalRef(module: String, name: String)
  private final class NdStub { var value: Any = _ }
  private final class DtypeStub(val descr: String) {
    var byteorder = "<"
    var unit: String = _ // datetime64 resolution from the dtype metadata
    def full: String = if (unit == null) descr else s"$descr[$unit]"
  }
  private final class PdFrameStub { var value: PdFrame = _ }
  private final class MgrStub { var value: PdFrame = _ } // legacy 0.14.1 states
  private final class NdBackedStub { var value: Any = _ } // DatetimeArray et al.

  /** Pickle (protocol 2) a value tree of String / Int / Long / Boolean /
    * None / Seq[Any] / (Any, Any) / Map[String, Any] / [[NdArray]].
    */
  def pickle(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0x80); out.write(2) // PROTO 2
    enc(out, v)
    out.write('.')
    out.toByteArray
  }

  private def global(out: ByteArrayOutputStream, module: String, name: String): Unit = {
    out.write('c')
    out.write(s"$module\n$name\n".getBytes("US-ASCII"), 0, module.length + name.length + 2)
  }

  // bytes as protocol-2 does it: _codecs.encode(<latin1 str>, 'latin1')
  private def encBytes(out: ByteArrayOutputStream, b: Array[Byte]): Unit = {
    global(out, "_codecs", "encode")
    enc(out, new String(b, "ISO-8859-1"))
    enc(out, "latin1")
    out.write(0x86) // TUPLE2
    out.write('R')  // REDUCE
  }

  private def enc(out: ByteArrayOutputStream, v: Any): Unit = v match {
    case null | None => out.write('N')
    case b: Boolean => out.write(0x80 + (if (b) 8 else 9)) // NEWTRUE/NEWFALSE (0x88/0x89)
    case s: String =>
      val b = s.getBytes("UTF-8")
      out.write('X') // BINUNICODE
      writeIntLe(out, b.length)
      out.write(b, 0, b.length)
    case i: Int => enc(out, i.toLong)
    case i: Long =>
      require(i >= Int.MinValue && i <= Int.MaxValue, s"int $i out of BININT range")
      if (i >= 0 && i < 256) { out.write('K'); out.write(i.toInt) } // BININT1
      else { out.write('J'); writeIntLe(out, i.toInt) }            // BININT
    case a: NdArray =>
      // numpy's own __reduce__: _reconstruct(ndarray, (0,), b'b'), then
      // __setstate__((1, shape, dtype, fortran, data))
      global(out, "numpy.core.multiarray", "_reconstruct")
      global(out, "numpy", "ndarray")
      out.write('K'); out.write(0); out.write(0x85) // (0,)
      encBytes(out, Array('b'.toByte))
      out.write(0x87) // TUPLE3
      out.write('R')  // REDUCE -> bare ndarray
      out.write('(')  // MARK: the 5-tuple state
      enc(out, 1L)
      out.write('(')
      a.shape.foreach(d => enc(out, d.toLong))
      out.write('t')
      global(out, "numpy", "dtype")
      enc(out, a.descr.replaceAll("^[<|=]", ""))
      out.write(0x89); out.write(0x88) // align=False, copy=True
      out.write(0x87); out.write('R')  // dtype(...)
      out.write('(')                   // dtype state (3, '<', None, None, None, -1, -1, 0)
      enc(out, 3L); enc(out, "<"); enc(out, None); enc(out, None); enc(out, None)
      enc(out, -1L); enc(out, -1L); enc(out, 0L)
      out.write('t'); out.write('b')
      enc(out, a.fortran)
      encBytes(out, a.data)
      out.write('t'); out.write('b')   // ndarray.__setstate__
    case a: ObjArray =>
      // object ndarray: same _reconstruct/__setstate__ dance, dtype 'O8'
      // ('|' byteorder, hash 63), items as a pickled list
      global(out, "numpy.core.multiarray", "_reconstruct")
      global(out, "numpy", "ndarray")
      out.write('K'); out.write(0); out.write(0x85) // (0,)
      encBytes(out, Array('b'.toByte))
      out.write(0x87); out.write('R')
      out.write('(')
      enc(out, 1L)
      out.write('(')
      a.shape.foreach(d => enc(out, d.toLong))
      out.write('t')
      global(out, "numpy", "dtype")
      enc(out, "O8")
      out.write(0x89); out.write(0x88)
      out.write(0x87); out.write('R')
      out.write('(')
      enc(out, 3L); enc(out, "|"); enc(out, None); enc(out, None); enc(out, None)
      enc(out, -1L); enc(out, -1L); enc(out, 63L)
      out.write('t'); out.write('b')
      enc(out, a.fortran)
      enc(out, a.values.toVector)
      out.write('t'); out.write('b')
    case f: PdFrame =>
      // DataFrame.__reduce_ex__(2): NEWOBJ + __setstate__({"_mgr": ...});
      // the manager via its own BlockManager((blocks...), [axes]) reduce
      global(out, "pandas.core.frame", "DataFrame")
      out.write(')'); out.write(0x81) // NEWOBJ
      out.write('}'); out.write('(')
      enc(out, "_mgr")
      global(out, "pandas.core.internals.managers", "BlockManager")
      out.write('(')
      f.blocks.foreach(enc(out, _))
      out.write('t')
      enc(out, f.axes.toVector)
      out.write(0x86); out.write('R')
      enc(out, "_typ"); enc(out, "dataframe")
      out.write('u'); out.write('b')
    case b: PdBlock =>
      global(out, "pandas._libs.internals", "_unpickle_block")
      enc(out, b.values)
      enc(out, b.placement)
      enc(out, 2L)
      out.write(0x87); out.write('R')
    case s: PySlice =>
      global(out, "__builtin__", "slice")
      enc(out, s.start); enc(out, s.stop); enc(out, s.step)
      out.write(0x87); out.write('R')
    case ix: PdIndex =>
      global(out, "pandas.core.indexes.base", "_new_Index")
      ix.values match {
        case PdRange(start, stop, step) =>
          global(out, "pandas.core.indexes.range", "RangeIndex")
          enc(out, scala.collection.mutable.LinkedHashMap[Any, Any](
            "name" -> ix.name.orNull, "start" -> start, "stop" -> stop,
            "step" -> step))
        case v =>
          global(out, "pandas.core.indexes.base", "Index")
          enc(out, scala.collection.mutable.LinkedHashMap[Any, Any](
            "data" -> v, "name" -> ix.name.orNull))
      }
      out.write(0x86); out.write('R')
    case m: scala.collection.Map[_, _] =>
      out.write('}') // EMPTY_DICT
      if (m.nonEmpty) {
        out.write('(')
        m.foreach { case (k, x) => enc(out, k); enc(out, x) }
        out.write('u') // SETITEMS
      }
    case (a, b) =>
      enc(out, a); enc(out, b)
      out.write(0x86) // TUPLE2
    case xs: Seq[_] =>
      out.write(']') // EMPTY_LIST
      if (xs.nonEmpty) {
        out.write('(') // MARK
        xs.foreach(enc(out, _))
        out.write('e') // APPENDS
      }
    case other => throw new IllegalArgumentException(
      s"cannot pickle ${other.getClass.getName}")
  }

  private def writeIntLe(out: ByteArrayOutputStream, i: Int): Unit = {
    out.write(i & 0xff); out.write((i >> 8) & 0xff)
    out.write((i >> 16) & 0xff); out.write((i >> 24) & 0xff)
  }

  /** Unpickle one value (the scope above). Dicts come back as
    * LinkedHashMap (insertion order = pickle order), ndarrays as
    * [[NdArray]], bytes as Array[Byte].
    */
  def unpickle(data: Array[Byte]): Any = {
    var p = 0
    def u1: Int = { val v = data(p) & 0xff; p += 1; v }
    def i4: Int = { val v = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8) |
      ((data(p + 2) & 0xff) << 16) | ((data(p + 3) & 0xff) << 24); p += 4; v }
    def i8: Long = { var v = 0L; (0 until 8).foreach(k => v |= (data(p + k).toLong & 0xff) << (8 * k)); p += 8; v }
    def line(): String = { // protocol-0 newline-terminated argument
      val start = p
      while (data(p) != '\n') p += 1
      val s = new String(data, start, p - start, "UTF-8")
      p += 1
      s
    }
    def takeBytes(n: Int): Array[Byte] = {
      val b = java.util.Arrays.copyOfRange(data, p, p + n); p += n; b
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Any]
    val marks = scala.collection.mutable.ArrayBuffer.empty[Int]
    val memo = scala.collection.mutable.Map.empty[Int, Any]
    def popToMark(): Seq[Any] = {
      val m = marks.remove(marks.length - 1)
      val items = stack.slice(m, stack.length).toSeq
      stack.remove(m, stack.length - m)
      items
    }
    def pop(): Any = stack.remove(stack.length - 1)

    def asBytes(v: Any): Array[Byte] = v match {
      case b: Array[Byte] => b
      case s: String => s.getBytes("ISO-8859-1") // latin1 chars round-trip
      case other => throw new IllegalArgumentException(s"expected bytes, got $other")
    }
    def asInt(v: Any): Int = v match { case l: Long => l.toInt; case i: Int => i }

    // allow-listed constructor calls (REDUCE / NEWOBJ)
    def reduce(callable: Any, args: Seq[Any]): Any = callable match {
      case GlobalRef("numpy.core.multiarray" | "numpy._core.multiarray", "_reconstruct") =>
        new NdStub // filled by the BUILD state
      case GlobalRef("_codecs", "encode") =>
        require(args.length == 2 && args(1) == "latin1", s"_codecs.encode $args")
        args.head.asInstanceOf[String].getBytes("ISO-8859-1")
      case GlobalRef("numpy", "dtype") =>
        new DtypeStub(String.valueOf(args.head))
      case GlobalRef("numpy.core.numeric" | "numpy._core.numeric", "_frombuffer") =>
        // protocol-5 ndarray reduce: (buffer, dtype, shape, order)
        require(args.length == 4, s"_frombuffer arity ${args.length}")
        val dt = args(1).asInstanceOf[DtypeStub]
        require(dt.byteorder == "<" || dt.byteorder == "|" || dt.byteorder == "=",
          s"big-endian ndarray not supported")
        val shape = tupleSeq(args(2)).asInstanceOf[Seq[Any]].map(asInt)
        NdArray(shape, s"<${dt.descr}", args(3) == "F", asBytes(args.head))
      case GlobalRef("numpy.core.multiarray" | "numpy._core.multiarray", "scalar") =>
        // numpy scalar: (dtype, bytes) -> a plain Double/Long
        val d = args.head.asInstanceOf[DtypeStub]
        val bb = java.nio.ByteBuffer.wrap(asBytes(args(1)))
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        d.descr.replaceAll("^[<|=]", "") match {
          case "f8" => bb.getDouble
          case "f4" => bb.getFloat.toDouble
          case "i8" => bb.getLong
          case "i4" => bb.getInt.toLong
          case o => throw new IllegalArgumentException(s"numpy scalar dtype '$o' not supported")
        }
      // ---- pandas DataFrame pickles (pd.to_pickle / pickle.dumps(df)) ----
      case GlobalRef("pandas.core.frame", "DataFrame") =>
        require(args.isEmpty, s"DataFrame NEWOBJ args $args")
        new PdFrameStub // filled by BUILD with {"_mgr": ...} state
      case GlobalRef("pandas.core.internals.managers", "BlockManager") =>
        if (args.isEmpty) new MgrStub // legacy NEWOBJ + 0.14.1 BUILD state
        else { // modern __reduce__: BlockManager((block...), [axes])
          require(args.length >= 2, s"BlockManager arity ${args.length}")
          val blocks = tupleSeq(args.head).asInstanceOf[Seq[Any]].map {
            case b: PdBlock => b
            case o => throw new IllegalArgumentException(s"BlockManager block: $o")
          }
          PdFrame(blocks, tupleSeq(args(1)).asInstanceOf[Seq[Any]].map(asIndex))
        }
      case GlobalRef("pandas._libs.internals", "_unpickle_block") =>
        require(args.length == 3, s"_unpickle_block arity ${args.length}")
        PdBlock(unwrapArr(args.head), args(1))
      case GlobalRef("builtins" | "__builtin__", "slice") =>
        PySlice(asLong(args(0)), asLong(args(1)), asLong(args(2)))
      case GlobalRef("pandas._libs.arrays", "__pyx_unpickle_NDArrayBacked") =>
        new NdBackedStub // (cls, checksum, None); BUILD state carries the array
      case GlobalRef("pandas.core.indexes.base", "_new_Index") =>
        val cls = args.head match {
          case GlobalRef(_, n) => n
          case o => throw new IllegalArgumentException(s"_new_Index class: $o")
        }
        val d = args(1).asInstanceOf[scala.collection.Map[Any, Any]]
        val name = d.get("name").filter(v => v != None && v != null).map(String.valueOf)
        if (cls == "RangeIndex")
          PdIndex(cls, name,
            PdRange(asLong(d("start")), asLong(d("stop")), asLong(d("step"))))
        else {
          val data = d.getOrElse("data", throw new IllegalArgumentException(
            s"_new_Index($cls) without data"))
          PdIndex(cls, name, unwrapArr(data))
        }
      case GlobalRef(m, n) => throw new IllegalArgumentException(
        s"pickle REDUCE of $m.$n not supported (numpy ndarray/dtype/scalar, " +
          "_codecs.encode, and the pandas DataFrame constructors only)")
      case other => throw new IllegalArgumentException(s"pickle REDUCE of $other")
    }

    def asLong(v: Any): Long = v match {
      case l: Long => l; case i: Int => i.toLong
      case o => throw new IllegalArgumentException(s"expected int, got $o")
    }
    def unwrapArr(v: Any): Any = v match {
      case s: NdStub => s.value
      case s: NdBackedStub => s.value
      case o => o
    }
    def asIndex(v: Any): PdIndex = v match {
      case i: PdIndex => i
      case o => throw new IllegalArgumentException(s"expected a pandas Index, got $o")
    }

    def build(obj: Any, state: Any): Any = obj match {
      case s: NdStub =>
        // ndarray.__setstate__((version, shape, dtype, fortran, data));
        // object dtypes carry a list of items instead of a byte buffer
        val st = state.asInstanceOf[Seq[Any]]
        require(st.length == 5, s"ndarray state arity ${st.length}")
        val shape = tupleSeq(st(1)).asInstanceOf[Seq[Any]].map(asInt)
        val dt = st(2).asInstanceOf[DtypeStub]
        s.value = st(4) match {
          case items: scala.collection.Seq[_] =>
            ObjArray(shape, items.toSeq.asInstanceOf[Seq[Any]], st(3) == true)
          case data =>
            require(dt.byteorder == "<" || dt.byteorder == "|" || dt.byteorder == "=",
              s"big-endian ndarray ('${dt.byteorder}${dt.descr}') not supported")
            NdArray(shape, s"<${dt.full}", st(3) == true, asBytes(data))
        }
        s.value
      case d: DtypeStub =>
        // dtype.__setstate__((ver, byteorder, subdescr, names, fields, ...));
        // datetime dtypes bury the unit in the metadata tail as bytes
        val st = state.asInstanceOf[Seq[Any]]
        st.lift(1).foreach(bo => d.byteorder = String.valueOf(bo))
        if (d.descr.startsWith("M8") || d.descr.startsWith("m8")) {
          val units = Set("ns", "us", "ms", "s", "m", "h", "D")
          def scan(v: Any): Unit = v match {
            case b: Array[Byte] =>
              val u = new String(b, "US-ASCII")
              if (units(u) && d.unit == null) d.unit = u
            case p: Product => p.productIterator.foreach(scan)
            case xs: Iterable[_] => xs.foreach(scan)
            case _ => ()
          }
          scan(st.drop(2))
        }
        d
      case s: NdBackedStub =>
        // NDArrayBacked.__setstate__((dtype, values, attrs)) — DatetimeArray
        // and friends; the payload is the backing ndarray (position varies
        // across pandas versions, so take the first array in the state)
        val st = tupleSeq(state).asInstanceOf[Seq[Any]]
        s.value = st.collectFirst {
          case nd: NdArray => nd
          case o: ObjArray => o
        }.getOrElse(throw new IllegalArgumentException(
          s"NDArrayBacked state without a backing ndarray: $st"))
        s.value
      case s: PdFrameStub =>
        // NDFrame.__setstate__({"_mgr"|"_data": manager, ...})
        val st = state.asInstanceOf[scala.collection.Map[Any, Any]]
        val mgr = st.get("_mgr").orElse(st.get("_data")).getOrElse(
          throw new IllegalArgumentException(
            s"DataFrame state without _mgr/_data: keys ${st.keys.mkString(",")}"))
        s.value = mgr match {
          case f: PdFrame => f
          case m: MgrStub => m.value
          case other => throw new IllegalArgumentException(
            s"DataFrame manager is ${other.getClass.getName}")
        }
        s.value
      case s: MgrStub =>
        // legacy BlockManager.__setstate__((axes, block_values, block_items,
        // extra)) — the pre-1.x wire format. The authoritative payload is
        // extra["0.14.1"] = {"axes": [...], "blocks": [{"values", "mgr_locs"}]}
        // (what pandas' own __setstate__ reads); the leading tuple elements
        // are the pre-0.14.1 fallback, recovered by item-label lookup.
        val st = tupleSeq(state).asInstanceOf[Seq[Any]]
        require(st.length >= 3, s"BlockManager legacy state arity ${st.length}")
        val modern = st.lift(3).collect {
          case m: scala.collection.Map[Any @unchecked, Any @unchecked] => m.get("0.14.1")
        }.flatten.collect {
          case m: scala.collection.Map[Any @unchecked, Any @unchecked]
            if m.contains("axes") && m.contains("blocks") => m
        }
        s.value = modern match {
          case Some(m) =>
            val axes = asSeq(m("axes")).map(asIndex)
            val blocks = asSeq(m("blocks")).map { b =>
              val bd = b.asInstanceOf[scala.collection.Map[Any, Any]]
              PdBlock(unwrapArr(bd("values")), unwrapArr(bd("mgr_locs")))
            }
            PdFrame(blocks, axes)
          case scala.None =>
            val axes = asSeq(st(0)).map(asIndex)
            val bvals = asSeq(st(1)).map(unwrapArr)
            val bitems = asSeq(st(2)).map(asIndex)
            val colLabels = indexLabels(axes.head)
            val blocks = bvals.lazyZip(bitems).map { (v, items) =>
              val placement = indexLabels(items).map { l =>
                val i = colLabels.indexOf(l)
                require(i >= 0, s"block item '$l' not among columns $colLabels")
                i.toLong
              }
              PdBlock(v, placement)
            }
            PdFrame(blocks.toSeq, axes)
        }
        s.value
      case other => throw new IllegalArgumentException(
        s"pickle BUILD on ${other.getClass.getName} not supported")
    }

    def indexLabels(ix: PdIndex): Seq[Any] = ix.values match {
      case o: ObjArray => o.values
      case nd: NdArray => nd.doubles.toSeq
      case PdRange(start, stop, step) => (start until stop by step).toSeq
      case other => throw new IllegalArgumentException(s"index values: $other")
    }

    // tuples are modeled as Seq (TUPLE/TUPLE1) or Product (TUPLE2/3); give
    // BUILD a uniform Seq view
    def tupleSeq(v: Any): Any = v match {
      case p2: (_, _) => Seq(p2._1, p2._2)
      case p3: (_, _, _) => Seq(p3._1, p3._2, p3._3)
      case s: scala.collection.Seq[_] => s.toSeq // lists are mutable buffers
      case other => other
    }
    def asSeq(v: Any): Seq[Any] = v match {
      case s: scala.collection.Seq[_] => s.toSeq.asInstanceOf[Seq[Any]]
      case other => throw new IllegalArgumentException(s"expected a list, got $other")
    }

    while (true) {
      val op = u1
      op match {
        case 0x80 => u1 // PROTO n
        case 0x95 => p += 8 // FRAME (protocol 4): length hint, ignored
        case '.' => require(stack.length == 1, s"pickle stack ${stack.length} at STOP")
          return stack.head
        case 'N' => stack += None
        case 0x88 => stack += true
        case 0x89 => stack += false
        case 'K' => stack += u1.toLong // BININT1
        case 'M' => stack += (u1 | (u1 << 8)).toLong // BININT2
        case 'J' => stack += i4.toLong // BININT (signed)
        case 'I' => stack += line().toLong // protocol-0 INT
        case 'L' => stack += line().stripSuffix("L").toLong // protocol-0 LONG
        case 0x8a => // LONG1: n-byte little-endian signed
          val n = u1
          var v = 0L
          (0 until n).foreach(k => v |= (data(p + k).toLong & 0xff) << (8 * k))
          if (n > 0 && n < 8 && (data(p + n - 1) & 0x80) != 0) v -= (1L << (8 * n))
          p += n
          stack += v
        case 'G' => // BINFLOAT: big-endian double
          var bits = 0L
          (0 until 8).foreach(_ => bits = (bits << 8) | (u1 & 0xffL))
          stack += java.lang.Double.longBitsToDouble(bits)
        case 'X' => val n = i4; stack += new String(data, p, n, "UTF-8"); p += n
        case 0x8c => val n = u1; stack += new String(data, p, n, "UTF-8"); p += n // SHORT_BINUNICODE
        case 0x8d => val n = i8.toInt; stack += new String(data, p, n, "UTF-8"); p += n // BINUNICODE8
        // protocol-1 "strings" are python-2 bytes: latin1 preserves them
        case 'U' => stack += new String(takeBytes(u1), "ISO-8859-1") // SHORT_BINSTRING
        case 'T' => stack += new String(takeBytes(i4), "ISO-8859-1") // BINSTRING
        case 'B' => stack += takeBytes(i4) // BINBYTES
        case 'C' => stack += takeBytes(u1) // SHORT_BINBYTES
        case 0x8e => stack += takeBytes(i8.toInt) // BINBYTES8
        case 0x96 => stack += takeBytes(i8.toInt) // BYTEARRAY8 (protocol 5)
        case 'S' => // protocol-0 quoted STRING
          val s = line()
          stack += s.substring(1, s.length - 1)
        case 'V' => stack += line() // protocol-0 UNICODE
        // lists MUST be mutated in place: BINPUT memoizes the (empty) list
        // before APPENDS fills it, and shared references BINGET it later
        case ']' => stack += scala.collection.mutable.ArrayBuffer.empty[Any] // EMPTY_LIST
        case ')' => stack += Vector.empty[Any] // EMPTY_TUPLE (as a Seq)
        case '}' => stack += scala.collection.mutable.LinkedHashMap.empty[Any, Any]
        case '(' => marks += stack.length // MARK
        case 'l' => // protocol-0 LIST
          stack += scala.collection.mutable.ArrayBuffer(popToMark(): _*)
        case 't' => stack += popToMark().toVector // TUPLE (as a Seq)
        case 0x85 => val a = pop(); stack += Vector(a) // TUPLE1
        case 0x86 => // TUPLE2
          val b = pop(); val a = pop()
          stack += ((a, b))
        case 0x87 => // TUPLE3
          val c = pop(); val b = pop(); val a = pop()
          stack += ((a, b, c))
        case 'e' => // APPENDS (in place — the list may be memo-shared)
          val items = popToMark()
          stack.last.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]] ++= items
        case 'a' => // APPEND (in place)
          val item = pop()
          stack.last.asInstanceOf[scala.collection.mutable.ArrayBuffer[Any]] += item
        case 's' => // SETITEM
          val v = pop(); val k = pop()
          stack.last.asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]].put(k, v)
        case 'u' => // SETITEMS
          val items = popToMark()
          val d = stack.last.asInstanceOf[scala.collection.mutable.LinkedHashMap[Any, Any]]
          items.grouped(2).foreach(kv => d.put(kv(0), kv(1)))
        case 'c' => stack += GlobalRef(line(), line()) // GLOBAL
        case 0x93 => // STACK_GLOBAL
          val n = pop(); val m = pop()
          stack += GlobalRef(String.valueOf(m), String.valueOf(n))
        case 'R' => // REDUCE
          val args = tupleSeq(pop()).asInstanceOf[Seq[Any]]
          val callable = pop()
          stack += reduce(callable, args)
        case 0x81 => // NEWOBJ: cls.__new__(cls, *args) — same allow-list
          val args = tupleSeq(pop()).asInstanceOf[Seq[Any]]
          val cls = pop()
          stack += reduce(cls, args)
        case 'b' => // BUILD
          val state = tupleSeq(pop())
          val obj = pop()
          stack += build(obj, state)
        case 'q' => memo(u1) = stack.last // BINPUT
        case 'r' => memo(i4) = stack.last // LONG_BINPUT
        case 0x94 => memo(memo.size) = stack.last // MEMOIZE
        case 'h' => stack += memo(u1) // BINGET
        case 'j' => stack += memo(i4) // LONG_BINGET
        case 'p' => memo(line().toInt) = stack.last // protocol-0 PUT
        case 'g' => stack += memo(line().toInt) // protocol-0 GET
        case o => throw new IllegalArgumentException(
          f"pickle opcode 0x$o%02x ('${o.toChar}') not supported")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
