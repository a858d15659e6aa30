package graft.sources

import java.io.ByteArrayOutputStream

/** Minimal Python-pickle codec for the object attributes PyTables stores on
  * HDFStore groups/tables (reference result stores are written with
  * `pd.to_hdf(format='table')`, GPSat/dataloader.py:644-704, whose storer
  * metadata — `data_columns`, `non_index_axes`, `values_cols`, ... — is
  * pickled into HDF5 attributes).
  *
  * Implemented from the public pickle protocol documentation (PEP 307 /
  * CPython `pickletools`): the ENCODER emits protocol 2 for the value
  * shapes pandas metadata uses (str, int, list, 2-tuple, None, bool); the
  * DECODER additionally accepts the protocol-0/1 opcodes those same shapes
  * serialize to, so attributes from either pickler family parse. Anything
  * outside that scope raises naming the opcode.
  */
object PickleLite {

  /** Pickle (protocol 2) a value tree of String / Int / Long / Boolean /
    * None / Seq[Any] / (Any, Any).
    */
  def pickle(v: Any): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(0x80); out.write(2) // PROTO 2
    enc(out, v)
    out.write('.')
    out.toByteArray
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

  /** Unpickle one value (the scope above). */
  def unpickle(data: Array[Byte]): Any = {
    var p = 0
    def u1: Int = { val v = data(p) & 0xff; p += 1; v }
    def i4: Int = { val v = (data(p) & 0xff) | ((data(p + 1) & 0xff) << 8) |
      ((data(p + 2) & 0xff) << 16) | ((data(p + 3) & 0xff) << 24); p += 4; v }
    def line(): String = { // protocol-0 newline-terminated argument
      val start = p
      while (data(p) != '\n') p += 1
      val s = new String(data, start, p - start, "UTF-8")
      p += 1
      s
    }
    val stack = scala.collection.mutable.ArrayBuffer.empty[Any]
    val marks = scala.collection.mutable.ArrayBuffer.empty[Int]
    def popToMark(): Seq[Any] = {
      val m = marks.remove(marks.length - 1)
      val items = stack.slice(m, stack.length).toSeq
      stack.remove(m, stack.length - m)
      items
    }
    while (true) {
      val op = u1
      op match {
        case 0x80 => u1 // PROTO n
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
        case 'X' => val n = i4; stack += new String(data, p, n, "UTF-8"); p += n
        case 'U' => val n = u1; stack += new String(data, p, n, "UTF-8"); p += n // SHORT_BINSTRING
        case 'T' => val n = i4; stack += new String(data, p, n, "UTF-8"); p += n // BINSTRING
        case 0x8c => val n = u1; stack += new String(data, p, n, "UTF-8"); p += n // SHORT_BINUNICODE (p4)
        case 'S' => // protocol-0 quoted STRING
          val s = line()
          stack += s.substring(1, s.length - 1)
        case 'V' => stack += line() // protocol-0 UNICODE
        case ']' => stack += Vector.empty[Any] // EMPTY_LIST
        case ')' => stack += Vector.empty[Any] // EMPTY_TUPLE (as a Seq)
        case '(' => marks += stack.length // MARK
        case 'l' => stack += popToMark().toVector // protocol-0 LIST
        case 't' => stack += popToMark().toVector // TUPLE (as a Seq)
        case 0x85 => val a = stack.remove(stack.length - 1); stack += Vector(a) // TUPLE1
        case 0x86 => // TUPLE2
          val b = stack.remove(stack.length - 1); val a = stack.remove(stack.length - 1)
          stack += ((a, b))
        case 'e' => // APPENDS
          val items = popToMark()
          val xs = stack.remove(stack.length - 1).asInstanceOf[Seq[Any]]
          stack += (xs ++ items)
        case 'a' => // APPEND
          val item = stack.remove(stack.length - 1)
          val xs = stack.remove(stack.length - 1).asInstanceOf[Seq[Any]]
          stack += (xs :+ item)
        case 'q' => u1 // BINPUT (memo: ignored)
        case 'r' => i4 // LONG_BINPUT
        case 'p' => line() // protocol-0 PUT
        case 'g' => throw new IllegalArgumentException(
          "pickle GET (memo reference) not supported")
        case o => throw new IllegalArgumentException(
          f"pickle opcode 0x$o%02x ('${o.toChar}') not supported")
      }
    }
    throw new IllegalStateException("unreachable")
  }
}
