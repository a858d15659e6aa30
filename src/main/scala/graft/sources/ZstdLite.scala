package graft.sources

/** Pure-JVM Zstandard codec, implemented from the public RFC 8878 frame
  * format (+ the FSE/Huffman construction rules it normatively references).
  *
  * DECODER: frames -> blocks (raw / RLE / compressed), compressed blocks =
  * a literals section (raw / RLE / Huffman with direct or FSE-compressed
  * weights, 1 or 4 streams) + a sequences section (predefined / RLE /
  * FSE-compressed / repeat tables for literal-length, offset and
  * match-length codes, with the 3-slot repeat-offset history). Single
  * frames, no dictionaries, content checksum skipped — the profile
  * numcodecs' `Zstd()`/`Blosc(cname='zstd')` chunk payloads use.
  *
  * ENCODER ([[compress]]): greedy hash-table LZ77 matching + sequences
  * under the RFC's PREDEFINED FSE distributions with raw literals, plus
  * RLE/raw block fallbacks — a real entropy coder (any zstd reader
  * accepts the frames and compressible data genuinely shrinks), kept to
  * the predefined-table profile so the backward-bitstream writer is the
  * exact mirror of the decoder here. [[compressStored]] remains for
  * callers that want raw-block framing only.
  *
  * Why hand-rolled: zarr's modern default stores are zstd-framed, the
  * sandbox classpath has no zstd JNI, and the reference opens such stores
  * through xarray (GPSat/dataloader.py:28-35). Conformance: ZstdSpec
  * decodes frames produced by the REAL zstd CLI v1.5.7 across levels
  * 3-19, and has the same CLI decode THIS encoder's frames bit-exactly.
  */
object ZstdLite {

  private def highbit(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Encode a STORED-mode zstd frame (raw blocks, no entropy coding) —
    * a valid RFC 8878 frame any zstd decoder accepts. Lets the engine
    * WRITE `{"id":"zstd"}`-tagged zarr chunks without shipping an
    * entropy encoder; real compression on the write side stays with
    * zlib/lz4 (see class doc).
    */
  def compressStored(raw: Array[Byte]): Array[Byte] = {
    val maxBlock = 128 * 1024
    val nBlocks = math.max(1, (raw.length + maxBlock - 1) / maxBlock)
    val fcsLen = if (raw.length <= 255) 1 else if (raw.length < 65536 + 256) 2 else 4
    val fcsFlag = fcsLen match { case 1 => 0; case 2 => 1; case 4 => 2 }
    val out = java.nio.ByteBuffer.allocate(4 + 1 + fcsLen + nBlocks * 3 + raw.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.putInt(0xFD2FB528)
    out.put(((fcsFlag << 6) | 0x20).toByte) // single-segment, no checksum/dict
    fcsLen match {
      case 1 => out.put(raw.length.toByte)
      case 2 => out.putShort((raw.length - 256).toShort)
      case 4 => out.putInt(raw.length)
    }
    var off = 0
    var bi = 0
    while (bi < nBlocks) {
      val len = math.min(maxBlock, raw.length - off)
      val last = if (bi == nBlocks - 1) 1 else 0
      val bh = (len << 3) | last // type 0 = raw
      out.put((bh & 0xff).toByte).put(((bh >> 8) & 0xff).toByte).put(((bh >> 16) & 0xff).toByte)
      out.put(raw, off, len)
      off += len; bi += 1
    }
    out.array()
  }

  // ------------------------------------------------------------- encoder

  /** FSE ENCODING table for one predefined distribution: the mirror of
    * [[fseBuild]] (same symbol spread, so encoder and decoder agree on
    * state numbering). Encoder states live in [tableSize, 2*tableSize);
    * `deltaNbBits`/`deltaFindState` are the standard FSE per-symbol
    * transition constants from the public FSE construction rules.
    */
  private final class FseEnc(norm: Array[Int], val accuracyLog: Int, name: String) {
    val tableSize: Int = 1 << accuracyLog
    val stateTable = new Array[Int](tableSize)
    val deltaNbBits = new Array[Int](norm.length)
    val deltaFindState = new Array[Int](norm.length)
    locally {
      // spread symbols exactly as the decode side does
      val spread = new Array[Int](tableSize)
      var highThreshold = tableSize - 1
      var s = 0
      while (s < norm.length) {
        if (norm(s) == -1) { spread(highThreshold) = s; highThreshold -= 1 }
        s += 1
      }
      val step = (tableSize >> 1) + (tableSize >> 3) + 3
      var pos = 0
      s = 0
      while (s < norm.length) {
        var i = 0
        while (i < norm(s)) {
          spread(pos) = s
          do pos = (pos + step) & (tableSize - 1) while (pos > highThreshold)
          i += 1
        }
        s += 1
      }
      require(pos == 0, s"$name: FSE spread did not close")
      // occurrence-indexed state table: the k-th cell of symbol s (scanning
      // decode states upward) maps to encoder state tableSize + position
      val cumul = new Array[Int](norm.length)
      var acc = 0
      s = 0
      while (s < norm.length) {
        cumul(s) = acc
        acc += (if (norm(s) == -1) 1 else norm(s))
        s += 1
      }
      var u = 0
      while (u < tableSize) {
        val sym = spread(u)
        stateTable(cumul(sym)) = tableSize + u
        cumul(sym) += 1
        u += 1
      }
      var total = 0
      s = 0
      while (s < norm.length) {
        norm(s) match {
          case 0 =>
            deltaNbBits(s) = ((accuracyLog + 1) << 16) - tableSize
          case 1 | -1 =>
            deltaNbBits(s) = (accuracyLog << 16) - tableSize
            deltaFindState(s) = total - 1
            total += 1
          case n =>
            val maxBitsOut = accuracyLog - highbit(n - 1)
            deltaNbBits(s) = (maxBitsOut << 16) - (n << maxBitsOut)
            deltaFindState(s) = total - n
            total += n
        }
        s += 1
      }
    }
  }

  private lazy val LlEnc = new FseEnc(LlDefault, 6, "LL-enc")
  private lazy val OfEnc = new FseEnc(OfDefault, 5, "OF-enc")
  private lazy val MlEnc = new FseEnc(MlDefault, 6, "ML-enc")

  /** Forward bit accumulator whose finished stream is read BACKWARD by
    * [[BackBits]]: values added chronologically land at increasing bit
    * positions, so the decoder (reading from the top) sees them in
    * reverse add order; a 1-sentinel caps the stream.
    */
  private final class BitWriter {
    private var buf = new Array[Byte](256)
    private var acc = 0L
    private var accBits = 0
    private var len = 0
    private def push(b: Int): Unit = {
      if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
      buf(len) = b.toByte; len += 1
    }
    def add(v: Long, n: Int): Unit = {
      acc |= (v & ((1L << n) - 1)) << accBits
      accBits += n
      while (accBits >= 8) { push((acc & 0xff).toInt); acc >>>= 8; accBits -= 8 }
    }
    def finishWithSentinel(): Array[Byte] = {
      add(1L, 1)
      if (accBits > 0) { push((acc & 0xff).toInt); acc = 0; accBits = 0 }
      java.util.Arrays.copyOf(buf, len)
    }
  }

  /** One FSE encoder state stream (the usual backward-encoded chain). */
  private final class CState(enc: FseEnc) {
    private var value = 0 // in [tableSize, 2*tableSize)
    def init(sym: Int): Unit = {
      val nbBitsOut = (enc.deltaNbBits(sym) + (1 << 15)) >> 16
      value = enc.stateTable(
        (((nbBitsOut << 16) - enc.deltaNbBits(sym)) >>> nbBitsOut) + enc.deltaFindState(sym))
    }
    def encode(sym: Int, bw: BitWriter): Unit = {
      val nbBitsOut = (value + enc.deltaNbBits(sym)) >> 16
      bw.add(value.toLong, nbBitsOut)
      value = enc.stateTable((value >>> nbBitsOut) + enc.deltaFindState(sym))
    }
    def flush(bw: BitWriter): Unit = bw.add(value.toLong, enc.accuracyLog)
  }

  /** literal-length value -> (code, extra-bits value, extra-bits count) */
  private def llCodeOf(ll: Int): Int = {
    if (ll < 16) return ll
    var c = LlBase.length - 1
    while (LlBase(c) > ll) c -= 1
    c
  }

  private def mlCodeOf(ml: Int): Int = {
    if (ml - 3 < 32) return ml - 3
    var c = MlBase.length - 1
    while (MlBase(c) > ml) c -= 1
    c
  }

  /** One LZ77 sequence: `ll` literal bytes, then a match of length `ml`
    * at distance `offset` (offBase = offset + 3; repeat codes unused).
    */
  private final case class Seq77(ll: Int, offset: Int, ml: Int)

  private val HashLog = 17
  private val MaxDistance = (1 << 27) - 4 // keeps the offset code <= 28 (predefined OF table)

  private def read4(a: Array[Byte], i: Int): Int =
    (a(i) & 0xff) | ((a(i + 1) & 0xff) << 8) | ((a(i + 2) & 0xff) << 16) | ((a(i + 3) & 0xff) << 24)

  private def hash4(a: Array[Byte], i: Int): Int =
    (read4(a, i) * 0x9E3779B1) >>> (32 - HashLog)

  /** Compress one zstd frame with real entropy-coded blocks: greedy
    * hash-table LZ77 matching (min match 4, window capped so offset
    * codes stay inside the predefined table), sequences encoded with the
    * RFC 8878 PREDEFINED FSE distributions, literals stored raw. Blocks
    * cap at 128 KiB of content; matches may reach back across block
    * boundaries (single-segment frame = whole-content window); blocks
    * that do not shrink fall back to raw, single-byte runs to RLE.
    * Conformance: ZstdSpec decodes these frames with the REAL zstd CLI
    * when one is on PATH (plus self-roundtrips and CLI-generated decoder
    * vectors, so both directions are pinned to the reference coder).
    */
  def compress(raw: Array[Byte]): Array[Byte] = {
    if (raw.length == 0) return compressStored(raw)
    val maxBlock = 128 * 1024
    val nBlocks = (raw.length + maxBlock - 1) / maxBlock
    val fcsLen = if (raw.length <= 255) 1 else if (raw.length < 65536 + 256) 2 else 4
    val fcsFlag = fcsLen match { case 1 => 0; case 2 => 1; case 4 => 2 }
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    def le(v: Long, n: Int): Unit = { var i = 0; while (i < n) { out.write(((v >> (8 * i)) & 0xff).toInt); i += 1 } }
    le(0xFD2FB528L, 4)
    out.write((fcsFlag << 6) | 0x20) // single-segment, no checksum/dict
    fcsLen match {
      case 1 => le(raw.length.toLong, 1)
      case 2 => le((raw.length - 256).toLong, 2)
      case 4 => le(raw.length.toLong, 4)
    }

    val hashTab = new Array[Int](1 << HashLog)
    java.util.Arrays.fill(hashTab, -1)

    var bStart = 0
    var bi = 0
    while (bi < nBlocks) {
      val bEnd = math.min(bStart + maxBlock, raw.length)
      val blockLen = bEnd - bStart
      val last = if (bi == nBlocks - 1) 1 else 0

      // ---- greedy match parse of [bStart, bEnd)
      val seqs = scala.collection.mutable.ArrayBuffer.empty[Seq77]
      var litTotal = 0
      var anchor = bStart
      var i = bStart
      val searchLimit = bEnd - 4
      var missRun = 0
      while (i <= searchLimit) {
        val h = hash4(raw, i)
        val cand = hashTab(h)
        hashTab(h) = i
        if (cand >= 0 && i - cand <= MaxDistance && read4(raw, cand) == read4(raw, i)) {
          var c = cand
          var ml = 4
          while (i + ml < bEnd && raw(c + ml) == raw(i + ml)) ml += 1
          while (i > anchor && c > 0 && raw(c - 1) == raw(i - 1)) { i -= 1; c -= 1; ml += 1 }
          seqs += Seq77(i - anchor, i - c, ml)
          litTotal += i - anchor
          // seed hashes inside the match (stride 2: ratio/speed balance)
          var j = i + 1
          val hEnd = math.min(i + ml, searchLimit + 1)
          while (j < hEnd) { hashTab(hash4(raw, j)) = j; j += 2 }
          i += ml
          anchor = i
          missRun = 0
        } else {
          missRun += 1
          i += 1 + (missRun >> 6) // LZ4-style acceleration on incompressible data
        }
      }
      litTotal += bEnd - anchor

      // ---- choose block encoding
      var rle = blockLen > 1
      locally { var k = bStart + 1; while (rle && k < bEnd) { if (raw(k) != raw(bStart)) rle = false; k += 1 } }
      if (rle) {
        le(((blockLen << 3) | (1 << 1) | last).toLong, 3)
        out.write(raw(bStart) & 0xff)
      } else {
        val enc = if (seqs.isEmpty) null else encodeCompressedBlock(raw, bStart, bEnd, seqs, litTotal)
        if (enc == null || enc.length >= blockLen) {
          le(((blockLen << 3) | last).toLong, 3) // raw block
          out.write(raw, bStart, blockLen)
        } else {
          le(((enc.length << 3) | (2 << 1) | last).toLong, 3)
          out.write(enc, 0, enc.length)
        }
      }
      bStart = bEnd
      bi += 1
    }
    out.toByteArray
  }

  /** Compressed-block body: raw-literals section + predefined-FSE
    * sequences section (the backward bitstream [[decompress]] reads).
    */
  private def encodeCompressedBlock(raw: Array[Byte], bStart: Int, bEnd: Int,
                                    seqs: scala.collection.mutable.ArrayBuffer[Seq77],
                                    litTotal: Int): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream(litTotal + seqs.length * 2 + 16)
    // literals section header: type 0 (raw), smallest size format that fits
    if (litTotal < 32) body.write(litTotal << 3)
    else if (litTotal < 4096) { body.write((1 << 2) | ((litTotal & 0xf) << 4)); body.write(litTotal >> 4) }
    else {
      body.write((3 << 2) | ((litTotal & 0xf) << 4))
      body.write((litTotal >> 4) & 0xff); body.write((litTotal >> 12) & 0xff)
    }
    // literal bytes: each sequence's run, then the tail after the last match
    var pos = bStart
    seqs.foreach { s => body.write(raw, pos, s.ll); pos += s.ll + s.ml }
    body.write(raw, pos, bEnd - pos)
    // sequences header
    val n = seqs.length
    if (n < 128) body.write(n)
    else if (n < 0x7F00) { body.write((n >> 8) + 128); body.write(n & 0xff) }
    else { body.write(255); body.write((n - 0x7F00) & 0xff); body.write(((n - 0x7F00) >> 8) & 0xff) }
    body.write(0x00) // modes: predefined LL/OF/ML
    // backward bitstream: states init from the LAST sequence, then
    // sequences encoded last-to-first (the decoder reads first-to-last)
    val bw = new BitWriter
    val sLl = new CState(LlEnc); val sOf = new CState(OfEnc); val sMl = new CState(MlEnc)
    def codes(s: Seq77): (Int, Int, Int) = {
      val ofBase = s.offset + 3
      (llCodeOf(s.ll), mlCodeOf(s.ml), highbit(ofBase))
    }
    val sN = seqs(n - 1)
    val (llcN, mlcN, ofcN) = codes(sN)
    sMl.init(mlcN); sOf.init(ofcN); sLl.init(llcN)
    bw.add((sN.ll - LlBase(llcN)).toLong, LlBits(llcN))
    bw.add((sN.ml - MlBase(mlcN)).toLong, MlBits(mlcN))
    bw.add((sN.offset + 3).toLong - (1L << ofcN), ofcN)
    var k = n - 2
    while (k >= 0) {
      val s = seqs(k)
      val (llc, mlc, ofc) = codes(s)
      sOf.encode(ofc, bw); sMl.encode(mlc, bw); sLl.encode(llc, bw)
      bw.add((s.ll - LlBase(llc)).toLong, LlBits(llc))
      bw.add((s.ml - MlBase(mlc)).toLong, MlBits(mlc))
      bw.add((s.offset + 3).toLong - (1L << ofc), ofc)
      k -= 1
    }
    sMl.flush(bw); sOf.flush(bw); sLl.flush(bw)
    val bits = bw.finishWithSentinel()
    body.write(bits, 0, bits.length)
    body.toByteArray
  }

  /** Backward bitstream: bytes written forward, bits read from the top.
    * The stream is the little-endian bit integer of the byte range; the
    * final byte's highest set bit is a sentinel (not data).
    */
  private final class BackBits(src: Array[Byte], from: Int, to: Int, name: String) {
    require(to > from, s"$name: empty backward bitstream")
    private val last = src(to - 1) & 0xff
    require(last != 0, s"$name: backward bitstream missing its sentinel bit")
    var bitpos: Int = (to - 1 - from) * 8 + highbit(last) // bits below the sentinel
    def overflowed: Boolean = bitpos < 0
    /** Read n bits from the top (returns 0-bits for positions below the
      * stream start — only reachable in the documented FSE tail state).
      */
    def readBits(n: Int): Int = {
      bitpos -= n
      if (n == 0) return 0
      var v = 0L
      var i = 0
      while (i < n) {
        val b = bitpos + i
        if (b >= 0 && (src(from + (b >> 3)) & (1 << (b & 7))) != 0) v |= (1L << i)
        i += 1
      }
      v.toInt
    }
    /** Peek n bits without consuming (for Huffman table lookups). */
    def peekBits(n: Int): Int = {
      val p = bitpos
      val v = readBits(n)
      bitpos = p
      v
    }
    def skip(n: Int): Unit = bitpos -= n
  }

  /** Forward bitstream (FSE table descriptions): LSB-first per byte. */
  private final class FwdBits(src: Array[Byte], from: Int) {
    var bitpos = 0
    def peekBits(n: Int): Int = {
      var v = 0
      var i = 0
      while (i < n) {
        val b = bitpos + i
        if ((src(from + (b >> 3)) & (1 << (b & 7))) != 0) v |= (1 << i)
        i += 1
      }
      v
    }
    def readBits(n: Int): Int = {
      val v = peekBits(n)
      bitpos += n
      v
    }
    def bytesConsumed: Int = (bitpos + 7) / 8
  }

  // ---------------------------------------------------------------- FSE

  private final class FseTable(val accuracyLog: Int, n: Int) {
    val symbol = new Array[Int](n)
    val nbBits = new Array[Int](n)
    val newState = new Array[Int](n)
  }

  /** Build the FSE decoding table from normalized counts (-1 = "less
    * than 1": one cell, assigned from the table end).
    */
  private def fseBuild(norm: Array[Int], accuracyLog: Int, name: String): FseTable = {
    val tableSize = 1 << accuracyLog
    val t = new FseTable(accuracyLog, tableSize)
    var highThreshold = tableSize - 1
    val symbolNext = new Array[Int](norm.length)
    var s = 0
    while (s < norm.length) {
      if (norm(s) == -1) {
        t.symbol(highThreshold) = s; highThreshold -= 1
        symbolNext(s) = 1
      } else symbolNext(s) = norm(s)
      s += 1
    }
    val step = (tableSize >> 1) + (tableSize >> 3) + 3
    var pos = 0
    s = 0
    while (s < norm.length) {
      var i = 0
      while (i < norm(s)) {
        t.symbol(pos) = s
        do pos = (pos + step) & (tableSize - 1) while (pos > highThreshold)
        i += 1
      }
      s += 1
    }
    require(pos == 0, s"$name: FSE spread did not close (corrupt normalized counts)")
    var c = 0
    while (c < tableSize) {
      val sym = t.symbol(c)
      val nextState = symbolNext(sym); symbolNext(sym) += 1
      t.nbBits(c) = accuracyLog - highbit(nextState)
      t.newState(c) = (nextState << t.nbBits(c)) - tableSize
      c += 1
    }
    t
  }

  /** Parse an FSE table description (forward bitstream) -> table.
    * Returns (table, bytes consumed).
    */
  private def fseReadTable(src: Array[Byte], from: Int, maxAccuracy: Int, maxSymbol: Int,
                           name: String): (FseTable, Int) = {
    val bits = new FwdBits(src, from)
    val accuracyLog = bits.readBits(4) + 5
    require(accuracyLog <= maxAccuracy,
      s"$name: FSE accuracy $accuracyLog exceeds the format limit $maxAccuracy")
    val tableSize = 1 << accuracyLog
    var remaining = tableSize + 1
    var threshold = tableSize
    var nbBits = accuracyLog + 1
    val norm = new Array[Int](maxSymbol + 1)
    var charnum = 0
    var previous0 = false
    while (remaining > 1 && charnum <= maxSymbol) {
      if (previous0) {
        // runs of zero-probability symbols: 2-bit repeat flags
        var rep = bits.readBits(2)
        while (rep == 3) { charnum += 3; rep = bits.readBits(2) }
        charnum += rep
        previous0 = false
      } else {
        // variable-width count read (FSE readNCount): values whose low
        // nbBits-1 bits fall under `max` need no disambiguation bit
        val max = (2 * threshold - 1) - remaining
        val small = bits.peekBits(nbBits - 1)
        var count =
          if (small < max) { bits.readBits(nbBits - 1); small }
          else {
            val v = bits.readBits(nbBits)
            if (v >= threshold) v - max else v
          }
        count -= 1 // shift: 0 encodes the -1 "less than 1" probability
        remaining -= math.abs(count)
        require(charnum < norm.length, s"$name: FSE symbol overflow")
        norm(charnum) = count; charnum += 1
        previous0 = count == 0
        while (remaining < threshold) { nbBits -= 1; threshold >>= 1 }
      }
    }
    require(remaining == 1, s"$name: FSE normalized counts sum mismatch ($remaining left)")
    (fseBuild(java.util.Arrays.copyOf(norm, charnum), accuracyLog, name), bits.bytesConsumed)
  }

  private def fseRleTable(sym: Int): FseTable = {
    val t = new FseTable(0, 1)
    t.symbol(0) = sym; t.nbBits(0) = 0; t.newState(0) = 0
    t
  }

  // ------------------------------------------------------------ Huffman

  private final class HuffTable(val maxBits: Int) {
    val sym = new Array[Int](1 << maxBits)
    val nb = new Array[Int](1 << maxBits)
  }

  /** Build the single-level Huffman decode table from weights. */
  private def huffBuild(weights: Array[Int], name: String): HuffTable = {
    // infer the last weight: total must complete to a power of two
    var sum = 0L
    weights.foreach(w => if (w > 0) sum += 1L << (w - 1))
    require(sum > 0, s"$name: Huffman weights all zero")
    val maxBits = highbit(sum.toInt) + 1
    val rest = (1L << maxBits) - sum
    require(rest > 0 && (rest & (rest - 1)) == 0,
      s"$name: Huffman weights do not complete a power of two")
    val lastW = highbit(rest.toInt) + 1
    val all = weights :+ lastW
    val t = new HuffTable(maxBits)
    // cells of weight w span 2^(w-1) entries; smaller weights (longer
    // codes) occupy the lower table positions, symbols in natural order
    val rankStart = new Array[Int](maxBits + 2)
    all.foreach(w => if (w > 0) rankStart(w + 1) += 1 << (w - 1))
    var w = 1
    while (w <= maxBits + 1) { rankStart(w) += rankStart(w - 1); w += 1 }
    var s = 0
    while (s < all.length) {
      val wt = all(s)
      if (wt > 0) {
        val span = 1 << (wt - 1)
        val start = rankStart(wt)
        var i = 0
        while (i < span) { t.sym(start + i) = s; t.nb(start + i) = maxBits + 1 - wt; i += 1 }
        rankStart(wt) += span
      }
      s += 1
    }
    t
  }

  /** Huffman tree description -> (table, bytes consumed). */
  private def huffReadTable(src: Array[Byte], from: Int, name: String): (HuffTable, Int) = {
    val hbyte = src(from) & 0xff
    if (hbyte >= 128) {
      // direct 4-bit weights for symbols 0..n-1; the (n+1)-th symbol's
      // weight is deduced inside huffBuild
      val n = hbyte - 127
      val bytes = (n + 1) / 2
      val ws = new Array[Int](n)
      var i = 0
      while (i < n) {
        val b = src(from + 1 + i / 2) & 0xff
        ws(i) = if (i % 2 == 0) b >> 4 else b & 0x0f
        i += 1
      }
      (huffBuild(ws, name), 1 + bytes)
    } else {
      // FSE-compressed weights: hbyte = compressed size
      val (ft, descLen) = fseReadTable(src, from + 1, maxAccuracy = 6, maxSymbol = 255, name)
      val bb = new BackBits(src, from + 1 + descLen, from + 1 + hbyte, name)
      var s1 = bb.readBits(ft.accuracyLog)
      var s2 = bb.readBits(ft.accuracyLog)
      val ws = scala.collection.mutable.ArrayBuffer.empty[Int]
      def emitUpdate(st: Int): Int = {
        ws += ft.symbol(st)
        ft.newState(st) + bb.readBits(ft.nbBits(st))
      }
      var done = false
      while (!done) {
        require(ws.length < 255, s"$name: Huffman weight stream does not terminate")
        s1 = emitUpdate(s1)
        if (bb.overflowed) { ws += ft.symbol(s2); done = true }
        else {
          s2 = emitUpdate(s2)
          if (bb.overflowed) { ws += ft.symbol(s1); done = true }
        }
      }
      (huffBuild(ws.toArray, name), 1 + hbyte)
    }
  }

  private def huffDecodeStream(src: Array[Byte], from: Int, to: Int, out: Array[Byte],
                               outFrom: Int, outLen: Int, t: HuffTable, name: String): Unit = {
    val bb = new BackBits(src, from, to, name)
    var i = 0
    while (i < outLen) {
      val idx = bb.peekBits(t.maxBits)
      out(outFrom + i) = t.sym(idx).toByte
      bb.skip(t.nb(idx))
      i += 1
    }
  }

  // -------------------------------------------------- sequence code tables

  // literal-length codes (RFC 8878 table): baseline + extra bits
  private val LlBase = Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15,
    16, 18, 20, 22, 24, 28, 32, 40, 48, 64, 128, 256, 512, 1024, 2048, 4096,
    8192, 16384, 32768, 65536)
  private val LlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  // match-length codes
  private val MlBase = Array(3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 37, 39, 41, 43, 47, 51, 59, 67, 83, 99, 131, 259, 515, 1027, 2051,
    4099, 8195, 16387, 32771, 65539)
  private val MlBits = Array(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    1, 1, 1, 1, 2, 2, 3, 3, 4, 4, 5, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16)
  // predefined FSE distributions (RFC 8878)
  private val LlDefault = Array(4, 3, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 2, 1, 1, 1,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 3, 2, 1, 1, 1, 1, 1, -1, -1, -1, -1)
  private val MlDefault = Array(1, 4, 3, 2, 2, 2, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1, -1, -1)
  private val OfDefault = Array(1, 1, 1, 1, 1, 1, 2, 2, 2, 1, 1, 1, 1, 1, 1, 1,
    1, 1, 1, 1, 1, 1, 1, 1, -1, -1, -1, -1, -1)

  // ------------------------------------------------------------- decoder

  /** Decompress one zstd frame (skippable frames are skipped). */
  def decompress(src: Array[Byte], name: String): Array[Byte] = {
    var p = 0
    def le32(off: Int): Int =
      (src(off) & 0xff) | ((src(off + 1) & 0xff) << 8) |
        ((src(off + 2) & 0xff) << 16) | ((src(off + 3) & 0xff) << 24)
    // skippable frames: magic 0x184D2A5?, 4-byte size, payload
    while (p + 8 <= src.length && (le32(p) & 0xFFFFFFF0) == 0x184D2A50) {
      p += 8 + le32(p + 4)
    }
    require(p + 4 <= src.length && le32(p) == 0xFD2FB528.toInt,
      s"$name: not a zstd frame (bad magic)")
    p += 4
    val fhd = src(p) & 0xff; p += 1
    val singleSegment = (fhd >> 5) & 1
    val fcsFlag = (fhd >> 6) & 3
    val dictIdFlag = fhd & 3
    require((fhd & 0x08) == 0, s"$name: reserved frame-header bit set")
    if (singleSegment == 0) p += 1 // window descriptor (output is fully buffered)
    val dictIdLen = Array(0, 1, 2, 4)(dictIdFlag)
    var dictId = 0L
    (0 until dictIdLen).foreach(i => dictId |= (src(p + i).toLong & 0xff) << (8 * i))
    p += dictIdLen
    require(dictId == 0, s"$name: dictionary $dictId required — dictionaries not supported")
    val fcsLen = fcsFlag match {
      case 0 => if (singleSegment == 1) 1 else 0
      case 1 => 2
      case 2 => 4
      case 3 => 8
    }
    var contentSize = -1L
    if (fcsLen > 0) {
      contentSize = 0
      (0 until fcsLen).foreach(i => contentSize |= (src(p + i).toLong & 0xff) << (8 * i))
      if (fcsLen == 2) contentSize += 256
      p += fcsLen
    }

    var out = new Array[Byte](if (contentSize >= 0) contentSize.toInt else math.max(64, src.length * 4))
    var outPos = 0
    def ensure(n: Int): Unit =
      if (outPos + n > out.length)
        out = java.util.Arrays.copyOf(out, math.max(out.length * 2, outPos + n))

    // per-frame decoder state
    var huff: HuffTable = null
    var llT: FseTable = null; var ofT: FseTable = null; var mlT: FseTable = null
    val recent = Array(1, 4, 8)

    var last = false
    while (!last) {
      val bh = (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8) | ((src(p + 2) & 0xff) << 16)
      p += 3
      last = (bh & 1) == 1
      val btype = (bh >> 1) & 3
      val bsize = bh >> 3
      btype match {
        case 0 => // raw
          ensure(bsize)
          System.arraycopy(src, p, out, outPos, bsize)
          outPos += bsize; p += bsize
        case 1 => // RLE
          ensure(bsize)
          java.util.Arrays.fill(out, outPos, outPos + bsize, src(p))
          outPos += bsize; p += 1
        case 2 =>
          val blockEnd = p + bsize
          // ---- literals section
          val lb0 = src(p) & 0xff
          val litType = lb0 & 3
          val sizeFormat = (lb0 >> 2) & 3
          var literals: Array[Byte] = null
          if (litType <= 1) { // raw / RLE
            val (regSize, hdr) = sizeFormat match {
              case 0 | 2 => (lb0 >> 3, 1)
              case 1 => ((lb0 >> 4) | ((src(p + 1) & 0xff) << 4), 2)
              case 3 => ((lb0 >> 4) | ((src(p + 1) & 0xff) << 4) | ((src(p + 2) & 0xff) << 12), 3)
            }
            p += hdr
            literals = new Array[Byte](regSize)
            if (litType == 0) { System.arraycopy(src, p, literals, 0, regSize); p += regSize }
            else { java.util.Arrays.fill(literals, src(p)); p += 1 }
          } else { // Huffman-compressed (2) / treeless repeat (3)
            val (regSize, compSize, hdrLen, fourStreams) = sizeFormat match {
              case 0 =>
                val v = (lb0 >> 4) | ((src(p + 1) & 0xff) << 4) | ((src(p + 2) & 0xff) << 12)
                (v & 0x3ff, v >> 10, 3, false)
              case 1 =>
                val v = (lb0 >> 4) | ((src(p + 1) & 0xff) << 4) | ((src(p + 2) & 0xff) << 12)
                (v & 0x3ff, v >> 10, 3, true)
              case 2 =>
                val v = (lb0.toLong >> 4) | ((src(p + 1).toLong & 0xff) << 4) |
                  ((src(p + 2).toLong & 0xff) << 12) | ((src(p + 3).toLong & 0xff) << 20)
                ((v & 0x3fff).toInt, (v >> 14).toInt, 4, true)
              case 3 =>
                val v = (lb0.toLong >> 4) | ((src(p + 1).toLong & 0xff) << 4) |
                  ((src(p + 2).toLong & 0xff) << 12) | ((src(p + 3).toLong & 0xff) << 20) |
                  ((src(p + 4).toLong & 0xff) << 28)
                ((v & 0x3ffff).toInt, (v >> 18).toInt, 5, true)
            }
            p += hdrLen
            val streamsEnd = p + compSize
            if (litType == 2) {
              val (t, used) = huffReadTable(src, p, name)
              huff = t; p += used
            } else require(huff != null,
              s"$name: treeless literals block with no previous Huffman table")
            literals = new Array[Byte](regSize)
            if (!fourStreams) huffDecodeStream(src, p, streamsEnd, literals, 0, regSize, huff, name)
            else {
              val s1 = (src(p) & 0xff) | ((src(p + 1) & 0xff) << 8)
              val s2 = (src(p + 2) & 0xff) | ((src(p + 3) & 0xff) << 8)
              val s3 = (src(p + 4) & 0xff) | ((src(p + 5) & 0xff) << 8)
              val part = (regSize + 3) / 4
              val starts = Array(p + 6, p + 6 + s1, p + 6 + s1 + s2, p + 6 + s1 + s2 + s3)
              val ends = Array(starts(1), starts(2), starts(3), streamsEnd)
              var si = 0
              while (si < 4) {
                val len = if (si < 3) part else regSize - 3 * part
                huffDecodeStream(src, starts(si), ends(si), literals, si * part, len, huff, name)
                si += 1
              }
            }
            p = streamsEnd
          }
          // ---- sequences section
          var nbSeq = 0
          val b0 = src(p) & 0xff
          if (b0 < 128) { nbSeq = b0; p += 1 }
          else if (b0 < 255) { nbSeq = ((b0 - 128) << 8) + (src(p + 1) & 0xff); p += 2 }
          else { nbSeq = (src(p + 1) & 0xff) + ((src(p + 2) & 0xff) << 8) + 0x7F00; p += 3 }
          if (nbSeq == 0) {
            ensure(literals.length)
            System.arraycopy(literals, 0, out, outPos, literals.length)
            outPos += literals.length
            require(p == blockEnd, s"$name: trailing bytes in a no-sequence block")
          } else {
            val modes = src(p) & 0xff; p += 1
            require((modes & 3) == 0, s"$name: reserved sequence-mode bits set")
            def table(mode: Int, default: Array[Int], defaultAl: Int, maxAl: Int,
                      maxSym: Int, prev: FseTable, what: String): FseTable = mode match {
              case 0 => fseBuild(default, defaultAl, s"$name/$what")
              case 1 => val t = fseRleTable(src(p) & 0xff); p += 1; t
              case 2 =>
                val (t, used) = fseReadTable(src, p, maxAl, maxSym, s"$name/$what")
                p += used; t
              case 3 =>
                require(prev != null, s"$name: repeat $what table with no previous block")
                prev
            }
            llT = table((modes >> 6) & 3, LlDefault, 6, 9, 35, llT, "LL")
            ofT = table((modes >> 4) & 3, OfDefault, 5, 8, 31, ofT, "OF")
            mlT = table((modes >> 2) & 3, MlDefault, 6, 9, 52, mlT, "ML")
            val bb = new BackBits(src, p, blockEnd, name)
            var llS = bb.readBits(llT.accuracyLog)
            var ofS = bb.readBits(ofT.accuracyLog)
            var mlS = bb.readBits(mlT.accuracyLog)
            var litPos = 0
            var i = 0
            while (i < nbSeq) {
              val ofCode = ofT.symbol(ofS)
              val mlCode = mlT.symbol(mlS)
              val llCode = llT.symbol(llS)
              // extra bits in OF, ML, LL order
              val ofValue = (1L << ofCode) + (bb.readBits(ofCode).toLong & 0xffffffffL)
              val ml = MlBase(mlCode) + bb.readBits(MlBits(mlCode))
              val ll = LlBase(llCode) + bb.readBits(LlBits(llCode))
              // repeat-offset resolution
              val offset: Int =
                if (ofValue > 3) {
                  val o = (ofValue - 3).toInt
                  recent(2) = recent(1); recent(1) = recent(0); recent(0) = o
                  o
                } else {
                  var idx = ofValue.toInt
                  if (ll == 0) idx += 1
                  idx match {
                    case 1 => recent(0)
                    case 2 =>
                      val o = recent(1); recent(1) = recent(0); recent(0) = o; o
                    case 3 =>
                      val o = recent(2); recent(2) = recent(1); recent(1) = recent(0); recent(0) = o; o
                    case _ => // ll == 0 && ofValue == 3: recent(0) - 1
                      val o = recent(0) - 1
                      require(o > 0, s"$name: repeat offset underflow")
                      recent(2) = recent(1); recent(1) = recent(0); recent(0) = o
                      o
                  }
                }
              // execute: literals then match
              ensure(ll + ml)
              System.arraycopy(literals, litPos, out, outPos, ll)
              litPos += ll; outPos += ll
              require(offset <= outPos, s"$name: match offset $offset exceeds output $outPos")
              var k = 0
              while (k < ml) { out(outPos) = out(outPos - offset); outPos += 1; k += 1 }
              i += 1
              if (i < nbSeq) { // no state update after the final sequence
                llS = llT.newState(llS) + bb.readBits(llT.nbBits(llS))
                mlS = mlT.newState(mlS) + bb.readBits(mlT.nbBits(mlS))
                ofS = ofT.newState(ofS) + bb.readBits(ofT.nbBits(ofS))
              }
            }
            val rest = literals.length - litPos
            require(rest >= 0, s"$name: sequences consumed ${litPos - literals.length} " +
              "literal bytes past the literals section")
            ensure(rest)
            System.arraycopy(literals, litPos, out, outPos, rest)
            outPos += rest
          }
          p = blockEnd
        case 3 => throw new IllegalArgumentException(s"$name: reserved block type")
      }
    }
    if ((fhd & 0x04) != 0) p += 4 // content checksum present (not validated)
    require(contentSize < 0 || outPos == contentSize,
      s"$name: decoded $outPos bytes, frame declared $contentSize")
    if (outPos == out.length) out else java.util.Arrays.copyOf(out, outPos)
  }
}
