package graft.sources

/** Pure-JVM blosclz codec — c-blosc's own FastLZ-derived LZ77 format
  * (public `c-blosc/internal/blosclz.c`), the inner codec behind
  * numcodecs `Blosc(cname='blosclz')`.
  *
  * Stream grammar (decoder-exact to blosclz_decompress):
  *  - the FIRST token is always a literal run (its top 3 bits are
  *    masked off);
  *  - literal token `t < 32`: copy `t + 1` bytes verbatim;
  *  - match token `t >= 32`: length bits `t >> 5` encode L-2 for
  *    L in 3..8; value 7 extends with add-255 bytes until a byte < 255
  *    (L = 9 + sum); distance: `((t & 31) << 8) + nextByte` gives
  *    D (ref = out - D - 1); the marker `(t & 31) == 31 && nextByte ==
  *    255` switches to the FAR form: two big-endian bytes give D - 8191;
  *  - matches copy byte-by-byte (overlap semantics);
  *  - the stream ends when input is exhausted after an instruction.
  *
  * No blosclz reference binary exists in this environment, so
  * conformance rests on (a) this literal transcription of the public
  * decoder and (b) hand-built per-opcode byte vectors + roundtrip
  * property tests (BloscSpec / CodecPropertySpec). The ENCODER emits
  * only this grammar (greedy hash-chain matcher), so engine-written
  * frames always decode; foreign frames exercise the same decoder paths
  * the vectors pin.
  */
object BloscLzLite {

  private val MaxDistance = 8191
  private val MaxFarDistance = 8191 + 65535

  /** Decompress one blosclz stream into exactly `outLen` bytes. */
  def decompress(src: Array[Byte], off: Int, len: Int, outLen: Int, name: String): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var ip = off
    val ipLimit = off + len
    var op = 0
    require(len > 0, s"$name: empty blosclz stream")
    var ctrl = src(ip) & 31
    ip += 1
    var done = false
    while (!done) {
      if (ctrl >= 32) {
        var mlen = (ctrl >> 5) - 1
        val ofsHigh = (ctrl & 31) << 8
        if (mlen == 6) { // length bits 7: add-255 extension
          var code = 0
          do {
            require(ip < ipLimit, s"$name: blosclz length extension past stream end")
            code = src(ip) & 0xff; ip += 1
            mlen += code
          } while (code == 255)
        }
        require(ip < ipLimit, s"$name: blosclz distance byte past stream end")
        val code = src(ip) & 0xff
        ip += 1
        mlen += 3
        var dist = ofsHigh + code
        if (code == 255 && ofsHigh == (31 << 8)) { // far match
          require(ip + 1 < ipLimit, s"$name: blosclz far distance past stream end")
          dist = ((src(ip) & 0xff) << 8) + (src(ip + 1) & 0xff) + MaxDistance
          ip += 2
        }
        var ref = op - dist - 1
        require(ref >= 0, s"$name: blosclz match reaches $ref before output start")
        require(op + mlen <= outLen, s"$name: blosclz match overruns output")
        var k = 0
        while (k < mlen) { out(op) = out(ref); op += 1; ref += 1; k += 1 }
      } else {
        val run = ctrl + 1
        require(ip + run <= ipLimit, s"$name: blosclz literal run past stream end")
        require(op + run <= outLen, s"$name: blosclz literals overrun output")
        System.arraycopy(src, ip, out, op, run)
        ip += run; op += run
      }
      if (ip < ipLimit) { ctrl = src(ip) & 0xff; ip += 1 }
      else done = true
    }
    require(op == outLen, s"$name: blosclz stream produced $op of $outLen bytes")
    out
  }

  /** Compress with a greedy single-probe hash matcher emitting the
    * grammar above. Returns null when the result would not be smaller
    * (caller stores raw, the blosc-frame convention).
    */
  def compress(src: Array[Byte]): Array[Byte] = {
    val n = src.length
    if (n < 16) return null
    val out = new java.io.ByteArrayOutputStream(n)
    val hashLog = 14
    val table = new Array[Int](1 << hashLog)
    java.util.Arrays.fill(table, -1)
    def hash(i: Int): Int = {
      val v = (src(i) & 0xff) | ((src(i + 1) & 0xff) << 8) | ((src(i + 2) & 0xff) << 16)
      (v * 2654435761L >>> (32 - hashLog)).toInt & ((1 << hashLog) - 1)
    }
    var litStart = 0
    def flushLiterals(until: Int): Unit = {
      var s = litStart
      while (s < until) {
        val run = math.min(32, until - s)
        out.write(run - 1)
        out.write(src, s, run)
        s += run
      }
      litStart = until
    }
    def emitMatch(len: Int, dist: Int): Unit = {
      val lenBits = if (len <= 8) len - 2 else 7
      if (dist < MaxDistance) {
        out.write((lenBits << 5) | (dist >> 8))
        if (lenBits == 7) {
          var rest = len - 9
          while (rest >= 255) { out.write(255); rest -= 255 }
          out.write(rest)
        }
        out.write(dist & 0xff)
      } else { // far form
        out.write((lenBits << 5) | 31)
        if (lenBits == 7) {
          var rest = len - 9
          while (rest >= 255) { out.write(255); rest -= 255 }
          out.write(rest)
        }
        out.write(255)
        out.write((dist - MaxDistance) >> 8)
        out.write((dist - MaxDistance) & 0xff)
      }
    }
    var i = 0
    while (i + 3 <= n - 4) { // keep a tail margin
      val h = hash(i)
      val cand = table(h)
      table(h) = i
      val dist = i - cand - 1
      if (cand >= 0 && dist <= MaxFarDistance &&
        src(cand) == src(i) && src(cand + 1) == src(i + 1) && src(cand + 2) == src(i + 2)) {
        var len = 3
        while (i + len < n && src(cand + len) == src(i + len)) len += 1
        // the first instruction must be a literal run (the decoder masks
        // the first token); ensure at least one literal precedes
        if (i == 0) i += 1
        else {
          flushLiterals(i)
          emitMatch(len, dist)
          var k = i + 1
          val end = math.min(i + len, n - 3)
          while (k < end) { table(hash(k)) = k; k += 1 }
          i += len
          litStart = i
        }
      } else i += 1
    }
    flushLiterals(n)
    val res = out.toByteArray
    if (res.length < n) res else null
  }
}
