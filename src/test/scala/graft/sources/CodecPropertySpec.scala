package graft.sources

import org.scalacheck.{Gen, Prop}
import org.scalatest.funsuite.AnyFunSuite

/** Property-based roundtrips for the hand-written binary codecs: any
  * input drawn from these generators must survive encode -> decode
  * bit-exactly. Complements the fixed byte-golden fixtures with
  * adversarially-shaped random data (runs, near-duplicates, extreme
  * doubles, empty-ish payloads).
  */
class CodecPropertySpec extends AnyFunSuite {

  /** run a scalacheck property under the ScalaTest suite (fixed seed-free
    * default parameters; failures report the shrunk counterexample) */
  private def check(prop: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(80), prop)
    assert(res.passed, res.status.toString)
  }

  private val byteArrays: Gen[Array[Byte]] = Gen.oneOf(
    // random bytes
    Gen.choose(1, 5000).flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.choose(Byte.MinValue, Byte.MaxValue))),
    // compressible: short alphabet + runs
    Gen.choose(1, 8000).flatMap(n => Gen.containerOfN[Array, Byte](n, Gen.oneOf(0.toByte, 1.toByte, 7.toByte))),
    // repeated motif (LZ matches at many offsets)
    for {
      motifLen <- Gen.choose(1, 64)
      motif <- Gen.containerOfN[Array, Byte](motifLen, Gen.choose(Byte.MinValue, Byte.MaxValue))
      reps <- Gen.choose(1, 200)
    } yield Array.fill(reps)(motif).flatten)

  private val doubles: Gen[Array[Double]] = Gen.choose(1, 400).flatMap(n =>
    Gen.containerOfN[Array, Double](n, Gen.oneOf(
      Gen.choose(-1e12, 1e12),
      Gen.oneOf(0.0, -0.0, Double.NaN, Double.PositiveInfinity,
        Double.NegativeInfinity, Double.MinPositiveValue, math.Pi))))

  private val longs: Gen[Array[Long]] = Gen.choose(1, 400).flatMap(n =>
    Gen.containerOfN[Array, Long](n, Gen.oneOf(
      Gen.choose(Long.MinValue, Long.MaxValue), Gen.choose(-100L, 100L))))

  test("property: LZ4 block compress -> decompress is the identity") {
    check(Prop.forAll(byteArrays) { p =>
      val c = Lz4Lite.compress(p)
      java.util.Arrays.equals(Lz4Lite.decompress(c, 0, c.length, p.length), p)
    })
  }

  test("property: blosclz compress -> decompress is the identity") {
    check(Prop.forAll(byteArrays) { p =>
      val c = BloscLzLite.compress(p)
      c == null || java.util.Arrays.equals(
        BloscLzLite.decompress(c, 0, c.length, p.length, "prop"), p)
    })
  }

  test("property: snappy and lzf compress -> decompress are identities") {
    check(Prop.forAll(byteArrays) { p =>
      val c = SnappyLite.compress(p)
      c == null || java.util.Arrays.equals(
        SnappyLite.decompress(c, 0, c.length, p.length, "prop"), p)
    })
    check(Prop.forAll(byteArrays) { p =>
      val c = LzfLite.compress(p)
      c == null || java.util.Arrays.equals(
        LzfLite.decompress(c, 0, c.length, p.length, "prop"), p)
    })
  }

  test("property: zstd compress -> decompress is the identity") {
    check(Prop.forAll(byteArrays) { p =>
      java.util.Arrays.equals(ZstdLite.decompress(ZstdLite.compress(p), "prop"), p)
    })
  }

  test("property: blosc frames roundtrip for every codec/shuffle/typesize combo") {
    val cfg = for {
      p <- byteArrays
      codec <- Gen.oneOf(BloscLite.CodecBloscLz, BloscLite.CodecLz4, BloscLite.CodecSnappy,
        BloscLite.CodecZlib, BloscLite.CodecZstd)
      shuffle <- Gen.oneOf(true, false)
      typesize <- Gen.oneOf(1, 2, 4, 8, 16)
    } yield (p, codec, shuffle, typesize)
    check(Prop.forAll(cfg) { case (p, codec, shuffle, typesize) =>
      val f = BloscLite.compress(p, typesize, codec, byteShuffle = shuffle)
      java.util.Arrays.equals(BloscLite.decompress(f, "prop"), p)
    })
  }

  test("property: .npy write -> read is bit-exact for 1-d/2-d doubles and longs") {
    check(Prop.forAll(doubles) { d =>
      val back = NpyLite.read(NpyLite.write(Seq(d.length), doubles = d))
      back.doubles.map(java.lang.Double.doubleToRawLongBits).toSeq ==
        d.map(java.lang.Double.doubleToRawLongBits).toSeq
    })
    check(Prop.forAll(longs) { l =>
      val rows = math.max(1, l.length / 4)
      val use = java.util.Arrays.copyOf(l, rows * 4)
      NpyLite.read(NpyLite.write(Seq(rows, 4), longs = use)).longs.toSeq == use.toSeq
    })
  }

  test("property: pickle encode -> decode is the identity on metadata shapes") {
    val strGen = Gen.choose(0, 30).flatMap(n => Gen.stringOfN(n, Gen.alphaNumChar))
    val leaf: Gen[Any] = Gen.oneOf(
      strGen.map(identity[Any]),
      Gen.choose(-2000000000L, 2000000000L).map(identity[Any]),
      Gen.oneOf(true, false).map(identity[Any]))
    val tree: Gen[Any] = Gen.oneOf(
      leaf,
      Gen.listOfN(3, leaf).map(_.toVector: Any),
      Gen.zip(Gen.choose(0L, 9L), Gen.listOfN(2, strGen).map(_.toVector))
        .map(t => (t._1, t._2): Any),
      Gen.listOf(Gen.zip(Gen.choose(0L, 9L), strGen).map(t => (t._1, t._2): Any))
        .map(_.toVector: Any))
    check(Prop.forAll(tree) { v =>
      PickleLite.unpickle(PickleLite.pickle(v)) == v
    })
  }

  test("property: HDF5 datasets roundtrip bit-exactly, contiguous and chunked+gzip") {
    val varGen = for {
      n <- Gen.choose(1, 300)
      isDouble <- Gen.oneOf(true, false)
      ds <- Gen.containerOfN[Array, Double](n, Gen.oneOf(
        Gen.choose(-1e9, 1e9), Gen.oneOf(Double.NaN, 0.0, -0.0)))
      ls <- Gen.containerOfN[Array, Long](n, Gen.choose(Long.MinValue, Long.MaxValue))
      chunk <- Gen.oneOf(0, 7, 64)
    } yield (n, isDouble, ds, ls, chunk)
    check(Prop.forAll(varGen) { case (n, isDouble, ds, ls, chunk) =>
      // one chunk B-tree node caps at 64 chunks — mirror the writer's limit
      val cr = if (chunk > 0 && (n + chunk - 1) / chunk > 64) 0 else chunk
      val v =
        if (isDouble) Hdf5Lite.H5Var("v", Seq(n), doubles = ds)
        else Hdf5Lite.H5Var("v", Seq(n), longs = ls)
      val img = Hdf5Lite.write(Seq(v), chunkRows = cr, deflate = if (cr > 0) 6 else 0)
      val back = Hdf5Lite.read(img).head
      if (isDouble)
        back.doubles.map(java.lang.Double.doubleToRawLongBits).toSeq ==
          ds.map(java.lang.Double.doubleToRawLongBits).toSeq
      else back.longs.toSeq == ls.toSeq
    })
  }
}
