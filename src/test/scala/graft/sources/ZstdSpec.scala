package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import java.util.Base64

/** Conformance vectors for the pure-JVM zstd decoder: every base64 frame
  * below was produced by the REAL zstd CLI v1.5.7 (levels 3-19) over
  * deterministic inputs the spec reconstructs byte-for-byte in Scala —
  * covering raw/RLE/compressed blocks, 1- and 4-stream Huffman literals,
  * direct and FSE-compressed weights, predefined/FSE/repeat sequence
  * tables, repeat offsets, and multi-block frames.
  */
class ZstdSpec extends AnyFunSuite with SparkTestBase {

  private def b64(s: String) = Base64.getDecoder.decode(s)

  private val text = ("the quick brown fox jumps over the lazy dog. " * 50).getBytes("US-ASCII")
  private def mixedRaw: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    var x = 12345L
    (0 until 8000).foreach { _ =>
      x = x * 6364136223846793005L + 1442695040888963407L
      out.write('a' + ((x >>> 33) % 8).toInt)
    }
    out.write(text)
    (0 until 8).foreach(_ => (0 until 256).foreach(out.write))
    out.toByteArray
  }
  private def patRaw: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    (0 until 500).foreach { i =>
      out.write(i % 251)
      (0 until i % 7).foreach(_ => out.write("xyzzy".getBytes("US-ASCII")))
    }
    out.toByteArray
  }
  private def doublesRaw: Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(16000).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    (0 until 2000).foreach(i => bb.putDouble(i * 0.25 - 7.0))
    bb.array()
  }
  private def bigRaw: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val unit = text ++ mixedRaw
    (0 until 12).foreach(_ => out.write(unit))
    out.toByteArray
  }

  private val fixtures: Seq[(String, Array[Byte], String)] = Seq(
    ("tiny level 3 (raw block)", "hello zstd".getBytes("US-ASCII"),
      "KLUv/SQKUQAAaGVsbG8genN0ZM/bYJw="),
    ("rle level 3", Array.fill(1000)('A'.toByte),
      "KLUv/WToAk0AABBBQQEA4yuABeIIEjk="),
    ("text level 5 (sequences + repeat offsets)", text,
      "KLUv/WTKB6UBAJQCdGhlIHF1aWNrIGJyb3duIGZveCBqdW1wcyBvdmVyIGxhenkgZG9nLiACAJqAytGCVU4V7opI"))

  test("CLI frames decode bit-exactly: raw/RLE/sequence blocks") {
    fixtures.foreach { case (what, raw, comp) =>
      assert(ZstdLite.decompress(b64(comp), what).toSeq === raw.toSeq, what)
    }
  }

  test("CLI frame: level-5 doubles (zarr-chunk-shaped data)") {
    val comp = b64(DoublesB64)
    assert(ZstdLite.decompress(comp, "doubles").toSeq === doublesRaw.toSeq)
  }

  test("CLI frame: level-9 mixed data (4-stream literals, FSE tables)") {
    assert(ZstdLite.decompress(b64(MixedB64), "mixed").toSeq === mixedRaw.toSeq)
  }

  test("CLI frame: level-19 long-match patterns") {
    assert(ZstdLite.decompress(b64(PatB64), "pat").toSeq === patRaw.toSeq)
  }

  test("CLI frame: 174KB multi-block frame") {
    assert(ZstdLite.decompress(b64(BigB64), "big").toSeq === bigRaw.toSeq)
  }

  test("skippable frames are skipped; bad magic raises") {
    val tiny = b64(fixtures.head._3)
    val skip = java.nio.ByteBuffer.allocate(12 + tiny.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    skip.putInt(0x184D2A53).putInt(4).putInt(0xdeadbeef).put(tiny)
    assert(ZstdLite.decompress(skip.array(), "skip").toSeq === "hello zstd".getBytes.toSeq)
    val e = intercept[IllegalArgumentException](
      ZstdLite.decompress("not a zstd frame at all".getBytes, "junk"))
    assert(e.getMessage.contains("magic"))
  }

  test("stored-mode encoder roundtrips, including multi-block > 128KB") {
    for (n <- Seq(0, 1, 255, 300, 70000, 200000)) {
      val raw = Array.tabulate(n)(i => ((i * 31 + 7) % 256).toByte)
      val frame = ZstdLite.compressStored(raw)
      assert(ZstdLite.decompress(frame, s"stored$n").toSeq === raw.toSeq, s"n=$n")
    }
  }

  test("entropy encoder: compressed frames roundtrip through the decoder") {
    val rnd = {
      val a = new Array[Byte](50000); var x = 99L
      var i = 0
      while (i < a.length) { x = x * 6364136223846793005L + 1442695040888963407L; a(i) = (x >>> 56).toByte; i += 1 }
      a
    }
    val payloads = Seq(
      "text" -> text, "mixed" -> mixedRaw, "pat" -> patRaw, "doubles" -> doublesRaw,
      "big-multiblock" -> bigRaw, "rle" -> Array.fill(3000)(7.toByte),
      "random-incompressible" -> rnd, "one" -> Array(42.toByte),
      "block-edge" -> Array.tabulate(128 * 1024 + 1)(i => (i % 97).toByte),
      "empty" -> Array.empty[Byte])
    payloads.foreach { case (what, raw) =>
      val frame = ZstdLite.compress(raw)
      assert(ZstdLite.decompress(frame, what).toSeq === raw.toSeq, what)
    }
    // the encoder must genuinely compress compressible data, not just wrap it
    assert(ZstdLite.compress(text).length < text.length / 5, "text ratio")
    assert(ZstdLite.compress(bigRaw).length < bigRaw.length / 4, "multi-block ratio")
    assert(ZstdLite.compress(doublesRaw).length < doublesRaw.length / 2, "doubles ratio")
  }

  test("entropy encoder conformance: the REAL zstd CLI decodes our frames") {
    val cli = Seq("/usr/bin/zstd", "/usr/local/bin/zstd", "/root/miniconda/bin/zstd")
      .find(p => Files.isExecutable(Paths.get(p)))
      .orElse(sys.env.get("PATH").flatMap(_.split(':').map(_ + "/zstd")
        .find(p => Files.isExecutable(Paths.get(p)))))
    assume(cli.isDefined, "no zstd CLI on this machine - conformance covered by fixture decode tests")
    val dir = Files.createTempDirectory("zstd_enc_")
    Seq("text" -> text, "mixed" -> mixedRaw, "pat" -> patRaw,
      "doubles" -> doublesRaw, "big" -> bigRaw).foreach { case (what, raw) =>
      val fz = dir.resolve(s"$what.zst"); val fo = dir.resolve(s"$what.out")
      Files.write(fz, ZstdLite.compress(raw))
      val rc = new ProcessBuilder(cli.get, "-d", "-f", fz.toString, "-o", fo.toString)
        .redirectErrorStream(true).start().waitFor()
      assert(rc === 0, s"$what: zstd CLI rejected the frame")
      assert(Files.readAllBytes(fo).toSeq === raw.toSeq, what)
    }
  }

  test("blosc frame with a zstd inner stream decodes (numcodecs Blosc cname='zstd')") {
    val raw = doublesRaw
    val inner = b64(DoublesB64)
    val bb = java.nio.ByteBuffer.allocate(16 + 4 + 4 + inner.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put(2.toByte).put(1.toByte)
    bb.put((BloscLite.CodecZstd << 5).toByte) // flags: zstd, no shuffle
    bb.put(8.toByte)                          // typesize
    bb.putInt(raw.length).putInt(raw.length)  // nbytes, blocksize (one block)
    bb.putInt(16 + 4 + 4 + inner.length)      // cbytes
    bb.putInt(20)                             // block start
    bb.putInt(inner.length)
    bb.put(inner)
    assert(BloscLite.decompress(bb.array(), "blosc-zstd").toSeq === raw.toSeq)
  }

  test("zarr store with {\"id\":\"zstd\"} chunks reads chunk-parallel") {
    import spark.implicits._
    val grid = (for { iy <- 0 until 5; ix <- 0 until 7 }
      yield (10.0 * ix, 100.0 * iy, 3.0 + iy * 7 + ix)).toDF("x", "y", "z")
    val dir = Files.createTempDirectory("zarr_").resolve("zs.zarr").toString
    ZarrGrid.writeGrid2d(grid, dir, "x", "y", Seq("z"), chunkRows = 2)
    // re-frame every chunk of every array as a stored-mode zstd frame and
    // declare the numcodecs Zstd() compressor
    for (arr <- Seq("x", "y", "z")) {
      val adir = Paths.get(dir, arr)
      Files.list(adir).toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(p => !p.getFileName.toString.startsWith(".")).foreach { p =>
          val plain = {
            val inf = new java.util.zip.Inflater()
            inf.setInput(Files.readAllBytes(p))
            val o = new ByteArrayOutputStream()
            val tmp = new Array[Byte](8192)
            while (!inf.finished()) o.write(tmp, 0, inf.inflate(tmp))
            inf.end(); o.toByteArray
          }
          Files.write(p, ZstdLite.compressStored(plain))
        }
      val za = Paths.get(dir, arr, ".zarray")
      Files.write(za, new String(Files.readAllBytes(za), "UTF-8")
        .replace("""{"id":"zlib","level":5}""", """{"id":"zstd","level":5}""").getBytes("UTF-8"))
    }
    Files.deleteIfExists(Paths.get(dir, ".zmetadata")) // hand-edited store
    val back = ZarrGrid.readGrid2d(spark, dir, "x", "y", Seq("z"))
    assert(back.count() === 35)
    assert(back.agg(sum("z")).collect()(0).getDouble(0) === (0 until 35).map(_ + 3.0).sum)
  }

  private val DoublesB64 =
    "KLUv/WSAPQU6AEqDOBpHwFhQ1QFgIChT2QBlVARlqgaCMlVUBmWqBoIyVVQEZaoGgjJV1LCx+Yagq/WgYWeVC1Vn0cHLFiVfyobikyca2k4ZNJQclQKBAXoBnwGWh1f7yckdai9vGLt2h1f7yckdai9vGLtWh1f7yckdai9vGLuWe7WfnNyh9vKGsWtzeLWfnNyh9vKGsWtxeLWfnNyh9vKGsWtveLWfnNyh9vKGsWstr/aTkzvUXt4wdq0Nr/aTkzvUXt4wdm0Nr/aTkzvUXt4wdi0Nr/aTkzvUXt4wdu32nW+d8Z3hO9864yvDd751xjeG73zrjG/lO9864wvDd751xveF73zrjK8L3/nWGV/tO98649vCd751xpeF73zrjO8K3/nWGV/Kd751xleF73zrjG8K3/nWGV8UvvOtM774ucYnPNfYhOcal/Bc48lzjUl4rvEIzzUW4bnG2XONQ3iuMQjPNf7gucaS5xp78FzjDp5rzMFzjbHXG7zW4HUGryOvMXh9wWsLXl+vK3hNwesJXkNeS/A6gtcQvL4PONDAg4EFFLASQOAAhwEFEGAHaAhQBcAAAH9qRalpP+E8e6qi1itSDwAjgEqAxgCWgAIMcByAQAKWAgswwB8fmds0nGHXtWyVxK9q2tHT5CU5bjEE9ed1mds0nGHXtWyV+VVNO3qavCTHLYag/rwuc5uGM+y6lq2Q+FVNO3qavCTHLYag/rwuc5uGM+y6lq2O+FVNO3qavCTHLYag/rwuc5uGM+y6lq2M+FVNO3qavCTHLYag/rwuc5uGM+y6lq26X9W0o6fJS3LcYgjqz+syt2k4w65r2aqIX9W0o6fJS3LcYgjqz+syt2k4w65r2YqIX9W0o6fJS3LcYgjqz+syt2k4w65r2WqIX9W0o6fJS3LcYgjqz+syt2k4w65r2Qrzq5p29DR5SY5bDEH9eV3mNg1n2HUtWwnxq5p29DR5SY5bDEH9eV3mNg1n2HUtWwXxq5p29DR5SY5bDEH9eV3mNg1n2HUtWwHxq5p29DR5SY5bDEH9eV3mNg1n2HUtW+VX+8nJHWovbxi79odX+8nJHWovbxi71odX+8nJHWovbxi7todX+8nJHWovbxi79vJqPzm5Q+3lDWM3fFSKyNAI2h/RE3ZAjt58Gi/TYfKFs2wVjYInmQSLXJD7sBy2UTGg+NSKUi9Si35CTWfJJPFRKSJDI2h/RE/YATl682m8TIfJF86yVTQKnmQSLHJB7sNy2EbFeOJTK0q9SC36CTWdJZPER6WIDI2g/RE9YQfk6M2n8TIdJl84y1bRKHiSSbDIBbkPy2EbFUPzqRWlXqQW/YSazpJJ4qNSRIZG0P6InrADcvTm03iZDpMvnGWraBQ8ySRY5ILch+WwjYrhxKdWlHqRWvQTajpLJomPShEZGkH7I3rCDsjRm0/jZTpMvnCWraJR8CSTYJELch+WwzYqRhOfWlHqRWrRT6jpLJkkPipFZGgE7Y/oCTsgR28+jZfpMPnCWbaKRsGTTIJFLsh9WA7bqBhMfGpFqRepRT+hprNkkvioFJGhEbQ/oifsgBy9+TRepsPkC2fZKhoFTzIJFrkg92E5bKNieL+qaUdPk5fkuMUQ1J/XZW7TcIZd17LVEr+qaUdPk5fkuMUQ1J/XZW7TcIZd17KVEr+qaUdPk5fkuMUQ1J/XBdiKkknio1JEhkbQ/oiesANy9ObTeJkOky+cZatoFDzJJFjkgtyH5bCNimHFp1aUepFa9BNqOksmiY9KERkaQfsjesIOyNGbT+NlOky+cJatolHwJJNgkQtyH5bDNipGFZ9aUepFatFPqOksmSQ+KkVkaATtj+gJOyBHbz6Nl+kw+cJZtopGwZNMgkUuyH1YDtuoGJtPrSj1IrXoJ9R0lkwSH5UiMjSC9kf0hB2Qozefxst0mHzhLFtFo+BJJsEiF+Q+LIdtVAwqPrWi1IvUop9Q01kySXxUisjQCNof0RN2QI7efBov02HyhbNsFY2CJ5kEi1yQ+7ActlExpvjUilIvUot+Qk1nySTxUSkiQyNof0RP2AE5evNpvEyHyRfOslU0Cp5kEixyQe7DcthGxZDiUytKvUgt+gk1nSWTxEeliAyNoP0RPWEH5OjNp/EyHSZfOMtW0Sh4kkmwyAW5D8thGxXj+9SKUi9Si35CTWfJJPFRKSJDI2h/RE/YATl682m8TIfJF86yVTQKnmQSLHJB7sNy2EbFiOJTK0q9SC36CTWdJZMUh9CoI0D/8y8cE5BAg/9QStL55d6JCvNRjSdpfnnvRJL5qOLJNL/cdyJhPlbxJJtf7p2YrLb1ZkO2hqwmq9t6s4GtRVaT1W692cDWUKvJagXglFqsA38VoEi+UEf1coCiasEP6lsAUEABBRRQQAEFFFBAAQ0ooIACCqi8YDzXS4YyvWQo00uGMr1kUqaX0loo/1IKzC4wu8DsArMLzC4ttGfCvEQfYOzGurwAoCsQCoWBxA=="

  private val MixedB64 =
    "KLUv/WQKL71+AMqESBMPEPDKcgAAaJ2SlCklgKoC9wD7APgAHyI/n9p+Fav0KVVVEe3zqVG9Pi/t80+ruP3D9a6SL46ktk7f/RR5+2/z85mp5MqPqxupyvQ5UfvpP+Si4n7+JXN1/nNW+ZVEtrd9TLJO06eLZe+vqP58JSqTqn/N2qf0+arcPizqNtpndiQSzaV/RrL9fEjEljRqu7bqUx9Wy/9w/FB9fH4b6/Oh0Yc0T2597M9nPBWNdxH7D99yrA/VP9/n/HxOfu1Dvq7qh3qfqp+yOxNXn53UYj/+yNr8orIfemVNbyvT7s89f+hjE9GH/mfc6POa6EPrvHo7Iv8m0p/aamzt8tzns6p9Pm6JRT/V6vOiayp+AUVUZVetn9Lr5PVDVPVPP0WmvfWuJJdKtPb3hx9/yI85+mynD/8p7xw7u/24n1Z9Oq76YY30KSJ+yJ/S+X+oSiKy/vn0s3r/0+3u85G2V70+nzrppr762cev/fbjqs/2cemrz4jot1rbTR8RnT4f799qH6Jdl/wPO/rQi1pr9fXJ8vSp8UP3Q1x78rqRy3p5+5BYNsv1z+X61D/uquSd2H7mfor2YY2+D7WobJq6T7Xq25//Q/tn/eyl1vS2vPqsVvrUt9OJrO0yFZ3q837++edz367782n5YYvsW/1U0YhOKv/T7v986PSRXStX0cVT1xeN9ujTufWhEpUMJqJ/vCL9z9vz8/r48zl9Ti0/r7don/q4qLzfPz88bepcrJ7OfujjEp3M+hDp/qz88YdVrsu6yJ/a7fr59/mrHj/9mHxicfN/EsfSp2p1jh9T0cfjp6pIp5X+oc+Hijjq+X6Kxf808iX6dZd7neXHnVn1T5Vq21+nfi6SY5G5bzw//9A/XNEsk3/X6OMP73/2/PrQ/rD0Er9+Pp9+SDT6/d5dPyOr1PL1IT/3h7VS789Nf1a6/LGLn9Y+9aHeq9FoL3bnaMWPV1RFpPqtbuTKqw+t7M/7lKVydZ9VSfXn8ynS+E/JH6L69vpaPyWvrJZXJsftQ5/P6Gz32FMPPfPIEw8877jTDjvrqJMOOueYUw4544gTDjjfeNMNN9tokw0211hTDTXTSBMNNM840wwzyyiTDDLHGFMMMcMIEwwwv/jSCy+76JILLrfYUgsts8gSCyyvuNIKK6uokgoqp5hSCimjiBIKKJ940gknm2iSCSaXWFIJJZNIEgkkjzjSCCOLKJIIIocYUgghgwgSCCB/+NEHH3vokQced9hRBx1zyBEHHG+40QYba6iRBhpnmFEGGWOIEcZdYHzhRRdcbKFFFlhcYUUVVEwhRRRQPOFEE0wsoUQSSBxhRBFEDCFEEED84EMPPOygQw443GBDDTTMIEMMMLzgQgssrKBCCiicYEIJJIwgQgggfOBBBxxsoEEGGFxgQQUUTCBBBBA84EADDCygQAIIHGBAAQQMIEAAAIDggs8oCHHIMTJAUIPcOAOENdAoow0xQIDjjALBjDfOUOMDwhgMo400QKCz8XndfPGdzbU+VJ/v8/ZUeq1Yro7oH/fqyhHRuRF1xNv2p/XPP1SffqrqQ3b7WetT81R67M+6uX/I+nw+RS7uNJH8YZ0za18/+4mkt3Kr+/jTlz+Jn09R1YvO+pz+iYju+qG99jv5MXk0fUx+negFhaCoEynLlCGaERFRkiRJhgMjEIDAwIBBAoSzGvL8EwCwvbL///9xmn4HCNQVAoqOQlcTEFtITJpoPseyci7nQfTIRNcORbWDrwAalsQo4I0FVpxS4iPZ9NWddHmJ9j0jMHmZz4qhsHdjMdpaQHQWg98Jm9DqktnwHHMxfFpGOMeZMmnQqFj3weBQgoQKKgxAg52HXYmkfgGmYp1AGOrM5Idnv+G33kq2yoFDPwTTdDwypO3IxNxVBhb5kAMb0nzc2PJpkFUf0cO3MTftXhEDG45WkOA5VIbJJLbQdmBHHao5vC3E4HwbF0NziOXNm15gi3s1FzNKou4AGFm5oujAd1/6lZ8sWnU2i7bCyYrW4z3oHYH82dVTV1nXnNqFA5PcqMPdmeljj1lMRDFvQh8GAyuZSrOV79wD/gqVI352g2Pnk2MfrLWSmrEg/bQnZaBXaAjDuUHZUrA93oqPW41UGAgfGJAk2UpTRj2D4NznIhvRuSAhJ/Q0GiSZ88JfdtJwwQackcIqMmwU7t2KAuwJDD14JudLxp764m1Tqq5rS8cAnAcILlNjBCuFhNy/gN4Ze01m490kV6RbNv5/N3bupAxa6aSwLca4UXPm2z/8/g38MEQgfuEqQgvRBasteM+6VnhwiVXlttLYPJqvamso1hHR78/P7YIijiP9KlqyspqdtkJluRiTB5EdBsidWivlUdzCfb7u0XJ0kqP5UAh1aP+VRjhtKbWpzYSeTjxXBWW5NkBE7n5HgQE2ak8Hi9FRoSbVw9WUDmHWaTek4ySlsl+PLY6ErXHL6azEMJQ9p+fkU537LX4wEZBjXLIcBsR0Qus+Ojfd3BvqsKRJPNaF2J94wRc4j1j4NMUYrD/vCAFrsrqJ3JGc0sKOtsMltkASKbPOosUx1Jj3IRmqYSXoPLTcl8ErROCeBSc8l45L/7FgVlAUHGshGVGPSYM/SVRxoX3dveETk33Xgbq0Z7XYKgO+o+7I3FmLwlVfhzPOSgzEhq7C9eL1jR9BXcV86JqTMBr9uArcVNIgU0cxUB0Y9O2q1cHbs0zQs+J3bgmopWQm5G73Jh6N+Qo3bI0O3pyPJlXVifj2AmaAGk2da25q1u/AUu3Qt7V9kxHX8vydrOpSo5XLTke+5MiYxe8Y8obPYhz10gmykTGlnFCloMQ0qzDz1RKxvSW/9KvRJ/E3d/fP+9/n5Gwr5UW4RcDME0uCuFJnaLoEONaipt0IGtOf1CCG7Dn4U7skwjUfDaC3dYNIilQGimM+AkQYMKe67Oh59xIXpIxKoVWztXvdxCEVi2GoiETpZ777++okCj6hOU599rraH+N6J140yAd+DgHBn08Y+wXXLEvIEFaL3g5jKmW+aKqDGIotYk7alA8b0wMGQG0LVqlpRAoGciVGH+QVoWiTuuL8DT4gNNkl/ehZsApr51XcJiUQ7IH+gaddKoiMnWu/DyeUwLNZreGW2usDL6hv7k+HFyEzkmZbCSmHEjDnhtQ2Cbf6TD/gwui9yfyOyMp3yFSWGFHDSYUUkG5ZKERN0It92FgAvFQIR7pDq+h1zRAOeTuka+1uV+3vux1mbzdEhOGLtQXOZ9tVTd4RtTi64opBWuYsXIJjRAVOFysW+G+iBXNyOtVzk6xwBXZ403yXAi7LFxcdEnM2dLLrZEI6555jVNxQZxFQ4ZbUoZqpuA8Yrat7hpzG4yQx3Qojf+vs6qPPuxU6+HUT6cKKFQJRdNE2EEYc5xNgeMoRy65qIZjEfX7xYIsrTzyZDcWq4XsfLZioLi7Z59qfNa1Ri8FOZ2xllqlPuNJnv+5zJN0luSrfkedr+KfOTQKnLzKJF522Wr/e45SviYunl+trKbYNAwV2soa4XpkMvKqUDBdqVaii/FIuLH5kF2fz/IlOS0OhAv0eFiJ/10LKVZb/7iSDFcORRrhyhGbwr7o76Cw6qvWK+AQaP9KzAAqQJEIj4ynOOLZIhBFjJEdFYwgQHzBLmO3djhjsJCkCNJPEq1+pSADhisTtrVCIiusOGty2DS58OQHpEBFo6oQj1N1+0JSAHVvHxGaqjOX317VFQsyn2QpDN9TtjCYqaLzBPjxYg3+/1aGyoeGMzKV4e4Z/RnnUt9FIBu/2VJdXPD/9Pxc4EKxmPavBwlv4VxrxDjj6+mc34nClZa0upSUi4nbWxcRc+wMbHFCYJJHB0GVtZoxVPh7VtzEjCKHuaBfG/umGJs2oSgGQqqpGMlq3ZMC1vqUkgJGFUL7qQQ2l2jIJQrh2BdkjF7vgwXoYmhsNYeVVVjdN7s28yssNEu6E87DxMBdZyL1owHHYZScNeqXzXLjpslZQmKScw4VyqkCY664x2+Za0TLxQopPMpt2tw1CI6wSID26PmasWihxls1dIDNmv+UZFfYf6FebFkLrMrRCPlrtPsjA7nktb09o9w+QE2sHRg2j8eYKe2wDd+wQ3Jipf6f6EuVYvt7khKGqzeGgVdgzo5LHvDqJv/dxQf8TjA1katJo+jtMsHBLv5v6IEP1YWQZxpAyQvILmY7K+W1KfG5ru4QYhtnJpaz1QGrBiXuawmebovw0rjJxwTGerLvBlggW8eHqYgmxlfBKxmtPwayd4CMawWKrQLhLzVVf1GTVtblqPfWKYd0bmSqhRZ5p32ncxOkgKvfhGKdS4QOEVOodKLT1b84wy446SrnUEX1aBPcrIeZePLxMotBHVXlDmNCp+vQdMrZ/o15CAyQ21otkU8bEsRDo+psPAy1ofyRqK5E6EYovAvwakXzqjHunUWgSmAfSkVxfOMwedW9AFj4UA7jeDnfGtEO4j/P87ZsQ22jjfSICD4Qx5PHQf0iWbZCCDcFmIWW9nEBD0lHeFecT8DHCjRoJVOkgjJ7GYsoLlt1AWzMHIwKpqdDj9GOBfbTc1GoXbT9Cd51IiVH9FkfyJ8dERS6SpKmedIXyj675tM4CNOOWUu5GYRZ4sJK/GnqrWtq9IEZjVUvc8jUkN7poGA4KCi7JFv34EXVJ/IpykeJHVG2Qtb+GQ5puwaprxcOxXACP950AKynM74hGJhzFICQe+LuJrKWA1VyosuFmErTjOMG/frn7v233TrSbXf9pWzIJT+Jqka5nKp4rmSukU0mVqUd6cBWJLzH/1d1RerIxY38nYuKnaC5+x1Bg1UjDs0Q2L80akmIpQg6nHWkrtGSlq/IpOiHZc+UkP3wLnp/zUmI1C+l8319abSHQqPyBlOjlVXvoGqx+MZykTd6iWIHuLk+ShUxBUialNS1Py5iNnYxwQahzqF4iR4a0C0AbzSQUlZn6A7Hqr9HkMc6ELLH1v4miDjb/MOdDb/Rp4ek/ipDZ1kGNBR8mSTQ8GxNQIIS3efxGxcoEDiLun0SJwwDsxjzYoQmGO1dkMR5h56c3lJIUFIQdCK/lqMn10mIoKnZdHg44oz8E7FYA6DTJY0VSES2JX2rTyuI7nEeI4rBk6X4wHsaKKUmz1lI+t8QiAp/Fp0VX+5sMbcvxOe037uy4sPfV3NzMF2G8+e8xlhU7Mp3b15N2ms7I344CodxBl0Yim5Z7nS7fo2p5gpRq80WuNziqDFHULSBv90DaMJJoSQdh9vPHDuLL/DTJrbOSjeuU5gqVuyYtt6AIjoWIRB5FSlb07dKngWTCZRZ7vxH0u/FAQcff6HYslXqfU7mgyHfOw/EDxLd+aT/HaHVx5j8yiYTZnCrQ/MEOuDJahs7QhJzgM9Z4phgd7Ph/jpyJyjUwLtr6pzgUersCgaa2Fw=="

  private val PatB64 =
    "KLUv/WQiHv0WAIQfAAF4eXp6eQIDBAUGBwgJCgsMDQ4PEBESExQVFhcYGRobHB0eHyAhIiMkJSYnKCkqKywtLi8wMTIzNDU2Nzg5Ojs8PT4/QEFCQ0RFRkdISUpLTE1OT1BRUlNUVVZXWFlaW1xdXl9gYWJjZGVmZ2hpamtsbW5vcHFyc3R1dnd4eXp7fH1+f4CBgoOEhYaHiImKi4yNjo+QkZKTlJWWl5iZmpucnZ6foKGio6SlpqeoqaqrrK2ur7CxsrO0tba3uLm6u7y9vr/AwcLDxMXGx8jJysvMzc7P0NHS09TV1tfY2drb3N3e3+Dh4uPk5ebn6Onq6+zt7u/w8fLz9PX29/j5+gABAgMEBQYHCAkKCwwNDg8QERITFBUWFxgZGhscHR4fICEiIyQlJicoKSorLC0uLzAxMjM0NTY3ODk6Ozw9Pj9AQUJDREVGR0hJSktMTU5PUFFSU1RVVldYWVpbXF1eX2BhYmNkZWZnaGlqa2xtbm9wcXJzdHV2d3h5ent8fX5/gIGCg4SFhoeIiYqLjI2Oj5CRkpOUlZaXmJmam5ydnp+goaKjpKWmp6ipqqusra6vsLGys7S1tre4ubq7vL2+v8DBwsPExcbHyMnKy8zNzs/Q0dLT1NXW19jZ2tvc3d7f4OHi4+Tl5ufo6err7O3u7/Dx8vP09fb3ga+oIdTeDbErSNoMEeSEWcIsEVwxK/O43+b+1XnD2t3r5Z6y+7bndWr2r5431t69Lvcp27d9XlNz/+q8Ze3u9XJP2X3b8zo1+1fPG2vvXpf7lO3bPq+puX913rJ293q5p+y+7Xmdmv2r5421d6/Lfcr2bZ/X1Ny/Om9Zu3u93FN23/a8Ts3+1fPG2rvX5T5l+7bPa2ruX523rN29Xu4pu297Xqdm/+p5Y+3d63Kfsn3b5zU196/OW9buXi/3lN23Pa9Ts3/1vLH27mSzWkqd/lP+F+XFOQubwtQU0KaQv6YPkCGtAjxFIs0="

  private val BigB64 =
    "KLUv/aTwqQIADIEA2orsEw8Q8MpyAABonVKSMiWAqgIbAQkB/wCt2ufTVd/Pqfb5h1pu/3B0l8iXI4uop2/6tLz9t/n5zEXkiB+XNlbr+ryK6EP/lFvlfv5U5nr+c5b4Eatsb/uYZE/Tp0si3V+L/PmoqmaVfjK7D9XnK3H7sEWj1632mTQWq2aqf0aS6PNhFYlYKyIaUfvph6X6H46f6sfnt7GfT60+pPky9WN/PuOrNd4t0j88Ecd+qv98n/Pzefndhzy5pU/R/Sp9atNcXD87i0r6+CO7+S0ifegRyfS2unZ/7vlTH7uqPvQ/41afk6s+NZrXE63Kv4v0p1tHIpt47vNZu8/HRMXWX10/L02u8nPBZxAIccgxMkCoswGCGuXGGSCsgUYZbYgBAhxnFAQz3jhDjQ8IYzCMNtIAoc5Gbt9x9KF6Xx59qtp/6NNy7dS7Ho1Mq1FR1Yh+f/jxh/yYq8/2+vCfeudIs4k+bj8fGlf6sGN9WsVP+UN1/p8qsYrsPx/6rPzsv2mfj7W9fT8fqruIyrTSZx+f7BN93H62j/mvn1XRp1K3u76qen0+3r91n6JNpvI/pNWn3qKOSiefJL4+HT80fYojKn1GW5nY19uHxdqs+891P/3HtFJ5LxJ9Zvq09mFX36eoVZsu2qdU8u3P/6n9M/rsVESuE9XrZx3Vp99eL5Js19V69XP6/PP5fO7bvT8fIn5IJelU+rS1qrPqf4j2fz71+sru6pYuXzR6a7RXH5qpn6IqIj9Ffj5k+y1L9aFqG7Xy/v7vh6dd5Pm/y7Z+jfr6nEUSP6aql/lPsXWX68/68YetycT6tHW1ZrnKKuv7/CXfLL9Ykv2fM5Hq48/Wc6OdHxf1r42fT+vTdvUa1T+fanGf86VPWZZpn99vX6ei35u49yR+TPPbf/px3UTd9vdFp7kkx+4bz88/9Q9XmnX59CF/7q4+/vD+Z88v7Q+pTsWPPp8PfVg10ujT0+/TTaPPyFIR8f2Qn/vDjopuf276M6Lrj0v3/FD36afo3j/varWXtHM1fz4sP16rLRb5VNrI1Strf96HSFWX9lmJRf58PmWN/1D5U0W+65Ff9Y4+VB6xVK8mx+1Tn8/qpFa1DvfYUw8988gTDzzvuNMOO+uokw4655hTDjnjiBMOON940w0322iTDTbXWFMNNdNIEw00zzjTDDPLKJMMMscYUwwxwwgTDDC/+NILL7vokgsut9hSCy2zyBILLK+40gorq6iSCiqnmFIKKaOIEgoon3jSCSebaJIJJpdYUgklk0gSCSSPONIII4sokggihxhSCCGDCBIIIH/40Qcfe+iRBx532FEHHXPIEQccb7jRBhtrqJEGGmeYUQYZY4gRxl0wvvCiCy620CILLK6wogoqppAiCiiecKIJJpZQIgkkjjCiCCKGECIIIH7woQcedtAhBxxusKEGGmaQIQYYXnChBRZWUCEFFE4woQQSRhAhBBA+8KADDjbQIAMMLrCgAgomkCACCB5woAEGFlAgAQQOMKAAAgYQIAAAPm9Ln/dTRaLax67Nn/I+J1fR271ar4/I0vwV8VMdbVQtmu0P+bOP1H/2KY7U0ue36UP1GdWkFX3okX76ZdUtrv6UW+P+If3xP/7nZc/Z5HqV9K3+Iumi7TSNTmTx82m1zP1rlayLtL+qyn1Rnai4kx+TPX4+H/t90SM/J5rzqfRx8eP6EPnpqTWWb4XCqDMJy5YhIhERKUmSQoYDIxCAwMAAAYJDpjX8fQMTwPY3qf//Va82A1++17jr0gRUlzAguj9NvwMz7woBRS0ExRtdNQF+CiVjBIcY0sQ7cTEPeOMCDxrs5zDs2ZDUiuVgJxMrJqX8I4f0607O/v10WWcEWrbyTZWTTbp2n/dBNC0G0DxBuM0eGQw5rkBUQOs944ZeNkhUbAdr7MPOhi7ilg2n6TMcUX8B3swkEHoWywy/8Ii3fKutROVwD600JTVOtCCgrY1A8jS4CM/HN84NCEmHjuDhMavwb9u5c9KjjVkj3oAAJwh4psr1eaRCz4E6qlXD8FZIwXGbF0PtMJs3Sf/xRfszXWPELRRFww2Yud5u/g3x8NOoW3e01tpsVZzg57QXbwQ9yZ/JSq3gQrLXnN+FKyb5gMEdO9Mf+zc6UbU3cdiiRScEVYE2ZS8+FJMxnnHDgqvOcUbVGnsWLecK4nDhnHAH4OkaYVg4IVxXetrrW33c20hATihMY+cwXrzUJ9ClBdeYC924XCRGLQ7gf+q1xtAegiBuRTEGyCwfHs7KElDtlxSaJ2M4SAlHPHJ71G3RctugqmdXiQG2IynUpwTbglUjCYXBIr2jz2twtnWThnLUD2P/3WWwLsdsEQz6y4ocXZAdxuHhaBIUoooNP/AYpoEwcnZoAzXpEwUC8OeS21eqp5vVWq16DWPd6ug/+iCrcZRRo84kpQRZ6rCtIkrljkPF62Ew7sS10o5iC/n5c4/YCffps1pGrUbtX2kE/03Wi5bIWtspc4dc+q06ROrq46ffRnE6WSwQKjSkmPqd0olwxuIb7Pil9C9Ojx1H/ObCtYqoXTdCnqPzrpMLGDW/zLKAUzXcJRsBgWP6E7Rsboo3jDGYc2034iQ29nle+YWc9ysoDX0M4h/EhH/T9XAi0JFcFtkMoUW4YltIwguas8X9zf2DrxWRBslKr7Oq5XvxvOaETHe9rJSuTL+wwFaQExy2cEa0D4T6/elR/UJeVwbCA6kVe1dRRxWxfWbaIsDXTc9cLaKEq6YOO05KTGSTM8ZwiEZ+RHtVNB/aiNghtKLbtjZ48CM4gbKBxcc1olhdNSmKkvBnL2+lugb+0ld3Qnvr7whpjvswhVcNY2uSYNwW1QOJ0JuvDZbmYs15ZywX9Abm5vbYNzriZSU+spi61NGMS20wSA42ZoxyQN5rZ2kcuXSibB0zpARVIhSYRgpDX1Uicu+YzxKYAd3hyEuuU6Ohrqy/GIKKbUKOVXu2JGiOOkPKJRTHEFDTM9qNOePUQA255uFbEnCN2zXAb0NNiCZtg6cbh3ZdymFOsbJD8s4l18MJUeFd1YjPxcM14FsB6fcHIvNn0v15dYjCT2iOT59zXUke47xTnWjsQEDeQZ14CX28GVl/kyX0YLlDw6UCqeTzBXaHYswqN2JGm5DuAsqfAQYQiaiAVqobMcEIVwL0wTwiKBqrbfn5X/HRoMEu8lPOwqpTO1fRm7RA8B94PtDgNoslg190lKbs0af0DNdMOBFcRyRioF2yEpbeSAOshjNZCWLOMeZN4q2E6UwIwLi+SX6H2cI7xFSeWNVAma5KzomkeiIuXkwO+7vmi0y40x2kitbR9u+8pYcAZOQb36U/1S8JoGJ40SgSbMr0KECzKs9w1EpGN+/v2edMLsFhBC6g3cW68reO/MkztO4zuqi+R9o7zf0qrNjTP2XMXQpsKGXXygSd45lL1DAr0UcEqMKlUU9Sb4jRevXB0Ns4nDTTZ1g/4XB1o69vnYRyZ0O+RGNnG20e6GobSIxQBFbAxBMVQZs2XPQU3X1OvNjikadPasOumvZ+VgoTeySGtopv5PA+0YrVz7EcEds0XuemwBAv6pdi/lPT5sLFx/BJHZYExr6MSVz0WUriung0Tjar5tMmPsGYFNgGxRJ58g2xrho9eHVK2jVa9TDFQKVmXj+yrRO2DANCJ2mq2qcDBUzS/o4FALKA/O88CVqxcMpGrnyh6fvXfBefyeig9RFRE4j/iGZBKdhXInjXUBUnY1ESkcU4yVYRhrjFDcwQttItn7rQyuFWlbomfk2PhAhvItEriIUYyO3A4ZptZPjeAPM2RKCp/R1BM+G/cjKMfUysR0XBOv5xbZPAzT9NIEM7IOjbTZE+ANIeXkOcIkRCJRoNlkbUxYm3GcGXoWuSEWxX3b+y/Pz/XMAQhJ9dwbLb/ksr5rod1tDiKI/a9wls0nrlvuwCInS2amKs3RgjODRhDpGXo2ttMIQp341q28AImFA7Woexxmk31n5MDwASNT8YyGhAtS4pgRPFGkKRFT/bldCWQ9DhKhTEiSzThQ/eYZq4AQRaHqiFCM3jLGaXBol70eSkBDkJELnRPDX3MoNv4lg3gg7ptv0BJUUdHsquwGZOu4bZFte6ZeqFKv5kktllA9oIxI7RMSDpus4IaW3JWR53lczOfgJnVNiPDfQgXUMIXKIV8tFUX/m5SvdYS1jvv0MPgImdCvx9qK7DKvloBx6xA8GNfiz2ReU6fOVJlyGqk3DEwH/dLarZjjS0ewdcEEwRZIEeMtt7Cdac8O+oPtWonCUkzHuflGmSpUDGIzYdm5Iouk0GG0Mwi3KJ9RTIHnCa6QRjr8fiTkDDBUl4R90O7C9fPZOi5isx0tFKPnWFgp93QkYkwdTWTXA3mou+sMkiatuXX/USswDlf8yExk6WG0/XonIfwihEqjGAdqXmgKBV/su8XDap2GPJHegbRXDoSkrbNJ5dRiu0QFUphF1TmFM9+Y4Y2xej2GhojyHrkGyaYeJYBMr9bYHRF9Q6AtVmBd04ftoviKRP/T7vBRQmCeSR6ZJrwWGbG2XZkcWaEcS50Q7sxmwHufciEesDE9trg/vEMXCdVhJX4IX7IIPdwH6hYX1uYJHUUXql8jl97HCDRtJUOAijt1qsxMdlN25L5gAiKGxCeoj+C4RHyU1Wq2jJEXbHifoY6/d2xOzkNZFXzmSVqILuki5Gbz5rZ5pmeEuYeytsAZJZibratbUt8d4Ss7HaJVtuquSAZixcHAs6LjFLUbsEJo6KWqRUolRbZB28RkiMbnhFEXAoF8ZjGSbcllxLHrIJSbGGFGT+PREAqVrNhQBs0EMDonGcwV9fSr16uqB1suPZyT+nJXrwKK4nsvUa4qmTAYRqalRZPOoNjpHoEv9Xdx+lm4065pyIiSmG6uIlhjivGkukAAWz7knpFC0Hor3cyloe6Ub+U5dw+3k5PR+IhfPM+ZYkzfLbfP9tJ1Dt+LuU5fOmPXENq1+bOCV74Sr0Uss0LQoHEp2M1recKuN19yaywEK3oTZhjgylC182yiS6kQX8iRi8hFijJp39Oylq7IeJPw7qTI36A2b6rfDmH0SoZmt2DcCRMPWKjGmAwgTWHHjesZGs+oDTCMYnk3A5gB8Dw2qCUjJsuguOCN6PbsjoFDAEeglpOa/ceXExhsqoi/0ADfbhgWolTJ2W/G5EFSmSbQI2UTm4MyviKQ4pS57BgDBzQOlq/pWCoiXwgtemDLLo1qFNn7NF83j+K9zZNWz6+pp/zHcofP7fjXVLR0DH1ddJnyZj8ptHkee5n5f6uY3ce7Eu31PQ8gT90LYJ5jfMVUJR1f2Agqdc7KfuEC25MdYAZ+FgvtQe3aDFNtn+T82iEP2vMXfLENFVyPzcdyT3Fs28dNP4FaGSOSYto7/fsgZkLv5pHZZQT+o7ExcrfBU67CJgoPWL7p+O/mhnESElUYRB822bnErVAn86J2QBXKqMgwrLaRPRp+CYQ0UDjhcNRSkORKcloFQwDHPGi00AAAh1AQDsKR0IAeZxKks="
}
