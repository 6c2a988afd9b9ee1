package graft

import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.ext.PixelDecode

/** Full PNG pixel decode + WAV PCM sample decode: round-trips through
  * the synthesizers, independent cross-validation against the JDK's
  * own ImageIO decoder (both directions: our bytes → ImageIO, ImageIO
  * bytes → our decoder), and null-on-garbage hardening. */
class PixelDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def expectedGray(w: Int, h: Int, seed: Int): (Long, Int, Int) = {
    val vals = (0 until w).map(x => (seed + x) & 0xff)
    (vals.map(_.toLong).sum * h, vals.min, vals.max)
  }

  test("PNG round-trip: stats match the closed form for all five filter types") {
    // h >= 5 cycles through every scanline filter (None/Sub/Up/Avg/Paeth)
    for ((w, h, seed) <- Seq((7, 5, 0), (100, 55, 250), (1, 6, 13),
        (64, 9, 200), (3, 12, 254))) {
      val st = PixelDecode.pngPixelStats(PixelDecode.pngPixelBytes(w, h, seed))
      assert(st != null, s"decode failed for ${w}x$h seed=$seed")
      val (sum, min, max) = expectedGray(w, h, seed)
      assert(st.getLong(0) === w.toLong && st.getLong(1) === h.toLong)
      assert(st.getInt(2) === 1)
      assert(st.getLong(3) === w.toLong * h)
      assert(st.getLong(4) === sum, s"sum mismatch for ${w}x$h seed=$seed")
      assert(st.getInt(5) === min && st.getInt(6) === max)
    }
  }

  test("resize: identity equals full stats; down/up-sample match brute force") {
    val (w, h, seed) = (10, 6, 37)
    val png = PixelDecode.pngPixelBytes(w, h, seed)
    // identity resample: x'·w/w = x' exactly — stats must equal the
    // unresized decode
    val full = PixelDecode.pngPixelStats(png)
    val ident = PixelDecode.pngResizeNearestStats(png, w, h)
    assert(ident.getLong(4) === full.getLong(4))
    assert(ident.getInt(5) === full.getInt(5))
    assert(ident.getInt(6) === full.getInt(6))
    // brute force the nearest rule for a downsample and an upsample
    for ((tw, th) <- Seq((4, 2), (3, 1), (20, 9))) {
      val st = PixelDecode.pngResizeNearestStats(png, tw, th)
      val vals = for (y <- 0 until th; x <- 0 until tw)
        yield (seed + (x.toLong * w / tw).toInt) & 0xff
      assert(st.getLong(0) === tw.toLong && st.getLong(1) === th.toLong)
      assert(st.getLong(3) === tw.toLong * th)
      assert(st.getLong(4) === vals.map(_.toLong).sum, s"${tw}x$th")
      assert(st.getInt(5) === vals.min && st.getInt(6) === vals.max)
    }
  }

  test("resize: garbage bytes and degenerate targets are null") {
    assert(PixelDecode.pngResizeNearestStats(Array[Byte](1, 2, 3), 4, 4)
      == null)
    val png = PixelDecode.pngPixelBytes(5, 5, 1)
    assert(PixelDecode.pngResizeNearestStats(png, 0, 4) == null)
    assert(PixelDecode.pngResizeNearestStats(png, 4, -1) == null)
  }

  test("resize expression runs in a plan via the SQL surface") {
    GraftExtensions.register(spark)
    val row = Seq(Tuple1(PixelDecode.pngPixelBytes(6, 4, 10)))
      .toDF("b")
      .selectExpr("graft_png_resize_stats(b, 3, 2).sum_val AS s")
      .as[Long].head()
    val want = (for (y <- 0 until 2; x <- 0 until 3)
      yield ((10 + x * 6 / 3) & 0xff).toLong).sum
    assert(row === want)
  }

  test("decimation: stride 1 equals full stats; stride k matches brute") {
    val wav = PixelDecode.wavToneBytes(1, 8000, 50, 321)
    val full = PixelDecode.wavSampleStats(wav)
    val s1 = PixelDecode.wavDecimateStats(wav, 1)
    assert(s1.getLong(2) === full.getLong(2) &&
      s1.getLong(3) === full.getLong(3) &&
      s1.getLong(4) === full.getLong(4))
    def tone(i: Int) = ((321 + i * 7919) % 2003) - 1001
    for (stride <- Seq(2, 3, 7)) {
      val st = PixelDecode.wavDecimateStats(wav, stride)
      val vals = (0 until 50 by stride).map(tone)
      assert(st.getLong(2) === vals.size.toLong, s"stride=$stride")
      assert(st.getLong(3) === vals.map(_.toLong).sum, s"stride=$stride")
      assert(st.getLong(4) === vals.map(v => v.toLong * v).sum)
      assert(st.getInt(5) === vals.min && st.getInt(6) === vals.max)
    }
    assert(PixelDecode.wavDecimateStats(wav, 0) == null)
    GraftExtensions.register(spark)
    val viaSql = Seq(Tuple1(wav)).toDF("b")
      .selectExpr("graft_wav_decimate_stats(b, 3).sum_val AS s")
      .as[Long].head()
    assert(viaSql === (0 until 50 by 3).map(tone).map(_.toLong).sum)
  }

  test("our PNG bytes decode identically under the JDK's ImageIO") {
    // independent decoder agreement rules out complementary bugs in
    // synth-filter + our-unfilter
    for ((w, h, seed) <- Seq((33, 21, 5), (90, 50, 240))) {
      val bytes = PixelDecode.pngPixelBytes(w, h, seed)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our PNG")
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val gray = img.getRaster.getSample(x, y, 0)
        assert(gray === ((seed + x) & 0xff),
          s"pixel ($x,$y) mismatch: ImageIO=$gray")
      }
    }
  }

  test("ImageIO-written RGB PNG decodes through our decoder (color type 2)") {
    val w = 17; val h = 11
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var sum = 0L; var min = 255; var max = 0
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x * 5) % 256; val g = (y * 11) % 256; val b = (x + y) % 256
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
      for (v <- Seq(r, g, b)) {
        sum += v; if (v < min) min = v; if (v > max) max = v
      }
    }
    val out = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "png", out))
    val st = PixelDecode.pngPixelStats(out.toByteArray)
    assert(st != null, "our decoder rejected an ImageIO PNG")
    assert(st.getLong(0) === w.toLong && st.getLong(1) === h.toLong)
    assert(st.getInt(2) === 3)
    assert(st.getLong(3) === w.toLong * h * 3)
    assert(st.getLong(4) === sum)
    assert(st.getInt(5) === min && st.getInt(6) === max)
  }

  test("corrupt/unsupported PNGs decode to null, never throw") {
    val good = PixelDecode.pngPixelBytes(20, 10, 7)
    assert(PixelDecode.pngPixelStats(null) === null)
    assert(PixelDecode.pngPixelStats("junk".getBytes) === null)
    assert(PixelDecode.pngPixelStats(good.take(60)) === null) // truncated IDAT
    // flip a byte inside the deflate stream: either DataFormatException
    // path or pixel-count mismatch — must be null, not a throw
    val broken = good.clone(); broken(45) = (broken(45) ^ 0x55).toByte
    assert(PixelDecode.pngPixelStats(broken) === null)
    // zip-bomb guard: declared dims imply > 64 MiB of raw scanlines
    val bomb = good.clone()
    bomb(16) = 0x7f.toByte; bomb(17) = 0xff.toByte // width ≈ 2^31
    bomb(18) = 0xff.toByte; bomb(19) = 0xff.toByte
    assert(PixelDecode.pngPixelStats(bomb) === null)
    // header-only PNG with empty IDAT (the x12 probe fixture)
    assert(PixelDecode.pngPixelStats(
      graft.ext.MediaProbe.pngBytes(5, 5)) === null)
  }

  test("adversarial PNGs: FDICT stream and u32-max dims decode to null, no hang/throw") {
    // hand-built PNG with a valid chunk layout whose IDAT declares a
    // preset dictionary (zlib FDICT: 0x78 0x20 — checksum divisible by
    // 31, bit 5 set). Inflater can never make progress on it; the
    // decoder must return null instead of spinning
    def chunk(typ: String, data: Array[Byte]): Array[Byte] = {
      val body = typ.getBytes("US-ASCII") ++ data
      val crc = new java.util.zip.CRC32(); crc.update(body, 0, body.length)
      val len = data.length
      Array[Byte](((len >>> 24) & 0xff).toByte, ((len >>> 16) & 0xff).toByte,
        ((len >>> 8) & 0xff).toByte, (len & 0xff).toByte) ++ body ++
        Array[Byte](((crc.getValue >>> 24) & 0xff).toByte,
          ((crc.getValue >>> 16) & 0xff).toByte,
          ((crc.getValue >>> 8) & 0xff).toByte, (crc.getValue & 0xff).toByte)
    }
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = Array[Byte](0, 0, 0, 5, 0, 0, 0, 5, 8, 0, 0, 0, 0) // 5x5 gray
    val fdict = sig ++ chunk("IHDR", ihdr) ++
      chunk("IDAT", Array[Byte](0x78, 0x20, 1, 2, 3, 4)) ++
      chunk("IEND", Array.emptyByteArray)
    assert(PixelDecode.pngPixelStats(fdict) === null)
    // u32-max dims: (rowBytes+1)*h would overflow Long past the byte
    // cap; the dim pre-check must reject before multiplying
    val big = PixelDecode.pngPixelBytes(4, 4, 1)
    (16 until 24).foreach(i => big(i) = 0xff.toByte) // w = h = 0xFFFFFFFF
    assert(PixelDecode.pngPixelStats(big) === null)
  }

  test("WAV round-trip: PCM-16 stats match the tone formula, mono and stereo") {
    for ((ch, n, seed) <- Seq((1, 100, 0), (2, 250, 1700), (1, 499, 1776))) {
      val st = PixelDecode.wavSampleStats(
        PixelDecode.wavToneBytes(ch, 8000, n, seed))
      assert(st != null)
      val total = n * ch
      val vals = (0 until total).map(i => (seed + i * 7919) % 2003 - 1001)
      assert(st.getInt(0) === ch)
      assert(st.getLong(1) === 8000L)
      assert(st.getLong(2) === total.toLong)
      assert(st.getLong(3) === vals.map(_.toLong).sum)
      assert(st.getLong(4) === vals.map(v => v.toLong * v).sum)
      assert(st.getInt(5) === vals.min && st.getInt(6) === vals.max)
    }
  }

  test("non-PCM16 and corrupt WAVs decode to null") {
    assert(PixelDecode.wavSampleStats(null) === null)
    assert(PixelDecode.wavSampleStats("RIFFjunk".getBytes) === null)
    // 8-bit PCM (unsupported depth for sample decode)
    assert(PixelDecode.wavSampleStats(
      graft.ext.MediaProbe.wavBytes(1, 8000, 8, 100)) === null)
    // data chunk length runs past the buffer
    val good = PixelDecode.wavToneBytes(1, 8000, 50, 3)
    assert(PixelDecode.wavSampleStats(good.take(good.length - 10)) === null)
  }

  test("expression path: synth → decode inside a plan, codegen'd") {
    val df = Seq((21, 9, 17), (40, 12, 200)).toDF("w", "h", "seed")
    val got = df.select(col("w"), col("h"), col("seed"),
      PixelDecode.pngStats(PixelDecode.synthPngPixels(
        col("w"), col("h"), col("seed"))).as("st"))
      .select(col("w"), col("h"), col("seed"),
        col("st.sum_val"), col("st.min_val"), col("st.max_val"))
      .as[(Int, Int, Int, Long, Int, Int)].collect()
    for ((w, h, seed, sum, min, max) <- got) {
      val (es, emin, emax) = expectedGray(w, h, seed)
      assert(sum === es && min === emin && max === emax)
    }
    val wv = Seq((1, 120, 5)).toDF("ch", "n", "seed")
      .select(PixelDecode.wavStats(PixelDecode.synthWavTone(
        col("ch"), lit(8000), col("n"), col("seed"))).as("st"))
      .select(col("st.n_samples")).as[Long].collect()
    assert(wv.toSeq === Seq(120L))
  }
}
