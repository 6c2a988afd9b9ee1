package graft

import java.awt.image.BufferedImage
import javax.imageio.ImageIO

import org.apache.spark.sql.functions._

import graft.ext.GifDecode

/** GIF LZW decode validated BOTH ways against the JDK's independent
  * implementation: our encoder's bytes must decode identically under
  * ImageIO's reader, and ImageIO's writer's bytes (a genuinely foreign
  * LZW stream) must decode identically under our decoder. This pins
  * the variable-width/early-change/KwKwK handling against a compliant
  * third party rather than a round-trip of our own conventions.
  */
class GifDecodeSpec extends SparkSpec {
  import spark.implicits._

  private def expectedStats(w: Int, h: Int, seed: Int): (Long, Int, Int) = {
    var sum = 0L; var min = 255; var max = 0
    for (y <- 0 until h; x <- 0 until w) {
      val v = (seed + x + 2 * y) & 0xff
      sum += 3L * v
      if (v < min) min = v
      if (v > max) max = v
    }
    (sum, min, max)
  }

  test("synthesized GIF decodes to the formula stats") {
    for ((w, h, seed) <- Seq((1, 1, 0), (7, 3, 250), (40, 25, 17),
        (300, 200, 99), (513, 3, 5))) {
      val row = GifDecode.gifPixelStats(GifDecode.gifPixelBytes(w, h, seed))
      assert(row != null, s"${w}x$h seed=$seed decoded to null")
      val (sum, min, max) = expectedStats(w, h, seed)
      assert(row.getLong(0) === w.toLong)
      assert(row.getLong(1) === h.toLong)
      assert(row.getLong(2) === w.toLong * h * 3)
      assert(row.getLong(3) === sum, s"sum ${w}x$h seed=$seed")
      assert(row.getInt(4) === min)
      assert(row.getInt(5) === max)
    }
  }

  test("ImageIO (foreign decoder) agrees with our encoder's bytes") {
    for ((w, h, seed) <- Seq((40, 25, 17), (300, 200, 99))) {
      val img = ImageIO.read(
        new java.io.ByteArrayInputStream(GifDecode.gifPixelBytes(w, h, seed)))
      assert(img.getWidth === w && img.getHeight === h)
      for (y <- 0 until h; x <- 0 until w) {
        val expected = (seed + x + 2 * y) & 0xff
        val rgb = img.getRGB(x, y)
        assert((rgb & 0xff) === expected, s"pixel ($x,$y)")
        assert(((rgb >> 8) & 0xff) === expected)
        assert(((rgb >> 16) & 0xff) === expected)
      }
    }
  }

  test("our decoder handles ImageIO's (foreign encoder) LZW stream") {
    // an INDEXED image with an explicit identity-gray palette: the GIF
    // writer then encodes the index raster losslessly (TYPE_BYTE_GRAY
    // goes through a lossy quantizer and cannot serve as a fixture)
    val grays = Array.tabulate(256)(_.toByte)
    val cm = new java.awt.image.IndexColorModel(8, 256, grays, grays, grays)
    for ((w, h, seed) <- Seq((40, 25, 17), (300, 200, 99), (16, 256, 3))) {
      val img = new BufferedImage(w, h,
        BufferedImage.TYPE_BYTE_INDEXED, cm)
      val raster = img.getRaster
      for (y <- 0 until h; x <- 0 until w)
        raster.setSample(x, y, 0, (seed + x + 2 * y) & 0xff)
      val baos = new java.io.ByteArrayOutputStream()
      assert(ImageIO.write(img, "gif", baos))
      // fixture sanity: ImageIO itself reads its own bytes back intact
      val rt = ImageIO.read(new java.io.ByteArrayInputStream(baos.toByteArray))
      assert((rt.getRGB(w - 1, h - 1) & 0xff) === ((seed + w - 1 + 2 * (h - 1)) & 0xff))
      val row = GifDecode.gifPixelStats(baos.toByteArray)
      assert(row != null, s"ImageIO gif ${w}x$h decoded to null")
      val (sum, min, max) = expectedStats(w, h, seed)
      assert(row.getLong(0) === w.toLong && row.getLong(1) === h.toLong)
      assert(row.getLong(3) === sum, s"sum ${w}x$h seed=$seed")
      assert(row.getInt(4) === min && row.getInt(5) === max)
    }
  }

  test("garbage and truncation decode to null, not exceptions") {
    val good = GifDecode.gifPixelBytes(20, 10, 42)
    assert(GifDecode.gifPixelStats(null) == null)
    assert(GifDecode.gifPixelStats(Array.emptyByteArray) == null)
    assert(GifDecode.gifPixelStats("not a gif at all".getBytes) == null)
    for (cut <- Seq(10, 100, good.length - 2))
      assert(GifDecode.gifPixelStats(good.take(cut)) == null, s"cut=$cut")
    // corrupt a byte inside the LZW stream: either the pixel count or
    // a chain goes wrong -> null (never a crash); flipping palette or
    // header padding bytes can legitimately still decode, so corrupt
    // deep inside the data region only
    val corrupt = good.clone()
    corrupt(corrupt.length - 10) = (corrupt(corrupt.length - 10) ^ 0x55).toByte
    val r = GifDecode.gifPixelStats(corrupt)
    // a flipped data byte may still decode to the right pixel COUNT
    // with different values; it must never throw. If it decodes, the
    // dims are still sane:
    if (r != null) assert(r.getLong(0) === 20L && r.getLong(1) === 10L)
  }

  test("gifStats expression works through the Spark plan (codegen)") {
    val df = Seq((5, 4, 9), (33, 21, 100)).toDF("w", "h", "seed")
    val rows = df.select(col("w"), col("h"), col("seed"),
      GifDecode.gifStats(GifDecode.synthGifPixels(
        col("w"), col("h"), col("seed"))).as("st"))
      .select("w", "h", "seed", "st.sum_val").as[(Int, Int, Int, Long)]
      .collect()
    rows.foreach { case (w, h, seed, sum) =>
      assert(sum === expectedStats(w, h, seed)._1)
    }
  }
}
