package graft

import org.apache.spark.sql.functions._

import graft.ext.{ImageIoDecode, Multimodal, PixelDecode}

/** JPEG membership in the image near-dup family: the dHash of a JPEG
  * re-save must pair with the PNG original. The fixture discipline
  * (BASELINE.md addendum 5) is probed EXHAUSTIVELY for DRIVER corpora:
  * the gate fixture draws seeds mod 251 inside each DocOffset id band
  * (ExtQueries.mediaSeed), and every driver-corpus doc_id sits in band
  * 0, so checking seeds 0–250 covers every image the driver can
  * produce — the re-encode stability (same-seed hamming 0) and the
  * cross-seed floor are theorems of this spec's pass there. ScaleCurve
  * replicas draw the HIGHER bands (seeds 251+); the banded tests below
  * probe band 1 (seeds 251–501) the same way, within-band and against
  * band 0, so the scaled corpora the curve measures ride the same
  * proven floor rather than an extrapolated one. */
class JpegDHashSpec extends SparkSpec {
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  private def any(b: Array[Byte]): Option[Long] =
    Option(PixelDecode.imageDHash64(b)).map(_.longValue())

  private lazy val pngH: Map[Int, Long] =
    (0 until 251).map(s => s -> any(PixelDecode.pngCellBytes(s)).get).toMap
  private lazy val jpgH: Map[Int, Long] =
    (0 until 251).map(s =>
      s -> any(ImageIoDecode.jpegCellBytes(s, 90)).get).toMap
  // band-1 seeds (ScaleCurve replica 1: mediaSeed = doc_id%251 + 251)
  private lazy val pngH1: Map[Int, Long] =
    (251 until 502).map(s => s -> any(PixelDecode.pngCellBytes(s)).get).toMap

  test("JPEG re-save of the cell-grid PNG hashes IDENTICALLY, all 251 seeds") {
    val worst = (0 until 251).map(s => (s, ham(pngH(s), jpgH(s)))).maxBy(_._2)
    assert(worst._2 === 0, s"seed ${worst._1} re-encode hamming ${worst._2}")
  }

  test("GIF of the cell grid hashes BIT-IDENTICALLY to the PNG, all 251 seeds") {
    // gray palette luma == index: lossless formats must agree exactly,
    // which transfers the PNG floors to the GIF member for free
    for (s <- 0 until 251)
      assert(any(graft.ext.GifDecode.gifCellBytes(s)) === Some(pngH(s)),
        s"seed $s")
  }

  test("cross-seed hamming floor >= 10 within and across formats") {
    var minPP = 64; var minPJ = 64
    for (a <- 0 until 251; b <- 0 until 251 if a != b) {
      if (a < b) minPP = math.min(minPP, ham(pngH(a), pngH(b)))
      minPJ = math.min(minPJ, ham(pngH(a), jpgH(b)))
    }
    assert(minPP >= 10, s"png-png floor $minPP")
    assert(minPJ >= 10, s"png-jpeg floor $minPJ")
  }

  test("banded replica seeds 251-501: re-encode stability and cross-seed floor") {
    // the ScaleCurve replicas' seed band, probed with the SAME theorems
    // as band 0: q90 JPEG re-save hamming 0 per seed, and the pairwise
    // floor — within band 1 AND across bands 0×1 (a scaled corpus holds
    // both kinds of non-duplicate pair) — comfortably above the
    // family's hamming-3 threshold
    val jpg1 = (251 until 502).map(s =>
      s -> any(ImageIoDecode.jpegCellBytes(s, 90)).get).toMap
    val worstRe = (251 until 502).map(s => (s, ham(pngH1(s), jpg1(s)))).maxBy(_._2)
    assert(worstRe._2 === 0, s"seed ${worstRe._1} re-encode hamming ${worstRe._2}")
    var min11 = 64; var min01 = 64
    for (a <- 251 until 502; b <- 251 until 502 if a < b)
      min11 = math.min(min11, ham(pngH1(a), pngH1(b)))
    for (a <- 0 until 251; b <- 251 until 502)
      min01 = math.min(min01, ham(pngH(a), pngH1(b)))
    assert(min11 >= 10, s"band1-band1 floor $min11")
    assert(min01 >= 10, s"band0-band1 floor $min01")
  }

  test("re-encode stability holds down to quality 70") {
    // margin check beyond the gate's q=90: constant 8x8 DCT blocks
    // survive coarser quantization too; the gate's 0-hamming claim is
    // not balanced on a quality knife-edge
    val worst = (0 until 251)
      .map(s => ham(pngH(s), any(ImageIoDecode.jpegCellBytes(s, 70)).get))
      .max
    assert(worst <= 1, s"q70 worst hamming $worst")
  }

  test("gray-colorspace JPEG (the gamma trap) still matches: dHash is monotone-invariant") {
    // TYPE_BYTE_GRAY encodes in a linear colorspace; decode gamma-
    // converts every value (jpegBytes scaladoc documents the ~54/255
    // mid-scale shift that breaks VALUE oracles). The dHash only
    // compares cell sums, and on constant cells a monotone per-pixel
    // map preserves every comparison — so the hash must survive the
    // colorspace round-trip that the stats decoder cannot.
    def grayJpeg(seed: Int): Array[Byte] = {
      val lv = PixelDecode.cellLevels(seed)
      val img = new java.awt.image.BufferedImage(72, 64,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      for (y <- 0 until 64; x <- 0 until 72) {
        val v = lv((y >> 3) * 9 + (x >> 3))
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val out = new java.io.ByteArrayOutputStream()
      val w = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
      val ios = javax.imageio.ImageIO.createImageOutputStream(out)
      try {
        w.setOutput(ios)
        val p = w.getDefaultWriteParam
        p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.9f)
        w.write(null, new javax.imageio.IIOImage(img, null, null), p)
      } finally { w.dispose(); ios.close() }
      out.toByteArray
    }
    val worst = (0 until 251)
      .map(s => ham(pngH(s), any(grayJpeg(s)).get)).max
    assert(worst <= 1, s"gray-colorspace worst hamming $worst")
  }

  test("jpegDHash64 nulls: non-JPEG magic, sub-grid dims, corrupt stream") {
    assert(ImageIoDecode.jpegDHash64(PixelDecode.pngCellBytes(1)) === null)
    assert(ImageIoDecode.jpegDHash64(null) === null)
    // 8x8: narrower than the 9-wide grid
    assert(ImageIoDecode.jpegDHash64(ImageIoDecode.jpegBytes(8, 8, 90)) === null)
    assert(ImageIoDecode.jpegDHash64(ImageIoDecode.jpegBytes(9, 8, 90)) !== null)
    val corrupt = Array[Byte](0xff.toByte, 0xd8.toByte, 1, 2, 3, 4, 5)
    assert(ImageIoDecode.jpegDHash64(corrupt) === null)
  }

  test("imageDHash64 dispatches JPEG; column path agrees with the JVM fn") {
    val jb = ImageIoDecode.jpegCellBytes(42, 90)
    assert(any(jb) === Some(ImageIoDecode.jpegDHash64(jb).longValue()))
    val rows = spark.range(0, 20).select(col("id"),
      PixelDecode.imageDHashAny(
        when(col("id") % 2 === 0,
          PixelDecode.synthPngCells((col("id") % 5).cast("int")))
        .otherwise(ImageIoDecode.synthJpegCells((col("id") % 5).cast("int"),
          lit(90)))).as("ph"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    for (id <- 0L until 20L) {
      val expect =
        if (id % 2 == 0) pngH((id % 5).toInt) else jpgH((id % 5).toInt)
      assert(rows(id) === expect, s"id=$id")
    }
  }

  test("imageNearDup pairs a PNG with its JPEG re-save end-to-end") {
    val docs = Seq(
      (1L, PixelDecode.pngCellBytes(7)),
      (2L, ImageIoDecode.jpegCellBytes(7, 90)),
      (3L, PixelDecode.pngCellBytes(9)),
      (4L, "garbage".getBytes("UTF-8"))).toDF("doc_id", "img")
    val pairs = Multimodal.imageNearDup(docs, "doc_id", "img")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.toSeq === Seq((1L, 2L, 0L)))
  }
}
