package graft

import org.apache.spark.sql.functions._

import graft.ext.ImageIoDecode

/** JPEG decode specs: exact structural fields, bounded-error value
  * fields (JPEG is lossy), and robustness on garbage. */
class ImageIoDecodeSpec extends SparkSpec {
  import spark.implicits._

  test("decoded dims and sample count are exact; values within an error budget") {
    for ((w, h, q) <- Seq((32, 20, 85), (120, 80, 85), (7, 5, 95))) {
      val row = ImageIoDecode.jpegPixelStats(ImageIoDecode.jpegBytes(w, h, q))
      assert(row != null, s"${w}x$h q=$q decoded to null")
      assert(row.getLong(0) === w.toLong)
      assert(row.getLong(1) === h.toLong)
      assert(row.getLong(2) === w.toLong * h)
      // smooth gradient at quality >= 85: mean error per sample < 4
      var expSum = 0L
      for (y <- 0 until h; x <- 0 until w)
        expSum += ImageIoDecode.expectedSample(x, y, w, h)
      val meanErr = math.abs(row.getLong(3) - expSum).toDouble / (w * h)
      assert(meanErr < 4.0, s"mean |err| $meanErr too large for ${w}x$h q=$q")
      // gradient spans 0..255: decoded extrema stay near the ends
      assert(row.getInt(4) <= 8 && row.getInt(5) >= 247,
        s"extrema ${row.getInt(4)}..${row.getInt(5)}")
    }
  }

  test("garbage, truncation and foreign formats decode to null") {
    assert(ImageIoDecode.jpegPixelStats(null) == null)
    assert(ImageIoDecode.jpegPixelStats(Array.emptyByteArray) == null)
    assert(ImageIoDecode.jpegPixelStats("plainly not a jpeg".getBytes) == null)
    // PNG magic: rejected fast without an ImageIO probe
    assert(ImageIoDecode.jpegPixelStats(
      graft.ext.PixelDecode.pngPixelBytes(8, 8, 1)) == null)
    val good = ImageIoDecode.jpegBytes(20, 10, 80)
    assert(ImageIoDecode.jpegPixelStats(good.take(60)) == null)
  }

  test("jpegStats expression runs through the Spark plan") {
    val rows = Seq((24, 16, 85), (40, 30, 90)).toDF("w", "h", "q")
      .select(col("w"), col("h"),
        ImageIoDecode.jpegStats(ImageIoDecode.synthJpeg(
          col("w"), col("h"), col("q"))).as("st"))
      .select(col("w"), col("h"), col("st.width"), col("st.n_samples"))
      .as[(Int, Int, Long, Long)].collect()
    rows.foreach { case (w, h, dw, n) =>
      assert(dw === w.toLong && n === w.toLong * h)
    }
  }
}
