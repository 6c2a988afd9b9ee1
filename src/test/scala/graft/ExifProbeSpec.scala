package graft

import org.apache.spark.sql.functions._

import graft.ext.ExifProbe

class ExifProbeSpec extends SparkSpec {
  import spark.implicits._

  test("synthesized APP1 round-trips through the parser (codegen path)") {
    val got = spark.range(50).select(col("id"),
      ExifProbe.exifMeta(ExifProbe.synthExifJpeg(
        (col("id") % 8 + 1).cast("int"), (col("id") % 5).cast("int"),
        (col("id") % 60).cast("int"), (col("id") * 7 % 60).cast("int")))
        .as("m"))
      .select(col("id"), col("m.orientation"), col("m.make"), col("m.datetime"))
      .as[(Long, Int, String, String)].collect()
    got.foreach { case (id, o, mk, dt) =>
      assert(o === (id % 8 + 1).toInt)
      assert(mk === s"Cam${id % 5}")
      assert(dt === f"2024:01:01 00:${id % 60}%02d:${id * 7 % 60}%02d")
    }
  }

  test("big-endian (MM) TIFF parses identically") {
    // hand-built MM variant: orientation 6 inline, no ASCII tags
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write((v >>> 8) & 0xff); out.write(v & 0xff) }
    def w32(v: Int): Unit = { w16((v >>> 16) & 0xffff); w16(v & 0xffff) }
    out.write('M'); out.write('M'); w16(42); w32(8)
    w16(1) // one entry
    w16(0x0112); w16(3); w32(1); w16(6); w16(0)
    w32(0)
    val tiff = out.toByteArray
    val payload = "Exif".getBytes("US-ASCII") ++ Array[Byte](0, 0) ++ tiff
    val len = payload.length + 2
    val jpeg = Array[Byte](0xff.toByte, 0xd8.toByte, 0xff.toByte, 0xe1.toByte,
      ((len >>> 8) & 0xff).toByte, (len & 0xff).toByte) ++ payload ++
      Array[Byte](0xff.toByte, 0xd9.toByte)
    val row = ExifProbe.parseExif(jpeg)
    assert(row != null && row.getInt(0) === 6)
    assert(row.isNullAt(1) && row.isNullAt(2))
  }

  test("malformed inputs return null, never wrong values") {
    assert(ExifProbe.parseExif(null) === null)
    assert(ExifProbe.parseExif(Array[Byte](1, 2, 3)) === null)
    // JPEG without APP1 (x36-style plain fixture)
    assert(ExifProbe.parseExif(
      graft.ext.MediaProbe.jpegBytes(10, 10)) === null)
    // APP1 but truncated TIFF
    val good = ExifProbe.exifJpegBytes(1, 0, 0, 0)
    assert(ExifProbe.parseExif(good.take(20)) === null)
    // bad byte-order magic
    val bad = good.clone()
    bad(12) = 'X'.toByte // 'I' at tiff start (SOI 2 + APP1 hdr 4 + Exif\0\0 6)
    assert(ExifProbe.parseExif(bad) === null)
  }
}
