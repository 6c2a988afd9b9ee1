package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** JPEG pixel decode via the JDK's bundled `javax.imageio` reader — a
  * JDK-standard API present in every JVM, so "no native codec libs in
  * the container" does not apply: the JPEG entropy decode ships with
  * the platform. This closes the last image-decode gap honestly; only
  * MP4 FRAME extraction (genuinely codec-library territory) stays on
  * the [[Multimodal]] stub path.
  *
  * JPEG is LOSSY, so unlike PNG/GIF/WAV the decoded sample values are
  * not a pure function a SQL oracle can reproduce — the oracle-checked
  * query (x36) pins the EXACT fields (dims, sample count) while the
  * value statistics are validated in specs with an error budget
  * against the encoder input.
  *
  * Scale shape: same as the other decoders — per-blob scan-side work,
  * zero shuffle. `ImageIO.read` costs an ImageReader allocation per
  * call; for tight loops the mapPartitions form in
  * [[Multimodal.decodeStatsPartitions]]-style reader reuse applies,
  * but the expression keeps plan shape uniform and the allocation is
  * dwarfed by entropy decode itself.
  */
object ImageIoDecode {

  /** Gray-converted pixel statistics of a decoded JPEG: null when the
    * bytes are not a decodable JPEG. */
  val JpegStatsType: StructType = StructType(Seq(
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_samples", LongType),
    StructField("sum_val", LongType),
    StructField("min_val", IntegerType),
    StructField("max_val", IntegerType)))

  private val MaxPixels = 64L << 20

  def jpegPixelStats(b: Array[Byte]): GenericInternalRow = {
    if (b == null || b.length < 4) return null
    // JPEG SOI magic; reject early so foreign formats don't pay an
    // ImageIO probe
    if ((b(0) & 0xff) != 0xff || (b(1) & 0xff) != 0xd8) return null
    val img =
      try ImageIoHolder.read(b)
      catch { case _: Exception => null }
    if (img == null) return null
    val w = img.getWidth
    val h = img.getHeight
    if (w <= 0 || h <= 0 || w.toLong * h > MaxPixels) return null
    // reduce to gray (luma) samples: stats are over one channel per
    // pixel regardless of source color model
    var sum = 0L
    var min = 255
    var max = 0
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val rgb = row(x)
        val r = (rgb >> 16) & 0xff
        val g = (rgb >> 8) & 0xff
        val bl = rgb & 0xff
        // integer ITU-R 601 luma
        val v = (299 * r + 587 * g + 114 * bl + 500) / 1000
        sum += v
        if (v < min) min = v
        if (v > max) max = v
        x += 1
      }
      y += 1
    }
    new GenericInternalRow(Array[Any](w.toLong, h.toLong, w.toLong * h,
      sum, min, max))
  }

  /** Gray JPEG with pixels from the SMOOTH formula
    * clamp(((x + y) * 255) / (w + h - 2)): gradients survive lossy
    * DCT quantization with small error, so spec-side value checks can
    * use a tight budget; dims/sample-count are exact. quality in
    * [0,100]. */
  def jpegBytes(w: Int, h: Int, quality: Int): Array[Byte] = {
    require(w > 0 && h > 0, s"bad dims ${w}x$h")
    // sRGB with r=g=b — NOT TYPE_BYTE_GRAY: the JDK's gray type is a
    // LINEAR color space and getRGB gamma-converts it to sRGB, which
    // would shift every value systematically (~54/255 mid-scale)
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
    val denom = math.max(1, w + h - 2)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (x + y) * 255 / denom
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
        x += 1
      }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream(w * h / 4 + 512)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("jpg").next()
    val ios = ImageIoHolder.outputStream(out)
    try {
      writer.setOutput(ios)
      val p = writer.getDefaultWriteParam
      p.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
      p.setCompressionQuality(math.max(0, math.min(100, quality)) / 100f)
      writer.write(null, new javax.imageio.IIOImage(img, null, null), p)
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  /** The reference pixel value the synthesizer wrote at (x, y). */
  def expectedSample(x: Int, y: Int, w: Int, h: Int): Int =
    (x + y) * 255 / math.max(1, w + h - 2)

  // ---- expressions -----------------------------------------------------

  case class JpegStatsExpr(child: Expression) extends UnaryExpression {
    override def dataType: DataType = JpegStatsType
    override def nullable: Boolean = true
    override def nullSafeEval(input: Any): Any =
      jpegPixelStats(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.ext.ImageIoDecode.jpegPixelStats($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)
    override protected def withNewChildInternal(c: Expression): JpegStatsExpr =
      copy(c)
  }

  case class JpegSynthExpr(first: Expression, second: Expression,
      third: Expression) extends TernaryExpression {
    override def dataType: DataType = BinaryType
    override protected def nullSafeEval(w: Any, h: Any, q: Any): Any =
      jpegBytes(w.asInstanceOf[Int], h.asInstanceOf[Int], q.asInstanceOf[Int])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (w, h, q) =>
        s"${ev.value} = graft.ext.ImageIoDecode.jpegBytes($w, $h, $q);")
    override protected def withNewChildrenInternal(a: Expression, b: Expression,
        c: Expression): JpegSynthExpr = copy(a, b, c)
  }

  def jpegStats(bytes: Column): Column =
    GraftSqlBridge.column(JpegStatsExpr(GraftSqlBridge.expression(bytes)))

  def synthJpeg(w: Column, h: Column, quality: Column): Column =
    GraftSqlBridge.column(JpegSynthExpr(GraftSqlBridge.expression(w),
      GraftSqlBridge.expression(h), GraftSqlBridge.expression(quality)))
}

/** ImageIO.read with the scanner disabled-dirs caches warm; kept in a
  * holder so executor-side class init stays cheap.
  *
  * setUseCache(false) is load-bearing: ImageIO's default stream cache
  * is FILE-backed — with it on, every per-row decode (and encode)
  * writes a temp file under java.io.tmpdir. In-memory payloads never
  * need it, and the temp-file churn both costs and varies with
  * filesystem pressure (observed as x36 swinging 2-4 s run-to-run). */
private[ext] object ImageIoHolder {
  javax.imageio.ImageIO.setUseCache(false)
  def read(b: Array[Byte]): java.awt.image.BufferedImage =
    javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
  /** Route encode-side stream creation here so the holder's
    * setUseCache init is guaranteed to have run first. */
  def outputStream(out: java.io.OutputStream): javax.imageio.stream.ImageOutputStream =
    javax.imageio.ImageIO.createImageOutputStream(out)
}
