package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal column support: media payloads as opaque `binary`
  * columns with a typed metadata struct.
  *
  * Image/audio/video METADATA is real ([[MediaProbe]]: PNG/JPEG/GIF,
  * WAV, MP4 header parses), and full PIXEL/SAMPLE decode is real for
  * three formats ([[PixelDecode]]: PNG Inflater + all five unfilters,
  * 16-bit PCM stats; [[GifDecode]]: spec-complete LZW) — all codegen'd
  * scan-side expressions. [[decodeStats]] below is the REAL
  * heterogeneous-column decoder: it sniffs each blob's magic and runs
  * the matching full decoder, so one binary column can mix PNG, GIF
  * and WAV payloads — the shape a real multimodal corpus has.
  *
  * Only the formats that genuinely need a native decoder (JPEG entropy
  * decode, MP4 frame extraction — no codec libraries in this
  * container) remain on the clearly-marked stub path
  * ([[decodeMetaStub]]/[[decodeMetaPartitions]]): their schema, batch
  * iteration and partition layout are what a real codec plugs into.
  * Either way the 100 TB shape holds: decode work is embarrassingly
  * parallel and never shuffles.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("media_type", StringType)))

  /** Unified stats row for the real dispatching decoder: image fields
    * null for audio, `sum_sq` null for images, everything null (struct
    * itself null) for undecodable bytes. */
  val DecodedStatsType: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_samples", LongType),
    StructField("sum_val", LongType),
    StructField("sum_sq", LongType),
    StructField("min_val", IntegerType),
    StructField("max_val", IntegerType)))

  /** REAL dispatching full decode: magic-sniff each blob and run the
    * matching decoder (PNG / GIF / WAV); null for formats without a
    * pure-JVM decoder (JPEG/MP4 → stub path) or corrupt payloads. The
    * CaseWhen evaluates branches lazily, and each decoder rejects
    * foreign magic in O(1), so a blob pays only its own format's
    * decode cost. */
  def decodeStats(bytes: Column): Column = {
    val png = PixelDecode.pngStats(bytes)
    val gif = GifDecode.gifStats(bytes)
    val wav = PixelDecode.wavStats(bytes)
    val jpg = ImageIoDecode.jpegStats(bytes)
    val nullL = lit(null).cast("long")
    val pngRow = struct(
      lit("image/png").as("media_type"),
      png.getField("width").as("width"),
      png.getField("height").as("height"),
      png.getField("n_samples").as("n_samples"),
      png.getField("sum_val").as("sum_val"),
      nullL.as("sum_sq"),
      png.getField("min_val").as("min_val"),
      png.getField("max_val").as("max_val"))
    val gifRow = struct(
      lit("image/gif").as("media_type"),
      gif.getField("width").as("width"),
      gif.getField("height").as("height"),
      gif.getField("n_samples").as("n_samples"),
      gif.getField("sum_val").as("sum_val"),
      nullL.as("sum_sq"),
      gif.getField("min_val").as("min_val"),
      gif.getField("max_val").as("max_val"))
    val wavRow = struct(
      lit("audio/wav").as("media_type"),
      nullL.as("width"),
      nullL.as("height"),
      wav.getField("n_samples").as("n_samples"),
      wav.getField("sum_val").as("sum_val"),
      wav.getField("sum_sq").as("sum_sq"),
      wav.getField("min_val").as("min_val"),
      wav.getField("max_val").as("max_val"))
    val jpgRow = struct(
      lit("image/jpeg").as("media_type"),
      jpg.getField("width").as("width"),
      jpg.getField("height").as("height"),
      jpg.getField("n_samples").as("n_samples"),
      jpg.getField("sum_val").as("sum_val"),
      nullL.as("sum_sq"),
      jpg.getField("min_val").as("min_val"),
      jpg.getField("max_val").as("max_val"))
    when(png.isNotNull, pngRow)
      .when(gif.isNotNull, gifRow)
      .when(wav.isNotNull, wavRow)
      .when(jpg.isNotNull, jpgRow)
  }

  /** The same real dispatch in mapPartitions form (per-partition codec
    * context shape); appends column `st: DecodedStatsType`. */
  def decodeStatsPartitions(df: DataFrame,
      bytesCol: String = "media_bytes"): DataFrame = {
    val schema = StructType(df.schema.fields :+
      StructField("st", DecodedStatsType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    val idx = df.schema.fieldIndex(bytesCol)
    df.mapPartitions { rows =>
      rows.map { r =>
        val b = r.getAs[Array[Byte]](idx)
        val st: Row =
          if (b == null || b.length < 4) null
          else if (b(0) == 0x89.toByte && b(1) == 'P') {
            val s = PixelDecode.pngPixelStats(b)
            if (s == null) null
            else Row("image/png", s.getLong(0), s.getLong(1), s.getLong(3),
              s.getLong(4), null, s.getInt(5), s.getInt(6))
          } else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
            val s = GifDecode.gifPixelStats(b)
            if (s == null) null
            else Row("image/gif", s.getLong(0), s.getLong(1), s.getLong(2),
              s.getLong(3), null, s.getInt(4), s.getInt(5))
          } else if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F') {
            val s = PixelDecode.wavSampleStats(b)
            if (s == null) null
            else Row("audio/wav", null, null, s.getLong(2), s.getLong(3),
              s.getLong(4), s.getInt(5), s.getInt(6))
          } else if ((b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
            val s = ImageIoDecode.jpegPixelStats(b)
            if (s == null) null
            else Row("image/jpeg", s.getLong(0), s.getLong(1), s.getLong(2),
              s.getLong(3), null, s.getInt(4), s.getInt(5))
          } else null
        Row.fromSeq(r.toSeq :+ st)
      }
    }(enc)
  }

  /** Wrap a string column as a fake media payload: binary bytes +
    * declared media type. Stands in for reading real image/audio blobs
    * (which at scale arrive via parquet binary columns already). */
  def asMedia(df: DataFrame, srcCol: String, mediaType: String): DataFrame =
    df.withColumn("media_bytes", col(srcCol).cast("binary"))
      .withColumn("media_type", lit(mediaType))

  /** STUB decode, expression form: deterministic metadata derived from
    * payload length only. Replace with a real probe at deployment. The
    * expression form keeps the stub inside codegen so pipelines built on
    * it have production plan shape. */
  def decodeMetaStub(bytes: Column, mediaType: Column): Column =
    struct(
      (length(bytes) % 640).cast("long").as("width"),
      ((length(bytes) * 7) % 480).cast("long").as("height"),
      (floor(length(bytes) / 50) + 1).cast("long").as("n_frames"),
      mediaType.as("media_type"))

  /** STUB decode, mapPartitions form — the shape a real codec plugs
    * into: per-partition init (codec context), row-batch iteration.
    * Deterministic fake identical to [[decodeMetaStub]]. */
  def decodeMetaPartitions(df: DataFrame): DataFrame = {
    val schema = StructType(df.schema.fields :+ StructField("meta", MediaMetaType))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    df.mapPartitions { rows =>
      // real impl: val codec = Codec.open() — once per partition
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("media_bytes")
        val mt = r.getAs[String]("media_type")
        val n = if (bytes == null) 0L else bytes.length.toLong
        Row.fromSeq(r.toSeq :+ Row(n % 640, (n * 7) % 480, n / 50 + 1, mt))
      }
    }(enc)
  }

  /** Frame sampling stub: every `stride`-th byte window as a "frame".
    * Real impl: keyframe extraction inside the same expression shape. */
  def sampleFrames(bytes: Column, stride: Int, frameLen: Int): Column =
    when(length(bytes) >= stride,
      transform(
        sequence(lit(1), (length(bytes) / stride).cast("int")),
        i => call_function("substring", bytes,
          (i - lit(1)) * lit(stride) + lit(1), lit(frameLen))))
      .otherwise(array().cast("array<binary>"))
}
