package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** [EXT] Multimodal column support: media payloads as opaque `binary`
  * columns with a typed metadata struct.
  *
  * Image/audio/video METADATA is real ([[MediaProbe]]: PNG/JPEG/GIF,
  * WAV, MP4 header parses), and PNG pixel + WAV PCM sample decode is
  * real too ([[PixelDecode]]: Inflater + all five PNG unfilters,
  * 16-bit PCM stats) — all codegen'd scan-side expressions. The
  * functions below keep the mapPartitions CODEC shape for the formats
  * that genuinely need a native decoder (JPEG entropy decode, MP4
  * frame extraction — no codec libraries in this container): their
  * bodies are clearly-marked deterministic stubs, but the schema,
  * batch iteration and partition layout are what a real decoder plugs
  * into. Either way the 100 TB shape holds: decode work is
  * embarrassingly parallel and never shuffles.
  */
object Multimodal {

  val MediaMetaType: StructType = StructType(Seq(
    StructField("width", LongType),
    StructField("height", LongType),
    StructField("n_frames", LongType),
    StructField("media_type", StringType)))

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
