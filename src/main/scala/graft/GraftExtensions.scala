package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Expressions._
import graft.schema.AvroExpressions._

/** SQL surface for the engine's custom expressions.
  *
  * Two registration paths:
  *  - `spark.sql.extensions=graft.GraftExtensions` at session build
  *    (the production path — works on any cluster submit);
  *  - `GraftExtensions.register(spark)` on a live session (tests,
  *    notebooks).
  *
  * Functions: graft_simhash64(array<bigint>),
  * graft_minhash(array<bigint>, k), graft_ngram_hashes(array<bigint>, n),
  * graft_cosine(arr, arr), graft_avro_encode(struct, 'schemaJson'),
  * graft_avro_decode(bin, 'schemaJson'), graft_schema_id(bin),
  * graft_winnow(bin, k, w), graft_nfc(str),
  * graft_probe_media(bin) → struct(width, height, media_type),
  * graft_png_stats(bin) / graft_wav_stats(bin) / graft_gif_stats(bin),
  * graft_png_resize_stats(bin, tw, th) — nearest-neighbor resample
  * stats, graft_wav_decimate_stats(bin, stride) — stride-decimated
  * PCM sample stats,
  * graft_mp4_frame_stats(bin, stride) / graft_mp4_frames(bin, stride),
  * → full-decode statistics structs,
  * graft_probe_wav(bin) → struct(n_channels, sample_rate,
  * bits_per_sample, duration_ms, media_type),
  * and the text/quality stack: graft_ws_tokens(str),
  * graft_bpeish_tokens(str), graft_langid(str), graft_stop_hits(str),
  * graft_punct_count(str), graft_quality_gate(str) → struct(n_words,
  * mean_len, max_len, stop_hits, top_count, top_share, kept).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    GraftExtensions.descriptions.foreach(e.injectFunction)
}

object GraftExtensions {

  private def litString(e: Expression, what: String): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  private def litInt(e: Expression, what: String): Int = e match {
    case Literal(i: Integer, _) => i.intValue
    case Literal(i: java.lang.Long, _) => i.intValue
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def info(name: String) =
    new ExpressionInfo("graft.functions.Expressions", name)

  /** Lift a Column→Column combinator (the TextFunctions surface —
    * compositions of codegen'd builtins, not custom expressions) into
    * a SQL function builder: argument expression → classic Column →
    * combinator → back to the catalyst expression the registry needs.
    * The result is unresolved until the analyzer runs — exactly like
    * any builtin's builder output. */
  private def colFn1(f: org.apache.spark.sql.Column =>
      org.apache.spark.sql.Column)(es: Seq[Expression]): Expression =
    org.apache.spark.sql.GraftSqlBridge.catalystExpression(
      f(org.apache.spark.sql.GraftSqlBridge.column(es.head)))

  val descriptions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash64"), info("graft_simhash64"),
      (es: Seq[Expression]) => SimHash64Expr(es.head)),
    (FunctionIdentifier("graft_minhash"), info("graft_minhash"),
      (es: Seq[Expression]) =>
        MinHashSigExpr(es.head, litInt(es(1), "k"))),
    (FunctionIdentifier("graft_ngram_hashes"), info("graft_ngram_hashes"),
      (es: Seq[Expression]) =>
        NGramHashesExpr(es.head, litInt(es(1), "n"))),
    (FunctionIdentifier("graft_cosine"), info("graft_cosine"),
      (es: Seq[Expression]) => CosineSimExpr(es.head, es(1))),
    (FunctionIdentifier("graft_avro_encode"), info("graft_avro_encode"),
      (es: Seq[Expression]) =>
        AvroEncodeExpr(es.head, litString(es(1), "schemaJson"))),
    (FunctionIdentifier("graft_avro_decode"), info("graft_avro_decode"),
      (es: Seq[Expression]) =>
        AvroDecodeExpr(es.head, litString(es(1), "schemaJson"))),
    (FunctionIdentifier("graft_schema_id"), info("graft_schema_id"),
      (es: Seq[Expression]) => ReadInt32BE(es.head, offset = 1)),
    (FunctionIdentifier("graft_winnow"), info("graft_winnow"),
      (es: Seq[Expression]) => WinnowFingerprintExpr(es.head,
        litInt(es(1), "k"), litInt(es(2), "w"))),
    (FunctionIdentifier("graft_nfc"), info("graft_nfc"),
      (es: Seq[Expression]) => NormalizeNfcExpr(es.head)),
    (FunctionIdentifier("graft_probe_media"), info("graft_probe_media"),
      (es: Seq[Expression]) => graft.ext.MediaProbe.ProbeMediaExpr(es.head)),
    (FunctionIdentifier("graft_probe_wav"), info("graft_probe_wav"),
      (es: Seq[Expression]) => graft.ext.MediaProbe.ProbeAudioExpr(es.head)),
    (FunctionIdentifier("graft_probe_mp4"), info("graft_probe_mp4"),
      (es: Seq[Expression]) => graft.ext.MediaProbe.ProbeVideoExpr(es.head)),
    (FunctionIdentifier("graft_png_stats"), info("graft_png_stats"),
      (es: Seq[Expression]) => graft.ext.PixelDecode.PngStatsExpr(es.head)),
    (FunctionIdentifier("graft_png_resize_stats"),
      info("graft_png_resize_stats"),
      (es: Seq[Expression]) => graft.ext.PixelDecode.PngResizeStatsExpr(
        es.head, litInt(es(1), "tw"), litInt(es(2), "th"))),
    (FunctionIdentifier("graft_wav_stats"), info("graft_wav_stats"),
      (es: Seq[Expression]) => graft.ext.PixelDecode.WavStatsExpr(es.head)),
    (FunctionIdentifier("graft_wav_decimate_stats"),
      info("graft_wav_decimate_stats"),
      (es: Seq[Expression]) => graft.ext.PixelDecode.WavDecimateStatsExpr(
        es.head, litInt(es(1), "stride"))),
    (FunctionIdentifier("graft_gif_stats"), info("graft_gif_stats"),
      (es: Seq[Expression]) => graft.ext.GifDecode.GifStatsExpr(es.head)),
    (FunctionIdentifier("graft_jpeg_stats"), info("graft_jpeg_stats"),
      (es: Seq[Expression]) => graft.ext.ImageIoDecode.JpegStatsExpr(es.head)),
    (FunctionIdentifier("graft_mp4_frame_stats"), info("graft_mp4_frame_stats"),
      (es: Seq[Expression]) => graft.ext.Mp4Demux.Mp4FrameStatsExpr(es.head, es(1))),
    (FunctionIdentifier("graft_mp4_frames"), info("graft_mp4_frames"),
      (es: Seq[Expression]) => graft.ext.Mp4Demux.Mp4SampleFramesExpr(es.head, es(1))),
    // text/quality stack (Column-combinator lifts — BI/SQL users get
    // the same curation primitives the DataFrame API exposes)
    (FunctionIdentifier("graft_ws_tokens"), info("graft_ws_tokens"),
      colFn1(graft.functions.TextFunctions.wsTokenCount) _),
    (FunctionIdentifier("graft_bpeish_tokens"), info("graft_bpeish_tokens"),
      colFn1(graft.functions.TextFunctions.bpeishTokenCount) _),
    (FunctionIdentifier("graft_langid"), info("graft_langid"),
      colFn1(graft.functions.TextFunctions.langId) _),
    (FunctionIdentifier("graft_stop_hits"), info("graft_stop_hits"),
      colFn1(c => graft.functions.TextFunctions.stopwordHits(c,
        graft.functions.TextFunctions.StopwordLists.head._2)) _),
    (FunctionIdentifier("graft_punct_count"), info("graft_punct_count"),
      colFn1(graft.functions.TextFunctions.punctCount) _),
    (FunctionIdentifier("graft_quality_gate"), info("graft_quality_gate"),
      colFn1(c => graft.functions.TextFunctions.qualityGate(c,
        graft.functions.TextFunctions.StopwordLists.head._2)) _),
  )

  /** Register on a live session (temp functions). */
  def register(spark: SparkSession): Unit =
    descriptions.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(id.funcName, builder, "built-in")
    }
}
