package graft

import org.scalatest.funsuite.AnyFunSuite

import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, Literal}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.unsafe.types.UTF8String

import graft.ext.{GifDecode, ImageIoDecode, Mp4Demux, PixelDecode, WebpDecode}
import graft.schema._
import graft.schema.ProtoWire._

/** Round-16 fuzz campaign over every hand-rolled binary decoder — the
  * one place real bugs kept surfacing through r15 (MP4 co64 Long
  * overflow, pqAdc LUT bounds, cosine dimension mismatch). A seeded
  * structure-aware mutator (bit flips, length-field corruption,
  * truncation, splices, dimension lies, varint bombs) drives ≥1M
  * mutated inputs across PNG/WAV/GIF/WebP/JPEG/MP4/proto/Avro and
  * asserts the honesty contract (r11): media decoders return null or
  * a value and NEVER throw; schema codecs may fail LOUDLY with any
  * NonFatal (the lenient path quarantines those) but never mint a
  * VM-level Error (OOM from trusting a declared length, SOE from
  * unbounded recursion).
  *
  * Determinism: SplitMix64 streams from the committed base seeds
  * below; a reported failure names (family, base seed, iteration) and
  * replays exactly. Iteration counts multiply via GRAFT_FUZZ_SCALE
  * (default 1 — the committed counts sum to >1M calls).
  */
object DecoderFuzz {

  /** SplitMix64 — deterministic, fast, good diffusion. */
  final class Rng(private var s: Long) {
    def nextLong(): Long = {
      s += 0x9E3779B97F4A7C15L
      var z = s
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }
    def nextInt(bound: Int): Int =
      if (bound <= 0) 0 else math.floorMod(nextLong(), bound.toLong).toInt
    def nextByte(): Byte = (nextLong() & 0xff).toByte
  }

  /** Poison values a length/dimension-field mutation writes: zero,
    * one, sign boundaries, off-by-one-from-Int.Max — the values that
    * historically slip past naive bounds math. */
  private val PoisonU32 = Array(0L, 1L, 0x7fffffffL, 0xffffffffL,
    0x80000000L, 0x10000L, 0xfffffffeL, 64L, 0x40000000L, 0x7ffffffeL)

  /** One structure-aware mutation of `seed` — always a fresh array.
    * `hot` offsets point at known length/dimension fields so the
    * u32-lie and boundary-truncation mutations hit structure, not
    * just noise. */
  def mutate(seed: Array[Byte], hot: Array[Int], rng: Rng): Array[Byte] = {
    rng.nextInt(13) match {
      case 0 => // single bit flip
        val b = seed.clone()
        if (b.nonEmpty) {
          val i = rng.nextInt(b.length)
          b(i) = (b(i) ^ (1 << rng.nextInt(8))).toByte
        }
        b
      case 1 => // bit-flip burst
        val b = seed.clone()
        var k = 2 + rng.nextInt(15)
        while (k > 0 && b.nonEmpty) {
          val i = rng.nextInt(b.length)
          b(i) = (b(i) ^ (1 << rng.nextInt(8))).toByte
          k -= 1
        }
        b
      case 2 => // random byte span overwrite
        val b = seed.clone()
        if (b.nonEmpty) {
          val at = rng.nextInt(b.length)
          val len = math.min(1 + rng.nextInt(8), b.length - at)
          var i = 0
          while (i < len) { b(at + i) = rng.nextByte(); i += 1 }
        }
        b
      case 3 => // truncate anywhere
        java.util.Arrays.copyOf(seed, rng.nextInt(seed.length + 1))
      case 4 => // extend with random tail
        val extra = 1 + rng.nextInt(64)
        val b = java.util.Arrays.copyOf(seed, seed.length + extra)
        var i = seed.length
        while (i < b.length) { b(i) = rng.nextByte(); i += 1 }
        b
      case k @ (5 | 6) => // u32 length/dimension lie (5=BE, 6=LE)
        val b = seed.clone()
        val at =
          if (hot.nonEmpty && rng.nextInt(2) == 0) hot(rng.nextInt(hot.length))
          else rng.nextInt(math.max(1, b.length - 3))
        if (at >= 0 && at + 4 <= b.length) {
          val v =
            if (rng.nextInt(4) == 0) rng.nextLong() & 0xffffffffL
            else PoisonU32(rng.nextInt(PoisonU32.length))
          if (k == 5) {
            b(at) = ((v >>> 24) & 0xff).toByte
            b(at + 1) = ((v >>> 16) & 0xff).toByte
            b(at + 2) = ((v >>> 8) & 0xff).toByte
            b(at + 3) = (v & 0xff).toByte
          } else {
            b(at) = (v & 0xff).toByte
            b(at + 1) = ((v >>> 8) & 0xff).toByte
            b(at + 2) = ((v >>> 16) & 0xff).toByte
            b(at + 3) = ((v >>> 24) & 0xff).toByte
          }
        }
        b
      case 7 => // zero / 0xFF fill span
        val b = seed.clone()
        if (b.nonEmpty) {
          val at = rng.nextInt(b.length)
          val len = math.min(1 + rng.nextInt(32), b.length - at)
          val fill: Byte = if (rng.nextInt(2) == 0) 0 else -1
          java.util.Arrays.fill(b, at, at + len, fill)
        }
        b
      case 8 => // splice one range over another
        val b = seed.clone()
        if (b.length >= 2) {
          val len = 1 + rng.nextInt(math.min(32, b.length - 1))
          val src = rng.nextInt(b.length - len + 1)
          val dst = rng.nextInt(b.length - len + 1)
          System.arraycopy(seed, src, b, dst, len)
        }
        b
      case 9 => // varint bomb: run of continuation bytes
        val b = seed.clone()
        if (b.nonEmpty) {
          val at = rng.nextInt(b.length)
          val len = math.min(1 + rng.nextInt(10), b.length - at)
          java.util.Arrays.fill(b, at, at + len, 0xff.toByte)
        }
        b
      case 10 => // tiny or empty input
        val n = rng.nextInt(5)
        val b = new Array[Byte](n)
        var i = 0
        while (i < n) { b(i) = rng.nextByte(); i += 1 }
        b
      case 11 => // truncate at a hot boundary ± jitter
        val cut =
          if (hot.nonEmpty)
            math.max(0, math.min(seed.length,
              hot(rng.nextInt(hot.length)) + rng.nextInt(9) - 4))
          else rng.nextInt(seed.length + 1)
        java.util.Arrays.copyOf(seed, cut)
      case _ => // double mutation: compose two simpler ones
        mutate(mutate(seed, hot, rng), hot, rng)
    }
  }

  def hex(b: Array[Byte], max: Int = 96): String = {
    val shown = b.take(max).map(x => f"${x & 0xff}%02x").mkString(" ")
    if (b.length > max) s"$shown …(+${b.length - max}B)" else shown
  }

  /** Offsets of every box length field in an MP4, to depth 3 — the
    * structure-aware hot list computed from the valid seed itself. */
  def mp4BoxOffsets(b: Array[Byte]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    def walk(from: Int, to: Int, depth: Int): Unit = {
      var at = from
      while (at + 8 <= to) {
        out += at
        val len = ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
          ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
        if (len < 8 || at + len > to) return
        val typ = new String(b, at + 4, 4, "US-ASCII")
        if (depth < 3 && Set("moov", "trak", "mdia", "minf", "stbl")(typ))
          walk(at + 8, (at + len).toInt, depth + 1)
        at += len.toInt
      }
    }
    walk(0, b.length, 0)
    out.toArray
  }

  /** Offsets of every chunk length field in a PNG. */
  def pngChunkOffsets(b: Array[Byte]): Array[Int] = {
    val out = scala.collection.mutable.ArrayBuffer[Int]()
    var at = 8
    while (at + 8 <= b.length) {
      out += at
      val len = ((b(at) & 0xffL) << 24) | ((b(at + 1) & 0xffL) << 16) |
        ((b(at + 2) & 0xffL) << 8) | (b(at + 3) & 0xffL)
      if (at + 12 + len > b.length) return out.toArray
      at += 12 + len.toInt
    }
    out.toArray
  }
}

class FuzzDecodersSpec extends AnyFunSuite {
  import DecoderFuzz._

  // committed base seeds — one stream per family, replayable
  private val Scale = sys.env.get("GRAFT_FUZZ_SCALE").map(_.toInt).getOrElse(1)
  private def n(base: Int): Int = base * Scale

  /** Media contract: null or value, NEVER a throw. Also asserts the
    * campaign is LIVE — some mutants decode fully and some reject —
    * so a future regression that nulls everything (or a mutator bug
    * that stops corrupting) fails here instead of silently shrinking
    * coverage. */
  private def fuzzNoThrow(family: String, baseSeed: Long, iters: Int,
      seeds: Seq[Array[Byte]], hot: Array[Int])(
      call: (Array[Byte], Int) => Any): Unit = {
    val rng = new Rng(baseSeed)
    var decoded = 0L
    var rejected = 0L
    var i = 0
    while (i < iters) {
      val m = mutate(seeds(i % seeds.length), hot, rng)
      val r =
        try call(m, i)
        catch {
          case e: Throwable =>
            fail(s"$family: iteration $i (baseSeed=0x${baseSeed.toHexString}) " +
              s"threw ${e.getClass.getName}: ${e.getMessage}\n" +
              s"input[${m.length}] = ${hex(m)}", e)
        }
      if (r == null) rejected += 1 else decoded += 1
      i += 1
    }
    assert(decoded > 0, s"$family: no mutant ever decoded — dead campaign")
    assert(rejected > 0, s"$family: no mutant ever rejected — dead mutator")
  }

  /** Codec contract: NonFatal throws are the documented loud path
    * (lenient decode quarantines them); VM Errors are findings. Same
    * liveness assertion as [[fuzzNoThrow]]. */
  private def fuzzLoudOk(family: String, baseSeed: Long, iters: Int,
      seeds: Seq[Array[Byte]], hot: Array[Int])(
      call: (Array[Byte], Int) => Any): Unit = {
    val rng = new Rng(baseSeed)
    var decoded = 0L
    var rejected = 0L
    var i = 0
    while (i < iters) {
      val m = mutate(seeds(i % seeds.length), hot, rng)
      try { call(m, i); decoded += 1 }
      catch {
        case e: Throwable if scala.util.control.NonFatal(e) => rejected += 1
        case e: Throwable =>
          fail(s"$family: iteration $i (baseSeed=0x${baseSeed.toHexString}) " +
            s"threw FATAL ${e.getClass.getName}: ${e.getMessage}\n" +
            s"input[${m.length}] = ${hex(m)}", e)
      }
      i += 1
    }
    assert(decoded > 0, s"$family: no mutant ever decoded — dead campaign")
    assert(rejected > 0, s"$family: no mutant ever rejected — dead mutator")
  }

  test("fuzz: PNG decode family (stats, resize, dHash)") {
    val seeds = Seq(
      PixelDecode.pngTextureBytes(72, 64, 11),
      PixelDecode.pngCellBytes(5),
      PixelDecode.pngPixelBytes(9, 7, 3))
    // IHDR dims/flags plus every chunk length field of the main seed
    val hot = Array(8, 16, 20, 24, 25, 26, 27, 28) ++
      pngChunkOffsets(seeds.head)
    fuzzNoThrow("png", 0x16DEC0DE01L, n(180000), seeds, hot) { (m, i) =>
      (i % 3: @unchecked) match {
        case 0 => PixelDecode.pngPixelStats(m)
        case 1 => PixelDecode.pngResizeNearestStats(m, 8, 5)
        case 2 => PixelDecode.pngDHash64(m)
      }
    }
  }

  test("fuzz: WAV decode family (stats, decimate, fingerprints, resample)") {
    val seeds = Seq(
      PixelDecode.wavToneBytes(2, 16000, 400, 7),
      PixelDecode.wavToneBytes(1, 8000, 100, 3))
    val hot = Array(4, 16, 20, 22, 24, 28, 32, 34, 40)
    fuzzNoThrow("wav", 0x16DEC0DE02L, n(180000), seeds, hot) { (m, i) =>
      (i % 5: @unchecked) match {
        case 0 => PixelDecode.wavSampleStats(m)
        case 1 => PixelDecode.wavDecimateStats(m, 3)
        case 2 => PixelDecode.wavFingerprint64(m)
        case 3 => PixelDecode.wavFingerprintAt64(m, 8000)
        case 4 => PixelDecode.wavResampleBytes(m, 2)
      }
    }
  }

  test("fuzz: GIF decode family (stats, dHash)") {
    val seeds = Seq(GifDecode.gifPixelBytes(40, 30, 5), GifDecode.gifCellBytes(3))
    val hot = Array(6, 8, 10) // LSD width/height u16le, flags
    fuzzNoThrow("gif", 0x16DEC0DE03L, n(150000), seeds, hot) { (m, i) =>
      (i % 2: @unchecked) match {
        case 0 => GifDecode.gifPixelStats(m)
        case 1 => GifDecode.gifDHash64(m)
      }
    }
  }

  test("fuzz: WebP VP8L decode family (stats, dHash)") {
    val seeds = Seq(WebpDecode.webpGrayBytes(40, 30, 7), WebpDecode.webpCellBytes(4))
    // RIFF size, VP8L chunk size, signature, packed 14-bit dims
    val hot = Array(4, 16, 20, 21, 22, 23, 24)
    fuzzNoThrow("webp", 0x16DEC0DE04L, n(150000), seeds, hot) { (m, i) =>
      (i % 2: @unchecked) match {
        case 0 => WebpDecode.webpPixelStats(m)
        case 1 => WebpDecode.webpDHash64(m)
      }
    }
  }

  test("fuzz: JPEG decode family via bounded ImageIO (stats, dHash)") {
    val seeds = Seq(
      ImageIoDecode.jpegBytes(24, 16, 80),
      ImageIoDecode.jpegCellBytes(3, 85))
    // SOF dims live at marker-dependent offsets; SOI+APP0 header is
    // fixed, so hit the first 32 bytes plus random elsewhere
    val hot = (2 until 32 by 2).toArray
    fuzzNoThrow("jpeg", 0x16DEC0DE05L, n(40000), seeds, hot) { (m, i) =>
      (i % 2: @unchecked) match {
        case 0 => ImageIoDecode.jpegPixelStats(m)
        case 1 => ImageIoDecode.jpegDHash64(m)
      }
    }
  }

  test("fuzz: EXIF probe (JPEG segment walk + TIFF IFD, both orders)") {
    // EXIF sat OUTSIDE the original round-16 fuzz net, and a review
    // pass found exactly the class this campaign exists for: unsigned
    // 32-bit IFD/value offsets narrowed via .toInt before the bounds
    // check could go negative (or overflow off+len) and THROW out of
    // the String/array reads. Hot offsets target the APP1 length, the
    // TIFF IFD offset, and each entry's count/value-offset words.
    val seeds = Seq(
      graft.ext.ExifProbe.exifJpegBytes(6, 3, 12, 34),
      graft.ext.ExifProbe.exifJpegBytes(1, 250, 59, 1))
    val hot = Array(4, 16, 20, 26, 30, 38, 42, 50, 54)
    fuzzNoThrow("exif", 0x16DEC0DE0BL, n(120000), seeds, hot) { (m, _) =>
      graft.ext.ExifProbe.parseExif(m)
    }
  }

  test("pin: EXIF unsigned-offset lies return null, never throw") {
    // the exact review finding: IFD / value offsets are unsigned
    // 32-bit; .toInt-narrowed values ≥ 2^31 went negative (or made
    // off+len overflow int) PAST the old `> end` guard and threw out
    // of the String/array reads. Layout of exifJpegBytes: TIFF@12,
    // IFD-offset word @16, Make value-offset word @30.
    def withU32LE(at: Int, v: Long): Array[Byte] = {
      val b = graft.ext.ExifProbe.exifJpegBytes(6, 3, 12, 34)
      b(at) = (v & 0xff).toByte
      b(at + 1) = ((v >> 8) & 0xff).toByte
      b(at + 2) = ((v >> 16) & 0xff).toByte
      b(at + 3) = ((v >> 24) & 0xff).toByte
      b
    }
    for (v <- Seq(0xffffffffL, 0x80000000L, 0x7ffffffeL, 0L);
         at <- Seq(16, 30)) {
      val r = graft.ext.ExifProbe.parseExif(withU32LE(at, v))
      // value may legitimately be a row (a lied Make offset only nulls
      // that FIELD); the contract under attack is never-throw
      assert(r == null || r.numFields == 3,
        s"offset lie v=0x${v.toHexString} at=$at")
    }
    // sane frame still parses fully
    val ok = graft.ext.ExifProbe.parseExif(
      graft.ext.ExifProbe.exifJpegBytes(6, 3, 12, 34))
    assert(ok != null && ok.getInt(0) == 6)
  }

  test("fuzz: MP4 demux family (stats, sums, fingerprint, frames)") {
    val seeds = Seq(
      Mp4Demux.mp4FramesBytes(8, 6, 10, 3),
      Mp4Demux.mp4NoiseFramesBytes(6, 4, 5, 9))
    val hot = mp4BoxOffsets(seeds.head)
    fuzzNoThrow("mp4", 0x16DEC0DE06L, n(150000), seeds, hot) { (m, i) =>
      (i % 4: @unchecked) match {
        case 0 => Mp4Demux.mp4FrameStats(m, 2)
        case 1 => Mp4Demux.mp4FrameSums(m)
        case 2 => Mp4Demux.mp4Fingerprint64(m)
        case 3 => Mp4Demux.mp4SampleFrames(m, 3)
      }
    }
  }

  // ---- proto3 wire ------------------------------------------------------

  private val protoInner = ProtoMessage("Inner", Seq(
    ProtoField("a", 1, PInt32), ProtoField("s", 2, PString)))
  private val protoNested = ProtoMessage("Outer", Seq(
    ProtoField("c", 1, PMessage(protoInner)),
    ProtoField("r", 2, PMessage(protoInner), repeated = true),
    ProtoField("tail", 3, PBytes)))
  private val protoSink = ProtoMessage("Sink", Seq(
    ProtoField("i32", 1, PInt32), ProtoField("i64", 2, PInt64),
    ProtoField("si32", 3, PSInt32), ProtoField("si64", 4, PSInt64),
    ProtoField("u32", 5, PUInt32), ProtoField("u64", 6, PUInt64),
    ProtoField("f32", 7, PFixed32), ProtoField("f64", 8, PFixed64),
    ProtoField("sf32", 9, PSFixed32), ProtoField("sf64", 10, PSFixed64),
    ProtoField("b", 11, PBool), ProtoField("fl", 12, PFloat),
    ProtoField("db", 13, PDouble), ProtoField("s", 14, PString),
    ProtoField("by", 15, PBytes),
    ProtoField("tags", 16, PString, repeated = true),
    ProtoField("nums", 17, PSInt64, repeated = true)))

  private def protoSinkSeed: Array[Byte] = ProtoWire.encode(
    new GenericInternalRow(Array[Any](
      150, 42L, -7, -99L, 3, 9L, 77, 88L, -5, -6L,
      true, 1.5f, 2.25, UTF8String.fromString("hello fuzz"),
      Array[Byte](1, 2, 3, 4, 5),
      new GenericArrayData(Array[Any](
        UTF8String.fromString("a"), UTF8String.fromString("bb"))),
      new GenericArrayData(Array[Any](3L, -270L, 86942L)))), protoSink)

  private def protoNestedSeed: Array[Byte] = ProtoWire.encode(
    new GenericInternalRow(Array[Any](
      new GenericInternalRow(Array[Any](150, UTF8String.fromString("in"))),
      new GenericArrayData(Array[Any](
        new GenericInternalRow(Array[Any](1, UTF8String.fromString("x"))),
        new GenericInternalRow(Array[Any](2, UTF8String.fromString("yy"))))),
      Array[Byte](9, 8, 7))), protoNested)

  test("fuzz: proto3 wire decode (kitchen-sink + nested, cross-schema)") {
    val seeds = Seq(protoSinkSeed, protoNestedSeed)
    fuzzLoudOk("proto", 0x16DEC0DE07L, n(150000), seeds, Array.empty) {
      (m, i) =>
        // decode against BOTH schemas regardless of source seed:
        // cross-schema garbage is exactly what a misconfigured topic
        // feeds the decoder
        val msg = if (i % 2 == 0) protoSink else protoNested
        ProtoWire.decode(m, msg)
    }
  }

  // ---- Avro codecs ------------------------------------------------------

  private val avroSchemaJson =
    """{"type":"record","name":"F","fields":[
      | {"name":"id","type":"long"},
      | {"name":"name","type":"string"},
      | {"name":"payload","type":"bytes"},
      | {"name":"tags","type":{"type":"array","items":"string"}},
      | {"name":"score","type":"double"},
      | {"name":"opt","type":["null","long"],"default":null}]}"""
      .stripMargin
  private val avroWriter2Json =
    """{"type":"record","name":"F","fields":[
      | {"name":"id","type":"long"},
      | {"name":"name","type":"string"},
      | {"name":"payload","type":"bytes"},
      | {"name":"tags","type":{"type":"array","items":"string"}},
      | {"name":"score","type":"double"},
      | {"name":"opt","type":["null","long"],"default":null},
      | {"name":"extra","type":"string","default":"x"}]}"""
      .stripMargin

  private def avroRow = new GenericInternalRow(Array[Any](
    1234L, UTF8String.fromString("fuzz target name"),
    Array[Byte](1, 2, 3, 4, 5, 6, 7, 8),
    new GenericArrayData(Array[Any](
      UTF8String.fromString("alpha"), UTF8String.fromString("beta"))),
    3.5, 77L))

  private def avroStruct = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("id",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("name",
      org.apache.spark.sql.types.StringType),
    org.apache.spark.sql.types.StructField("payload", BinaryType),
    org.apache.spark.sql.types.StructField("tags",
      org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.StringType)),
    org.apache.spark.sql.types.StructField("score",
      org.apache.spark.sql.types.DoubleType),
    org.apache.spark.sql.types.StructField("opt",
      org.apache.spark.sql.types.LongType)))

  test("fuzz: Avro binary, registry frame, and OCF decodes") {
    val enc = AvroExpressions.AvroEncodeExpr(
      Literal.default(avroStruct), avroSchemaJson)
    val plain = enc.encodeRow(avroRow)
    val framed = {
      val b = new Array[Byte](plain.length + 5)
      b(0) = 0; b(1) = 0; b(2) = 0; b(3) = 0; b(4) = 7
      System.arraycopy(plain, 0, b, 5, plain.length)
      b
    }
    val ocf = AvroExpressions.AvroDataFileEncodeExpr(
      Literal.default(avroStruct), avroSchemaJson).encodeRow(avroRow)

    val plainDec = AvroExpressions.AvroDecodeExpr(
      Literal(null, BinaryType), avroSchemaJson)
    val regDec = AvroExpressions.AvroResolvingDecodeExpr(
      Literal(null, BinaryType), avroSchemaJson,
      Map(7 -> avroSchemaJson, 8 -> avroWriter2Json))
    val ocfDec = AvroExpressions.AvroDataFileDecodeExpr(
      Literal(null, BinaryType), avroSchemaJson)

    fuzzLoudOk("avro-plain", 0x16DEC0DE08L, n(40000), Seq(plain),
      Array.empty)((m, _) => plainDec.decodeRow(m))
    fuzzLoudOk("avro-registry", 0x16DEC0DE09L, n(40000), Seq(framed),
      Array(0, 1))((m, _) => regDec.decodeRow(m))
    fuzzLoudOk("avro-ocf", 0x16DEC0DE0AL, n(40000), Seq(ocf),
      Array.empty)((m, _) => ocfDec.decodeRow(m))
  }

  // ---- targeted allocation-bomb pins (the shapes the campaign found) ----

  test("pin: Avro binary decode rejects a 1 GiB declared string without allocating it") {
    // 1 GiB zigzag varint + 3 bytes of data: before the round-16
    // limit properties this OOM'd at -Xmx1g in ~30 ms
    val len = 1L << 30
    var v = (len << 1) ^ (len >> 63)
    val out = scala.collection.mutable.ArrayBuffer[Byte]()
    while ((v & ~0x7fL) != 0) { out += ((v & 0x7f) | 0x80).toByte; v >>>= 7 }
    out += v.toByte
    val poison = out.toArray ++ Array[Byte](1, 2, 3)
    val dec = AvroExpressions.AvroDecodeExpr(Literal(null, BinaryType),
      """{"type":"record","name":"R","fields":[{"name":"s","type":"string"}]}""")
    val t0 = System.nanoTime()
    val e = intercept[Exception] { dec.decodeRow(poison) }
    val ms = (System.nanoTime() - t0) / 1e6
    assert(e.getClass.getName.contains("SystemLimitException"), e.toString)
    assert(ms < 1000, s"took ${ms}ms — allocated before checking?")
  }

  test("pin: OCF decode rejects a block-size lie without allocating it") {
    val ocf = AvroExpressions.AvroDataFileEncodeExpr(
      Literal.default(avroStruct), avroSchemaJson).encodeRow(avroRow)
    val dec = AvroExpressions.AvroDataFileDecodeExpr(
      Literal(null, BinaryType), avroSchemaJson)
    assert(dec.decodeRow(ocf) != null) // the valid frame decodes
    // corrupt every plausible block-size varint position after the
    // header sync: each must fail loudly, never allocate 2 GiB
    var at = ocf.length - 40
    while (at < ocf.length - 10) {
      val bad = ocf.clone()
      bad(at) = 0xfe.toByte; bad(at + 1) = 0xff.toByte
      bad(at + 2) = 0xff.toByte; bad(at + 3) = 0xff.toByte
      bad(at + 4) = 0x0f.toByte
      try { dec.decodeRow(bad); () } catch {
        case e: Throwable =>
          assert(scala.util.control.NonFatal(e),
            s"at=$at threw fatal ${e.getClass.getName}: ${e.getMessage}")
      }
      at += 1
    }
  }

  // ---- recursion-depth bombs (round-17 fuzz family) ----------------------

  test("pin: recursive Avro schema is refused at parse, never a stack blow") {
    // legal Avro: a record referencing itself by name. toSparkType (and
    // Avro's own GenericDatumReader on a crafted frame) would recurse
    // unboundedly — the parse boundary must reject it loudly.
    val recursive =
      """{"type":"record","name":"Node","fields":[
        | {"name":"v","type":"long"},
        | {"name":"next","type":["null","Node"],"default":null}]}"""
        .stripMargin
    val e = intercept[IllegalArgumentException] {
      graft.schema.AvroConverters.parseSchema(recursive)
    }
    assert(e.getMessage.contains("recursive"), e.getMessage)
    // mutual recursion through a second record is a cycle too
    val mutual =
      """{"type":"record","name":"A","fields":[
        | {"name":"b","type":{"type":"record","name":"B","fields":[
        |   {"name":"a","type":["null","A"],"default":null}]}}]}"""
        .stripMargin
    val e2 = intercept[IllegalArgumentException] {
      graft.schema.AvroConverters.parseSchema(mutual)
    }
    assert(e2.getMessage.contains("recursive"), e2.getMessage)
  }

  test("pin: over-deep Avro schema nesting is refused loudly") {
    // anonymous nesting (arrays) grows depth without any named cycle;
    // build depth 120 > the 100 cap. Must be a loud NonFatal, never a
    // StackOverflowError at schema or decode time.
    val deep = (1 to 120).foldLeft("\"long\"") { (inner, _) =>
      s"""{"type":"array","items":$inner}"""
    }
    val json = s"""{"type":"record","name":"D","fields":[
                  | {"name":"x","type":$deep}]}""".stripMargin
    val e = intercept[Exception] {
      graft.schema.AvroConverters.parseSchema(json)
    }
    assert(scala.util.control.NonFatal(e), e.getClass.getName)
    // depth 50 stays accepted (the cap is a ceiling, not a tax on
    // real schemas)
    val ok = (1 to 50).foldLeft("\"long\"") { (inner, _) =>
      s"""{"type":"array","items":$inner}"""
    }
    val okJson = s"""{"type":"record","name":"D2","fields":[
                    | {"name":"x","type":$ok}]}""".stripMargin
    assert(graft.schema.AvroConverters.parseSchema(okJson) != null)
  }

  test("pin: proto descriptor past protobuf's 100-level recursion limit is refused") {
    import ProtoWire._
    def nest(levels: Int): ProtoMessage =
      (1 to levels).foldLeft(ProtoMessage("L0", Seq(
        ProtoField("v", 1, PInt64)))) { (inner, i) =>
        ProtoMessage(s"L$i", Seq(ProtoField("sub", 1, PMessage(inner))))
      }
    // 99 nested + leaf = depth 100: accepted, and depth is exact
    assert(nest(99).depth == 100)
    val e = intercept[IllegalArgumentException] { nest(100) }
    assert(e.getMessage.contains("recursion limit"), e.getMessage)
  }

  test("pin: deep proto WIRE nesting against a shallow descriptor never recurses") {
    import ProtoWire._
    // 50k levels of field-1 length-delimited nesting on the wire; the
    // descriptor is 2 levels. Decode recursion follows the DESCRIPTOR
    // (nested payloads accumulate as bytes first), so this must
    // return a row — or fail loudly — without a stack blow.
    var payload = Array[Byte](0x10, 0x07) // field 2 varint = 7
    var i = 0
    while (i < 50000) {
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x0a) // field 1, wire type 2
      var len = payload.length
      while ((len & ~0x7f) != 0) { out.write((len & 0x7f) | 0x80); len >>>= 7 }
      out.write(len)
      out.write(payload, 0, payload.length)
      payload = out.toByteArray
      i += 1
    }
    val shallow = ProtoMessage("Outer", Seq(
      ProtoField("sub", 1, PMessage(ProtoMessage("Inner", Seq(
        ProtoField("n", 2, PInt64)))))))
    try { ProtoWire.decode(payload, shallow); () } catch {
      case e: Throwable => assert(scala.util.control.NonFatal(e),
        s"fatal ${e.getClass.getName} on deep wire nesting")
    }
  }

  test("pin: JPEG dimension lie decodes to null, not a multi-GiB raster") {
    // a valid tiny JPEG with its SOF dims spliced to 65500×65500:
    // ImageIO.read would allocate the full raster before any caller
    // check — readBounded must reject from the header alone
    val good = ImageIoDecode.jpegBytes(24, 16, 80)
    // find the SOF0/SOF2 marker (FF C0 / FF C2) and patch dims
    var at = 2
    var sof = -1
    while (sof < 0 && at + 4 < good.length) {
      if ((good(at) & 0xff) == 0xff &&
          ((good(at + 1) & 0xff) == 0xc0 || (good(at + 1) & 0xff) == 0xc2))
        sof = at
      else at += 1
    }
    assert(sof > 0, "no SOF marker in synth JPEG")
    val bad = good.clone()
    // SOF payload: len(2), precision(1), height(2), width(2)
    bad(sof + 5) = 0xff.toByte; bad(sof + 6) = 0xdc.toByte // h = 65500
    bad(sof + 7) = 0xff.toByte; bad(sof + 8) = 0xdc.toByte // w = 65500
    val t0 = System.nanoTime()
    assert(ImageIoDecode.jpegPixelStats(bad) == null)
    assert(ImageIoDecode.jpegDHash64(bad) == null)
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"took ${ms}ms — decoded the lied raster?")
  }
}
