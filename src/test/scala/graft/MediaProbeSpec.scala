package graft

import org.apache.spark.sql.functions._

import graft.ext.MediaProbe

/** Header-parse conformance for the pure-JVM media probe: PNG IHDR,
  * GIF logical screen descriptor, JPEG SOFn marker walk — synthesized
  * and hand-built frames, plus rejection of junk and truncation. */
class MediaProbeSpec extends SparkSpec {
  import spark.implicits._

  test("PNG: IHDR big-endian dims parse from synthesized bytes") {
    val r = MediaProbe.probe(MediaProbe.pngBytes(1234, 77))
    assert(r.getLong(0) === 1234L && r.getLong(1) === 77L)
    assert(r.getUTF8String(2).toString === "image/png")
  }

  test("GIF: little-endian screen descriptor dims") {
    val r = MediaProbe.probe(MediaProbe.gifBytes(320, 200))
    assert(r.getLong(0) === 320L && r.getLong(1) === 200L)
    assert(r.getUTF8String(2).toString === "image/gif")
  }

  test("JPEG: probe walks past APP0 to SOF0 for dims") {
    val r = MediaProbe.probe(MediaProbe.jpegBytes(640, 480))
    assert(r.getLong(0) === 640L && r.getLong(1) === 480L)
    assert(r.getUTF8String(2).toString === "image/jpeg")
  }

  test("JPEG: 0xFF fill bytes before a marker are consumed one at a time") {
    // legal JPEGs may pad with FF bytes before a marker: FF FF FF C0 …
    val base = MediaProbe.jpegBytes(640, 480)
    // inject two fill bytes before the SOF0 marker (after SOI+APP0 = 20 bytes)
    val padded = base.take(20) ++ Array[Byte](0xff.toByte, 0xff.toByte) ++ base.drop(20)
    val r = MediaProbe.probe(padded)
    assert(r != null, "fill bytes must not break marker sync")
    assert(r.getLong(0) === 640L && r.getLong(1) === 480L)
  }

  test("junk, truncated and header-less inputs probe to null") {
    assert(MediaProbe.probe("not an image".getBytes) === null)
    assert(MediaProbe.probe(MediaProbe.pngBytes(10, 10).take(12)) === null)
    assert(MediaProbe.probe(Array[Byte](0xff.toByte, 0xd8.toByte,
      0xff.toByte, 0xd9.toByte)) === null) // JPEG with no SOF
    assert(MediaProbe.probe(null) === null)
  }

  test("expression path: synth → probe round-trips dims inside a plan") {
    val df = Seq((3, 5), (99, 101), (640, 480)).toDF("w", "h")
    val got = df.select(
      MediaProbe.probeMedia(MediaProbe.synthPng(col("w"), col("h"))).as("m"))
      .select(col("m.width"), col("m.height"), col("m.media_type"))
      .as[(Long, Long, String)].collect().toSet
    assert(got === Set((3L, 5L, "image/png"), (99L, 101L, "image/png"),
      (640L, 480L, "image/png")))
  }

  test("probe expression yields null struct for unrecognized bytes") {
    val df = Seq("plain text").toDF("t")
    val got = df.select(
      MediaProbe.probeMedia(col("t").cast("binary")).as("m"))
    assert(got.filter(col("m").isNull).count() === 1)
  }

  test("WAV: fmt + data chunk walk yields channels, rate, bits, duration") {
    val r = MediaProbe.probeWav(MediaProbe.wavBytes(2, 44100, 16, 44100))
    assert(r.getInt(0) === 2 && r.getLong(1) === 44100L)
    assert(r.getInt(2) === 16 && r.getLong(3) === 1000L) // 1 second
    assert(r.getUTF8String(4).toString === "audio/wav")
    // mono 8-bit half-second at 8kHz
    val m = MediaProbe.probeWav(MediaProbe.wavBytes(1, 8000, 8, 4000))
    assert(m.getInt(0) === 1 && m.getLong(3) === 500L)
  }

  test("WAV: junk and truncated RIFF probe to null") {
    assert(MediaProbe.probeWav("RIFFnope".getBytes) === null)
    assert(MediaProbe.probeWav(MediaProbe.pngBytes(3, 3)) === null)
    assert(MediaProbe.probeWav(MediaProbe.wavBytes(1, 8000, 8, 100).take(20))
      === null)
  }

  test("WAV: corrupt chunk length >= 2^31 never throws (Int-overflow guard)") {
    // pre-fix, `len.toInt` overflowed negative, the cursor walked out
    // of bounds and new String threw — one malformed blob would kill a
    // whole 100 TB scan. Post-fix the walk stops at the buffer edge:
    // the intact fmt header still parses, the unreachable data chunk
    // reports duration 0.
    val b = MediaProbe.wavBytes(1, 8000, 8, 4)
    // overwrite the fmt chunk's length field (u32le at offset 16)
    // with 0x80000000 — Int.MinValue if truncated to Int
    b(16) = 0x00; b(17) = 0x00; b(18) = 0x00; b(19) = 0x80.toByte
    val r = MediaProbe.probeWav(b)
    assert(r == null || r.getLong(3) === 0L)
    // zero-length chunk (len=0 advances by 8) must also terminate
    val z = MediaProbe.wavBytes(1, 8000, 8, 4)
    z(16) = 0; z(17) = 0; z(18) = 0; z(19) = 0
    MediaProbe.probeWav(z) // terminates; result value not pinned
  }

  test("WAV: synthesized bytes validate against the JDK's own audio reader") {
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(MediaProbe.wavBytes(2, 22050, 16, 2205)))
    val fmt = ais.getFormat
    assert(fmt.getChannels === 2)
    assert(fmt.getSampleRate === 22050f)
    assert(fmt.getSampleSizeInBits === 16)
    assert(ais.getFrameLength === 2205L)
  }

  test("audio expression path: synth → probe inside a plan") {
    val df = Seq((1, 8000, 16, 800), (2, 16000, 8, 1600)).toDF(
      "ch", "rate", "bits", "n")
    val got = df.select(MediaProbe.probeAudio(MediaProbe.synthWav(
      col("ch"), col("rate"), col("bits"), col("n"))).as("m"))
      .select(col("m.n_channels"), col("m.sample_rate"), col("m.duration_ms"))
      .as[(Int, Long, Long)].collect().toSet
    assert(got === Set((1, 8000L, 100L), (2, 16000L, 100L)))
  }

  test("MP4: moov/mvhd/tkhd walk yields dims and duration") {
    val r = MediaProbe.probeMp4(MediaProbe.mp4Bytes(1920, 1080, 2500L))
    assert(r.getLong(0) === 1920L && r.getLong(1) === 1080L)
    assert(r.getLong(2) === 2500L)
    assert(r.getUTF8String(3).toString === "video/mp4")
    // non-default timescale: 90kHz, 0.5s
    val t = MediaProbe.probeMp4(MediaProbe.mp4Bytes(640, 360, 500L,
      timescale = 90000))
    assert(t.getLong(2) === 500L)
  }

  test("MP4: junk and non-ftyp streams probe to null") {
    assert(MediaProbe.probeMp4("not a video".getBytes) === null)
    assert(MediaProbe.probeMp4(MediaProbe.wavBytes(1, 8000, 8, 10)) === null)
    assert(MediaProbe.probeMp4(MediaProbe.mp4Bytes(10, 10, 100L).take(30))
      === null)
  }

  test("video expression path: synth → probe inside a plan") {
    val df = Seq((320, 240, 1000L), (1280, 720, 42L)).toDF("w", "h", "d")
    val got = df.select(MediaProbe.probeVideo(MediaProbe.synthMp4(
      col("w"), col("h"), col("d"))).as("m"))
      .select(col("m.width"), col("m.height"), col("m.duration_ms"))
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((320L, 240L, 1000L), (1280L, 720L, 42L)))
  }

  test("synthesized PNG passes an independent reader (ImageIO header)") {
    // cross-check the synthesizer against the JDK's own PNG header
    // reader so the spec doesn't just test the probe against its own
    // fixture (pixel decode is skipped — the IDAT is empty by design)
    val stream = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(MediaProbe.pngBytes(21, 34)))
    val it = javax.imageio.ImageIO.getImageReaders(stream)
    assert(it.hasNext, "JDK PNG reader did not recognize the synth bytes")
    val reader = it.next()
    reader.setInput(stream)
    assert(reader.getWidth(0) === 21 && reader.getHeight(0) === 34)
  }
}
