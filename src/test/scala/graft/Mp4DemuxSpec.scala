package graft

import graft.ext.{MediaProbe, Mp4Demux}
import org.apache.spark.sql.functions._

/** The MP4 sample-table demux against its own muxer, hand-computed
  * goldens, and hostile inputs. The muxer chunks frames 4-per-chunk,
  * so any nFrames % 4 != 0 case exercises the two-run stsc expansion.
  */
class Mp4DemuxSpec extends SparkSpec {
  import spark.implicits._

  private def expected(w: Int, h: Int, nf: Int, seed: Int,
      stride: Int): (Long, Long, Long, Int, Int) = {
    val sampled = (0 until nf by stride)
    val vals = for (f <- sampled; x <- 0 until w) yield (seed + f * 31 + x) % 256
    (sampled.size.toLong * w * h, vals.map(_.toLong).sum * h,
      sampled.size.toLong, vals.min, vals.max)
  }

  test("demux recovers dims and per-frame offsets/sizes") {
    val b = Mp4Demux.mp4FramesBytes(6, 5, 7, 42) // 7 frames: 4+3 chunks
    val s = Mp4Demux.demux(b)
    assert(s != null)
    assert(s.width === 6 && s.height === 5)
    assert(s.sizes.toSeq === Seq.fill(7)(30))
    // frames are contiguous within a chunk, chunks contiguous in mdat
    assert(s.offsets.toSeq === (0 until 7).map(f => s.offsets(0) + 30L * f))
    // first sample sits right after ftyp(24) + mdat header(8)
    assert(s.offsets(0) === 32L)
  }

  test("frame stats match the pixel formula at stride 1 and 3") {
    for (stride <- Seq(1, 3); (w, h, nf, seed) <- Seq(
        (6, 5, 7, 42), (3, 2, 4, 0), (17, 9, 10, 200), (4, 4, 1, 255))) {
      val st = Mp4Demux.mp4FrameStats(Mp4Demux.mp4FramesBytes(w, h, nf, seed), stride)
      assert(st != null, s"null stats for ${w}x${h}x$nf/$stride")
      val (nPix, sum, nSampled, mn, mx) = expected(w, h, nf, seed, stride)
      assert(st.getLong(0) === w.toLong && st.getLong(1) === h.toLong)
      assert(st.getLong(2) === nf.toLong)
      assert(st.getLong(3) === nSampled)
      assert(st.getLong(4) === nPix)
      assert(st.getLong(5) === sum)
      assert(st.getInt(6) === mn && st.getInt(7) === mx)
    }
  }

  test("sampleFrames returns the exact raw frame bytes") {
    val b = Mp4Demux.mp4FramesBytes(4, 2, 6, 7)
    val frames = Mp4Demux.mp4SampleFrames(b, 2)
    assert(frames.numElements() === 3)
    for ((fi, i) <- Seq(0, 2, 4).zipWithIndex) {
      val got = frames.getBinary(i).toSeq
      val want = (0 until 2).flatMap(_ => (0 until 4)
        .map(x => ((7 + fi * 31 + x) % 256).toByte))
      assert(got === want, s"frame $fi")
    }
  }

  test("header-only MP4 (x25 synth), truncated and foreign bytes → null") {
    // MediaProbe.mp4Bytes has moov but no mdia/stbl: probe-able, not demuxable
    val headerOnly = MediaProbe.mp4Bytes(640, 480, 2000)
    assert(Mp4Demux.mp4FrameStats(headerOnly, 1) === null)
    assert(MediaProbe.probeMp4(headerOnly) != null)

    val good = Mp4Demux.mp4FramesBytes(6, 5, 7, 42)
    for (cut <- Seq(4, 40, good.length / 2, good.length - 4)) {
      // truncation clips either mdat (offsets out of range) or moov
      assert(Mp4Demux.mp4FrameStats(java.util.Arrays.copyOf(good, cut), 1) === null,
        s"cut=$cut")
    }
    assert(Mp4Demux.mp4FrameStats("plainly not a video".getBytes, 1) === null)
    assert(Mp4Demux.mp4FrameStats(null, 1) === null)
    assert(Mp4Demux.mp4FrameStats(good, 0) === null) // bad stride
  }

  test("stsc table disagreement is rejected, not misread") {
    val good = Mp4Demux.mp4FramesBytes(3, 3, 8, 5)
    // corrupt stco entry count to 1 (there are 2 chunks of 4)
    val b = good.clone()
    val idx = {
      // find "stco" fourcc
      var i = 0
      var at = -1
      while (i < b.length - 4 && at < 0) {
        if (b(i) == 's' && b(i + 1) == 't' && b(i + 2) == 'c' && b(i + 3) == 'o') at = i
        i += 1
      }
      at
    }
    assert(idx > 0)
    // entry_count is 8 bytes after the fourcc (4 version/flags + offset)
    b(idx + 4 + 4 + 3) = 1.toByte
    b(idx + 4 + 4 + 2) = 0.toByte
    assert(Mp4Demux.mp4FrameStats(b, 1) === null)
  }

  // ---- hand-rolled box assembly for multi-track adversarial files ----

  private def b32(v: Long): Array[Byte] = Array(
    ((v >>> 24) & 0xff).toByte, ((v >>> 16) & 0xff).toByte,
    ((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def b16(v: Int): Array[Byte] =
    Array(((v >>> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def mkBox(typ: String, body: Array[Byte]*): Array[Byte] = {
    val payload = body.flatten.toArray
    b32(payload.length + 8L) ++ typ.getBytes("US-ASCII") ++ payload
  }
  /** 86-byte VisualSampleEntry with the given fourcc, w×h, depth 8. */
  private def sampleEntry(fourcc: String, w: Int, h: Int): Array[Byte] =
    mkBox(fourcc,
      new Array[Byte](6), b16(1), new Array[Byte](16), // reserved/dref
      b16(w), b16(h), b32(0x00480000L), b32(0x00480000L), b32(0L),
      b16(1), new Array[Byte](32), b16(8), b16(0xffff))
  private def stsdBox(entry: Array[Byte]): Array[Byte] =
    mkBox("stsd", b32(0L), b32(1L), entry)
  /** Complete one-sample tables: one chunk at `off`, sample size `sz`. */
  private def tables(off: Long, sz: Long): Seq[Array[Byte]] = Seq(
    mkBox("stsz", b32(0L), b32(sz), b32(1L)),
    mkBox("stsc", b32(0L), b32(1L), b32(1L), b32(1L), b32(1L)),
    mkBox("stco", b32(0L), b32(1L), b32(off)))
  private def trakOf(stbl: Array[Byte]): Array[Byte] =
    mkBox("trak", mkBox("mdia", mkBox("minf", stbl)))

  test("co64 offset near Long.MaxValue is rejected (off+sz overflow guard)") {
    // offset 0x7ff...f0 wraps `off + sz` negative — before the
    // round-15 guard this slipped past the length check and downstream
    // reads truncated it to an in-bounds Int: plausible garbage stats
    val huge = 0x7ffffffffffffff0L
    def b64(v: Long): Array[Byte] = b32(v >>> 32) ++ b32(v & 0xffffffffL)
    val stbl = mkBox("stbl",
      stsdBox(sampleEntry("raw ", 4, 4)),
      mkBox("stsz", b32(0L), b32(16L), b32(1L)),
      mkBox("stsc", b32(0L), b32(1L), b32(1L), b32(1L), b32(1L)),
      mkBox("co64", b32(0L), b32(1L), b64(huge)))
    val file = mkBox("ftyp", "isom".getBytes("US-ASCII"), b32(0L)) ++
      mkBox("moov", trakOf(stbl)) ++ new Array[Byte](64)
    assert(Mp4Demux.demux(file) === null)
    assert(Mp4Demux.mp4FrameStats(file, 1) === null)
  }

  test("a raw trak with incomplete tables never borrows another trak's") {
    val ftyp = mkBox("ftyp", "isom".getBytes("US-ASCII"), b32(512L),
      "isomiso2".getBytes("US-ASCII"))
    val mdat = mkBox("mdat", Array.fill[Byte](9)(7)) // one 3x3 frame
    val off = ftyp.length + 8L
    // trak1: COMPLETE tables but a compressed codec (avc1) — no dims;
    // trak2: raw stsd (dims) but NO sample tables at all.
    val bad = ftyp ++ mdat ++ mkBox("moov",
      trakOf(mkBox("stbl",
        (stsdBox(sampleEntry("avc1", 3, 3)) +: tables(off, 9L)): _*)),
      trakOf(mkBox("stbl", stsdBox(sampleEntry("raw ", 3, 3)))))
    // pre-fix this demuxed as 3x3 with trak1's tables; must be null
    assert(Mp4Demux.demux(bad) === null)
    assert(Mp4Demux.mp4FrameStats(bad, 1) === null)

    // control: the same layout with trak2 COMPLETE demuxes via trak2
    val good = ftyp ++ mdat ++ mkBox("moov",
      trakOf(mkBox("stbl",
        (stsdBox(sampleEntry("avc1", 5, 5)) +: tables(off, 9L)): _*)),
      trakOf(mkBox("stbl",
        (stsdBox(sampleEntry("raw ", 3, 3)) +: tables(off, 9L)): _*)))
    val s = Mp4Demux.demux(good)
    assert(s != null && s.width === 3 && s.height === 3)
    assert(s.offsets.toSeq === Seq(off) && s.sizes.toSeq === Seq(9))
  }

  test("expression forms run inside codegen over a DataFrame") {
    val df = (0 until 20).map { i =>
      (i.toLong, i % 13 + 2, i % 7 + 2, i % 5 + 1, i % 251)
    }.toDF("id", "w", "h", "nf", "seed")
    val got = df.select(col("id"), col("w"), col("h"), col("nf"), col("seed"),
      Mp4Demux.frameStats(
        Mp4Demux.synthMp4Frames(col("w"), col("h"), col("nf"), col("seed")),
        lit(2)).as("st"))
      .select(col("id"), col("w"), col("h"), col("nf"), col("seed"),
        col("st.n_pixels"), col("st.sum_val"), col("st.min_val"), col("st.max_val"))
      .as[(Long, Int, Int, Int, Int, Long, Long, Int, Int)]
      .collect()
    assert(got.length === 20)
    got.foreach { case (id, w, h, nf, seed, nPix, sum, mn, mx) =>
      val (eNPix, eSum, _, eMn, eMx) = expected(w, h, nf, seed, 2)
      assert((nPix, sum, mn, mx) === ((eNPix, eSum, eMn, eMx)), s"id=$id")
    }
  }
}

/** Property round-trip over random geometry: every mux must demux back
  * to the exact pixel formula, across chunk-boundary shapes (nf % 4
  * covers single-run, exact-run and partial-last-chunk stsc tables)
  * and all stride phases. Raw ScalaCheck generators with fixed seeds
  * (scalatestplus bridge is not in the offline cache). */
class Mp4DemuxPropertySpec extends SparkSpec {
  import org.scalacheck.Gen
  import org.scalacheck.rng.Seed

  private val geomGen: Gen[(Int, Int, Int, Int, Int)] = for {
    w <- Gen.choose(1, 40)
    h <- Gen.choose(1, 24)
    nf <- Gen.choose(1, 13)
    seed <- Gen.choose(0, 255)
    stride <- Gen.choose(1, 4)
  } yield (w, h, nf, seed, stride)

  test("mux→demux round-trips the pixel formula for arbitrary geometry") {
    (1 to 60).flatMap(i => geomGen(Gen.Parameters.default, Seed(i.toLong)))
      .foreach { case (w, h, nf, seed, stride) =>
        val st = graft.ext.Mp4Demux.mp4FrameStats(
          graft.ext.Mp4Demux.mp4FramesBytes(w, h, nf, seed), stride)
        assert(st != null, s"($w,$h,$nf,$seed,$stride)")
        val sampled = 0 until nf by stride
        val vals = for (f <- sampled; x <- 0 until w)
          yield (seed + f * 31 + x) % 256
        assert(st.getLong(2) === nf.toLong)
        assert(st.getLong(3) === sampled.size.toLong)
        assert(st.getLong(4) === sampled.size.toLong * w * h)
        assert(st.getLong(5) === vals.map(_.toLong).sum * h,
          s"sum mismatch ($w,$h,$nf,$seed,$stride)")
        assert(st.getInt(6) === vals.min && st.getInt(7) === vals.max)
      }
  }
}
