package graft

import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.functions._

import graft.ext.{Multimodal, PixelDecode}

/** Perceptual dHash + image near-dup: hand-computable goldens for the
  * hash, pigeonhole completeness for the pair generation (vs brute
  * force over random hashes), and the end-to-end PNG path with
  * planted duplicates and corrupt blobs. */
class ImageDHashSpec extends SparkSpec {
  import spark.implicits._

  private def dhash(b: Array[Byte]): Option[Long] =
    Option(PixelDecode.pngDHash64(b)).map(_.longValue())

  test("gradient image: every cell darker than its right neighbor -> hash 0") {
    // pngPixelBytes value(x,y) = (seed+x) & 0xff; seed+w <= 256 means
    // no wrap, so block means strictly INCREASE left-to-right and no
    // bit (left strictly brighter) can be set — an analytic golden
    for (seed <- Seq(0, 10, 200))
      assert(dhash(PixelDecode.pngPixelBytes(40, 24, seed)) === Some(0L),
        s"seed=$seed")
  }

  test("gradient with a wrap edge sets bits; hash is deterministic") {
    val h1 = dhash(PixelDecode.pngPixelBytes(40, 24, 240))
    val h2 = dhash(PixelDecode.pngPixelBytes(40, 24, 240))
    assert(h1 === h2)
    assert(h1.get !== 0L) // the 255->0 cliff makes some left cell brighter
  }

  test("identical texture images hash identically; different seeds far apart") {
    def h(seed: Int): Long =
      dhash(PixelDecode.pngTextureBytes(48, 32, seed)).get
    assert(h(7) === h(7))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    // avalanche textures should sit near hamming 32; anything > 3
    // keeps the near-dup fixture clean — check several seed pairs
    for (s <- 1 to 6)
      assert(ham(h(s), h(s + 10)) > 3, s"seeds $s/${s + 10}")
  }

  test("images smaller than the 9x8 grid return null") {
    assert(dhash(PixelDecode.pngTextureBytes(8, 8, 1)) === None)
    assert(dhash(PixelDecode.pngTextureBytes(9, 7, 1)) === None)
    assert(dhash(PixelDecode.pngTextureBytes(9, 8, 1)).isDefined)
  }

  test("undecodable bytes return null") {
    assert(dhash("not a png".getBytes) === None)
  }

  test("RGB image with r=g=b equals the gray image's hash (luma path)") {
    // hand-built RGB PNG (color type 2, filter 0 rows) whose channels
    // all equal the texture pattern — integer luma of (v,v,v) is v
    def px(x: Int, y: Int, seed: Int): Int = {
      // mirror pngTextureBytes' murmur-finalizer formula
      var z = seed * 0x9E3779B1.toInt + x * 0x85EBCA6B.toInt +
        y * 0xC2B2AE35.toInt
      z ^= z >>> 15; z *= 0x2545F491; z ^= z >>> 13
      (z >>> 24) & 0xff
    }
    val (w, h, seed) = (16, 12, 5)
    val raw = new Array[Byte]((w * 3 + 1) * h)
    for (y <- 0 until h) {
      raw(y * (w * 3 + 1)) = 0
      for (x <- 0 until w; c <- 0 until 3)
        raw(y * (w * 3 + 1) + 1 + x * 3 + c) = px(x, y, seed).toByte
    }
    val d = new Deflater(); d.setInput(raw); d.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = { val c = new CRC32(); c.update(body); c.getValue }
      out.write(((crc >>> 24) & 0xff).toInt); out.write(((crc >>> 16) & 0xff).toInt)
      out.write(((crc >>> 8) & 0xff).toInt); out.write((crc & 0xff).toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = 2 // RGB
    chunk("IHDR", ihdr); chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    assert(dhash(out.toByteArray) ===
      dhash(PixelDecode.pngTextureBytes(w, h, seed)))
  }

  test("hashNearDup equals brute force on random hashes (pigeonhole complete)") {
    val rnd = new scala.util.Random(42)
    // random base hashes plus planted near pairs at hamming 1..3
    val base = (0 until 60).map(i => (i.toLong, rnd.nextLong()))
    val near = Seq(
      (100L, base(0)._2 ^ 1L),                    // ham 1 vs id 0
      (101L, base(1)._2 ^ (1L << 63) ^ (1L << 17)), // ham 2 vs id 1
      (102L, base(2)._2 ^ 7L),                    // ham 3 vs id 2
      (103L, base(3)._2))                         // ham 0 vs id 3
    val all = base ++ near
    val df = all.toDF("id", "ph")
    val got = Multimodal.hashNearDup(df, "id", "ph", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    val want = (for {
      (ia, ha) <- all; (ib, hb) <- all if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 3
    } yield (ia, ib, d.toLong)).toSet
    assert(want.size >= 4, "fixture must contain the planted pairs")
    assert(got === want)
  }

  test("hashNearDup equals brute force at every threshold 0..3") {
    val rnd = new scala.util.Random(99)
    val base = (0 until 50).map(i => (i.toLong, rnd.nextLong()))
    val near = (0 until 12).map { i =>
      val flips = i % 4 // plant exact hamming 0..3 neighbors
      var h = base(i)._2
      (0 until flips).foreach(b => h ^= 1L << ((i * 7 + b * 13) % 64))
      (200L + i, h)
    }
    val all = base ++ near
    val df = all.toDF("id", "ph")
    for (mh <- 0 to 3) {
      val got = Multimodal.hashNearDup(df, "id", "ph", maxHamming = mh)
        .as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ia, ha) <- all; (ib, hb) <- all if ia < ib
        d = java.lang.Long.bitCount(ha ^ hb) if d <= mh
      } yield (ia, ib, d.toLong)).toSet
      assert(got === want, s"maxHamming=$mh")
    }
  }

  test("hashNearDupAgainst: cross pairs only, equals bipartite brute force") {
    val rnd = new scala.util.Random(17)
    val left = (0 until 40).map(i => (i.toLong, rnd.nextLong()))
    // plant cross neighbors at hamming 0..3 plus a WITHIN-left near
    // pair that must NOT surface
    val right = (0 until 10).map { i =>
      var h = left(i)._2
      (0 until (i % 4)).foreach(b => h ^= 1L << ((i * 11 + b * 5) % 64))
      (500L + i, h)
    } ++ (10 until 30).map(i => (500L + i, rnd.nextLong()))
    val withinL = left :+ (99L, left(0)._2) // identical WITHIN left
    for (mh <- 0 to 3) {
      val got = Multimodal.hashNearDupAgainst(
        withinL.toDF("id", "ph"), right.toDF("id", "ph"), "id", "ph",
        maxHamming = mh).as[(Long, Long, Long)].collect().toSet
      val want = (for {
        (ia, ha) <- withinL; (ib, hb) <- right
        d = java.lang.Long.bitCount(ha ^ hb) if d <= mh
      } yield (ia, ib, d.toLong)).toSet
      assert(got === want, s"maxHamming=$mh")
      // the within-left identical pair (0, 99) never appears
      assert(!got.exists(p => p._1 === 99L && p._2 < 500L))
    }
  }

  test("hashNearDupAgainst: equal ids across sides are two documents, kept") {
    val l = Seq((7L, 0x1111L)).toDF("id", "ph")
    val r = Seq((7L, 0x1111L)).toDF("id", "ph")
    val got = Multimodal.hashNearDupAgainst(l, r, "id", "ph")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((7L, 7L, 0L)))
  }

  test("hashNearDupAgainst cap counts both sides, drops and reports") {
    val rnd = new scala.util.Random(23)
    // 30 left + 30 right sharing chunk 0 value: combined 60 > cap 40
    val l = (0 until 30).map(i =>
      (i.toLong, (rnd.nextLong() & ~0xffffL) | 0x4242L))
    val r = (0 until 30).map(i =>
      (800L + i, (rnd.nextLong() & ~0xffffL) | 0x4242L))
    val (pairs, overflow) = Multimodal.hashNearDupAgainstCapped(
      l.toDF("id", "ph"), r.toDF("id", "ph"), "id", "ph",
      maxHamming = 3, maxBucket = Some(40))
    val of = overflow.as[(Int, Long, Long)].collect()
    assert(of.exists(x => x._1 === 0 && x._2 === 0x4242L && x._3 === 60L))
    val uncapped = Multimodal.hashNearDupAgainst(
      l.toDF("id", "ph"), r.toDF("id", "ph"), "id", "ph")
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.as[(Long, Long, Long)].collect().toSet.subsetOf(uncapped))
  }

  test("hot-chunk cap drops and reports, never invents") {
    // 40 hashes sharing chunk 0 (low 16 bits) but random elsewhere:
    // bucket (0, 0x1234) overflows a cap of 8
    val rnd = new scala.util.Random(7)
    val hashes = (0 until 40).map(i =>
      (i.toLong, (rnd.nextLong() & ~0xffffL) | 0x1234L))
    val (pairs, overflow) = Multimodal.hashNearDupCapped(
      hashes.toDF("id", "ph"), "id", "ph",
      maxHamming = 3, maxBucket = Some(8))
    val of = overflow.as[(Int, Long, Long)].collect()
    assert(of.exists(r => r._1 === 0 && r._2 === 0x1234L && r._3 === 40L))
    val uncapped = Multimodal.hashNearDup(
      hashes.toDF("id", "ph"), "id", "ph", maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    assert(pairs.as[(Long, Long, Long)].collect().toSet.subsetOf(uncapped))
  }

  test("wavFingerprint: identical streams equal; different seeds far; nulls right") {
    def fp(seed: Int, frames: Int = 600): Option[Long] =
      Option(PixelDecode.wavFingerprint64(
        PixelDecode.wavNoiseBytes(1, 8000, frames, seed))).map(_.longValue())
    assert(fp(3) === fp(3))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (s <- 1 to 6)
      assert(ham(fp(s).get, fp(s + 10).get) > 3, s"seeds $s/${s + 10}")
    assert(fp(1, frames = 64) === None) // < 65 samples: a block is empty
    assert(fp(1, frames = 65).isDefined)
    assert(Option(PixelDecode.wavFingerprint64("nope".getBytes)).isEmpty)
    // the tone ramp's block-mass delta signs are phase-stable across
    // seeds (documented on wavNoiseBytes) — pin that the fingerprint
    // still works on it structurally: identical in, identical out
    val t1 = PixelDecode.wavFingerprint64(
      PixelDecode.wavToneBytes(1, 8000, 600, 9))
    val t2 = PixelDecode.wavFingerprint64(
      PixelDecode.wavToneBytes(1, 8000, 600, 9))
    assert(t1 === t2 && t1 != null)
  }

  test("audioNearDup end-to-end: planted identical streams pair at hamming 0") {
    val rows = (0 until 24).map { i =>
      (i.toLong, PixelDecode.wavNoiseBytes(1, 8000, 600, i % 5))
    } :+ (99L, "garbage".getBytes)
    val got = Multimodal.audioNearDup(rows.toDF("doc_id", "audio"),
      "doc_id", "audio").as[(Long, Long, Long)].collect()
    val want = (for {
      a <- 0 until 24; b <- 0 until 24 if a < b && a % 5 == b % 5
    } yield (a.toLong, b.toLong, 0L)).toSet
    assert(got.toSet === want)
    assert(!got.exists(p => p._1 === 99L || p._2 === 99L))
  }

  /** Hand-built grayscale PNG (filter-0 rows) for an arbitrary pixel
    * function — lets tests pair a PNG against a GIF of the SAME grid. */
  private def grayPng(w: Int, h: Int, px: (Int, Int) => Int): Array[Byte] = {
    val raw = new Array[Byte]((w + 1) * h)
    for (y <- 0 until h) {
      raw(y * (w + 1)) = 0
      for (x <- 0 until w) raw(y * (w + 1) + 1 + x) = px(x, y).toByte
    }
    val d = new Deflater(); d.setInput(raw); d.finish()
    val z = new java.io.ByteArrayOutputStream()
    val buf = new Array[Byte](8192)
    while (!d.finished()) z.write(buf, 0, d.deflate(buf))
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a))
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val len = data.length
      out.write((len >>> 24) & 0xff); out.write((len >>> 16) & 0xff)
      out.write((len >>> 8) & 0xff); out.write(len & 0xff)
      val body = typ.getBytes("US-ASCII") ++ data
      out.write(body, 0, body.length)
      val crc = { val c = new CRC32(); c.update(body); c.getValue }
      out.write(((crc >>> 24) & 0xff).toInt); out.write(((crc >>> 16) & 0xff).toInt)
      out.write(((crc >>> 8) & 0xff).toInt); out.write((crc & 0xff).toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte
    ihdr(8) = 8; ihdr(9) = 0 // gray
    chunk("IHDR", ihdr); chunk("IDAT", z.toByteArray)
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  test("locality: editing one downsample cell flips at most 2 dHash bits") {
    // a cell (i, j) participates in exactly two comparisons — (j-1, j)
    // and (j, j+1) of row i — so a local edit confined to one cell's
    // pixel block moves at most 2 bits: the theorem that makes dHash
    // a NEAR-dup hash rather than an exact one
    val (w, h) = (36, 24) // 9x8 grid of 4x3 pixel blocks, exact
    def px(x: Int, y: Int): Int = {
      var z = 5 * 0x9E3779B1.toInt + x * 0x85EBCA6B.toInt +
        y * 0xC2B2AE35.toInt
      z ^= z >>> 15; z *= 0x2545F491; z ^= z >>> 13
      (z >>> 24) & 0xff
    }
    val base = Option(PixelDecode.pngDHash64(grayPng(w, h, px))).get
    for ((ci, cj) <- Seq((0, 0), (3, 4), (7, 8))) {
      // brighten every pixel of cell (ci, cj) to the max
      val edited = grayPng(w, h, (x, y) =>
        if (x / 4 == cj && y / 3 == ci) 255 else px(x, y))
      val eh = Option(PixelDecode.pngDHash64(edited)).get
      val ham = java.lang.Long.bitCount(base ^ eh)
      assert(ham <= 2, s"cell ($ci,$cj) moved $ham bits")
    }
  }

  test("locality: editing one audio block flips at most 2 fingerprint bits") {
    // same argument in time: block i appears in deltas (i-1, i) and
    // (i, i+1) only
    val frames = 650 // 65 blocks of exactly 10 samples
    val base = PixelDecode.wavNoiseBytes(1, 8000, frames, 3)
    val h0 = Option(PixelDecode.wavFingerprint64(base)).get
    for (blk <- Seq(0, 30, 64)) {
      val edited = base.clone()
      // locate the data chunk (fixed 44-byte header for this writer)
      // and zero block blk's 10 samples
      for (k <- blk * 10 until (blk + 1) * 10) {
        edited(44 + 2 * k) = 0
        edited(44 + 2 * k + 1) = 0
      }
      val h1 = Option(PixelDecode.wavFingerprint64(edited)).get
      val ham = java.lang.Long.bitCount(h0 ^ h1)
      assert(ham <= 2, s"block $blk moved $ham bits")
    }
  }

  test("gifDHash64 nulls on corrupt GIF input") {
    import graft.ext.GifDecode
    val good = GifDecode.gifPixelBytes(20, 12, 7)
    assert(GifDecode.gifDHash64(good) != null)
    // truncated mid-LZW stream
    assert(GifDecode.gifDHash64(
      java.util.Arrays.copyOfRange(good, 0, good.length / 2)) == null)
    // sub-9x8 dims
    assert(GifDecode.gifDHash64(GifDecode.gifPixelBytes(8, 8, 7)) == null)
    // foreign magic
    assert(GifDecode.gifDHash64("RIFFxxxxWAVE".getBytes) == null)
  }

  test("cross-format: same gray grid as PNG and GIF hashes identically") {
    import graft.ext.GifDecode
    val (w, h, seed) = (20, 12, 9)
    // gifPixelBytes pixel rule: (seed + x + 2*y) mod 256, gray palette
    val gif = GifDecode.gifPixelBytes(w, h, seed)
    val png = grayPng(w, h, (x, y) => (seed + x + 2 * y) % 256)
    val hg = Option(GifDecode.gifDHash64(gif)).map(_.longValue())
    val hp = Option(PixelDecode.pngDHash64(png)).map(_.longValue())
    assert(hg.isDefined)
    assert(hg === hp)
    // the dispatcher routes each format to the same value
    assert(Option(PixelDecode.imageDHash64(gif)).map(_.longValue()) === hg)
    assert(Option(PixelDecode.imageDHash64(png)).map(_.longValue()) === hg)
    assert(Option(PixelDecode.imageDHash64("nope".getBytes)) === None)
  }

  test("imageNearDup pairs a PNG with its GIF twin across formats") {
    import graft.ext.GifDecode
    val (w, h) = (20, 12)
    val rows = Seq(
      (1L, GifDecode.gifPixelBytes(w, h, 40)),
      (2L, grayPng(w, h, (x, y) => (40 + x + 2 * y) % 256)), // PNG twin of 1
      (3L, GifDecode.gifPixelBytes(w, h, 41))) // near twin: +1 brightness
    val got = Multimodal.imageNearDup(rows.toDF("doc_id", "img"),
      "doc_id", "img").as[(Long, Long, Long)].collect().toSet
    // (1,2) identical grids across formats -> hamming 0; seed 41 is a
    // uniform +1 brightness shift of seed 40 (same gradient), so its
    // dHash is identical too -> all three pair at 0
    assert(got.contains((1L, 2L, 0L)))
    assert(got === Set((1L, 2L, 0L), (1L, 3L, 0L), (2L, 3L, 0L)))
  }

  test("mp4Fingerprint: identical equal; seeds far; gradient documented-stable; nulls") {
    import graft.ext.Mp4Demux
    def fp(seed: Int, frames: Int = 80): Option[Long] =
      Option(Mp4Demux.mp4Fingerprint64(
        Mp4Demux.mp4NoiseFramesBytes(16, 8, frames, seed))).map(_.longValue())
    assert(fp(3) === fp(3))
    def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
    for (s <- 1 to 6)
      assert(ham(fp(s).get, fp(s + 10).get) > 3, s"seeds $s/${s + 10}")
    assert(fp(1, frames = 64) === None) // < 65 frames
    assert(fp(1, frames = 65).isDefined)
    assert(Option(Mp4Demux.mp4Fingerprint64("nope".getBytes)).isEmpty)
    // gradient synth still fingerprints deterministically (the noise
    // variant exists because gradient delta signs are seed-stable)
    val g1 = Mp4Demux.mp4Fingerprint64(Mp4Demux.mp4FramesBytes(16, 8, 80, 5))
    val g2 = Mp4Demux.mp4Fingerprint64(Mp4Demux.mp4FramesBytes(16, 8, 80, 5))
    assert(g1 === g2 && g1 != null)
  }

  test("noise mp4 refactor keeps the gradient synth byte-identical") {
    // mp4FramesBytes now routes through the generic writer — the
    // bytes (and thus every existing golden/oracle) must not move
    import graft.ext.Mp4Demux
    val b = Mp4Demux.mp4FramesBytes(16, 8, 10, 7)
    val s = Mp4Demux.demux(b)
    assert(s != null && s.width === 16 && s.height === 8)
    val sums = Mp4Demux.mp4FrameSums(b)
    // frame 0 sum: 8 rows of sum_x (7 + 0*31 + x) % 256, x in 0..15
    val expected = 8L * (0 until 16).map(x => (7 + x) % 256).sum
    assert(sums.getLong(0) === expected)
  }

  test("videoNearDup end-to-end: planted identical videos pair at hamming 0") {
    import graft.ext.Mp4Demux
    val rows = (0 until 24).map { i =>
      (i.toLong, Mp4Demux.mp4NoiseFramesBytes(16, 8, 80, i % 5))
    } :+ (99L, "garbage".getBytes)
    val got = Multimodal.videoNearDup(rows.toDF("doc_id", "video"),
      "doc_id", "video").as[(Long, Long, Long)].collect()
    val want = (for {
      a <- 0 until 24; b <- 0 until 24 if a < b && a % 5 == b % 5
    } yield (a.toLong, b.toLong, 0L)).toSet
    assert(got.toSet === want)
    assert(!got.exists(p => p._1 === 99L || p._2 === 99L))
  }

  test("imageNearDup end-to-end: planted identical images pair at hamming 0") {
    val rows = (0 until 30).map { i =>
      val seed = i % 7 // identical groups of ~4-5
      (i.toLong, PixelDecode.pngTextureBytes(48, 32, seed))
    } :+ (99L, "garbage".getBytes) // undecodable: must drop, not pair
    val got = Multimodal.imageNearDup(rows.toDF("doc_id", "img"),
      "doc_id", "img").as[(Long, Long, Long)].collect()
    val want = (for {
      a <- 0 until 30; b <- 0 until 30 if a < b && a % 7 == b % 7
    } yield (a.toLong, b.toLong, 0L)).toSet
    assert(got.toSet === want)
    assert(!got.exists(p => p._1 === 99L || p._2 === 99L))
  }
}
