package graft

import org.apache.spark.sql.functions._

import graft.ext.PixelDecode

/** Resample-invariant audio pairing: [[PixelDecode.wavResampleBytes]]
  * (real frame decimation) + [[PixelDecode.wavFingerprintAt64]]
  * (canonical-rate fingerprint). The invariance is a theorem — both
  * sides decimate to the same frame sequence — but like the image
  * fixtures it is PROBED over every banded seed (0–501), along with
  * the cross-seed hamming floor that makes the hamming-3 gate
  * threshold safe for driver AND scale-curve corpora. */
class WavResampleSpec extends SparkSpec {
  import spark.implicits._

  private def ham(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)
  private def noise(seed: Int, rate: Int = 44100, frames: Int = 600) =
    PixelDecode.wavNoiseBytes(1, rate, frames, seed)

  test("resample: header rewritten, every stride-th frame kept exactly") {
    val orig = noise(11, rate = 8000, frames = 10)
    val half = PixelDecode.wavResampleBytes(orig, 2)
    assert(half != null)
    // header: mono PCM-16 at 4000, 5 frames
    def u16(b: Array[Byte], i: Int) = (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    def u32(b: Array[Byte], i: Int) = u16(b, i).toLong | (u16(b, i + 2).toLong << 16)
    assert(u32(half, 24) === 4000L)
    assert(u16(half, 22) === 1)
    assert(u32(half, 40) === 10L) // 5 frames × 2 bytes
    for (f <- 0 until 5; c <- 0 until 2)
      assert(half(44 + f * 2 + c) === orig(44 + f * 4 + c), s"frame $f byte $c")
  }

  test("resample nulls: non-WAV, stride not dividing the rate") {
    assert(PixelDecode.wavResampleBytes("junk".getBytes, 2) === null)
    // 8 does NOT divide 44100 (44100 = 2²·3²·5²·7², so 7 would!)
    assert(PixelDecode.wavResampleBytes(noise(1, rate = 44100), 8) === null)
    assert(PixelDecode.wavResampleBytes(noise(1), 0) === null)
  }

  test("canonical fingerprint nulls: rate not a multiple, too few samples") {
    assert(PixelDecode.wavFingerprintAt64(noise(1, rate = 44100), 8000) === null)
    assert(PixelDecode.wavFingerprintAt64(
      noise(1, rate = 44100, frames = 120), 22050) === null) // 60 < 65
    assert(PixelDecode.wavFingerprintAt64(noise(1), 0) === null)
  }

  test("invariance + cross-seed floor over every banded seed 0-501") {
    val fps = (0 until 502).map { s =>
      val orig = noise(s)
      val res = PixelDecode.wavResampleBytes(orig, 2)
      val fo = PixelDecode.wavFingerprintAt64(orig, 22050)
      val fr = PixelDecode.wavFingerprintAt64(res, 22050)
      assert(fo != null && fr != null, s"seed $s")
      assert(fo === fr, s"seed $s: original vs resample fingerprints differ")
      fo.longValue()
    }
    var floor = 64
    for (a <- 0 until 502; b <- a + 1 until 502)
      floor = math.min(floor, ham(fps(a), fps(b)))
    // observed floor 9 at 502 seeds — three tiers above the gate's
    // hamming-3 threshold
    assert(floor >= 8, s"cross-seed floor $floor (gate threshold is 3)")
  }

  test("at the native rate the canonical fingerprint equals wavFingerprint64") {
    val b = noise(5, rate = 22050, frames = 300)
    assert(PixelDecode.wavFingerprintAt64(b, 22050) ===
      PixelDecode.wavFingerprint64(b))
  }

  test("stereo: frame decimation keeps channel pairs together") {
    val orig = PixelDecode.wavNoiseBytes(2, 8000, 200, 3)
    val half = PixelDecode.wavResampleBytes(orig, 2)
    for (f <- 0 until 100; c <- 0 until 4)
      assert(half(44 + f * 4 + c) === orig(44 + f * 8 + c), s"frame $f byte $c")
    // canonical fingerprint of the original at 4000 equals the
    // resample's native fingerprint (same decimated stream)
    assert(PixelDecode.wavFingerprintAt64(orig, 4000) ===
      PixelDecode.wavFingerprintAt64(half, 4000))
  }

  test("column expressions agree with the JVM functions end to end") {
    val rows = spark.range(0, 10).select(col("id"),
      PixelDecode.wavFingerprintAt(
        PixelDecode.wavResample(
          PixelDecode.synthWavNoise(lit(1), lit(44100), lit(600),
            (col("id") % 5).cast("int")), 2), 22050).as("ph"))
      .collect()
    for (r <- rows) {
      val want = PixelDecode.wavFingerprintAt64(
        PixelDecode.wavResampleBytes(noise((r.getLong(0) % 5).toInt), 2), 22050)
      assert(r.getLong(1) === want.longValue())
    }
  }
}
