package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Hash-sketch primitives: MinHash signatures and SimHash, built
  * on Spark's codegen'd `xxhash64` and higher-order array functions.
  * No UDFs: signatures are computed scan-side, so the only shuffle in an
  * LSH dedup is the band-bucket exchange.
  */
object HashFunctions {

  /** k-permutation MinHash signature as array<bigint>: tokens hashed
    * once (xxhash64), then k affine permutations in a single pass
    * (custom expression — one JVM loop per row). */
  def minhashSignature(tokens: Column, k: Int): Column =
    Expressions.minhashSignature(tokenHashes(tokens), k)

  /** LSH band keys: split a k-wide signature into `bands` bands of
    * k/bands rows each, hash each band to one bigint. Two documents with
    * Jaccard ≥ t collide in ≥1 band w.h.p. (standard banding bound). */
  def bandKeys(signature: Column, k: Int, bands: Int): Column = {
    val r = k / bands
    array((0 until bands).map { b =>
      xxhash64((lit(b) +: (0 until r).map(i =>
        signature.getItem(b * r + i))): _*)
    }: _*)
  }

  /** Per-token 64-bit hashes — materialize this as its own column before
    * calling [[simhash64]] so the 64 bit-counts share one hash pass. */
  def tokenHashes(tokens: Column): Column =
    transform(tokens, t => xxhash64(t))

  /** 64-bit SimHash over pre-hashed tokens: bit i is set when the
    * majority of token-hash bits i are set (custom expression). */
  def simhash64(tokenHashes: Column): Column =
    Expressions.simhash64(tokenHashes)

  /** 16-bit chunks of a 64-bit simhash — pigeonhole banding: hamming
    * distance ≤ 3 ⇒ at least one of the 4 chunks is equal. */
  def simhashChunks(sim: Column): Column = simhashChunks(sim, 4)

  /** `nChunks` equal-width chunks of a 64-bit hash — the generalized
    * pigeonhole: hamming ≤ nChunks−1 ⇒ at least one chunk equal.
    * 4×16-bit covers radius 3 (65k values per position — buckets stay
    * cold); 8×8-bit covers radius 7, where real dHash near-duplicates
    * (crops, brightness shifts, aggressive re-encodes) actually live —
    * at 256 values per position its buckets run ~256× hotter, so the
    * radius-7 mode leans on the callers' hot-bucket caps rather than
    * luck. Chunks ordered low→high so chunk index 0 is always the
    * lowest bits regardless of width. */
  def simhashChunks(sim: Column, nChunks: Int): Column = {
    require(nChunks == 4 || nChunks == 8,
      s"chunk count must be 4 (radius 3) or 8 (radius 7), got $nChunks")
    val w = 64 / nChunks
    val m = (1L << w) - 1
    array((0 until nChunks).map(c =>
      shiftrightunsigned(sim, c * w).bitwiseAND(m)): _*)
  }

  /** The 17-key 1-bit ball of a 16-bit chunk value: the value plus its
    * 16 one-bit flips — the multi-probe side of the radius-4..7 scheme
    * (hamming ≤ 7 over 4 chunks ⇒ some chunk has ≤ 1 error ⇒ that
    * chunk's exact key on one side meets the other side's ball). */
  def oneBitBall(cval: Column): Column =
    array((cval +: (0 until 16).map(i =>
      cval.bitwiseXOR(lit(1L << i)))): _*)

  /** Hamming distance between two 64-bit hashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b)).cast("long")

  /** Exact Jaccard over two distinct-element arrays (used to verify LSH
    * candidates). Integer-ratio division — deterministic. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b)).cast("double")
    val union = size(array_union(a, b)).cast("double")
    when(union === 0.0, lit(0.0)).otherwise(inter / union)
  }
}
