package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Vector primitives over embedding columns (array<float>):
  * dot product, norm, cosine — plus sign-bit LSH bucketing for
  * approximate nearest-neighbor search. All higher-order-function
  * expressions (no UDFs); math in double.
  */
object VectorFunctions {

  /** Dot product of two equal-length float arrays, accumulated in
    * double, left-to-right (deterministic). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** L2 norm. */
  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; 0 when either vector is zero. Custom
    * expression: dot + both norms in one pass per pair. */
  def cosine(a: Column, b: Column): Column = Expressions.cosineSim(a, b)

  /** Unit-normalize a vector (array<float> → array<double>); zero
    * vectors pass through. Pre-normalized corpora turn cosine into a
    * plain dot product — at 100 TB you normalize once at ingest and
    * halve every ANN scan's arithmetic. */
  def normalize(a: Column): Column = {
    val n = l2Norm(a)
    when(n === 0.0, transform(a, x => x.cast("double")))
      .otherwise(transform(a, x => x.cast("double") / n))
  }

  /** Symmetric int8 quantization: round(x·127/scale) clamped to
    * [-127,127], with the per-vector scale = max(|x|). Storage drops
    * 4× (float32→int8); recall loss is the standard SQ8 trade. */
  def quantizeInt8(a: Column): Column = {
    val scale = array_max(transform(a, x => abs(x.cast("double"))))
    struct(
      when(scale === 0.0,
        transform(a, _ => lit(0).cast("int")))
        .otherwise(transform(a, x =>
          round(x.cast("double") * 127.0 / scale).cast("int")))
        .as("q"),
      scale.as("scale"))
  }

  /** Inverse of [[quantizeInt8]]. */
  def dequantizeInt8(qs: Column): Column =
    transform(qs.getField("q"),
      x => x.cast("double") * qs.getField("scale") / 127.0)

  /** Deterministic pseudo-random hyperplane component, plane `j`
    * dimension `d` — pure arithmetic, no PRNG state, identical on every
    * executor. Values in [-1, 1). */
  private def planeComponent(j: Int, d: Int): Double =
    (((j.toLong * 1000003L + d.toLong * 7919L + 12345L) % 2001L) - 1000L) / 1000.0

  /** Sign-bit LSH bucket id: bit j of the bucket is the sign of the dot
    * product with pseudo-random hyperplane j. `nBits` buckets of
    * expected size n/2^nBits; cosine-close vectors land in the same
    * bucket w.h.p. (random-hyperplane LSH). */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int): Column =
    (0 until nBits).map { j =>
      val proj = aggregate(
        zip_with(vec,
          array((0 until dim).map(d => lit(planeComponent(j, d))): _*),
          (x, p) => x.cast("double") * p),
        lit(0.0), (acc, v) => acc + v)
      when(proj >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
}
