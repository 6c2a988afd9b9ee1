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
    * double, left-to-right (deterministic). Codegen expression since
    * round-17 (one loop per row instead of an interpreted lambda per
    * element); bit-identical incl. the null/length-mismatch edges —
    * pinned against the retained HOF sibling in VectorExprEquivSpec. */
  def dot(a: Column, b: Column): Column = Expressions.dotProduct(a, b)

  /** Pre-round-17 HOF formulation — differential oracle for
    * VectorExprEquivSpec only. */
  private[graft] def dotHof(a: Column, b: Column): Column =
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
    * 4× (float32→int8); recall loss is the standard SQ8 trade.
    * Codegen expression since round-17: the HOF form's per-element
    * lambda referenced the dim-length `array_max` scale subtree
    * INSIDE the lambda (HOF subtrees are CSE-exempt), re-evaluating
    * it per element — dim² interpreted work per row. Bit-identical
    * semantics pinned in VectorExprEquivSpec. */
  def quantizeInt8(a: Column): Column = Expressions.quantizeInt8(a)

  /** Pre-round-17 HOF formulation — differential oracle for
    * VectorExprEquivSpec only. */
  private[graft] def quantizeInt8Hof(a: Column): Column = {
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

  /** The nBits×dim plane matrix the codegen expressions take as a
    * reference object (one shared array per plan, not nBits×dim
    * literal nodes). */
  private def planeMatrix(dim: Int, nBits: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim)((j, d) => planeComponent(j, d))

  /** Sign-bit LSH bucket id: bit j of the bucket is the sign of the dot
    * product with pseudo-random hyperplane j. `nBits` buckets of
    * expected size n/2^nBits; cosine-close vectors land in the same
    * bucket w.h.p. (random-hyperplane LSH).
    *
    * Round-17: custom codegen expression (one tight loop per row) in
    * place of the HOF formulation — nBits interpreted
    * aggregate-over-zip_with passes per row, dim×nBits lambda calls on
    * the CORPUS side of every LSH query (opt guide §4 / §1.2 "per-task
    * work"). Bit-identical output incl. null/NaN edges — proven
    * against the retained HOF sibling in HyperplaneExprEquivSpec. */
  def hyperplaneBucket(vec: Column, dim: Int, nBits: Int): Column =
    Expressions.hyperplaneBucket(vec, planeMatrix(dim, nBits))

  /** The pre-round-17 HOF formulation, retained as the differential
    * oracle for HyperplaneExprEquivSpec (not used in query paths). */
  private[graft] def hyperplaneBucketHof(vec: Column, dim: Int,
      nBits: Int): Column =
    (0 until nBits).map { j =>
      val proj = projection(vec, dim, j)
      when(proj >= 0.0, lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  private def projection(vec: Column, dim: Int, j: Int): Column =
    aggregate(
      zip_with(vec,
        array((0 until dim).map(d => lit(planeComponent(j, d))): _*),
        (x, p) => x.cast("double") * p),
      lit(0.0), (acc, v) => acc + v)

  /** Per-plane ranking array — ONE dim-length pass that carries
    * everything both the primary bucket and multi-probe expansion
    * need: struct(m = |projection|, mask = bit j, bit = mask when the
    * sign bit is set else 0). Codegen expression since round-17 (same
    * rationale and equivalence proof as [[hyperplaneBucket]]); the
    * two-step-select advice below still applies to the DERIVED
    * expressions (probe expansion references the array repeatedly). */
  def rankedPlanes(vec: Column, dim: Int, nBits: Int): Column =
    Expressions.hyperplaneRanked(vec, planeMatrix(dim, nBits))

  /** Pre-round-17 HOF formulation of [[rankedPlanes]] — differential
    * oracle for HyperplaneExprEquivSpec only. */
  private[graft] def rankedPlanesHof(vec: Column, dim: Int,
      nBits: Int): Column =
    array((0 until nBits).map { j =>
      val p = projection(vec, dim, j)
      struct(abs(p).as("m"), lit(1L << j).as("mask"),
        when(p >= 0.0, lit(1L << j)).otherwise(lit(0L)).as("bit"))
    }: _*)

  /** Primary sign-bit bucket derived from [[rankedPlanes]] output —
    * O(nBits) longs, no dim-length work. */
  def bucketFromRanked(ranked: Column): Column =
    aggregate(ranked, lit(0L), (acc, s) => acc.bitwiseOR(s.getField("bit")))

  /** Multi-probe bucket list (size `nProbe`) from [[rankedPlanes]]
    * output: the primary bucket first, then the buckets reached by
    * flipping ONE bit each, in ascending |projection| order — the bits
    * the vector was least confident about are the likeliest to differ
    * for a true neighbor (standard multi-probe LSH perturbation).
    * Raises recall at a fixed nBits without re-bucketing the corpus:
    * only the QUERY side fans out. */
  def probesFromRanked(ranked: Column, nBits: Int, nProbe: Int): Column = {
    require(nProbe >= 1 && nProbe <= nBits + 1,
      s"nProbe=$nProbe out of range 1..${nBits + 1}")
    val primary = bucketFromRanked(ranked)
    if (nProbe == 1) array(primary)
    else {
      // struct sort orders by first field (the margin)
      val flipMasks =
        slice(transform(array_sort(ranked), s => s.getField("mask")),
          1, nProbe - 1)
      concat(array(primary),
        transform(flipMasks, mk => primary.bitwiseXOR(mk)))
    }
  }

  /** Single-expression convenience form of the above (the dot products
    * appear in several subtrees; prefer the rankedPlanes two-step in
    * per-row hot paths). */
  def hyperplaneProbes(vec: Column, dim: Int, nBits: Int, nProbe: Int): Column =
    probesFromRanked(rankedPlanes(vec, dim, nBits), nBits, nProbe)
}
