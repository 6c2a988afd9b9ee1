package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 optimization guard: `hyperplaneBucket` / `rankedPlanes`
  * were rewritten from the HOF formulation (nBits interpreted
  * aggregate-over-zip_with passes per row) to one-loop codegen
  * expressions. This spec pins the rewrite to the retained HOF
  * siblings on adversarial vectors — incl. the edges where the HOF
  * null/NaN semantics are non-obvious:
  *  - null vector / wrong length / null element → EVERY projection is
  *    null (zip_with null-pads, `acc + null` sticks), so the bucket is
  *    0L (never null — `when().otherwise(0)` coalesces) and each
  *    ranked struct reads (m=null, mask, bit=0);
  *  - NaN element → NaN projection, whose sign bit is SET (Spark's
  *    nan-safe ordering puts NaN above every double, so `p >= 0.0` is
  *    true);
  *  - exact 0.0 and -0.0 projections → sign bit set (0.0 >= 0.0;
  *    Spark compares -0.0 == 0.0).
  */
class HyperplaneExprEquivSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{VectorFunctions => V}

  private val dim = 4
  private val nBits = 6

  private def vecs = Seq(
    (0L, Array(1.0f, 2.0f, -3.0f, 0.5f)),
    (1L, Array(0.0f, 0.0f, 0.0f, 0.0f)),      // zero vector: proj 0.0
    (2L, Array(-1.0f, -2.0f, -3.0f, -4.0f)),
    (3L, Array(1.5f, -0.25f, 8.0f, -7.75f)),
    (4L, Array(Float.NaN, 1.0f, 1.0f, 1.0f)), // NaN poisons to NaN
    (5L, Array(1.0f, 2.0f)),                  // too short → null projs
    (6L, Array(1.0f, 2.0f, 3.0f, 4.0f, 5.0f)),// too long → null projs
    (7L, Array.empty[Float]),                 // empty → null projs
    (8L, null.asInstanceOf[Array[Float]]),    // null vector
    (9L, Array(Float.NegativeInfinity, 1.0f, 0.0f, 0.0f)),
    (10L, Array(-0.0f, -0.0f, -0.0f, -0.0f))  // -0.0 products
  )

  test("codegen bucket ≡ HOF bucket (incl. null/NaN/length edges)") {
    val df = vecs.toDF("id", "v")
    val rows = df.select(col("id"),
        V.hyperplaneBucket(col("v"), dim, nBits).as("nw"),
        V.hyperplaneBucketHof(col("v"), dim, nBits).as("old"))
      .select(col("id"), col("nw"), col("old"),
        col("nw").isNull.as("nn"), col("old").isNull.as("on"))
      .as[(Long, Long, Long, Boolean, Boolean)].collect()
    rows.foreach { case (id, nw, old, nn, on) =>
      assert(!nn && !on, s"vector $id: nullability diverged ($nn vs $on)")
      assert(nw === old, s"vector $id: bucket $nw != HOF $old")
    }
  }

  test("codegen rankedPlanes ≡ HOF rankedPlanes, nan-safe field equality") {
    val df = vecs.toDF("id", "v")
    // EqualNullSafe over the struct arrays: Spark's nan-safe equality
    // treats NaN = NaN, so a NaN margin compares equal on both sides
    val rows = df.select(col("id"),
        (V.rankedPlanes(col("v"), dim, nBits) <=>
          V.rankedPlanesHof(col("v"), dim, nBits)).as("eq"))
      .as[(Long, Boolean)].collect()
    rows.foreach { case (id, eq) =>
      assert(eq, s"vector $id: ranked planes diverged")
    }
  }

  test("derived multi-probe buckets identical through the rewrite") {
    // probesFromRanked consumes the struct array (array_sort on the
    // margin incl. the null-margin degenerate rows) — pin the DERIVED
    // output, the thing lshTopK actually joins on
    val df = vecs.toDF("id", "v")
    val rows = df
      .select(col("id"), V.rankedPlanes(col("v"), dim, nBits).as("rp"),
        V.rankedPlanesHof(col("v"), dim, nBits).as("rph"))
      .select(col("id"),
        (V.probesFromRanked(col("rp"), nBits, nProbe = 4) <=>
          V.probesFromRanked(col("rph"), nBits, nProbe = 4)).as("eq"))
      .as[(Long, Boolean)].collect()
    rows.foreach { case (id, eq) =>
      assert(eq, s"vector $id: probe list diverged")
    }
  }

  test("random float vectors: buckets and ranked planes bit-identical") {
    val rnd = new scala.util.Random(1717)
    val data = (0L until 200L).map { i =>
      (i, Array.fill(dim)((rnd.nextFloat() - 0.5f) * 20f))
    }
    val df = data.toDF("id", "v")
    val bad = df.select(
        (V.hyperplaneBucket(col("v"), dim, nBits) ===
          V.hyperplaneBucketHof(col("v"), dim, nBits)).as("be"),
        (V.rankedPlanes(col("v"), dim, nBits) <=>
          V.rankedPlanesHof(col("v"), dim, nBits)).as("re"))
      .filter(!col("be") || !col("re")).count()
    assert(bad === 0L)
  }
}
