package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import MetamorphicHarness._
import graft.ext.{Dedup, Sampling}
import graft.operators.Profile

/** Split-union consistency (metamorphic family, engine-only — see
  * [[MetamorphicHarness]]): for mergeable operators,
  * op(A ∪ B) ≡ merge(op(A), op(B)). This is the distributed-combine
  * contract itself — the property that makes map-side partial
  * aggregation, incremental corpus updates, and cross-datacenter
  * rollups CORRECT — checked directly, with no oracle in the loop.
  * A and B split the sf0.001 documents by doc_id parity (disjoint,
  * covering).
  */
class MetamorphicSplitUnionSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").localCheckpoint(true)
  private lazy val partA = docs.filter(col("doc_id") % 2 === 0)
    .localCheckpoint(true)
  private lazy val partB = docs.filter(col("doc_id") % 2 === 1)
    .localCheckpoint(true)

  test("uniform sampling distributes over union (exact rows)") {
    val full = Sampling.uniform(docs, col("doc_id"), 0.3)
    val merged = Sampling.uniform(partA, col("doc_id"), 0.3)
      .unionByName(Sampling.uniform(partB, col("doc_id"), 0.3))
    assertSame("uniform split-union", full, merged)
    assert(full.count() > 0, "empty sample — vacuous")
  }

  test("stratified sampling distributes over union (exact rows)") {
    val rates = Map("en" -> 0.5, "de" -> 0.2)
    val full = Sampling.stratified(docs, col("doc_id"), col("lang"),
      rates, 0.1)
    val merged = Sampling.stratified(partA, col("doc_id"), col("lang"),
        rates, 0.1)
      .unionByName(Sampling.stratified(partB, col("doc_id"), col("lang"),
        rates, 0.1))
    assertSame("stratified split-union", full, merged)
  }

  test("moment partials combine exactly across a corpus split") {
    val full = Profile.momentsFinalize(Profile.momentsCombine(
      Profile.momentPartials(docs, col("lang"), col("n_chars"))))
    val merged = Profile.momentsFinalize(Profile.momentsCombine(
      Profile.momentPartials(partA, col("lang"), col("n_chars"))
        .unionByName(
          Profile.momentPartials(partB, col("lang"), col("n_chars")))))
    assertSame("moments split-union", full, merged)
  }

  test("CMS sketches add cell-wise across a corpus split") {
    val sketchFull = Profile.cmsCombine(
      Profile.cmsPartials(docs, col("lang"), xxhash64(col("text"))))
    val sketchMerged = Profile.cmsCombine(
      Profile.cmsPartials(partA, col("lang"), xxhash64(col("text")))
        .unionByName(
          Profile.cmsPartials(partB, col("lang"), xxhash64(col("text")))))
    assertSame("cms split-union", sketchFull, sketchMerged)
    // and the estimates a consumer reads agree too
    val probes = docs.select(xxhash64(col("text")).as("k")).distinct()
      .limit(50).localCheckpoint(true)
    assertSame("cms estimates",
      Profile.cmsEstimate(sketchFull, probes, "k"),
      Profile.cmsEstimate(sketchMerged, probes, "k"))
  }

  test("HLL distinct sketches union to the same estimate") {
    val full = Profile.distinctCombine(
      Profile.distinctPartials(docs, col("lang"), col("text")))
      .select(col("n_rows"), col("distinct_est"))
    val merged = Profile.distinctCombine(
      Profile.distinctPartials(partA, col("lang"), col("text"))
        .unionByName(
          Profile.distinctPartials(partB, col("lang"), col("text"))))
      .select(col("n_rows"), col("distinct_est"))
    assertSame("hll split-union", full, merged)
  }

  test("incremental exact dedup composes to the one-shot result") {
    // survivors(incremental: A first, then B against A) must equal
    // survivors(one shot over A ∪ B) — partA holds the lower-id halves
    // per fingerprint? No: parity split, so first-occurrence winners
    // can sit in either part. Composition is still exact because the
    // incremental contract dedups B against ALL of A and itself; the
    // one-shot winner (min id per fingerprint) only matches when A
    // holds the lower ids, so split by id RANGE here instead.
    val mid = docs.agg(avg(col("doc_id"))).collect()(0).getDouble(0)
    val lo = docs.filter(col("doc_id") <= mid).localCheckpoint(true)
    val hi = docs.filter(col("doc_id") > mid).localCheckpoint(true)
    val oneShot = Dedup.incrementalExact(docs.limit(0), docs,
      "doc_id", "text")
    val composed = Dedup.incrementalExact(docs.limit(0), lo,
        "doc_id", "text")
      .unionByName(Dedup.incrementalExact(lo, hi, "doc_id", "text"))
    assertSame("incremental dedup composition",
      oneShot.select(col("doc_id"), col("fingerprint")),
      composed.select(col("doc_id"), col("fingerprint")))
  }

  test("TEETH: a position-dependent sample mutant is flagged") {
    // seeded mutant: "sampling" by row position instead of key hash —
    // the exact bug class split-union consistency exists to catch
    def mutantSample(df: DataFrame): DataFrame = df.limit(30)
    val full = mutantSample(docs)
    val merged = mutantSample(partA).unionByName(mutantSample(partB))
    assert(diff(full, merged).isDefined,
      "checker failed to flag a position-dependent sample")
  }
}
