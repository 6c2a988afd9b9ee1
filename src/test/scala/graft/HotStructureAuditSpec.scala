package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal}

/** The ungoverned-path candidate-mass pre-audit (round-17 verdict item
  * 2): `Dedup.simhash` / `Multimodal.hashNearDup` with maxBucket=None
  * measure the (chunk, value) bucket histogram BEFORE committing to
  * the exact join and refuse hot-structured corpora with the governed
  * recipe — the caller no longer has to know the corpus is quadratic
  * (the x3 1000× disk-fill lesson, BASELINE round-16 addendum 6).
  * CI-scale teeth: a synthetic hot corpus against a lowered bound.
  */
class HotStructureAuditSpec extends SparkSpec {
  import spark.implicits._

  // 200 docs sharing ONE hash → every (chunk, value) bucket is 200
  // wide → projected mass = 4 · 200² = 160k
  private def hotCorpus = (1 to 200).map(i => (i.toLong, 0x1234L))
    .toDF("id", "h")

  test("hot corpus trips the audit with widths and the governed recipe") {
    val e = intercept[Multimodal.HotStructureException] {
      Multimodal.hashNearDup(hotCorpus, "id", "h",
        maxProjectedCandidates = 100000L)
    }
    assert(e.getMessage.contains("width=200"), e.getMessage)
    assert(e.getMessage.contains("simhashCapped"), e.getMessage)
    assert(e.getMessage.contains("maxBucket"), e.getMessage)
  }

  test("the same corpus under the governed surface completes (drop-and-report)") {
    val (pairs, overflow) = Multimodal.hashNearDupCapped(
      hotCorpus, "id", "h", maxBucket = Some(64))
    assert(pairs.count() == 0, "every bucket hot: no pairs survive")
    assert(overflow.count() == 4, "all four chunk buckets reported hot")
  }

  test("a healthy corpus passes the audit silently") {
    val cold = (1 to 200).map(i => (i.toLong, i.toLong * 0x9E3779B97F4A7C15L))
      .toDF("id", "h")
    // same lowered bound: distinct hashes → bucket widths ~1 → mass ~N
    val pairs = Multimodal.hashNearDup(cold, "id", "h",
      maxProjectedCandidates = 100000L)
    assert(pairs.count() >= 0) // executes without refusal
  }

  test("bipartite ungoverned screen is audited too") {
    val e = intercept[Multimodal.HotStructureException] {
      Multimodal.hashNearDupAgainst(hotCorpus,
        hotCorpus.select((col("id") + 1000).as("id"), col("h")),
        "id", "h", maxProjectedCandidates = 100000L)
    }
    assert(e.getMessage.contains("hashNearDupAgainst"), e.getMessage)
  }

  test("simhash text surface plumbs the bound through") {
    val docs = (1 to 300).map(i =>
      (i.toLong, "the same boilerplate text repeated verbatim everywhere"))
      .toDF("doc_id", "text")
    val e = intercept[Multimodal.HotStructureException] {
      Dedup.simhash(docs, "doc_id", "text",
        maxProjectedCandidates = 100000L)
    }
    assert(e.getMessage.contains("simhashCapped"), e.getMessage)
  }

  test("radius 4-7 audits with the 17x probe factor") {
    // 80 docs, one shared hash: mass = 4 · 80² · 17 = 435200 > 400k;
    // without the probe factor it would be 25600 — under the bound
    val small = (1 to 80).map(i => (i.toLong, 0x42L)).toDF("id", "h")
    intercept[Multimodal.HotStructureException] {
      Multimodal.hashNearDup(small, "id", "h", maxHamming = 7,
        maxProjectedCandidates = 400000L)
    }
    // and at radius 3 the same corpus/bound passes (25600 < 400k)
    val ok = Multimodal.hashNearDup(small, "id", "h", maxHamming = 3,
      maxProjectedCandidates = 400000L)
    assert(ok.count() == 80L * 79 / 2, "all pairs at hamming 0")
  }
}
