package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Opt-in scale probe (round 16): the GOVERNED simhash variant on the
  * 1000× corpus whose unigram-dup structure is genuinely quadratic —
  * the corpus that filled the disk under the UNGOVERNED exact surface
  * (BASELINE round-16 addendum 6: replicas share ~75% of unigram
  * tokens, so all 1000 copies of a base doc sit within hamming ≤ 3 and
  * the correct exact answer is ~2.5e9 pairs).
  *
  * The production contract under that structure is drop-and-report:
  * with a maxBucket SIZED BELOW the replica-cluster width, the hot
  * (chunk, value) buckets are skipped and land in the overflow report,
  * candidate mass stays bounded by cap² per surviving bucket, and the
  * job completes on one box where the exact surface could not.
  *
  * Gated twice: GRAFT_SCALE_PROBE=1 in the env (never part of the CI
  * budget) AND the cached 1000× corpus present on disk.
  */
class GovernedScaleProbeSpec extends SparkSpec {

  test("governed simhash bounds the quadratic 1000x corpus (drop-and-report)") {
    assume(sys.env.get("GRAFT_SCALE_PROBE").contains("1"),
      "opt-in probe: set GRAFT_SCALE_PROBE=1")
    // resolved from the same env var ScaleCurve's builder uses, so the
    // probe runs from any checkout location (round-16 ADVICE); the
    // default is cwd-relative, matching ScaleCurve's outDir default
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "target/scale1000") + "/documents.parquet"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)),
      s"cached 1000x corpus not present at $dir")
    val docs = spark.read.parquet(dir)
    val t0 = System.nanoTime()
    val (pairs, overflow) = Dedup.simhashCapped(docs, "doc_id", "text",
      maxHamming = 3, maxBucket = Some(256))
    val nOver = overflow.count()
    val nPairs = pairs.count()
    val wall = (System.nanoTime() - t0) / 1e9
    info(f"1000x governed: $nPairs pairs, $nOver hot buckets dropped, " +
      f"$wall%.1f s")
    // the replica clusters (~1000-2000 members per (chunk, value)
    // position) MUST trip a 256 cap — a zero overflow would mean the
    // governor never engaged and the probe proves nothing
    assert(nOver > 0, "no bucket overflowed: governor never engaged")
    // bounded output: surviving buckets are ≤256 wide, so the pair
    // count must sit far below the ~2.5e9 exact answer
    assert(nPairs < 100000000L, s"governed pair count exploded: $nPairs")
  }

  test("UNGOVERNED simhash on the 1000x corpus is refused by the pre-audit") {
    assume(sys.env.get("GRAFT_SCALE_PROBE").contains("1"),
      "opt-in probe: set GRAFT_SCALE_PROBE=1")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR",
      "target/scale1000") + "/documents.parquet"
    assume(java.nio.file.Files.exists(java.nio.file.Paths.get(dir)),
      s"cached 1000x corpus not present at $dir")
    val docs = spark.read.parquet(dir)
    // round-17 verdict item 2: the DEFAULT bound must catch the corpus
    // that filled the disk in round 16 — the caller no longer has to
    // know to switch; the audit measures, refuses, and names the
    // governed recipe
    // the audit is EAGER (it collects its one aggregate at call time,
    // before any quadratic join is planned), so constructing the frame
    // suffices — deliberately NOT executing it: if the audit failed to
    // fire, running the plan would re-fill the disk
    val e = intercept[graft.ext.Multimodal.HotStructureException] {
      Dedup.simhash(docs, "doc_id", "text")
    }
    info(s"audit message: ${e.getMessage.take(300)}")
    assert(e.getMessage.contains("simhashCapped"), e.getMessage)
    assert(e.getMessage.contains("width="), e.getMessage)
  }
}
