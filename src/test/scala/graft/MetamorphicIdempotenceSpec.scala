package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import MetamorphicHarness._
import graft.ext.Dedup

/** Curation idempotence (metamorphic family, engine-only — see
  * [[MetamorphicHarness]]): a curated corpus re-curated is a fixed
  * point. curate(curate(C)) ≡ curate(C) needs no oracle and catches
  * the bug class where the survivor election is itself unstable
  * (non-deterministic winners, groups that re-form differently,
  * fingerprints that shift on re-read).
  */
class MetamorphicIdempotenceSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private lazy val docs =
    spark.read.parquet(s"$sfDir/documents.parquet").localCheckpoint(true)

  test("exact keep-best curation is a fixed point (survivor set)") {
    val once = Dedup.keepBest(docs, "doc_id", "text", "n_chars")
      .select(docs.columns.map(col).toSeq: _*).localCheckpoint(true)
    val twice = Dedup.keepBest(once, "doc_id", "text", "n_chars")
      .select(docs.columns.map(col).toSeq: _*)
    assertSame("keepBest idempotence", once, twice)
    // and the survivor set is pairwise non-duplicate: re-running exact
    // dedup on it finds only singleton groups
    val regroup = Dedup.exact(once, "doc_id", "text")
    assert(regroup.filter(col("n_docs") > 1).count() == 0,
      "keepBest survivors still contain exact duplicates")
  }

  test("near-dup curation leaves zero re-detectable pairs") {
    // minhash-LSH pairs -> components -> keep best per group; the
    // SAME detector re-run on the survivors must find nothing: every
    // detected pair was inside one group, and exactly one member of
    // each group survived. (Uncapped — caps trade recall and void
    // this contract by design.)
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text")
    val labels = Dedup.components(pairs)
    val survivors = Dedup.keepBestInGroups(docs, labels, "doc_id", "n_chars")
      .select(docs.columns.map(col).toSeq: _*).localCheckpoint(true)
    assert(pairs.count() > 0,
      "corpus has no near-dup pairs — the invariant would be vacuous")
    val again = Dedup.minhashLsh(survivors, "doc_id", "text")
    assert(again.count() == 0,
      s"re-detected ${again.count()} pairs on curated survivors")
  }

  test("exact dedup group frame is a fixed point under re-grouping") {
    val groups = Dedup.exact(docs, "doc_id", "text").localCheckpoint(true)
    // keep the representative doc per fingerprint, re-group: the group
    // frame must be the same fingerprints, all n_docs = 1, same reps
    val reps = docs.join(
      groups.select(col("rep_doc_id").as("doc_id")), Seq("doc_id"))
    val regroups = Dedup.exact(reps, "doc_id", "text")
    assertSame("exact regroup",
      groups.select(col("fingerprint"), col("rep_doc_id")),
      regroups.select(col("fingerprint"), col("rep_doc_id")))
    assert(regroups.filter(col("n_docs") =!= 1).count() == 0)
  }

  test("curateIncrement with an empty batch is the identity") {
    val withHash = docs.select(col("doc_id"),
      xxhash64(col("text")).as("h"), col("n_chars"))
    // bootstrap a survivor set, then increment with nothing
    val pairs = graft.ext.Multimodal.hashNearDup(
      withHash.select(col("doc_id"), col("h")), "doc_id", "h", 0)
    val labels = Dedup.components(
      pairs, aCol = "id_a", bCol = "id_b")
    val survivors = Dedup.keepBestInGroups(withHash, labels, "doc_id",
      "n_chars")
      .select(col("doc_id"), col("h"), col("n_chars"),
        col("n_copies")).localCheckpoint(true)
    val emptyBatch = withHash.limit(0)
    val next = Dedup.curateIncrement(survivors, emptyBatch, "doc_id",
      "h", "n_chars", maxHamming = 0)
    assertSame("curateIncrement empty-batch identity", survivors,
      next.select(col("doc_id"), col("h"), col("n_chars"),
        col("n_copies")))
  }

  test("TEETH: an unstable curation mutant is flagged") {
    // seeded mutant: curation that also drops the max-id survivor —
    // each application shrinks the set, so the fixed-point check MUST
    // fail on it
    def mutantCurate(c: DataFrame): DataFrame = {
      val kept = Dedup.keepBest(c, "doc_id", "text", "n_chars")
        .select(c.columns.map(col).toSeq: _*)
      val worst = kept.agg(max(col("doc_id"))).collect()(0).getLong(0)
      kept.filter(col("doc_id") =!= worst)
    }
    val once = mutantCurate(docs).localCheckpoint(true)
    val twice = mutantCurate(once)
    assert(diff(once, twice).isDefined,
      "checker failed to flag a non-idempotent curation")
  }
}
