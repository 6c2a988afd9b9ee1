package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Corruption matrix for the dedup guarantee surfaces (x2/x3/x13
  * gates) — the dedup sibling of `AnnGateTeethSpec`: each gate
  * boolean must flip FALSE under the tampering it claims to catch,
  * and the exact-dup anchors must count planted duplicates. */
class DedupGateTeethSpec extends SparkSpec {
  import spark.implicits._

  /** 20 distinct 8-token docs; 1≡11 and 4≡14 planted exact dups so
    * the recall floors have real pairs to guard. */
  private def docs: DataFrame = {
    def text(i: Int): String = {
      val src = if (i == 11) 1 else if (i == 14) 4 else i
      (0 until 8).map(j => s"w${(src * 13 + j * 7) % 101}x$j").mkString(" ")
    }
    (0 until 20).map(i => (i.toLong, text(i))).toDF("doc_id", "text")
  }

  // ---- x2 (MinHash-LSH) gate ----

  private def lshPairs: DataFrame =
    Dedup.minhashLsh(docs, "doc_id", "text")

  private def mg(p: DataFrame): (Long, Long, Boolean, Boolean) =
    ExtQueries.minhashGate(docs, p)
      .as[(Long, Long, Boolean, Boolean)].head()

  test("minhashGate clean: anchors exact, booleans TRUE") {
    val (nDocs, nDup, floor, verified) = mg(lshPairs)
    assert(nDocs === 20L)
    assert(nDup === 2L) // (1,11) and (4,14)
    assert(floor)
    assert(verified)
  }

  test("minhashGate: dropping a planted exact-dup pair trips the floor") {
    val tampered = lshPairs.filter(
      !(col("doc_a") === 1L && col("doc_b") === 11L))
    val (_, nDup, floor, _) = mg(tampered)
    assert(nDup === 2L) // anchor from docs, not the result
    assert(!floor)
  }

  test("minhashGate: perturbing an emitted jaccard is caught") {
    val tampered = lshPairs.withColumn("jaccard",
      when(col("doc_a") === 1L && col("doc_b") === 11L,
        col("jaccard") - 0.05).otherwise(col("jaccard")))
    assert(!mg(tampered)._4)
  }

  test("minhashGate: a smuggled below-threshold pair is caught") {
    // docs 2 and 7 share no shingles — true Jaccard 0, claimed 0.9
    val extra = Seq((2L, 7L, 0.9)).toDF("doc_a", "doc_b", "jaccard")
    assert(!mg(lshPairs.unionByName(extra))._4)
  }

  // ---- x3 (SimHash) gate ----

  private def shPairs: DataFrame = Dedup.simhash(docs, "doc_id", "text")

  private def sg(p: DataFrame): (Long, Long, Boolean, Boolean) =
    ExtQueries.simhashGate(docs, p)
      .as[(Long, Long, Boolean, Boolean)].head()

  test("simhashGate clean: anchors exact, booleans TRUE") {
    val (nDocs, nDup, floor, verified) = sg(shPairs)
    assert(nDocs === 20L)
    assert(nDup === 2L)
    assert(floor)
    assert(verified)
  }

  test("simhashGate: dropping a planted same-token-set pair trips the floor") {
    val tampered = shPairs.filter(
      !(col("doc_a") === 4L && col("doc_b") === 14L))
    assert(!sg(tampered)._3)
  }

  test("simhashGate: corrupting an emitted hamming distance is caught") {
    val tampered = shPairs.withColumn("hamming",
      when(col("doc_a") === 1L && col("doc_b") === 11L,
        col("hamming") + 1L).otherwise(col("hamming")))
    assert(!sg(tampered)._4)
  }

  test("simhashGate: a smuggled far pair (true hamming > 3) is caught") {
    val extra = Seq((2L, 7L, 0L)).toDF("doc_a", "doc_b", "hamming")
    assert(!sg(shPairs.unionByName(extra))._4)
  }

  // ---- x13 (components) gate ----

  private def labels: DataFrame = Dedup.components(lshPairs)

  private def cg(p: DataFrame, l: DataFrame): (Long, Boolean, Boolean, Boolean) =
    ExtQueries.componentsGate(docs, p, l)
      .as[(Long, Boolean, Boolean, Boolean)].head()

  test("componentsGate clean: group anchor exact, booleans TRUE") {
    val (nGroups, cog, minLab, closed) = cg(lshPairs, labels)
    assert(nGroups === 2L) // the two planted same-text groups
    assert(cog)
    assert(minLab)
    assert(closed)
  }

  test("componentsGate: splitting a group (relabeled member) is caught") {
    val tampered = labels.withColumn("group_id",
      when(col("doc_id") === 11L, lit(11L)).otherwise(col("group_id")))
    val (_, cog, _, closed) = cg(lshPairs, tampered)
    // doc 11 now sits alone: its text group spans two labels AND the
    // (1,11) pair's endpoints disagree
    assert(!cog)
    assert(!closed)
  }

  test("componentsGate: a non-min label is caught") {
    // relabel group {1,11} to its max member on BOTH members: still
    // co-grouped and closed, but the label is not the min member
    val tampered = labels.withColumn("group_id",
      when(col("group_id") === 1L, lit(11L)).otherwise(col("group_id")))
    val (_, cog, minLab, closed) = cg(lshPairs, tampered)
    assert(cog)
    assert(closed)
    assert(!minLab)
  }

  test("componentsGate: dropping a labeled member is caught") {
    val tampered = labels.filter(col("doc_id") =!= 11L)
    val (_, cog, _, closed) = cg(lshPairs, tampered)
    assert(!cog)   // null label inside a dup-text group
    assert(!closed) // the (1,11) pair has an unlabeled endpoint
  }

  // ---- keepBestInGroups (near-dup curation composition) ----

  test("keepBestInGroups keeps the max-quality member per group, passes the rest") {
    val scored = docs.withColumn("quality", col("doc_id") % 7)
    val kept = Dedup.keepBestInGroups(scored, labels, "doc_id", "quality")
      .select(col("doc_id"), col("n_copies"))
      .as[(Long, Long)].collect().toMap
    // groups {1,11} and {4,14}: 11 (q=4) beats 1 (q=1); 4 (q=4)
    // beats 14 (q=0) — one survivor each, everyone else untouched
    assert(kept.size === 18)
    assert(kept(11L) === 2L && !kept.contains(1L))
    assert(kept(4L) === 2L && !kept.contains(14L))
    assert((0 until 20).filter(i => i != 1 && i != 4 && i != 11 && i != 14)
      .forall(i => kept(i.toLong) === 1L))
  }

  test("keepBestInGroups breaks quality ties by minimum id") {
    val flat = docs.withColumn("quality", lit(1))
    val kept = Dedup.keepBestInGroups(flat, labels, "doc_id", "quality")
      .select(col("doc_id")).as[Long].collect().toSet
    assert(kept.contains(1L) && !kept.contains(11L))
    assert(kept.contains(4L) && !kept.contains(14L))
  }

  test("a NULL-quality member never beats a scored one (nulls-first struct trap)") {
    // struct ordering sorts null fields first, so an unguarded
    // min(struct(-q, id)) elects the UNSCORED row — doc 1 (null
    // quality) must lose to doc 11 (scored), and an all-null group
    // falls back to min id
    val scored = docs.withColumn("quality",
      when(col("doc_id") === 1L || col("doc_id") === 4L ||
        col("doc_id") === 14L, lit(null).cast("int"))
        .otherwise(lit(5)))
    val kept = Dedup.keepBestInGroups(scored, labels, "doc_id", "quality")
      .select(col("doc_id")).as[Long].collect().toSet
    // group {1, 11}: 11 is the only scored member -> survives
    assert(kept.contains(11L) && !kept.contains(1L),
      "scored member must beat the null-quality one")
    // group {4, 14}: both null -> min id survives
    assert(kept.contains(4L) && !kept.contains(14L),
      "all-null group falls back to min id")
  }
}
