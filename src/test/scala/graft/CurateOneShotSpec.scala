package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal}

/** Round-18 optimization guard: `Dedup.curateOneShot` computes the
  * composed one-shot curation pipeline — `hashNearDup → components →
  * keepBestInGroups` (the x137 showcase shape) — in LINEAR candidate
  * space: full-hash equality classes collapse in one aggregate, and
  * (at maxHamming > 0) only one representative per distinct hash
  * enters the pair search, with per-class winner partials folded
  * across merged classes. This spec is the differential proof: the
  * composed pipeline, built verbatim from its public pieces, must
  * produce the identical survivor multiset over random clustered
  * geometries, engineered cross-class near-collisions at and beyond
  * the hamming threshold, multi-probe radii, null hashes, and
  * null/tied qualities. */
class CurateOneShotSpec extends SparkSpec {
  import spark.implicits._

  /** The declared composed pipeline, verbatim. */
  private def composed(docs: DataFrame, h: Int): DataFrame = {
    val pairs = Multimodal.hashNearDup(
      docs.select(col("doc_id"), col("ph")), "doc_id", "ph", h)
    val labels = Dedup.components(pairs, aCol = "id_a", bCol = "id_b")
    Dedup.keepBestInGroups(docs, labels, "doc_id", "quality")
      .select(col("doc_id"), col("ph"), col("quality"), col("n_copies"))
  }

  private def outSet(df: DataFrame): Set[(Long, Option[Long], Option[Long], Long)] =
    df.select(col("doc_id"), col("ph"), col("quality"), col("n_copies"))
      .as[(Long, Option[Long], Option[Long], Long)].collect().toSet

  private def check(docs: DataFrame, h: Int, label: String): Unit = {
    val fast = Dedup.curateOneShot(docs, "doc_id", "ph", "quality", h)
    val gen = composed(docs, h)
    assert(outSet(fast) === outSet(gen), s"$label: survivors diverge")
  }

  test("random clustered geometries: one-shot ≡ composed at h = 0 and 3") {
    val rnd = new scala.util.Random(1818)
    for (trial <- 1 to 3) {
      val centers = Array.fill(6)(rnd.nextLong())
      val docs = (1L to 60L).map { id =>
        (id, centers(rnd.nextInt(6)), rnd.nextInt(7).toLong)
      }.toDF("doc_id", "ph", "quality")
      check(docs, 0, s"trial $trial h=0")
      check(docs, 3, s"trial $trial h=3")
    }
  }

  test("cross-class near-collisions merge classes exactly like composed") {
    // c2 = c1 with 2 bits flipped (merges at h >= 2), c3 = c1 with 4
    // bits flipped (must NOT merge at h = 3; bridges via c2 at h >= 2
    // since hamming(c2, c3) = 2), far is unrelated
    val c1 = 0x1234_5678_9ABC_DEF0L
    val c2 = c1 ^ 0x0000_0000_0000_0003L // hamming 2 from c1
    val c3 = c1 ^ 0x0000_0000_0000_000FL // hamming 4 from c1, 2 from c2
    val far = 0x7777_0000_1111_CCCCL
    val docs = Seq(
      (1L, c1, 5L), (2L, c1, 5L), (3L, c1, 9L),
      (10L, c2, 1L), (11L, c2, 8L),
      (20L, c3, 4L), (21L, c3, 4L),
      (30L, far, 2L)).toDF("doc_id", "ph", "quality")
    for (h <- Seq(0, 1, 2, 3)) check(docs, h, s"near-collision h=$h")
  }

  test("multi-probe radii (4-7) keep rep-level search equivalent") {
    val c1 = 0x0F0F_0F0F_0F0F_0F0FL
    val c2 = c1 ^ 0x001F_0000_0000_0000L // hamming 5
    val c3 = c1 ^ 0x8000_0000_0000_0001L // hamming 2
    val docs = Seq(
      (1L, c1, 3L), (2L, c1, 7L),
      (10L, c2, 9L), (11L, c2, 9L), // quality tie -> min id
      (20L, c3, 0L)).toDF("doc_id", "ph", "quality")
    for (h <- Seq(4, 5, 7)) check(docs, h, s"multi-probe h=$h")
  }

  test("null hashes pass through; null qualities lose; ties break to min id") {
    val docs = Seq(
      (1L, Some(42L), Some(5L)),
      (2L, Some(42L), None), // null quality loses to any score
      (3L, Some(42L), Some(5L)), // tie with 1 -> 1 wins
      (4L, None, Some(9L)), // null hash: passes through, n_copies 1
      (5L, None, None), // null hash AND quality: still its own row
      (6L, Some(99L), None), (7L, Some(99L), None) // all-null group -> min id
    ).toDF("doc_id", "ph", "quality")
    check(docs, 0, "nulls h=0")
    check(docs, 3, "nulls h=3")
    // and pin the absolute expectation, not only the equivalence
    val got = Dedup.curateOneShot(docs, "doc_id", "ph", "quality", 0)
    val rows = got.select(col("doc_id"), col("n_copies"))
      .as[(Long, Long)].collect().toMap
    assert(rows === Map(1L -> 3L, 4L -> 1L, 5L -> 1L, 6L -> 2L))
  }

  test("merged-group survivor carries its own hash and quality") {
    val c1 = 0x1000_2000_3000_4000L
    val c2 = c1 ^ 0x1L // hamming 1: classes merge at h >= 1
    val docs = Seq(
      (5L, c1, 1L), (6L, c2, 8L) // winner 6 lives in the c2 class
    ).toDF("doc_id", "ph", "quality")
    val got = Dedup.curateOneShot(docs, "doc_id", "ph", "quality", 3)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === Set((6L, c2, 8L, 2L)))
    check(docs, 3, "merged-group winner hash")
  }
}
