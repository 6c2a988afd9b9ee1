package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Multimodal}

/** Round-17 optimization guard: at maxHamming = 0
  * `curateIncrementCapped` routes through the equality fast path —
  * star edges per full-hash class (Σ k rows) instead of the generic
  * screens' clique/biclique pairs (Σ k²) — with cap semantics
  * replicated from ONE fused bucket histogram. This spec is the
  * differential proof: the generic path, composed verbatim from its
  * public pieces (hashNearDupCapped + hashNearDupAgainstCapped +
  * components + keepBestInGroupsWeighted), must produce the identical
  * survivor set AND the identical overflow report on random clustered
  * geometries, including caps tight enough to drop classes and
  * engineered 16-bit chunk collisions across distinct hashes. */
class CurateEqualityFastPathSpec extends SparkSpec {
  import spark.implicits._

  /** The pre-round-17 generic body at maxHamming = 0, verbatim. */
  private def genericIncrement(survivors: DataFrame, batch: DataFrame,
      cap: Option[Int]): (DataFrame, DataFrame) = {
    val surv = survivors.select(col("doc_id"), col("ph"), col("quality"),
      col("n_copies").cast("long").as("__w")).localCheckpoint(true)
    val bat = batch.select(col("doc_id"), col("ph"), col("quality"))
      .localCheckpoint(true)
    val (pairsSelf, hotSelf) = Multimodal.hashNearDupCapped(
      bat.select(col("doc_id"), col("ph")), "doc_id", "ph", 0, cap,
      inputMaterialized = true)
    val (pairsCross, hotCross) = Multimodal.hashNearDupAgainstCapped(
      bat.select(col("doc_id"), col("ph")),
      surv.select(col("doc_id"), col("ph")), "doc_id", "ph", 0, cap,
      inputMaterialized = true)
    val edges = pairsSelf.select(col("id_a"), col("id_b"))
      .unionByName(pairsCross.select(col("id_a"), col("id_b")))
    val labels = Dedup.components(edges, aCol = "id_a", bCol = "id_b")
    val all = surv.select(col("doc_id"), col("ph"), col("quality"),
        col("__w"))
      .unionByName(bat.select(col("doc_id"), col("ph"), col("quality"),
        lit(1L).as("__w")))
    val out = Dedup.keepBestInGroupsWeighted(all, labels, "doc_id",
        "quality", "__w")
      .select(col("doc_id"), col("ph"), col("quality"), col("n_copies"))
    val overflow = hotSelf.select(lit("self").as("side"), col("chunk"),
        col("cval"), col("n_ids"))
      .unionByName(hotCross.select(lit("cross").as("side"), col("chunk"),
        col("cval"), col("n_ids")))
    (out, overflow)
  }

  private def outSet(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select(col("doc_id"), col("ph"), col("quality"), col("n_copies"))
      .as[(Long, Long, Long, Long)].collect().toSet

  private def ovfSet(df: DataFrame): Set[(String, Int, Long, Long)] =
    df.select(col("side"), col("chunk"), col("cval"), col("n_ids"))
      .as[(String, Int, Long, Long)].collect().toSet

  private def check(surv: Seq[(Long, Long, Long, Long)],
      batch: Seq[(Long, Long, Long)], cap: Option[Int],
      label: String): Unit = {
    val survDf = surv.toDF("doc_id", "ph", "quality", "n_copies")
    val batDf = batch.toDF("doc_id", "ph", "quality")
    val (fastOut, fastOvf) = Dedup.curateIncrementCapped(survDf, batDf,
      "doc_id", "ph", "quality", maxHamming = 0, maxBucket = cap)
    val (genOut, genOvf) = genericIncrement(survDf, batDf, cap)
    assert(outSet(fastOut) === outSet(genOut), s"$label: survivors diverge")
    assert(ovfSet(fastOvf) === ovfSet(genOvf), s"$label: overflow diverges")
  }

  test("random clustered geometries, uncapped: fast ≡ generic") {
    val rnd = new scala.util.Random(4242)
    for (trial <- 1 to 4) {
      val centers = Array.fill(5)(rnd.nextLong())
      val surv = (1L to 20L).map { id =>
        (id, centers(rnd.nextInt(5)), rnd.nextInt(10).toLong,
          1L + rnd.nextInt(4)) }
      val batch = (100L to 140L).map { id =>
        (id, centers(rnd.nextInt(5)), rnd.nextInt(10).toLong) }
      check(surv, batch, None, s"uncapped trial $trial")
    }
  }

  test("tight caps drop classes: fast ≡ generic incl. overflow") {
    val rnd = new scala.util.Random(777)
    for (trial <- 1 to 4) {
      val centers = Array.fill(4)(rnd.nextLong())
      // class sizes straddle the cap: some classes hot on the self
      // side only, some on the two-sided sum only, some cold
      val surv = (1L to 30L).map { id =>
        (id, centers(rnd.nextInt(4)), rnd.nextInt(10).toLong,
          1L + rnd.nextInt(3)) }
      val batch = (100L to 160L).map { id =>
        (id, centers(rnd.nextInt(4)), rnd.nextInt(10).toLong) }
      for (cap <- Seq(Some(2), Some(8), Some(24)))
        check(surv, batch, cap, s"trial $trial cap $cap")
    }
  }

  test("engineered 16-bit chunk collision across distinct hashes") {
    // h2/h3 share chunk 0 with h1 (same low 16 bits) but differ in
    // every other chunk: bucket (0, low16) aggregates ACROSS classes,
    // so a cap of 4 kills chunk 0 for all three classes while their
    // other chunks stay cold — classes must still fully merge (alive
    // via a cold chunk), and the single hot bucket must be reported
    // once per screen, with the cross count = both sides' members.
    val low = 0xBEEFL
    val h1 = 0x1111_2222_3333_0000L | low
    val h2 = 0x4444_5555_6666_0000L | low
    val h3 = 0x7777_8888_9999_0000L | low
    val surv = Seq((1L, h1, 5L, 2L), (2L, h2, 3L, 1L))
    val batch = Seq((10L, h1, 7L), (11L, h1, 1L), (12L, h2, 9L),
      (13L, h3, 2L), (14L, h3, 4L))
    check(surv, batch, Some(4), "chunk collision cap 4")
    check(surv, batch, Some(2), "chunk collision cap 2")
    check(surv, batch, None, "chunk collision uncapped")
  }

  test("one-sided classes and null hashes pass through both paths") {
    val far1 = 0x0123_4567_89AB_CDEFL
    val far2 = 0x0FED_CBA9_8765_4321L
    val surv = Seq((1L, far1, 5L, 3L), // surv-only class (never merges)
      (2L, 0x7L, 9L, 2L))
    val batch = Seq((10L, far2, 4L), (11L, far2, 6L), // bat-only class
      (20L, 0x7L, 1L))                               // joins survivor 2
    check(surv, batch, Some(4096), "one-sided classes")
    // null hash rows pass through ungrouped with their own weight
    val survN = Seq((1L, java.lang.Long.valueOf(5L), 5L, 3L),
      (2L, null.asInstanceOf[java.lang.Long], 9L, 2L))
      .toDF("doc_id", "ph", "quality", "n_copies")
    val batN = Seq((10L, java.lang.Long.valueOf(5L), 7L),
      (11L, null.asInstanceOf[java.lang.Long], 1L))
      .toDF("doc_id", "ph", "quality")
    val (fastOut, _) = Dedup.curateIncrementCapped(survN, batN,
      "doc_id", "ph", "quality", maxHamming = 0)
    val rows = fastOut.select(col("doc_id"), col("n_copies"))
      .as[(Long, Long)].collect().toMap
    assert(rows === Map(10L -> 4L, 2L -> 2L, 11L -> 1L))
  }
}
