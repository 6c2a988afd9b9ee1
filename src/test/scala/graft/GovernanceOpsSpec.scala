package graft

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Privacy}
import graft.operators.Profile

/** Hand-computed fixtures for the round-7 governance/curation trio:
  * k-anonymity risk profile, n-gram novelty curve, winsorized stats.
  */
class GovernanceOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---- kAnonymityProfile ----------------------------------------------

  // classes by (qi): A×1, B×2, C×5 → 3 classes, 8 rows
  private val kdf = (Seq("A") ++ Seq.fill(2)("B") ++ Seq.fill(5)("C"))
    .zipWithIndex.map { case (qi, i) => (i.toLong, qi) }.toDF("id", "qi")

  test("kAnonymityProfile counts classes and rows below each k") {
    val out = Privacy.kAnonymityProfile(kdf, Seq(col("qi")), Seq(2, 3, 6))
      .select("k", "n_classes", "classes_below", "rows_at_risk", "n_rows")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (2L, 3L, 1L, 1L, 8L),   // only the singleton A is < 2
      (3L, 3L, 2L, 3L, 8L),   // A and B
      (6L, 3L, 3L, 8L, 8L)))  // everything
  }

  test("kAnonymityProfile risk fraction is the row share at risk") {
    val fr = Privacy.kAnonymityProfile(kdf, Seq(col("qi")), Seq(3))
      .select("risk_frac").as[Double].head()
    assert(fr === 3.0 / 8.0)
  }

  test("kAnonymityProfile rejects vacuous parameters") {
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityProfile(kdf, Seq.empty, Seq(2))
    }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityProfile(kdf, Seq(col("qi")), Seq(2, 1))
    }
    intercept[IllegalArgumentException] { // a dup k would double-count
      Privacy.kAnonymityProfile(kdf, Seq(col("qi")), Seq(5, 5))
    }
  }

  // ---- noveltyProfile --------------------------------------------------

  test("noveltyProfile attributes first occurrence by arrival order") {
    val docs = Seq(
      (0L, "q q q"),     // "q q"×2 — same-doc repeats in the FIRST doc
      (1L, "a b c d"),   // a b | b c | c d — all novel
      (2L, "a b c x"),   // a b, b c seen in doc 1; c x novel
      (3L, "a b a b"),   // a b ×2 seen; b a novel
      (4L, "z")          // < n tokens — excluded
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyProfile(docs, "doc_id", "text", n = 2)
      .select("doc_id", "n_grams", "n_novel")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (0L, 2L, 2L), (1L, 3L, 3L), (2L, 3L, 1L), (3L, 3L, 1L)))
  }

  test("noveltyProfile fraction divides exactly") {
    val docs = Seq((1L, "a b c"), (2L, "a b c")).toDF("doc_id", "text")
    val out = Dedup.noveltyProfile(docs, "doc_id", "text", n = 3)
      .select("doc_id", "novelty_frac").as[(Long, Double)]
      .collect().sortBy(_._1)
    assert(out.toSeq === Seq((1L, 1.0), (2L, 0.0)))
  }

  // ---- winsorize -------------------------------------------------------

  test("winsorize clips at the exact discrete quantile elements") {
    val df = ((1L to 8L).map(v => ("g", v)) ++
      Seq(("h", 10L), ("h", 20L))).toDF("grp", "v")
    val out = Profile.winsorize(df, "grp", "v", pLo = 0.25, pHi = 0.75)
      .select("grp", "n", "n_lo", "n_hi", "lo", "hi", "winsorized_sum")
      .as[(String, Long, Long, Long, Long, Long, Long)]
      .collect().sortBy(_._1)
    // g: ceil(.25·8)=2 → lo=2, ceil(.75·8)=6 → hi=6;
    //    clipped 2,2,3,4,5,6,6,6 = 34; one below, two above
    // h: n=2 → lo=10, hi=20; nothing clips
    assert(out.toSeq === Seq(
      ("g", 8L, 1L, 2L, 2L, 6L, 34L),
      ("h", 2L, 0L, 0L, 10L, 20L, 30L)))
  }

  test("winsorize ignores null values and rejects bad bounds") {
    val df = Seq(("g", Some(10L)), ("g", None), ("g", Some(20L)))
      .toDF("grp", "v")
    val out = Profile.winsorize(df, "grp", "v", 0.25, 0.75)
      .select("n", "winsorized_sum").as[(Long, Long)].head()
    assert(out === ((2L, 30L)))
    intercept[IllegalArgumentException] {
      Profile.winsorize(df, "grp", "v", 0.75, 0.25)
    }
  }
}
