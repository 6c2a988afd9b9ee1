package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

class DuplicateExtentsSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], k: Int): Set[(Long, Long, Long, Long)] =
    Dedup.duplicateExtents(docs.toDF("id", "text"), "id", "text", k)
      .as[(Long, Long, Long, Long)].collect().toSet

  test("cross-doc shared run merges into one maximal extent per doc") {
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "x a b c d e y z",
      3L -> "p q r s t u")
    // shared run "a b c d e": 3-windows (a b c)(b c d)(c d e)
    assert(run(docs, 3) === Set(
      (1L, 0L, 5L, 3L),   // positions 0,1,2 -> [0, 2+3)
      (2L, 1L, 6L, 3L)))  // positions 1,2,3 -> [1, 3+3)
  }

  test("far-apart duplicated windows stay separate extents") {
    val docs = Seq(
      4L -> "a b c q w e r t c d e",
      5L -> "a b c z1 z2 z3 z4 z5 c d e")
    // (a b c) at pos 0 and (c d e) at pos 8 in both; gap 8 > k=3
    assert(run(docs, 3) === Set(
      (4L, 0L, 3L, 1L), (4L, 8L, 11L, 1L),
      (5L, 0L, 3L, 1L), (5L, 8L, 11L, 1L)))
  }

  test("intra-document periodic repeat covers the whole doc") {
    val docs = Seq(6L -> "m n o m n o m n o", 7L -> "unique words only here")
    // every 3-window of doc 6 recurs (period 3): positions 0..6
    assert(run(docs, 3) === Set((6L, 0L, 9L, 7L)))
  }

  test("adjacent extents (gap exactly k) merge; docs shorter than k emit nothing") {
    // (a b c) at 0 and (d e f) at 3 both duplicated; gap 3 == k merges
    val docs = Seq(
      8L -> "a b c d e f",
      9L -> "a b c x y x d e f",
      10L -> "a b")
    // doc 8: pos 0 (a b c) dup, pos 1 (b c d) unique, pos 2 (c d e)
    // unique, pos 3 (d e f) dup -> gap 3 <= k -> one extent [0, 6)
    // doc 9: (a b c) at 0, (d e f) at 6 -> gap 6 > 3 -> two extents
    assert(run(docs, 3) === Set(
      (8L, 0L, 6L, 2L),
      (9L, 0L, 3L, 1L), (9L, 6L, 9L, 1L)))
  }

  test("invalid spanTokens rejected") {
    intercept[IllegalArgumentException] {
      Dedup.duplicateExtents(Seq((1L, "a")).toDF("id", "text"),
        "id", "text", 0)
    }
  }
}
