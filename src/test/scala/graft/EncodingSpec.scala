package graft

import org.apache.spark.sql.functions._

import graft.ext.Encoding

/** Specs for dictionary encoding (top-K vocab + id sequences). */
class EncodingSpec extends SparkSpec {
  import spark.implicits._

  // counts: aa=4, bb=3, cc=2, dd=1, ee=1 (dd/ee tie -> dd first)
  private val docs = Seq(
    (1L, "aa bb aa cc"),
    (2L, "aa bb dd"),
    (3L, "bb aa cc ee")).toDF("doc_id", "text")

  test("vocab ids are contiguous, frequency-ranked, tie-broken by token") {
    val v = Encoding.topKVocab(docs, "text", 10)
      .orderBy("id").as[(Long, String, Long)].collect().toSeq
    assert(v === Seq((1L, "aa", 4L), (2L, "bb", 3L), (3L, "cc", 2L),
      (4L, "dd", 1L), (5L, "ee", 1L)))
  }

  test("vocabSize bounds the dictionary and the tail becomes OOV") {
    val v = Encoding.topKVocab(docs, "text", 3)
    assert(v.count() === 3)
    val enc = Encoding.dictionaryEncode(docs, "doc_id", "text", v)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Seq[Long], Long)].collect().toSeq
    // doc 1: aa bb aa cc -> 1 2 1 3, no OOV
    assert(enc(0) === ((1L, 4L, 0L, Seq(1L, 2L, 1L, 3L),
      1 * 1 + 2 * 2 + 1 * 3 + 3 * 4)))
    // doc 2: aa bb dd -> 1 2 0 (dd past budget)
    assert(enc(1) === ((2L, 3L, 1L, Seq(1L, 2L, 0L), 1 * 1 + 2 * 2)))
    // doc 3: bb aa cc ee -> 2 1 3 0
    assert(enc(2) === ((3L, 4L, 1L, Seq(2L, 1L, 3L, 0L),
      2 * 1 + 1 * 2 + 3 * 3)))
  }

  test("headLen trims the id sequence but the checksum covers all of it") {
    val v = Encoding.topKVocab(docs, "text", 10)
    val enc = Encoding.dictionaryEncode(docs, "doc_id", "text", v,
        headLen = 2)
      .filter(col("doc_id") === 1)
      .as[(Long, Long, Long, Seq[Long], Long)].collect().head
    assert(enc._4 === Seq(1L, 2L))
    // checksum still weights position 3 (aa=1) and 4 (cc=3)
    assert(enc._5 === 1 * 1 + 2 * 2 + 1 * 3 + 3 * 4)
  }

  test("tokenization case-folds, splits on non-word chars, drops empties") {
    val d = Seq((1L, "AA, bb! aa")).toDF("doc_id", "text")
    val v = Encoding.topKVocab(d, "text", 10)
    assert(v.orderBy("id").as[(Long, String, Long)].collect().toSeq ===
      Seq((1L, "aa", 2L), (2L, "bb", 1L)))
  }

  test("documents with zero tokens emit no row") {
    val d = Seq((1L, "aa"), (2L, "!!!"), (3L, "")).toDF("doc_id", "text")
    val v = Encoding.topKVocab(d, "text", 10)
    val enc = Encoding.dictionaryEncode(d, "doc_id", "text", v)
    assert(enc.select("doc_id").as[Long].collect().toSeq === Seq(1L))
  }

  test("encode is deterministic across runs") {
    val v = Encoding.topKVocab(docs, "text", 3)
    val a = Encoding.dictionaryEncode(docs, "doc_id", "text", v)
      .orderBy("doc_id").collect().toSeq
    val b = Encoding.dictionaryEncode(docs, "doc_id", "text", v)
      .orderBy("doc_id").collect().toSeq
    assert(a === b)
  }

  test("vocabGrowth counts cumulative tokens and types per checkpoint") {
    val d = Seq((0L, "a b a"), (1L, "b c"), (2L, "d"), (3L, ""))
      .toDF("doc_id", "text")
    val got = Encoding.vocabGrowth(d, "doc_id", "text",
        Seq(1L, 2L, 3L, 10L))
      .select("k", "n_tokens", "vocab_size")
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      (1L, 3L, 2L),   // doc 0: tokens a,b,a → types {a,b}
      (2L, 5L, 3L),   // + doc 1: b,c → +{c}
      (3L, 6L, 4L),   // + doc 2: d
      (10L, 6L, 4L))) // empty doc 3 adds nothing
  }

  test("vocabGrowth: checkpoint before the first doc reports zero") {
    val d = Seq((5L, "x y")).toDF("doc_id", "text")
    val got = Encoding.vocabGrowth(d, "doc_id", "text", Seq(1L, 6L))
      .select("k", "n_tokens", "vocab_size", "ttr")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq === Seq((1L, 0L, 0L, 0.0), (6L, 2L, 2L, 1.0)))
    intercept[IllegalArgumentException] {
      Encoding.vocabGrowth(d, "doc_id", "text", Seq(5L, 1L)) // unsorted
    }
    intercept[IllegalArgumentException] { // a dup would double-count
      Encoding.vocabGrowth(d, "doc_id", "text", Seq(5L, 5L))
    }
  }
}
