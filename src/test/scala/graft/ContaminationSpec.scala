package graft

import graft.ext.Contamination
import org.apache.spark.sql.functions._

class ContaminationSpec extends SparkSpec {
  import spark.implicits._

  private val benchmark = Seq(
    (100L, "alpha beta gamma delta epsilon"),
    (101L, "one two three four five six")).toDF("doc_id", "text")

  test("flags docs sharing a verbatim n-gram, counts distinct grams once") {
    val corpus = Seq(
      // shares "alpha beta gamma" and "beta gamma delta" (two 3-grams)
      (1L, "alpha beta gamma delta"),
      // shares "one two three" — twice in the doc, counted once
      (2L, "one two three and one two three"),
      // same tokens, different order: no verbatim 3-gram
      (3L, "gamma beta alpha delta"),
      (4L, "totally unrelated text here")).toDF("doc_id", "text")
    val got = Contamination.sharedGrams(corpus, benchmark, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 2L, 2L -> 1L))
  }

  test("docs shorter than n never match; whitespace runs collapse") {
    val corpus = Seq(
      (1L, "alpha beta"), // 2 tokens < n=3
      (2L, "alpha   beta\tgamma")).toDF("doc_id", "text")
    val got = Contamination.sharedGrams(corpus, benchmark, "doc_id", "text", n = 3)
      .as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 1L))
  }

  test("decontaminate removes exactly the flagged rows, broadcast plan") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "clean document body"),
      (3L, "four five six seven")).toDF("doc_id", "text")
    val clean = Contamination.decontaminate(corpus, benchmark, "doc_id", "text", n = 3)
    assert(clean.select("doc_id").as[Long].collect().sorted.toSeq === Seq(2L))
    val plan = clean.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoop"),
      s"expected broadcast anti-join, got:\n$plan")
    assert(!plan.contains("SortMergeJoin"), "corpus side must not shuffle for the anti-join")
  }

  test("empty benchmark → no flags; empty corpus → empty report") {
    val corpus = Seq((1L, "alpha beta gamma")).toDF("doc_id", "text")
    val emptyB = benchmark.filter(lit(false))
    assert(Contamination.sharedGrams(corpus, emptyB, "doc_id", "text", 3).count() === 0L)
    val emptyC = corpus.filter(lit(false))
    assert(Contamination.sharedGrams(emptyC, benchmark, "doc_id", "text", 3).count() === 0L)
  }

  test("containmentScore grades partial overlap exactly") {
    // doc 1 bigrams: {a b, b c, c d} — ref holds {a b, b c} -> 2/3;
    // doc 3 fully novel -> 0/2; doc 5 fully contained -> 1.0
    val ref = Seq((100L, "a b c x y z")).toDF("doc_id", "text")
    val docs = Seq(
      (1L, "a b c d"), (3L, "q r s"), (5L, "x y z"))
      .toDF("doc_id", "text")
    val got = Contamination.containmentScore(docs, ref, "doc_id", "text",
      n = 2).orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq((1L, 3L, 2L, 2.0 / 3.0), (3L, 2L, 0L, 0.0),
      (5L, 2L, 2L, 1.0)))
  }

  test("containmentScore dedups in-doc gram repeats before counting") {
    val ref = Seq((100L, "a b")).toDF("doc_id", "text")
    // "a b a b a b" has bigrams {a b, b a} distinct -> 1/2 matched
    val docs = Seq((1L, "a b a b a b")).toDF("doc_id", "text")
    val got = Contamination.containmentScore(docs, ref, "doc_id", "text",
      n = 2).as[(Long, Long, Long, Double)].head()
    assert(got === ((1L, 2L, 1L, 0.5)))
  }
}
