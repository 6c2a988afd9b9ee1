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
}
