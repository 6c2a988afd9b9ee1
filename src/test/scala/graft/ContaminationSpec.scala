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

  test("semanticScreen finds the max-cosine benchmark vector and flags at tau") {
    val bench = Seq((10L, Array(1.0f, 0.0f)), (20L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq(
      (1L, Array(0.9f, 0.1f)),   // nearest 10, cos ≈ 0.994 → flagged
      (2L, Array(0.1f, 0.9f)),   // nearest 20, flagged
      (3L, Array(1.0f, -1.0f)))  // cos 0.707 / -0.707 → not flagged at 0.9
      .toDF("vec_id", "embedding")
    val got = Contamination.semanticScreen(corpus, bench, "vec_id",
      "embedding", tau = 0.9)
      .select("vec_id", "bench_id", "contaminated")
      .as[(Long, Long, Boolean)].collect().toSeq.sorted
    assert(got === Seq((1L, 10L, true), (2L, 20L, true), (3L, 10L, false)))
  }

  test("semanticScreen resolves exact cosine ties to the lowest bench id") {
    // both benchmark vectors identical -> every cosine ties exactly
    val bench = Seq((7L, Array(1.0, 1.0)), (3L, Array(1.0, 1.0)))
      .toDF("vec_id", "embedding")
    val corpus = Seq((1L, Array(2.0, 0.5))).toDF("vec_id", "embedding")
    val got = Contamination.semanticScreen(corpus, bench, "vec_id",
      "embedding", tau = 2.0).select("bench_id").as[Long].head()
    assert(got === 3L)
  }

  test("semanticScreen matches the brute-force cross join") {
    val rnd = new scala.util.Random(11)
    def vec() = Array.fill(8)(rnd.nextFloat() * 2 - 1)
    val bench = (1L to 9L).map(i => (i, vec())).toDF("vec_id", "embedding")
    val corpus = (100L to 160L).map(i => (i, vec()))
      .toDF("vec_id", "embedding")
    val got = Contamination.semanticScreen(corpus, bench, "vec_id",
      "embedding", tau = 0.5)
      .select("vec_id", "bench_id").as[(Long, Long)].collect().toMap
    val naive = corpus.as("c").crossJoin(bench.as("b"))
      .withColumn("cos", graft.functions.VectorFunctions.cosine(
        org.apache.spark.sql.functions.col("c.embedding"),
        org.apache.spark.sql.functions.col("b.embedding")))
      .groupBy(org.apache.spark.sql.functions.col("c.vec_id").as("cid"))
      .agg(org.apache.spark.sql.functions.max(
        org.apache.spark.sql.functions.struct(col("cos"),
          (-col("b.vec_id")).as("nid"))).as("m"))
      .select(col("cid"), (-col("m.nid")).as("bid"))
      .as[(Long, Long)].collect().toMap
    assert(got === naive)
  }

  test("semanticScreen fails loudly past maxBench") {
    val bench = (1L to 5L).map(i => (i, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val corpus = Seq((9L, Array(1.0f, 0.0f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Contamination.semanticScreen(corpus, bench, "vec_id", "embedding",
        tau = 0.5, maxBench = 4)
    }
    assert(e.getMessage.contains("maxBench"))
  }
}
