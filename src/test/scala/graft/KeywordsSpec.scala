package graft

import org.apache.spark.sql.functions._

import graft.ext.Keywords

/** Specs for TF-IDF keyword extraction. */
class KeywordsSpec extends SparkSpec {
  import spark.implicits._

  // 'shared' is in every doc (idf=0); 'rare' only in doc 1; 'pair' in
  // docs 1 and 2 of 3
  private val docs = Seq(
    (1L, "shared rare rare pair"),
    (2L, "shared pair pair"),
    (3L, "shared shared shared")).toDF("doc_id", "text")

  test("scores are tf * ln(N/df) and rank by score then term") {
    val got = Keywords.tfidfTopK(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "rank")
      .as[(Long, Long, String, Long, Long, Double)].collect().toSeq
    val ln3over1 = math.log(3.0); val ln3over2 = math.log(1.5)
    // doc 1: rare 2*ln(3) beats pair 1*ln(1.5) beats shared 0
    assert(got(0)._3 === "rare")
    assert(math.abs(got(0)._6 - 2 * ln3over1) < 1e-12)
    assert(got(1)._3 === "pair")
    assert(math.abs(got(1)._6 - ln3over2) < 1e-12)
    // doc 2: pair 2*ln(1.5) then shared 0
    assert(got(2)._3 === "pair" && got(2)._4 === 2L)
    assert(got(3)._3 === "shared" && math.abs(got(3)._6) < 1e-15)
    // doc 3: only 'shared' (score 0) exists; rank 1 only
    assert(got.count(_._1 == 3L) === 1)
    assert(got.filter(_._1 == 3L).head._3 === "shared")
  }

  test("equal scores break ties by term ascending") {
    val d = Seq((1L, "bb aa"), (2L, "cc")).toDF("doc_id", "text")
    // aa and bb both tf=1, df=1 -> equal score; aa must rank first
    val got = Keywords.tfidfTopK(d, "doc_id", "text", 2)
      .filter(col("doc_id") === 1).orderBy("rank")
      .select("term").as[String].collect().toSeq
    assert(got === Seq("aa", "bb"))
  }

  test("k bounds the per-document output") {
    val got = Keywords.tfidfTopK(docs, "doc_id", "text", 1)
      .groupBy("doc_id").count().as[(Long, Long)].collect().toMap
    assert(got.values.forall(_ == 1L))
  }

  test("plan: per-doc top-k runs as a window group limit") {
    val big = spark.range(100).select(col("id").as("doc_id"),
      concat_ws(" ", lit("w"), col("id").cast("string"),
        lit("x y z")).as("text"))
    val plan = Keywords.tfidfTopK(big, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan:\n$plan")
  }

  test("invalid k rejected") {
    intercept[IllegalArgumentException] {
      Keywords.tfidfTopK(docs, "doc_id", "text", 0) }
  }
}
