package graft

import org.apache.spark.sql.functions._

import graft.ext.LangModel

/** Specs for add-alpha bigram LM quality scoring. */
class LangModelSpec extends SparkSpec {
  import spark.implicits._

  // doc 1 bigrams: (a,b),(b,a),(a,b); doc 2: (b,a)
  // model: c(a,b)=2, c(b,a)=2; contexts c(a)=2, c(b)=2; V=2
  private val corpus = Seq((1L, "a b a b"), (2L, "b a")).toDF("doc_id", "text")

  private def p(cPw: Long, cP: Long, v: Long, a: Double = 0.5) =
    (cPw + a) / (cP + a * v)

  test("self-scored NLL matches the hand model") {
    val got = LangModel.bigramNll(corpus, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val nll = -math.log(p(2, 2, 2)) // every bigram has the same prob
    assert(got.map(g => (g._1, g._2)) === Seq((1L, 3L), (2L, 1L)))
    got.foreach(g => assert(math.abs(g._3 - nll) < 1e-12, g))
  }

  test("asymmetric counts separate fluent from rare sequences") {
    val df = Seq((1L, "x y x y x y"), (2L, "y x"), (3L, "z z"))
      .toDF("doc_id", "text")
    // bigrams: (x,y)*3 doc1, (y,x)*2 doc1, (y,x)*1 doc2... recompute:
    // doc1 toks [x,y,x,y,x,y]: (x,y),(y,x),(x,y),(y,x),(x,y)
    // doc2: (y,x); doc3: (z,z); V=3
    // c(x,y)=3, c(y,x)=3, c(z,z)=1; c(x)=3, c(y)=3, c(z)=1
    val got = LangModel.bigramNll(df, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    val nXY = -math.log(p(3, 3, 3)); val nYX = -math.log(p(3, 3, 3))
    val d1 = (nXY * 3 + nYX * 2) / 5
    assert(math.abs(got(0)._3 - d1) < 1e-12)
    assert(math.abs(got(1)._3 - nYX) < 1e-12)
    assert(math.abs(got(2)._3 - (-math.log(p(1, 1, 3)))) < 1e-12)
    // the repeated-rare-bigram doc scores worse than the fluent one
    assert(got(2)._3 > got(0)._3)
  }

  test("held-out scoring floors unseen bigrams instead of dropping them") {
    val train = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val score = Seq((10L, "a b"), (11L, "b c"), (12L, "q r")).toDF("doc_id", "text")
    val got = LangModel.bigramNllAgainst(train, score, "doc_id", "text")
      .orderBy("doc_id").as[(Long, Long, Double)].collect().toSeq
    assert(got.map(_._1) === Seq(10L, 11L, 12L))
    // train model: c(a,b)=2, c(b,a)=1, c(a)=2, c(b)=1, V=2
    assert(math.abs(got(0)._3 - (-math.log(p(2, 2, 2)))) < 1e-12)
    // (b,c): context b seen (c=1), bigram unseen -> (0+.5)/(1+1)
    assert(math.abs(got(1)._3 - (-math.log(0.5 / 2.0))) < 1e-12)
    // (q,r): context unseen -> (0+.5)/(0+1) = 1/V
    assert(math.abs(got(2)._3 - (-math.log(0.5))) < 1e-12)
  }

  test("documents with fewer than two tokens are absent") {
    val df = Seq((1L, "solo"), (2L, ""), (3L, "a a")).toDF("doc_id", "text")
    val got = LangModel.bigramNll(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(3L))
  }

  test("tokenization case-folds before counting") {
    val df = Seq((1L, "A b"), (2L, "a B")).toDF("doc_id", "text")
    val got = LangModel.bigramNll(df, "doc_id", "text")
      .select("avg_nll").as[Double].collect().toSeq
    assert(got.size === 2 && math.abs(got(0) - got(1)) < 1e-12)
  }

  test("oovReport counts tokens outside the min-count vocabulary") {
    // "a" x3 and "b" x2 reach minCount=2; "c","d" are OOV
    val docs = Seq(
      (1L, "a b c"),   // 1 OOV of 3
      (2L, "a b d"),   // 1 OOV of 3
      (3L, "a"))       // 0 OOV of 1
      .toDF("doc_id", "text")
    val got = LangModel.oovReport(docs, "doc_id", "text", minCount = 2L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Double)].collect().toSeq
    assert(got === Seq(
      (1L, 3L, 1L, 1.0 / 3.0),
      (2L, 3L, 1L, 1.0 / 3.0),
      (3L, 1L, 0L, 0.0)))
  }

  test("oovReport with minCount=1 has zero OOV everywhere") {
    val docs = Seq((1L, "x y"), (2L, "z")).toDF("doc_id", "text")
    val got = LangModel.oovReport(docs, "doc_id", "text", minCount = 1L)
      .select(sum("oov_tokens")).as[Long].collect().head
    assert(got === 0L)
  }

  test("invalid alpha rejected") {
    intercept[IllegalArgumentException] {
      LangModel.bigramNll(corpus, "doc_id", "text", alpha = 0.0) }
  }

  test("pmi matches the hand formula and ranks collocations first") {
    // "new york" always adjacent (5x); "the the" frequent but
    // independent; support floor 2
    val df = Seq(
      (1L, "new york new york new york new york new york"),
      (2L, "the a the b the c the d the e the f")).toDF("doc_id", "text")
    val got = graft.ext.LangModel.pmiTopK(df, "doc_id", "text",
      k = 3, minCount = 2)
      .as[(String, String, Long, Double)].collect().toSeq
    // doc1 (10 toks): (new,york)*5, (york,new)*4; doc2 (12 toks): 11
    // singleton bigrams, all pruned by minCount. B = 20.
    // pmi(york,new) = ln(4*20/(4*4)) = ln 5 beats
    // pmi(new,york)  = ln(5*20/(5*5)) = ln 4
    assert(got.map(g => (g._1, g._2)) === Seq(("york", "new"),
      ("new", "york")))
    assert(math.abs(got(0)._4 - math.log(5.0)) < 1e-12)
    assert(math.abs(got(1)._4 - math.log(4.0)) < 1e-12)
  }

  test("pmi support floor prunes rare pairs") {
    val df = Seq((1L, "p q p q r s")).toDF("doc_id", "text")
    // (p,q)*2 survives minCount=2; (q,p),(q,r),(r,s) don't
    val got = graft.ext.LangModel.pmiTopK(df, "doc_id", "text",
      k = 10, minCount = 2)
      .select("p", "w").as[(String, String)].collect().toSeq
    assert(got === Seq(("p", "q")))
  }

  test("pmi invalid args rejected") {
    intercept[IllegalArgumentException] {
      graft.ext.LangModel.pmiTopK(corpus, "doc_id", "text", k = 0) }
    intercept[IllegalArgumentException] {
      graft.ext.LangModel.pmiTopK(corpus, "doc_id", "text", k = 1,
        minCount = 0) }
  }

  test("plan: no cartesian beyond the one-row vocab broadcast") {
    val big = spark.range(200).select(col("id").as("doc_id"),
      concat_ws(" ", lit("a"), col("id").cast("string"), lit("b")).as("text"))
    val plan = LangModel.bigramNll(big, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(plan).size
    assert(bnlj <= 1, s"expected only the vocab stats broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }
}
