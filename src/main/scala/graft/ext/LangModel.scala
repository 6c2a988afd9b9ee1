package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] N-gram language-model quality scoring: train an add-alpha
  * smoothed bigram model over the corpus and score every document by
  * its average negative log-likelihood under that model — the
  * KenLM-style "perplexity filter" training pipelines use to rank a
  * crawl by fluency before sampling (high avg-NLL = gibberish /
  * boilerplate / wrong-language text).
  *
  * 100 TB shape: the model is two count tables — bigram `(prev, word)`
  * and context `prev` — each a standard partial-aggregated groupBy
  * whose output is VOCABULARY-sized, not corpus-sized; the scoring
  * pass joins the exploded bigram stream against them by key. The
  * joins are left to AQE: a web-scale vocabulary still fits executor
  * memory in aggregate (bigram types grow ~O(tokens^0.7), Heaps' law)
  * and broadcasts when small, shuffles co-partitioned when not. The
  * vocabulary size (smoothing denominator) reduces to ONE row and
  * crosses back by broadcast exactly like [[Retrieval.bm25]]'s stats.
  *
  * Probability: `P(w|p) = (c(p,w) + alpha) / (c(p) + alpha * V)` with
  * `V` = distinct token count of the corpus; a document's score is
  * `avg(-ln P)` over its bigrams (documents with fewer than 2 tokens
  * carry no evidence and are dropped). Tokenization is the shared
  * case-folded whitespace rule ([[Retrieval.bm25]]).
  *
  * Train-on-self is the reference semantics here (one corpus argument
  * scores itself); to score against a held-out model, pass the
  * training frame to [[bigramNllAgainst]].
  *
  * Reference scope: deimos has no text analytics; this extends the
  * engine for LLM-corpus work (SURVEY.md §2.9).
  */
object LangModel {

  private def toks(textCol: String) =
    array_remove(split(lower(col(textCol)), "\\s+"), "")

  /** (id, p, w) bigram stream: scan-side zip of adjacent tokens —
    * the explode is the only row-multiplying step anywhere. */
  private def bigrams(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    val t = toks(textCol)
    df.select(col(idCol), t.as("__t"))
      .filter(size(col("__t")) >= 2)
      .select(col(idCol), explode(
        zip_with(slice(col("__t"), lit(1), size(col("__t")) - 1),
          slice(col("__t"), lit(2), size(col("__t")) - 1),
          (p, w) => struct(p.as("p"), w.as("w")))).as("__b"))
      .select(col(idCol), col("__b.p").as("p"), col("__b.w").as("w"))
  }

  /** Score `score` documents under a bigram model trained on `train`.
    * @return one row per scored document with >= 2 tokens:
    *         (id, n_bigrams, avg_nll)
    */
  def bigramNllAgainst(train: DataFrame, score: DataFrame, idCol: String,
      textCol: String, alpha: Double = 0.5): DataFrame = {
    require(alpha > 0, s"alpha must be positive, got $alpha")
    val trainBg = bigrams(train, idCol, textCol)
    val bc = trainBg.groupBy(col("p"), col("w"))
      .agg(count(lit(1)).as("__c_pw"))
    val cc = trainBg.groupBy(col("p")).agg(count(lit(1)).as("__c_p"))
    val vocab = train.select(explode(toks(textCol)).as("__tok"))
      .agg(count_distinct(col("__tok")).as("__v"))
    // left joins + zero-coalesce: a bigram or context unseen in
    // training gets the smoothed floor (alpha / (c_p + alpha*V), down
    // to 1/V for an unseen context) instead of being dropped — for
    // self-scoring both counts always exist and the coalesces fold
    bigrams(score, idCol, textCol)
      .join(bc, Seq("p", "w"), "left")
      .join(cc, Seq("p"), "left")
      .crossJoin(broadcast(vocab))
      .select(col(idCol),
        (-log((coalesce(col("__c_pw"), lit(0L)) + alpha) /
          (coalesce(col("__c_p"), lit(0L)) + lit(alpha) * col("__v"))))
          .as("__nll"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"), avg(col("__nll")).as("avg_nll"))
  }

  /** Self-scoring form: every bigram of `df` was seen in training, so
    * the model joins are inner without loss. */
  def bigramNll(df: DataFrame, idCol: String, textCol: String,
      alpha: Double = 0.5): DataFrame =
    bigramNllAgainst(df, df, idCol, textCol, alpha)

  /** Top-k adjacent-word collocations by pointwise mutual information:
    * `pmi(p, w) = ln(c(p,w) * B / (c(p,·) * c(·,w)))` with `B` the
    * corpus bigram total and the marginals counted in bigram POSITION
    * (first / second) — the standard collocation-mining pass that
    * surfaces multi-word units ("new york", "machine learning") for
    * tokenizer audits and phrase-aware dedup.
    *
    * 100 TB shape: three aggregations of the same scan-side bigram
    * stream — the joint is (vocab²⁻ᵉᵖˢ)-sized, the two positional
    * marginals vocabulary-sized (joined back by AQE choice, broadcast
    * when small); the bigram total reduces to ONE broadcast row; and
    * the global top-k is a TakeOrderedAndProject heap, never a full
    * sort. `minCount` prunes the hapax tail BEFORE the marginal joins,
    * which is what keeps the joint frame join-input-sized at corpus
    * scale.
    *
    * @param minCount joint-count support floor (PMI is noise below it)
    * @return (p, w, c_pw, pmi) top-k by (pmi desc, p, w)
    */
  def pmiTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int, minCount: Long = 5L): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    val bg = bigrams(docs, idCol, textCol)
    val joint = bg.groupBy(col("p"), col("w"))
      .agg(count(lit(1)).as("c_pw"))
      .filter(col("c_pw") >= minCount)
    val firstM = bg.groupBy(col("p")).agg(count(lit(1)).as("__c_p"))
    val secondM = bg.groupBy(col("w")).agg(count(lit(1)).as("__c_w"))
    val total = bg.agg(count(lit(1)).as("__b"))
    joint.join(firstM, Seq("p")).join(secondM, Seq("w"))
      .crossJoin(broadcast(total))
      .withColumn("pmi",
        log(col("c_pw").cast("double") * col("__b") /
          (col("__c_p").cast("double") * col("__c_w"))))
      .orderBy(col("pmi").desc, col("p"), col("w"))
      .limit(k)
      .select(col("p"), col("w"), col("c_pw"), col("pmi"))
  }

  /** Out-of-vocabulary report: per-document token count, OOV count,
    * and OOV rate against the corpus vocabulary of tokens occurring at
    * least `minCount` times — the "will my tokenizer/embedding table
    * cover this corpus" audit.
    *
    * 100 TB shape: the vocabulary is a partial-aggregated token count
    * bounded above by total_tokens / minCount entries, hinted for
    * broadcast so the exploded token stream joins it WITHOUT a
    * shuffle; the only wide exchange is the per-document regroup.
    * Tokenization is the shared case-folded `\W+` rule
    * ([[graft.functions.TextFunctions.tokens]]). Documents with no
    * tokens carry no rows.
    */
  def oovReport(docs: DataFrame, idCol: String, textCol: String,
      minCount: Long): DataFrame = {
    require(minCount >= 1, s"minCount must be positive, got $minCount")
    val ex = docs.select(col(idCol),
      explode(graft.functions.TextFunctions.tokens(col(textCol)))
        .as("tok"))
    val vocab = ex.groupBy(col("tok")).agg(count(lit(1)).as("__c"))
      .filter(col("__c") >= minCount)
      .select(col("tok"), lit(1).as("__in"))
    ex.join(broadcast(vocab), Seq("tok"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("oov_tokens"))
      .withColumn("oov_rate",
        col("oov_tokens").cast("double") / col("n_tokens").cast("double"))
  }
}
