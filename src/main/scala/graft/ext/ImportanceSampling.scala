package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Data-selection importance reweighting (DSIR-style, Xie et al.
  * 2023, arXiv:2302.03169): score every document by how much more
  * likely its hashed n-gram features are under a TARGET distribution
  * (the high-quality / in-domain slice you want more of) than under
  * the raw source distribution. The log-importance weight
  * `Σ_g ln p̂_target(h(g)) − ln p̂_source(h(g))` (add-1 smoothed bucket
  * unigram/bigram counts) is the standard recipe for mining a trillion-
  * token crawl for target-domain-like documents.
  *
  * 100 TB shape: features hash into a FIXED bucket space, so the
  * distribution estimate is a `buckets`-row frame however large the
  * corpus — one exploded-gram aggregate (partial map-side combine on
  * ≤`buckets` keys per partition), totals as a one-row broadcast. The
  * scoring pass broadcast-joins the bucket table back to the gram
  * stream and regroups by document: ONE wide exchange keyed by doc id,
  * the same shape as [[Encoding.dictionaryEncode]] / oov. Nothing
  * driver-side, nothing proportional to vocabulary size.
  *
  * Determinism: bucket ids come from the md5 hex prefix through
  * base-16 conversion (`conv` ≡ `CAST('0x'||substr(md5(g),1,8) AS
  * BIGINT)` — the [[Shuffling]] differential discipline), counts are
  * integers, and each bucket's log-ratio is computed once from exact
  * rationals; the only cross-engine noise is ln's last ulp and the
  * per-doc sum's reduction order (~1e-14 — round emitted weights).
  *
  * Reference scope: deimos has no corpus selection; extends the engine
  * for LLM-data curation (SURVEY.md §2.9).
  */
object ImportanceSampling {

  /** Hashed feature stream: case-folded `\s+` unigrams plus adjacent
    * bigrams, each mapped to `[0, buckets)`. Bigrams via zip of two
    * slices — indexing a computed array inside a lambda re-evaluates
    * the subtree per element (the x72 lesson). */
  private[ext] def featureBuckets(textCol: Column, buckets: Int): Column = {
    val toks = array_remove(split(lower(textCol), "\\s+"), "")
    val n = size(toks)
    val bigrams = zip_with(
      slice(toks, lit(1), greatest(n - 1, lit(0))),
      slice(toks, lit(2), greatest(n - 1, lit(0))),
      (a, b) => concat(a, lit(" "), b))
    transform(concat(toks, bigrams), g =>
      pmod(conv(substring(md5(g), 1, 8), 16, 10).cast("long"),
        lit(buckets.toLong)))
  }

  /** Per-document log importance weight against the target slice.
    *
    * @param isTarget row predicate marking the target (in-domain)
    *                 documents; the source distribution is the WHOLE
    *                 corpus (target included — both smoothed add-1)
    * @param buckets  hashed feature space size (fixed; estimate frames
    *                 are `buckets` rows at any corpus size)
    * @return (idCol, n_feats, logw) — documents with zero tokens emit
    *         no row (no evidence, same contract as dictionaryEncode)
    */
  def dsirLogWeights(docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int = 1024): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2, got $buckets")
    // spreadScan: the hashed-feature explode is the dominant scan-side
    // cost; identity on a many-split corpus (guide §2.5)
    val ex = graft.operators.Scale.spreadScan(docs, col(idCol))
      .select(col(idCol),
        explode(featureBuckets(col(textCol), buckets)).as("__b"),
        isTarget.cast("boolean").as("__t"))
    // collapse to per-(doc, bucket) multiplicities FIRST and
    // materialize them ONCE (localCheckpoint — the pagerank lineage
    // discipline): both consumers (bucket counts, per-doc weights)
    // would otherwise re-run the corpus tokenize+hash pass, the
    // operator's dominant cost, because their different column
    // prunings defeat exchange reuse. The materialized frame is
    // min(features, buckets) rows per doc — far below the exploded
    // stream. __t is constant per doc; max() carries it through.
    val dcounts = ex.groupBy(col(idCol), col("__b"))
      .agg(count(lit(1)).as("__c"), max(col("__t")).as("__t"))
      .localCheckpoint(false)
    val counts = dcounts.groupBy(col("__b")).agg(
      sum(when(col("__t"), col("__c")).otherwise(0L)).as("__tc"),
      sum(col("__c")).as("__sc"))
    val totals = counts.agg(sum(col("__tc")).as("__tt"),
      sum(col("__sc")).as("__st"))
    // one log-ratio per bucket, computed once from exact integers;
    // ln((c+1)/(total+B)) matches the oracle's literal op order
    val bucketLogr = counts.crossJoin(broadcast(totals)).select(col("__b"),
      (log((col("__tc") + 1L).cast("double") /
          (col("__tt") + lit(buckets.toLong)).cast("double")) -
        log((col("__sc") + 1L).cast("double") /
          (col("__st") + lit(buckets.toLong)).cast("double"))).as("__logr"))
    // logw folds multiplicity-weighted: Σ_b c·logr — a different (and
    // shorter) IEEE reduction order than per-instance summing, inside
    // the same ~1e-14 noise class the 6dp rounding grid was probed
    // against (ln-ulp × order already varies cross-engine)
    dcounts.join(broadcast(bucketLogr), Seq("__b"))
      .groupBy(col(idCol))
      .agg(sum(col("__c")).as("n_feats"),
        sum(col("__c").cast("double") * col("__logr")).as("logw"))
  }
}
