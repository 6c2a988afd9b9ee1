package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Dictionary encoding for tokenizer-style pipelines: build a bounded,
  * frequency-ranked vocabulary (ids 1..K, most frequent first) and map
  * every document to its integer-id sequence — the step that turns a
  * text corpus into the int arrays a training job actually reads.
  * Tokens outside the vocabulary map to the reserved OOV id 0, the
  * convention every real vocab file (word2vec, fastText, BPE ranks)
  * follows.
  *
  * 100 TB shape: the vocabulary is computed with a heap — the token
  * counts partial-aggregate map-side and `orderBy().limit(K)` plans as
  * TakeOrderedAndProject, so no global sort ever materializes; the id
  * assignment window runs single-partition but over exactly K rows
  * (the vocab budget, ≤1e6 — bounded by contract, not by data). The
  * encode pass broadcast-joins the exploded token stream against the
  * K-row vocab (no shuffle on the corpus side) and regroups by
  * document — ONE wide exchange, keyed by doc id, same shape as
  * [[LangModel.oovReport]]. Positions ride along and
  * `array_sort(collect_list(struct(pos, id)))` rebuilds the in-order
  * id sequence without a per-group sort task.
  *
  * Determinism: ties in count break by token (lexicographic), so the
  * vocab — and therefore every encoded sequence — is a pure function
  * of the corpus.
  *
  * Reference scope: deimos has no text analytics; this extends the
  * engine for LLM-corpus work (SURVEY.md §2.9).
  */
object Encoding {

  /** The top-`vocabSize` tokens by (count desc, token) with dense ids
    * 1..K. Shared case-folded `\W+` tokenization
    * ([[TextFunctions.tokens]]).
    *
    * @return (id, token, n_occ), id contiguous from 1
    */
  def topKVocab(docs: DataFrame, textCol: String,
      vocabSize: Int): DataFrame = {
    require(vocabSize >= 1, s"vocabSize must be positive, got $vocabSize")
    val counts = docs
      .select(explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("token"))
      .limit(vocabSize)
    // dense ids via the shared window-free helper: the frame is
    // vocab-sized (post-limit) so a K-row single-task window WOULD be
    // safe, but no call site carries a bare Window.orderBy — the
    // pattern gets imitated onto corpus-sized frames (round-16
    // verdict item 4; q20 was that copy)
    graft.operators.Scale.denseIds(counts,
        Seq(col("n_occ").desc, col("token")), "id")
      .select(col("id"), col("token"), col("n_occ"))
  }

  /** Encode every document against `vocab` (a [[topKVocab]] frame or
    * anything with (id, token)): per document, the token count, OOV
    * count, the first `headLen` ids in token order, and a
    * position-weighted checksum `sum(id * pos)` (pos 1-based) that
    * pins the FULL sequence, not just the head. Documents with zero
    * tokens emit no row (they carry no evidence, same contract as
    * [[LangModel.bigramNll]]).
    *
    * @return (idCol, n_tokens, n_oov, ids_head, id_checksum)
    */
  def dictionaryEncode(docs: DataFrame, idCol: String, textCol: String,
      vocab: DataFrame, headLen: Int = 12): DataFrame = {
    require(headLen >= 1, s"headLen must be positive, got $headLen")
    val ex = docs.select(col(idCol),
      posexplode(TextFunctions.tokens(col(textCol)))
        .as(Seq("__pos", "token")))
    ex.join(broadcast(vocab.select(col("token"), col("id"))),
        Seq("token"), "left")
      .select(col(idCol), col("__pos"),
        coalesce(col("id"), lit(0L)).as("__tid"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__tid") === 0L, 1L).otherwise(0L)).as("n_oov"),
        array_sort(collect_list(struct(col("__pos"), col("__tid"))))
          .as("__seq"),
        sum(col("__tid") * (col("__pos") + 1L)).as("id_checksum"))
      .select(col(idCol), col("n_tokens"), col("n_oov"),
        slice(transform(col("__seq"), e => e.getField("__tid")),
          1, headLen).as("ids_head"),
        col("id_checksum"))
  }

  /** Heaps-law vocabulary growth curve: for each id-space checkpoint
    * k, the cumulative token count and distinct-type count over
    * documents with id < k (arrival order) — the curve that says
    * whether more corpus still buys vocabulary (and where the
    * type/token ratio flattens), read before sizing a tokenizer or
    * the next crawl.
    *
    * ONE pass over the exploded tokens serves both series: the
    * distinct-type count at every checkpoint falls out of each type's
    * FIRST-occurrence doc (min-aggregate — x110's attribution trick:
    * a type is "in the vocabulary at k" iff its first doc < k), so no
    * per-checkpoint distinct pass exists. Types collapse to 64-bit
    * hashes before shuffling (whitespace tokenization — raw surface
    * forms, not the case-folded [[topKVocab]] normalization); the
    * checkpoint explode runs over the type frame, never the corpus.
    *
    * @param checkpoints ascending doc-id cutoffs (id-space, not row
    *                    ranks — dense ids make these equivalent)
    * @return one row per checkpoint: (k, n_tokens, vocab_size, ttr)
    */
  def vocabGrowth(docs: DataFrame, idCol: String, textCol: String,
      checkpoints: Seq[Long]): DataFrame = {
    require(checkpoints.nonEmpty && checkpoints.forall(_ > 0),
      s"checkpoints must be positive: $checkpoints")
    require(checkpoints.zip(checkpoints.drop(1)).forall(p => p._1 < p._2),
      s"checkpoints must strictly ascend (a duplicate would " +
        s"double-count its row after the rollup): $checkpoints")
    val ks = array(checkpoints.map(lit): _*)
    val toks = docs.select(col(idCol).as("__d"),
      explode(array_remove(split(col(textCol), "\\s+"), ""))
        .as("__tok"))
    val perDoc = toks.groupBy(col("__d")).agg(count(lit(1)).as("__c"))
    val counts = perDoc.select(col("__d"), col("__c"), explode(ks).as("k"))
      .groupBy(col("k"))
      .agg(sum(when(col("__d") < col("k"), col("__c")).otherwise(0L))
        .as("n_tokens"))
    val vocab = toks
      .groupBy(xxhash64(col("__tok")).as("__h"))
      .agg(min(col("__d")).as("__first"))
      .select(col("__first"), explode(ks).as("k"))
      .groupBy(col("k"))
      .agg(sum(when(col("__first") < col("k"), 1L).otherwise(0L))
        .as("vocab_size"))
    counts.join(vocab, Seq("k"))
      .withColumn("ttr",
        when(col("n_tokens") === 0L, lit(0.0))
          .otherwise(col("vocab_size").cast("double") /
            col("n_tokens").cast("double")))
  }
}
