package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Retrieval-style document chunking: split each document into
  * overlapping token windows (the unit a RAG indexer embeds, and the
  * pre-packing unit some training pipelines shard long documents
  * into). The whole operator is a scan-side explode — tokenize, derive
  * the chunk-start sequence from the token count, slice the token
  * array per chunk — so there is NO shuffle anywhere: at corpus scale
  * it parallelizes trivially and composes with a downstream
  * repartition/write like any other row transform.
  *
  * Chunk rule (the standard sliding window): chunks start at
  * `0, step, 2*step, …` with `step = chunkSize - overlap`; the last
  * start is the smallest multiple of `step` whose window reaches the
  * final token, so every token is covered and no trailing chunk is a
  * pure subset of its predecessor. A document with `n` tokens yields
  * `1 + ceil(max(0, n - chunkSize) / step)` chunks; empty documents
  * yield none.
  *
  * Tokenization is the whitespace rule shared with
  * [[graft.functions.TextFunctions.wsTokenCount]] (original case kept
  * — chunk text must stay faithful for embedding), and the ceil
  * division is expressed as `floor((n - chunkSize + step - 1) / step)`
  * in double precision — exact for any corpus-plausible counts and
  * replicated verbatim by the DuckDB oracle (x48).
  */
object Chunking {

  /** @param idCol    document identity (output keeps its name)
    * @param textCol  text to chunk
    * @param chunkSize window length in tokens
    * @param overlap  tokens shared between consecutive chunks
    * @return one row per chunk: (id, chunk_idx, start_tok,
    *         chunk_tokens, chunk_text) — chunk_idx 0-based,
    *         start_tok the 0-based token offset of the window
    */
  def tokenWindows(df: DataFrame, idCol: Column, textCol: Column,
      chunkSize: Int, overlap: Int): DataFrame = {
    require(chunkSize >= 1, s"chunkSize must be positive, got $chunkSize")
    require(overlap >= 0 && overlap < chunkSize,
      s"overlap must be in [0, chunkSize), got $overlap")
    val step = chunkSize - overlap
    val base = df.select(idCol,
      array_remove(split(textCol, "\\s+"), "").as("__toks"))
    val id = col(base.columns.head)
    val counted = base
      .withColumn("__n", size(col("__toks")).cast("long"))
      .filter(col("__n") > 0)
    // last chunk index: smallest k with k*step + chunkSize >= n —
    // integer ceil via double floor, exact at any plausible count
    val kMax = when(col("__n") <= chunkSize, lit(0L)).otherwise(
      floor((col("__n") - chunkSize + (step - 1)) / lit(step.toDouble))
        .cast("long"))
    counted
      .withColumn("chunk_idx", explode(sequence(lit(0L), kMax, lit(1L))))
      .select(id,
        col("chunk_idx"),
        (col("chunk_idx") * step).as("start_tok"),
        least(lit(chunkSize.toLong), col("__n") - col("chunk_idx") * step)
          .as("chunk_tokens"),
        array_join(
          slice(col("__toks"), (col("chunk_idx") * step + 1).cast("int"),
            lit(chunkSize)), " ").as("chunk_text"))
  }

  /** Token-budget truncation: cut each document to its first
    * `maxTokens` whitespace tokens (whole tokens only — the cheap
    * context-window guard applied before packing/embedding). Pure
    * scan-side row transform, no shuffle; the token array is
    * materialized once per row (x48's two-Project shape) and sliced
    * with plain expressions.
    *
    * @return (id, n_tokens, kept_tokens, truncated, out_text); empty
    *         documents pass through with n_tokens = 0, out_text ""
    */
  def truncateTokens(df: DataFrame, idCol: Column, textCol: Column,
      maxTokens: Int): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be positive, got $maxTokens")
    val base = df.select(idCol,
      array_remove(split(textCol, "\\s+"), "").as("__toks"))
    val id = col(base.columns.head)
    val n = size(col("__toks")).cast("long")
    base.select(id,
      n.as("n_tokens"),
      least(n, lit(maxTokens.toLong)).as("kept_tokens"),
      (n > maxTokens).as("truncated"),
      array_join(slice(col("__toks"), 1, maxTokens), " ").as("out_text"))
  }
}
