package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** [EXT] TF-IDF keyword extraction: the top-k most characteristic
  * terms of every document — the classic summarization/labeling pass a
  * corpus pipeline runs to tag documents for retrieval filters, topic
  * mixing, or dedup explainability.
  *
  * 100 TB shape: term frequencies are one (doc, term) aggregation of
  * the exploded token stream; document frequencies reduce the SAME
  * aggregated frame again by term (vocabulary-sized output, joined
  * back by AQE choice — broadcast when it fits); the corpus size is a
  * one-row broadcast. The per-doc top-k is `row_number <= k` over a
  * doc-keyed window, which Spark executes as a map-side
  * WindowGroupLimit BEFORE the exchange — the shuffle carries at most
  * k rows per (partition, doc), not the full posting matrix.
  *
  * Scoring: `tfidf = tf * ln(N / df)` (unsmoothed — a term in every
  * document scores exactly 0). Ties (equal tf and df) break by term
  * string, ascending; tokenization is the shared lowercase `\W+` rule
  * ([[graft.functions.TextFunctions.tokens]]).
  *
  * Reference scope: deimos has no text analytics; this extends the
  * engine for LLM-corpus work (SURVEY.md §2.9).
  */
object Keywords {

  /** @return (id, rank, term, tf, df, tfidf), rank 1..k per document */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val tf = docs
      .select(col(idCol), explode(T.tokens(col(textCol))).as("term"))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("__n"))
    val scored = tf.join(df, Seq("term")).crossJoin(broadcast(n))
      .withColumn("tfidf",
        col("tf") * log(col("__n").cast("double") / col("df")))
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("tfidf").desc, col("term"))
    scored
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("tf"), col("df"),
        col("tfidf"))
  }
}
