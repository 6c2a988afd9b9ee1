package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Benchmark-contamination screening: flag corpus documents that
  * share verbatim token n-grams with an evaluation/benchmark set — the
  * decontamination pass every serious training-data pipeline runs
  * before training (the GPT-3/PaLM-style n-gram overlap check).
  *
  * 100 TB shape: the benchmark side is an eval suite — thousands of
  * documents, not billions — so its distinct gram set is tiny and
  * BROADCAST to every executor; the corpus side is a single scan that
  * explodes to (doc, gram-hash) pairs, semi-joins against the
  * broadcast set map-side, and only the surviving (contaminated)
  * slice ever reaches the one aggregation shuffle. Grams travel as
  * 8-byte xxhash64 values, never as strings: at 1e12 corpus grams ×
  * 1e6 benchmark grams the cross-collision expectation is
  * ~1e18/2^64 ≈ 5e-2 — and a collision only ever inflates one doc's
  * shared-gram count by 1, it cannot drop a real match.
  *
  * Reference scope: deimos has no text analytics; this extends the
  * engine for LLM-corpus work alongside [[Dedup]] (SURVEY.md §2.9).
  */
object Contamination {

  /** Ordered whitespace tokens (empties dropped) — the same
    * tokenization the packing op and the DuckDB oracles use. */
  private def wsTokens(text: Column): Column =
    filter(split(text, "\\s+"), t => t =!= "")

  /** (id, gram-hash) pairs: every token n-gram of every document,
    * hashed to 64 bits scan-side. Documents shorter than n contribute
    * nothing. */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    df.select(col(idCol), wsTokens(col(textCol)).as("t"))
      .select(col(idCol), explode(
        when(size(col("t")) >= n,
          transform(sequence(lit(1), size(col("t")) - (n - 1)),
            i => xxhash64(concat_ws(" ", slice(col("t"), i, lit(n))))))
          .otherwise(array().cast("array<bigint>"))).as("g"))

  /** Contaminated corpus docs with their distinct-shared-gram counts:
    * one row per corpus document sharing at least one verbatim token
    * n-gram with any benchmark document. Clean docs are absent — at
    * corpus scale the output is the (small) contamination report, not
    * an annotation of every row. */
  def sharedGrams(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"gram size must be positive, got $n")
    val bench = gramHashes(benchmark, idCol, textCol, n)
      .select(col("g")).distinct()
    // Join BEFORE dedup: the broadcast filter runs map-side on the raw
    // gram stream, so the (doc, gram) dedup shuffle only ever carries
    // the contaminated slice. (bench is distinct ⇒ the join never
    // multiplies rows; countDistinct dedups in-doc repeats.)
    gramHashes(corpus, idCol, textCol, n)
      .join(broadcast(bench), "g")
      .groupBy(col(idCol))
      .agg(countDistinct(col("g")).as("n_shared_grams"))
  }

  /** The filter form: corpus with contaminated rows REMOVED — the
    * actual decontamination step. The dirty-id report is small by
    * construction, so it broadcasts and the corpus side never
    * shuffles. */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame, idCol: String,
      textCol: String, n: Int = 8): DataFrame = {
    val dirty = sharedGrams(corpus, benchmark, idCol, textCol, n)
      .select(col(idCol))
    corpus.join(broadcast(dirty), Seq(idCol), "left_anti")
  }
}
