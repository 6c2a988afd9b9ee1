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
    // array_remove, not a lambda filter: identical array, but the
    // lambda HOF is interpreted per element and CSE-exempt (guide §4)
    array_remove(split(text, "\\s+"), "")

  /** (id, gram-hash) pairs: every token n-gram of every document,
    * hashed to 64 bits scan-side. Documents shorter than n contribute
    * nothing. */
  private def gramHashes(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame =
    // spreadScan: the gram hashing is the operator's dominant scan-side
    // cost; identity on a many-split corpus (guide §2.5)
    graft.operators.Scale.spreadScan(df, col(idCol))
      .select(col(idCol), wsTokens(col(textCol)).as("t"))
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

  /** Graded form of [[sharedGrams]]: every document's CONTAINMENT in a
    * reference corpus — the fraction of its distinct token n-grams
    * that appear anywhere in the reference. Where the binary screen
    * asks "does it overlap at all", containment is the dial: novelty
    * scoring of a new crawl against the held corpus, quote-heavy
    * document detection, and the soft-decontamination threshold
    * ("drop above 80% contained").
    *
    * 100 TB shape: both sides reduce to 8-byte gram hashes scan-side;
    * the reference's distinct gram set joins by hash (AQE broadcasts a
    * benchmark-sized reference, shuffles co-partitioned for a
    * corpus-sized one — no broadcast assumption baked in, unlike the
    * screen). Per-doc totals and matched counts are two aggregations
    * of the same deduped (doc, gram) frame. The ratio is exact-int /
    * exact-int.
    *
    * @return one row per document with >= 1 gram:
    *         (id, n_grams, n_matched, containment) */
  /** Semantic decontamination: every corpus vector's nearest benchmark
    * vector by cosine, with the `contaminated` verdict at `tau` — the
    * embedding-space complement of the n-gram screen (paraphrased
    * benchmark leakage that shares no verbatim grams still sits close
    * in embedding space).
    *
    * 100 TB shape: the benchmark is an eval suite (bounded by
    * contract, enforced at `maxBench`), collected ONCE and shipped as
    * a single codegen reference object
    * ([[graft.functions.Expressions.MaxCosineExpr]]) — the corpus side
    * is one scan with zero shuffle and zero row expansion, vs the
    * |corpus|×|bench| intermediate a cross-join formulation would
    * push through an aggregate. Benchmark rows are scanned in id order
    * so exact cosine ties resolve to the lowest benchmark id.
    *
    * @return corpus frame (id, bench_id, max_cos, contaminated) — one
    *         row per corpus vector, flag true when max_cos ≥ tau
    */
  def semanticScreen(corpus: DataFrame, benchmark: DataFrame,
      idCol: String, vecCol: String, tau: Double,
      maxBench: Int = 65536): DataFrame = {
    import graft.functions.{Expressions => E}
    val rows = benchmark.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(col(idCol)).limit(maxBench + 1).collect()
    require(rows.length <= maxBench,
      s"benchmark side exceeds maxBench=$maxBench — the semantic screen " +
        "broadcasts the whole benchmark; raise maxBench deliberately or " +
        "bucket the benchmark first")
    require(rows.nonEmpty, "benchmark side is empty")
    val ids = rows.map(_.getLong(0))
    val vecs = rows.map(_.getSeq[Number](1).map(_.doubleValue).toArray)
    corpus
      .withColumn("__m", E.maxCosineAgainst(col(vecCol), ids, vecs))
      .withColumn("bench_id", col("__m").getField("best_id"))
      .withColumn("max_cos", col("__m").getField("cos"))
      .withColumn("contaminated", col("max_cos") >= tau)
      .drop("__m")
  }

  def containmentScore(docs: DataFrame, reference: DataFrame,
      idCol: String, textCol: String, n: Int = 8): DataFrame = {
    require(n >= 1, s"gram size must be positive, got $n")
    val refGrams = gramHashes(reference, idCol, textCol, n)
      .select(col("g")).distinct()
    val docGrams = gramHashes(docs, idCol, textCol, n)
      .dropDuplicates(idCol, "g")
    val matched = docGrams.join(refGrams, Seq("g"), "left_semi")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_matched"))
    docGrams.groupBy(col(idCol)).agg(count(lit(1)).as("n_grams"))
      .join(matched, Seq(idCol), "left")
      .withColumn("n_matched", coalesce(col("n_matched"), lit(0L)))
      .withColumn("containment",
        col("n_matched").cast("double") / col("n_grams").cast("double"))
  }
}
