package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{VectorFunctions => V}

/** [EXT] Similarity search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (query-set broadcast × corpus
  * scan — linear in corpus size, the right plan when the query set is
  * small). Scale path: random-hyperplane LSH bucketing, which turns the
  * corpus scan into a bucket-local search (one shuffle on the bucket id).
  */
object Similarity {

  /** Brute-force cosine top-k: every query vector against the whole
    * corpus. The query side is broadcast (small by contract), so the
    * plan is a single pass over the corpus with no shuffle before the
    * per-query top-k window. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int = 5): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", V.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }

  /** LSH-bucketed ANN: corpus and queries bucketed by sign-bit
    * hyperplane hash; search only within the query's bucket. Recall is
    * tunable via nBits (fewer bits → bigger buckets → higher recall,
    * more work). At scale, multi-probe (flipping low-confidence bits)
    * raises recall without re-bucketing. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, dim: Int, nBits: Int = 8, k: Int = 3): DataFrame = {
    val bucket = (v: Column) => V.hyperplaneBucket(v, dim, nBits)
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      bucket(col(vecCol)).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      bucket(col(vecCol)).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", V.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rank"),
        round(col("cos"), 4).as("cos"))
  }
}
