package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Embedding-vector hygiene ops: the per-vector transforms a
  * training/retrieval pipeline applies between the embedder and the
  * index — L2 normalization (cosine ≡ dot product afterwards), int8
  * quantization (4× index shrink; the standard faiss/SQ8 scheme), and
  * label/document-level mean pooling.
  *
  * 100 TB shape: [[l2Normalize]] and [[int8Quantize]] are pure array
  * expressions — codegen'd, zero shuffle, compose with any scan;
  * [[meanPool]] is one posexplode + (key, pos) aggregation — a single
  * shuffle whose key count is |groups| × dim, uniformly distributed by
  * construction.
  *
  * All arithmetic is double precision in ARRAY ORDER (strict left
  * folds), so results are bit-deterministic and replicable by the
  * DuckDB oracle (x52) — no distributed reduction order anywhere in
  * the per-vector ops.
  */
object Embeddings {

  /** Sum of squares, left-fold in array order. */
  private def sumSq(vec: Column): Column =
    aggregate(transform(vec, x => x.cast("double") * x),
      lit(0.0), (acc, x) => acc + x)

  /** Euclidean norm of a float/double vector. */
  def l2Norm(vec: Column): Column = sqrt(sumSq(vec))

  /** Unit-normalized copy (array<double>); a zero vector stays zero
    * rather than dividing by zero. */
  def l2Normalize(vec: Column): Column = {
    val n = l2Norm(vec)
    when(n === 0.0, transform(vec, x => x.cast("double")))
      .otherwise(transform(vec, x => x.cast("double") / n))
  }

  /** Symmetric int8 scalar quantization: q_i = round(v_i * 127/max|v|)
    * as struct(q array<int>, scale double) with `scale` the
    * dequantization factor max|v|/127 (q_i * scale ≈ v_i). An all-zero
    * vector quantizes to zeros with scale 0. */
  def int8Quantize(vec: Column): Column = {
    val mx = array_max(transform(vec, x => abs(x.cast("double"))))
    val q = when(mx === 0.0, transform(vec, x => lit(0).cast("int")))
      .otherwise(transform(vec,
        x => round(x.cast("double") * (lit(127.0) / mx)).cast("int")))
    struct(q.as("q"), (mx / 127.0).as("scale"))
  }

  /** Element-wise mean of `vecCol` per `keyCol` group: one posexplode
    * and one (key, position) aggregation, reassembled in position
    * order. Output: (key, vec array<double>, n_vecs). */
  def meanPool(df: DataFrame, keyCol: String, vecCol: String): DataFrame =
    df.select(col(keyCol), posexplode(col(vecCol)).as(Seq("__p", "__x")))
      .groupBy(col(keyCol), col("__p"))
      .agg(avg(col("__x")).as("__m"), count(lit(1)).as("__n"))
      .groupBy(col(keyCol))
      .agg(array_sort(collect_list(struct(col("__p"), col("__m"))))
        .as("__s"), max(col("__n")).as("n_vecs"))
      .select(col(keyCol),
        transform(col("__s"), s => s.getField("__m")).as("vec"),
        col("n_vecs"))
}
