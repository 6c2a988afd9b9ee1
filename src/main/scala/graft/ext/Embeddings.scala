package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** [EXT] Embedding-column hygiene at the DataFrame level. The
  * per-vector kernels (dot / norm / normalize / int8 quantize /
  * LSH bucketing) live in [[graft.functions.VectorFunctions]] — pure
  * array expressions, codegen'd, zero shuffle; this module holds the
  * ops that need a frame, not a column.
  */
object Embeddings {

  /** Element-wise mean of `vecCol` per `keyCol` group — label/document
    * centroid pooling. One posexplode and one (key, position)
    * aggregation (|groups| × dim keys, uniformly distributed),
    * reassembled in position order. Output:
    * (key, vec array<double>, n_vecs). */
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
