package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{TextFunctions => T}

/** [EXT] Corpus-overlap governance: how much do my sources / crawl
  * snapshots duplicate each other? The pairwise matrix of shared exact
  * content fingerprints drives dataset-mixing decisions ("these two
  * crawls are 80% the same corpus — don't double-weight them") and
  * catches pipeline accidents (a re-crawl labeled as a new source).
  *
  * 100 TB shape: documents reduce scan-side to (source, 16-byte
  * fingerprint); the distinct and the self-join both key on the
  * uniformly-distributed digest, so the only shuffles are
  * digest-partitioned with no skew. The join fans out per fingerprint
  * by the number of sources sharing it — bounded by the SOURCE count
  * (tens), never by corpus size. Per-source distinct totals ride the
  * same aggregated frame.
  */
object Overlap {

  /** @return one row per unordered source pair that shares at least
    *         one fingerprint: (src_a, src_b, shared, n_a, n_b,
    *         jaccard) with jaccard = shared / (n_a + n_b - shared) */
  def sourceOverlap(docs: DataFrame, textCol: String,
      groupCol: String): DataFrame = {
    val fp = docs.select(col(groupCol).as("src"),
      T.normFingerprint(col(textCol)).as("fp")).distinct()
    val sizes = fp.groupBy(col("src")).agg(count(lit(1)).as("n"))
    val pairs = fp.alias("a")
      .join(fp.alias("b"),
        col("a.fp") === col("b.fp") && col("a.src") < col("b.src"))
      .groupBy(col("a.src").as("src_a"), col("b.src").as("src_b"))
      .agg(count(lit(1)).as("shared"))
    pairs
      .join(sizes.select(col("src").as("src_a"), col("n").as("n_a")), "src_a")
      .join(sizes.select(col("src").as("src_b"), col("n").as("n_b")), "src_b")
      .withColumn("jaccard", col("shared").cast("double") /
        (col("n_a") + col("n_b") - col("shared")).cast("double"))
      .select(col("src_a"), col("src_b"), col("shared"), col("n_a"),
        col("n_b"), col("jaccard"))
  }
}
