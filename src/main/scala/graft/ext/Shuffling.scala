package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic epoch shuffling for training-data pipelines: every
  * epoch needs a different — but REPRODUCIBLE — global permutation of
  * the corpus, and a naive `orderBy(rand())` is neither reproducible
  * nor scalable (one global sort, RNG tied to partition layout).
  *
  * Shape: `shard` and the intra-shard `pos` are both pure functions of
  * `md5(epoch || key)` — the shard assignment is a scan-side
  * expression, and the per-shard positions come from window ranks that
  * sort each shard independently in parallel. The one exchange is the
  * shard partitioning; no global single-partition sort anywhere.
  * Reading shards in (shard, pos) order IS the epoch's permutation,
  * and a training loader can consume shards concurrently. Changing
  * `epoch` re-permutes everything; re-running the same epoch
  * reproduces it bit-for-bit on any cluster size or layout.
  *
  * The hex→int step uses the md5 hex-string prefix through base-16
  * conversion, chosen because an ANSI engine can replicate it exactly
  * (`CAST('0x'||substr(md5(…),1,8) AS BIGINT)`) — same differential
  * discipline as [[Sampling]]'s threshold strings.
  */
object Shuffling {

  /** @param nShards number of independent output shards (at corpus
    *        scale: thousands — each shard's window sorts in parallel)
    * @param epoch   salt; a different value is a different permutation
    * @return df plus (shard, pos) — pos is the 1-based rank inside the
    *         shard, (shard, pos) unique when keys are unique
    */
  def epochShuffle(df: DataFrame, keyCol: Column, nShards: Int,
      epoch: String): DataFrame = {
    require(nShards >= 1, s"nShards must be positive, got $nShards")
    val withHash = df
      .withColumn("__h", md5(concat(lit(epoch), keyCol.cast("string"))))
      .withColumn("shard",
        pmod(conv(substring(col("__h"), 1, 8), 16, 10).cast("long"),
          lit(nShards.toLong)))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("__h"), keyCol)
    withHash.withColumn("pos", row_number().over(w).cast("long"))
      .drop("__h")
  }
}
