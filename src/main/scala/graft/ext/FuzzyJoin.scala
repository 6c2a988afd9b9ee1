package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** [EXT] Blocked fuzzy string lookup: resolve noisy strings (typos,
  * OCR errors, crawl variants) against a canonical vocabulary by edit
  * distance — the verify step of entity resolution, with candidate
  * generation bounded by a BLOCKING key so matching never goes
  * all-pairs.
  *
  * Blocking contract: only (probe, vocab) candidates sharing
  * `(lowercased first `prefixLen` chars, length DIV lenBand)` are
  * compared. An edit inside the prefix, or a length edit that crosses
  * a band boundary, is therefore MISSED by design — recall-by-contract,
  * the same trade as [[Dedup.ngramJaccard]]'s bucket. Loosen with
  * `prefixLen = 0` / a wider `lenBand`; the cost is block size.
  *
  * 100 TB shape: a canonical vocabulary is ~always small, so it is
  * BROADCAST; probes stream scan-side through the broadcast hash join
  * on the block key and the `levenshtein` verify (codegen'd builtin)
  * runs inside the join — zero shuffles on the probe side. The only
  * exchange anywhere is the per-probe top-k window, and that is a
  * map-side WindowGroupLimit on the probe id (at most k rows per
  * probe survive per input partition).
  */
object FuzzyJoin {

  /** @param k top matches kept per probe row, ranked (dist, matched asc)
    * @return probe columns plus (matched, dist, rank), rank 1..k;
    *         probes with no candidate within `maxDist` drop out */
  def lookup(probes: DataFrame, idCol: String, probeCol: String,
      vocab: DataFrame, vocabCol: String, maxDist: Int = 2, k: Int = 1,
      prefixLen: Int = 2, lenBand: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(k >= 1, s"k must be positive, got $k")
    require(lenBand >= 1, s"lenBand must be positive, got $lenBand")
    def blockPrefix(c: org.apache.spark.sql.Column) =
      substring(lower(c), 1, prefixLen)
    def blockBand(c: org.apache.spark.sql.Column) =
      floor(length(c) / lenBand).cast("long")
    val v = vocab.select(col(vocabCol).as("matched")).distinct()
      .select(col("matched"), blockPrefix(col("matched")).as("__bp"),
        blockBand(col("matched")).as("__bb"))
    val p = probes.withColumn("__bp", blockPrefix(col(probeCol)))
      .withColumn("__bb", blockBand(col(probeCol)))
    // threshold variant: the edit-distance DP early-exits (and returns
    // -1) once the distance provably exceeds maxDist — O(maxDist·len)
    // per comparison instead of O(len²), the difference that matters
    // when a hot block meets a long vocabulary entry
    val cand = p.join(broadcast(v), Seq("__bp", "__bb"))
      .withColumn("dist",
        levenshtein(col(probeCol), col("matched"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
    val w = Window.partitionBy(col(idCol))
      .orderBy(col("dist"), col("matched"))
    cand
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .drop("__bp", "__bb")
  }
}
