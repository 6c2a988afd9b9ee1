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

  /** Mutual-best entity matching between two record sets — the linkage
    * step after blocking: a (left, right) pair is emitted iff each side
    * is the OTHER's single best candidate (minimum edit distance, ties
    * broken lexicographically then by id). One round of stable
    * matching: deterministic, one-to-one by construction, and exactly
    * what record-linkage pipelines run to merge two noisy catalogs —
    * a left that several rights prefer keeps only its own best, a
    * right contested by several lefts goes to the one it prefers.
    *
    * Same blocking contract as [[lookup]] (shared first-`prefixLen`
    * chars + length band): candidates never go all-pairs; pairs whose
    * edit crosses the block boundary are missed by design.
    *
    * 100 TB shape: both sides can be large — the candidate generation
    * is an equi-join on the block key (AQE picks broadcast when one
    * side is small), the threshold `levenshtein` early-exits inside
    * the join, and the two best-of windows are key-partitioned
    * shuffles of the ALREADY-thresholded candidate frame, not of
    * either input.
    *
    * @return (left_id, left_val, right_id, right_val, dist), at most
    *         one row per left_id and per right_id
    */
  def mutualBestMatch(left: DataFrame, leftId: String, leftCol: String,
      right: DataFrame, rightId: String, rightCol: String,
      maxDist: Int = 2, prefixLen: Int = 2, lenBand: Int = 4): DataFrame = {
    require(maxDist >= 0, s"maxDist must be >= 0, got $maxDist")
    require(lenBand >= 1, s"lenBand must be positive, got $lenBand")
    def blockPrefix(c: org.apache.spark.sql.Column) =
      substring(lower(c), 1, prefixLen)
    def blockBand(c: org.apache.spark.sql.Column) =
      floor(length(c) / lenBand).cast("long")
    val l = left.select(col(leftId).as("left_id"), col(leftCol).as("left_val"))
      .withColumn("__bp", blockPrefix(col("left_val")))
      .withColumn("__bb", blockBand(col("left_val")))
    val r = right.select(col(rightId).as("right_id"),
        col(rightCol).as("right_val"))
      .withColumn("__bp", blockPrefix(col("right_val")))
      .withColumn("__bb", blockBand(col("right_val")))
    val cand = l.join(r, Seq("__bp", "__bb"))
      .withColumn("dist",
        levenshtein(col("left_val"), col("right_val"), maxDist))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("left_id"), col("left_val"), col("right_id"),
        col("right_val"), col("dist"))
    val wl = Window.partitionBy(col("left_id"))
      .orderBy(col("dist"), col("right_val"), col("right_id"))
    val wr = Window.partitionBy(col("right_id"))
      .orderBy(col("dist"), col("left_val"), col("left_id"))
    cand
      .withColumn("__rl", row_number().over(wl))
      .withColumn("__rr", row_number().over(wr))
      .filter(col("__rl") === 1 && col("__rr") === 1)
      .select(col("left_id"), col("left_val"), col("right_id"),
        col("right_val"), col("dist"))
  }
}
