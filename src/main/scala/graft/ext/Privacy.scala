package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Differentially-private releases over grouped counts: Laplace noise
  * with DETERMINISTIC, seed-keyed draws — the reproducible-pipeline
  * form of the standard mechanism (a release job must emit the same
  * noisy table on re-run, so the "randomness" is a pure function of
  * (seed, group key), the same discipline as Sampling's md5-priority
  * draws).
  *
  * The uniform comes from the first 60 bits of md5(seed‖key) shifted
  * by +0.5 so u ∈ (0,1) strictly — the inverse-CDF transform
  * `-b·sign(u-½)·ln(1-2|u-½|)` is then finite for every key. All
  * arithmetic is IEEE-double reproducible across engines (x45/x65
  * precedent: DuckDB derives the identical hex-prefix integer and ln).
  *
  * Privacy note: deterministic noise is still a valid ε-DP release
  * for ONE release of a given seed; re-releasing under fresh seeds
  * composes like fresh draws (the usual accountant applies). Scale
  * shape: one map-side-combining groupBy; the noise is a scan-side
  * expression over the (small) aggregated frame.
  */
object Privacy {

  /** Per-group count with Laplace(b = sensitivity/ε) noise added.
    *
    * @return (grp, n, noisy) — n the exact count (kept for testing /
    *         internal use; DROP IT before an actual DP release),
    *         noisy the DP count
    */
  def noisyCounts(df: DataFrame, groupCol: Column, epsilon: Double,
      sensitivity: Double = 1.0, seed: String = ""): DataFrame = {
    require(epsilon > 0, s"epsilon must be positive, got $epsilon")
    require(sensitivity > 0,
      s"sensitivity must be positive, got $sensitivity")
    val b = sensitivity / epsilon
    val counts = df.groupBy(groupCol.as("grp")).agg(count(lit(1)).as("n"))
    // 15 hex chars = 60 bits; +0.5 keeps u strictly inside (0,1)
    val h = conv(substring(md5(concat(lit(seed),
      col("grp").cast("string"))), 1, 15), 16, 10).cast("long")
    val u = (h.cast("double") + lit(0.5)) /
      lit(1152921504606846976L).cast("double")
    val centered = u - lit(0.5)
    val noise = -lit(b) * signum(centered) *
      log(lit(1.0) - lit(2.0) * abs(centered))
    counts.withColumn("noisy", col("n").cast("double") + noise)
  }

  /** k-anonymity risk profile over quasi-identifier columns — the
    * re-identification report that precedes a data release: how many
    * equivalence classes (distinct QI combinations) fall below each
    * candidate k, and what fraction of ROWS sits inside them. A
    * release is k-anonymous exactly when `classes_below = 0` for that
    * k; the per-k sweep shows where the knee is before choosing a
    * generalization level.
    *
    * Everything is integer-exact (class sizes, conditional sums); the
    * only float op is the final risk fraction — one IEEE division
    * over exact BIGINTs, the x100 discipline.
    *
    * Scale shape: one map-side-combining groupBy over the QI tuple is
    * the only corpus-sized shuffle; the per-k rollup then runs over
    * the CLASS frame (|classes| × |ks| exploded rows aggregated to
    * |ks|), already orders of magnitude smaller than the corpus.
    *
    * @param qiCols quasi-identifier columns (generalize/bucket BEFORE
    *               calling — e.g. `n_chars div 64`, zip3, age range)
    * @param ks     candidate anonymity thresholds, each >= 2
    * @return one row per k: (k, n_classes, classes_below,
    *         rows_at_risk, n_rows, risk_frac)
    */
  def kAnonymityProfile(df: DataFrame, qiCols: Seq[Column],
      ks: Seq[Int]): DataFrame = {
    require(qiCols.nonEmpty, "at least one quasi-identifier required")
    require(ks.nonEmpty && ks.forall(_ >= 2),
      s"every k must be >= 2 (k=1 is vacuous): $ks")
    require(ks.distinct.size == ks.size,
      s"duplicate k would double-count its row after the rollup: $ks")
    val classes = df.groupBy(qiCols: _*).agg(count(lit(1)).as("__sz"))
    classes.select(col("__sz"),
        explode(array(ks.map(k => lit(k.toLong)): _*)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("__sz") < col("k"), 1L).otherwise(0L))
          .as("classes_below"),
        sum(when(col("__sz") < col("k"), col("__sz")).otherwise(0L))
          .as("rows_at_risk"),
        sum(col("__sz")).as("n_rows"))
      .withColumn("risk_frac",
        col("rows_at_risk").cast("double") / col("n_rows").cast("double"))
  }
}
