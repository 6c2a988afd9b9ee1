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
}
