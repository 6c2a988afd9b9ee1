package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.Num.roundz

/** Per-group percentile-rank calibration: map a raw score to its
  * percent rank within its group — the normalization step that makes
  * quality/length thresholds comparable across languages or sources
  * ("keep the top 30% of each language", not one global cutoff that
  * Gopher-style scores don't support across languages).
  *
  * Semantics are SQL `percent_rank`: `(rank - 1) / (n - 1)` with rank
  * counting strictly-smaller rows; single-row groups get 0.
  *
  * 100 TB shape — the naive window (`percent_rank().over(partitionBy
  * (group))`) sorts EVERY row of a group in one task, and a dominant
  * group (English is 40%+ of a web corpus) makes that task the job.
  * This implementation never windows the raw rows: it aggregates to
  * (group, value) counts first — vocabulary-sized, not corpus-sized —
  * windows the cumulative sum over THAT, and broadcasts/joins the rank
  * back to the scan. Ties collapse into the aggregate, so the
  * per-group window handles distinct values only; the raw-row join is
  * key-partitioned with no single-task stage anywhere. `(rank-1)` and
  * `(n-1)` are exact integers, so the division is the same IEEE op in
  * any engine — no rounding discipline needed downstream.
  */
object Calibrate {

  /** @return df plus `outCol` = percent rank of `valueCol` within
    *         `groupCol` */
  def percentRank(df: DataFrame, groupCol: Column, valueCol: Column,
      outCol: String = "pct"): DataFrame = {
    val counts = df.groupBy(groupCol.as("__g"), valueCol.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = counts
      .withColumn("__below", coalesce(sum(col("__c")).over(w), lit(0L)))
    val totals = df.groupBy(groupCol.as("__g2"))
      .agg(count(lit(1)).as("__n"))
    // null-safe joins (<=>): a NULL group or NULL value row came out
    // of the groupBy above but never matched the plain equi-join back
    // — the row silently vanished from the output (the Profile-class
    // defect from the round-14 review, same fix). NULL values sort
    // first in the cumulative window, so they rank 0 — SQL
    // percent_rank's nulls-first convention.
    df.join(ranked, groupCol <=> col("__g") && valueCol <=> col("__v"))
      .join(totals, groupCol <=> col("__g2"))
      .withColumn(outCol,
        when(col("__n") === 1L, lit(0.0))
          .otherwise(col("__below").cast("double") /
            (col("__n") - 1L).cast("double")))
      .drop("__g", "__g2", "__v", "__c", "__below", "__n")
  }

  /** Reliability diagram for a [0,1] score against a boolean label —
    * the calibration check run before trusting a quality/relevance
    * scorer's thresholds: per equal-width score bin, how often the
    * label actually holds vs the bin's nominal confidence.
    *
    * Output is PER-BIN rows only, deliberately: bin accuracy and gap
    * are exact-integer counts plus one IEEE expression each
    * (engine-exact, the x100 discipline), while a single-row ECE
    * would sum doubles in engine-dependent row order. ECE is a
    * trivial fold over the ≤nBins output rows for the caller.
    *
    * Scores are clamped into [0, 1]; the top edge closes into the
    * last bin (the x55 histogram rule). One map-side-combining
    * groupBy on the bin — nothing here scales past the scan.
    *
    * @return one row per non-empty bin: (bin, n, n_pos, conf_mid,
    *         acc, gap)
    */
  def reliability(df: DataFrame, scoreCol: Column, labelCol: Column,
      nBins: Int = 10): DataFrame = {
    require(nBins >= 1, s"nBins must be positive, got $nBins")
    val clamped = greatest(least(scoreCol.cast("double"), lit(1.0)),
      lit(0.0))
    val bin = least(floor(clamped * nBins), lit((nBins - 1).toDouble))
      .cast("long")
    df.filter(scoreCol.isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        sum(when(labelCol, 1L).otherwise(0L)).as("n_pos"))
      .withColumn("conf_mid",
        (col("bin").cast("double") + lit(0.5)) / lit(nBins.toDouble))
      .withColumn("acc",
        col("n_pos").cast("double") / col("n").cast("double"))
      .withColumn("gap", abs(col("acc") - col("conf_mid")))
  }

  /** Cohen's kappa between two categorical label columns —
    * chance-corrected agreement, the label-quality audit a pipeline
    * runs when validating a heuristic labeler against gold labels
    * (or two annotators against each other). κ = (p_o − p_e)/(1 − p_e)
    * with p_o the observed agreement share and p_e the expected-by-
    * chance share Σ row_i·col_i / N².
    *
    * Exactness: every input to the two final IEEE expressions is a
    * BIGINT count (N, agreements, Σ marginal products) — bit-exact
    * across engines. κ is null when p_e = 1 (both raters constant —
    * agreement is vacuous, not perfect). Magnitude contract (the
    * groupTrend rule): N² and Σ row·col products stay in BIGINT, so
    * N must stay under ~3·10⁹ — beyond that, sample.
    *
    * Scale shape: one (a,b)-keyed map-side-combined groupBy over the
    * rows (≤|labels|² cells); marginals and the product sum are
    * aggregates over the CELL frame. One corpus-sized exchange.
    */
  def cohenKappa(df: DataFrame, aCol: Column, bCol: Column): DataFrame = {
    val cells = df
      .filter(aCol.isNotNull && bCol.isNotNull)
      .groupBy(aCol.as("a"), bCol.as("b"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true) // ≤|labels|² rows; read by three aggs
    val n = cells.agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    val agree = cells.filter(col("a") === col("b"))
      .agg(coalesce(sum(col("c")), lit(0L))).head().getLong(0)
    val rows = cells.groupBy(col("a")).agg(sum(col("c")).as("ra"))
    val colsM = cells.groupBy(col("b")).agg(sum(col("c")).as("cb"))
    val prodSum = rows.join(colsM, col("a") === col("b"))
      .agg(coalesce(sum(col("ra") * col("cb")), lit(0L)))
      .head().getLong(0)
    val spark = df.sparkSession
    import spark.implicits._
    Seq((n, agree, prodSum)).toDF("n", "n_agree", "marginal_prod_sum")
      .select(col("n"), col("n_agree"),
        when(col("n") > 0, roundz(
          col("n_agree").cast("double") / col("n").cast("double"), 9))
          .as("po_r"),
        when(col("n") > 0, roundz(col("marginal_prod_sum").cast("double") /
          (col("n") * col("n")).cast("double"), 9)).as("pe_r"),
        when(col("n") > 0 &&
          col("marginal_prod_sum") =!= col("n") * col("n"), roundz(
          (col("n_agree").cast("double") / col("n").cast("double") -
            col("marginal_prod_sum").cast("double") /
              (col("n") * col("n")).cast("double")) /
            (lit(1.0) - col("marginal_prod_sum").cast("double") /
              (col("n") * col("n")).cast("double")), 9))
          .as("kappa_r"))
  }
}
