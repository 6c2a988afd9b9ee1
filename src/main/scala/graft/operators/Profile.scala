package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.Num.roundz

/** Data-quality profiling: per-column completeness and cardinality in
  * ONE pass over the table — the report a pipeline runs on every new
  * data drop before trusting it (and the input to partition/skew
  * decisions: n_distinct is the first question every join asks).
  *
  * Output is long format, one row per column:
  * (col_name, n_rows, n_nulls, n_distinct).
  *
  * Scale: all counts ride a single aggregation. Multiple exact
  * distincts make Catalyst plan an Expand (one input row fans to one
  * row per distinct aggregate before the shuffle) — exact but N×
  * expansion; `approx = true` switches to HyperLogLog++ sketches,
  * which keeps the pre-shuffle row count flat and is the right mode
  * at 100 TB (the exact mode is for oracle-checkable reports and
  * modest tables).
  */
object Profile {

  def table(df: DataFrame, cols: Seq[String],
      approx: Boolean = false): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    // internal aliases are INDEX-based: a name-derived alias like
    // __nn_user.id would be read back as field access on __nn_user
    // (dots parse as struct paths), crashing on legal dotted column
    // names. The input names themselves are backquoted for the same
    // reason unless the caller already quoted.
    def q(c: String) =
      if (c.contains(".") && !c.startsWith("`")) s"`$c`" else c
    val aggs = count(lit(1)).as("__n") +:
      cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(
          count(col(q(c))).as(s"__nn_$i"),
          (if (approx) approx_count_distinct(col(q(c)))
          else countDistinct(col(q(c)))).as(s"__nd_$i"))
      }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val stacked = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"), col("__n").as("n_rows"),
        (col("__n") - col(s"__nn_$i")).as("n_nulls"),
        col(s"__nd_$i").as("n_distinct"))
    }
    wide.select(explode(array(stacked: _*)).as("p")).select("p.*")
  }

  /** Mergeable moment partials — incremental statistics maintenance:
    * profile each new data slice (a day's drop, a source) ONCE into
    * (n, nulls, Σx, Σx², min, max), then combine partials
    * associatively into any coarser profile WITHOUT rescanning the
    * data. The monoid every warehouse rollup runs on; at 100 TB the
    * whole point is that yesterday's corpus stats never get recomputed
    * — only the new slice is scanned and one `momentsCombine` over the
    * (slices)-row partial frame refreshes the total.
    *
    * Exactness contract: `valueCol` must be integer-valued (counts,
    * cents — the money discipline). Sums accumulate as BIGINT, so
    * partials and any merge order produce IDENTICAL results, and the
    * derived mean/variance are single IEEE expressions over exact
    * integers — bit-equal across engines with no rounding discipline
    * needed. (Float inputs would make Σx order-dependent; exact
    * distincts are deliberately absent — distinct is not a monoid
    * without sketches.)
    */
  def momentPartials(df: DataFrame, sliceCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column): DataFrame = {
    val x = valueCol.cast("long")
    df.groupBy(sliceCol.as("slice")).agg(
      count(lit(1)).as("n_rows"),
      (count(lit(1)) - count(x)).as("n_nulls"),
      coalesce(sum(x), lit(0L)).as("s1"),
      coalesce(sum(x * x), lit(0L)).as("s2"),
      min(x).as("min_val"),
      max(x).as("max_val"))
  }

  /** Fold a partial frame to ONE combined row (slice = the given
    * label). Associative and exact: integer adds, min/max. */
  def momentsCombine(partials: DataFrame,
      label: String = "__ALL__"): DataFrame =
    partials.agg(
      sum(col("n_rows")).as("n_rows"),
      sum(col("n_nulls")).as("n_nulls"),
      sum(col("s1")).as("s1"),
      sum(col("s2")).as("s2"),
      min(col("min_val")).as("min_val"),
      max(col("max_val")).as("max_val"))
      .select(lit(label).as("slice"), col("n_rows"), col("n_nulls"),
        col("s1"), col("s2"), col("min_val"), col("max_val"))

  /** Derive mean and population variance from partials:
    * `mean = s1/nv`, `var = s2/nv - mean²` over the non-null count —
    * plain IEEE expressions on exact integers, identical in any
    * engine. Null when the slice has no non-null values. */
  def momentsFinalize(partials: DataFrame): DataFrame = {
    val nv = (col("n_rows") - col("n_nulls")).cast("double")
    val mean = col("s1").cast("double") / nv
    val varP = col("s2").cast("double") / nv - mean * mean
    partials.select(col("slice"), col("n_rows"), col("n_nulls"),
      col("s1"), col("min_val"), col("max_val"),
      when(nv > 0, mean).as("mean"),
      when(nv > 0, varP).as("var_pop"))
  }

  /** Mergeable DISTINCT partials — the sketch companion to
    * [[momentPartials]] (exact distinct is not a monoid; an HLL sketch
    * is): per-slice HyperLogLog sketches (Spark's bundled DataSketches
    * HLL_4) that union associatively into any coarser slice's distinct
    * estimate WITHOUT rescanning. Store the binary sketch column next
    * to the moment partials and yesterday's corpus cardinality never
    * gets recomputed — union and estimate are sketch-sized operations.
    *
    * @param lgK sketch precision (log2 of K); Spark's default 12 ⇒
    *        ~1.6% relative standard error, 4 KB per sketch
    * @return (slice, n_rows, distinct_sketch BINARY, distinct_est)
    */
  def distinctPartials(df: DataFrame, sliceCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column, lgK: Int = 12): DataFrame =
    df.groupBy(sliceCol.as("slice")).agg(
      count(lit(1)).as("n_rows"),
      hll_sketch_agg(valueCol, lit(lgK)).as("distinct_sketch"))
      .withColumn("distinct_est",
        hll_sketch_estimate(col("distinct_sketch")))

  /** Union a partial frame's sketches to ONE combined row — the
    * rollup step; estimates come from the merged sketch, never by
    * adding per-slice estimates (distincts overlap). */
  def distinctCombine(partials: DataFrame,
      label: String = "__ALL__"): DataFrame =
    partials.agg(
      sum(col("n_rows")).as("n_rows"),
      hll_union_agg(col("distinct_sketch")).as("distinct_sketch"))
      .select(lit(label).as("slice"), col("n_rows"),
        col("distinct_sketch"),
        hll_sketch_estimate(col("distinct_sketch")).as("distinct_est"))

  /** Fixed-width histogram of a numeric column: `nBuckets` equal
    * ranges over the observed [min, max], the distribution report
    * that pairs with [[table]] (and the input to choosing packing/
    * filter thresholds). Two jobs: a (min, max) aggregate whose ONE
    * row broadcasts back, then a scan-side bucket assignment and a
    * bucket-keyed count — the shuffle carries at most `nBuckets` keys
    * per partition. The top edge closes ([min,max] fully covered:
    * x = max lands in the last bucket); a constant column degenerates
    * to one full bucket of width 0. Empty buckets are absent from the
    * output (a corpus-scale histogram is the small report, not a
    * dense vector).
    *
    * Bucket arithmetic is `floor((x - min) / width)` in double — both
    * engines in the oracle pair compute it identically, so boundary
    * landings are deterministic. */
  def histogram(df: DataFrame, valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets >= 1, s"nBuckets must be positive, got $nBuckets")
    val x = col(valueCol).cast("double")
    // NaN is excluded like NULL: it passes isNotNull, max() propagates
    // it, and a NaN width collapses the whole histogram into one
    // garbage bucket with NaN edges — one poison row must not void the
    // report
    val valid = x.isNotNull && !isnan(x)
    val stats = df.filter(valid)
      .agg(min(x).as("__mn"), max(x).as("__mx"))
    val width = (col("__mx") - col("__mn")) / nBuckets
    val bucket = when(col("__mx") === col("__mn"), lit(0L)).otherwise(
      least(floor((x - col("__mn")) / width), lit(nBuckets - 1L))
        .cast("long"))
    df.filter(valid).crossJoin(broadcast(stats))
      .select(bucket.as("bucket"), col("__mn"), width.as("__w"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("cnt"),
        first(col("__mn") + col("bucket") * col("__w")).as("lo"),
        first(col("__mn") + (col("bucket") + 1) * col("__w")).as("hi"))
  }

  /** Mergeable QUANTILE partials — the rank companion to
    * [[momentPartials]] (exact quantiles are not a monoid; counts over
    * a FIXED binning are): clamp values into the declared domain
    * `[lo, hi]`, bin into `nBins` equal widths, count per (slice,
    * bin). The bin domain is declared up front — that is precisely
    * what makes yesterday's partials reusable (a data-derived range
    * like [[histogram]]'s would shift between runs and make old
    * partials unmergeable). Partials fold associatively by integer
    * addition; the quantile estimate from merged partials therefore
    * EQUALS the estimate computed directly on the union, and its error
    * vs the exact quantile is bounded by one bin width, at any number
    * of merge levels. At 100 TB: each new slice is scanned once into a
    * ≤`nBins`-row frame; rollups never touch data again.
    *
    * Bin rule (both engines in the oracle pair compute it
    * identically): `bin = min(floor((clamp(x) - lo) / width), nBins-1)`
    * in double arithmetic, `width = (hi - lo) / nBins`.
    *
    * @return (slice, bin, cnt) — only non-empty bins, non-null values
    */
  def binnedQuantilePartials(df: DataFrame,
      sliceCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column,
      lo: Double, hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1, s"nBins must be positive, got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val width = (hi - lo) / nBins
    val x = least(greatest(valueCol.cast("double"), lit(lo)), lit(hi))
    val bin = least(floor((x - lit(lo)) / lit(width)), lit(nBins - 1L))
      .cast("long")
    // NaN excluded like NULL (clamp would route it to the TOP bin —
    // greatest(NaN, lo) = NaN, least(NaN, hi) = hi — silently
    // inflating p99 toward `hi`); a NaN has no rank
    df.filter(valueCol.isNotNull && !isnan(valueCol.cast("double")))
      .groupBy(sliceCol.as("slice"), bin.as("bin"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Fold a partial frame to ONE slice's partials (integer adds per
    * bin — associative, exact). */
  def binnedQuantileCombine(partials: DataFrame,
      label: String = "__ALL__"): DataFrame =
    partials.groupBy(col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
      .select(lit(label).as("slice"), col("bin"), col("cnt"))

  /** Quantile estimates from binned partials: for each requested
    * `p`, the discrete rank `ceil(p * n)` is located in the cumulative
    * bin counts and linearly interpolated inside its bin —
    * `lo + bin*width + width * (rank - cum_before) / cnt`. Plain IEEE
    * expressions over exact integer counts: cross-engine identical,
    * and within one bin width of the exact quantile. The cumulative
    * window is per-slice (partitioned) over ≤nBins rows.
    *
    * @return (slice, p, q_est, n) one row per slice × p
    */
  def binnedQuantileFinalize(partials: DataFrame, lo: Double, hi: Double,
      nBins: Int, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1),
      s"quantiles must be in (0, 1], got $ps")
    // the same domain requires as the build side — a finalize called
    // with a mismatched domain silently shifts every estimate, the
    // defect class cmsEstimate's dimension guard exists for. The bin
    // range itself is checked in-plan below (the only observational
    // signal a partial frame carries).
    require(nBins >= 1, s"nBins must be positive, got $nBins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi]")
    val width = (hi - lo) / nBins
    val spark = partials.sparkSession
    import spark.implicits._
    // pre-fold duplicate (slice, bin) rows: a union of several runs'
    // partials (the advertised reuse path) is valid input here — with
    // duplicates, the cumulative frame would skip some ranks and
    // double-emit others, so finalize folds first (integer adds, the
    // same monoid as binnedQuantileCombine)
    val folded = partials.groupBy(col("slice"), col("bin"))
      .agg(sum(col("cnt")).as("cnt"))
      // loud in-plan guard: a bin outside [0, nBins) proves the
      // partials were built with a different nBins/domain — every
      // estimate from such a frame would be silently wrong
      .filter(assert_true(col("bin") >= 0 && col("bin") < nBins,
        lit(s"binnedQuantileFinalize: bin outside [0, $nBins) — the " +
          "partials were built with different (lo, hi, nBins) " +
          "parameters than finalize was called with")).isNull)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("slice")).orderBy(col("bin"))
    val cum = folded
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("slice"))))
    val pFrame = ps.toDF("p")
    cum.join(broadcast(pFrame),
        ceil(col("p") * col("n")) > col("cum") - col("cnt") &&
          ceil(col("p") * col("n")) <= col("cum"))
      .select(col("slice"), col("p"),
        (lit(lo) + col("bin") * lit(width) + lit(width) *
          (ceil(col("p") * col("n")) - (col("cum") - col("cnt"))).cast("double")
          / col("cnt").cast("double")).as("q_est"),
        col("n"))
  }

  /** Per-group pass-rate report with a Wilson-score LOWER bound — the
    * curation ranking that doesn't let small samples win: a domain
    * with 3/3 passing docs scores a raw rate of 1.0 but a Wilson
    * lower bound far below a domain at 900/1000, so budget flows to
    * evidence, not luck. One group aggregation; the bound
    * `(p̂ + z²/2n − z·√(p̂(1−p̂)/n + z²/4n²)) / (1 + z²/n)` is a single
    * IEEE expression over exact integer counts — cross-engine
    * deterministic, replayable by the oracle.
    *
    * @param passCol boolean predicate per row (the quality gate).
    *   Rows where the predicate evaluates NULL (unevaluable — e.g. a
    *   length gate on a NULL text) are EXCLUDED from n and k: counting
    *   them as failures would crater a group's bound for reasons that
    *   are missing data, not failing docs.
    * @param z       normal quantile (1.96 ≈ 95% one-sided-ish default)
    * @return (group, n, k, rate, wilson_lb)
    */
  def wilsonPassRates(df: DataFrame, groupCol: org.apache.spark.sql.Column,
      passCol: org.apache.spark.sql.Column,
      z: Double = 1.96): DataFrame = {
    require(z > 0, s"z must be positive, got $z")
    val agg = df.filter(passCol.isNotNull).groupBy(groupCol.as("group"))
      .agg(count(lit(1)).as("n"),
        sum(when(passCol, 1L).otherwise(0L)).as("k"))
    val nD = col("n").cast("double")
    val p = col("k").cast("double") / nD
    val z2 = lit(z * z)
    val lb = (p + z2 / (lit(2.0) * nD) -
      lit(z) * sqrt(p * (lit(1.0) - p) / nD +
        z2 / (lit(4.0) * nD * nD))) / (lit(1.0) + z2 / nD)
    agg.select(col("group"), col("n"), col("k"), p.as("rate"),
      greatest(lb, lit(0.0)).as("wilson_lb"))
  }

  /** Per-group z-score standardization: `(x - mean_g) / stddev_g`
    * (sample stddev), the feature-scaling step before any
    * distance/threshold logic that mixes groups. One group-keyed
    * aggregation (group-count rows) joined back — broadcast under AQE
    * when the group count is small — then a scan-side projection.
    * A group with fewer than 2 rows or zero variance yields null z
    * (explicitly, on both engines — Spark's stddev NaN is normalized
    * away). Output: input columns + `z`. */
  def standardize(df: DataFrame, valueCol: String,
      groupCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    // null-safe join key: the groupBy PRODUCES a row for the NULL
    // group, but a plain equi-join never matches it — a row-preserving
    // projection must not silently drop every NULL-group input row
    val stats = df.groupBy(col(groupCol).as("__g"))
      .agg(avg(x).as("__mean"), stddev_samp(x).as("__sd"))
    df.join(stats, col(groupCol) <=> col("__g"))
      .withColumn("z",
        when(col("__sd").isNull || isnan(col("__sd")) ||
          col("__sd") === 0.0, lit(null).cast("double"))
          .otherwise((x - col("__mean")) / col("__sd")))
      .drop("__g", "__mean", "__sd")
  }

  /** Robust per-group outlier report: median + MAD (both SQL-standard
    * PERCENTILE_DISC — exact ELEMENT selection, no interpolation, so
    * the statistics are actual data values and cross-engine exact) and
    * the count of rows beyond `k` MADs. The mean/stddev z-score breaks
    * down exactly when outliers are present (they drag the mean and
    * inflate the stddev toward themselves); median/MAD is the
    * detection rule that doesn't move.
    *
    * 100 TB shape: two quantile passes, each the counts-then-window
    * formulation of [[Scale.discreteQuantiles]] (windows see DISTINCT
    * values per group, never raw rows); the per-group med/mad frames
    * are group-cardinality-sized and broadcast back onto the scan; the
    * report is one final group aggregation.
    *
    * @return (group, n, med, mad, n_outliers) */
  def robustOutliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    // null-safe group joins throughout: a NULL group is profiled by
    // the quantile passes and must appear in the report — in a
    // data-quality operator the dirtiest segment is the one the old
    // inner equi-joins silently excluded
    val med = Scale.discreteQuantiles(df, groupCol, valueCol, Seq(0.5))
      .select(col(groupCol).as("__rg"), col("q").as("__med"))
    val withDev = df.filter(col(valueCol).isNotNull)
      .join(broadcast(med), col(groupCol) <=> col("__rg"))
      .drop("__rg")
      .withColumn("__dev", abs(col(valueCol) - col("__med")))
    val mad = Scale.discreteQuantiles(withDev, groupCol, "__dev", Seq(0.5))
      .select(col(groupCol).as("__rg"), col("q").as("__mad"))
    withDev.join(broadcast(mad), col(groupCol) <=> col("__rg"))
      .drop("__rg")
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        max(col("__med")).as("med"),
        max(col("__mad")).as("mad"),
        sum(when(col("__dev") > lit(k) * col("__mad"), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Winsorized per-group statistics: values clipped to the group's
    * exact discrete [pLo, pHi] quantiles, then aggregated — the
    * clip-then-aggregate companion to [[robustOutliers]]' flag-only
    * report (a mean a few extreme documents can't own, without
    * dropping the rows the way a filter would).
    *
    * Exactness: the bounds are exact selected ELEMENTS
    * ([[Scale.discreteQuantiles]] — never interpolated), and with an
    * integer-valued column the clipped sum accumulates as BIGINT, so
    * every output but the mean is engine-exact; the mean is one IEEE
    * division over exact integers (the x100 money discipline). Pass
    * dyadic ps (0.125, 0.875, ...) when a differential gate replays
    * `ceil(p·n)` cross-engine — dyadic doubles make the rank exact.
    *
    * Scale shape: the bounds frame is |groups|×2 rows out of
    * discreteQuantiles' distinct-value shuffle; it broadcast-joins
    * back onto the scan and the rollup is one map-side-combined
    * groupBy — no per-group sort of raw rows anywhere.
    *
    * @return one row per group: (groupCol, n, n_lo, n_hi, lo, hi,
    *         winsorized_sum, winsorized_mean)
    */
  def winsorize(df: DataFrame, groupCol: String, valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo > 0 && pHi <= 1 && pLo < pHi,
      s"need 0 < pLo < pHi <= 1, got ($pLo, $pHi)")
    // null-safe group join: same rationale as [[robustOutliers]]
    val bounds = Scale.discreteQuantiles(
        df.select(col(groupCol), col(valueCol)), groupCol, valueCol,
        Seq(pLo, pHi))
      .groupBy(col(groupCol).as("__wg"))
      .agg(min(when(col("p") === pLo, col("q"))).as("__lo"),
        min(when(col("p") === pHi, col("q"))).as("__hi"))
    df.filter(col(valueCol).isNotNull)
      .join(broadcast(bounds), col(groupCol) <=> col("__wg"))
      .drop("__wg")
      .withColumn("__w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"),
        sum(when(col(valueCol) < col("__lo"), 1L).otherwise(0L))
          .as("n_lo"),
        sum(when(col(valueCol) > col("__hi"), 1L).otherwise(0L))
          .as("n_hi"),
        min(col("__lo")).as("lo"), min(col("__hi")).as("hi"),
        sum(col("__w")).as("winsorized_sum"))
      .withColumn("winsorized_mean",
        col("winsorized_sum").cast("double") / col("n").cast("double"))
  }

  /** Snapshot-to-snapshot drift report: per key, row counts, null
    * counts, and exact-cent value sums of two snapshots side by side,
    * with the delta and an added/removed/common status — the
    * day-over-day data-quality diff a pipeline runs before promoting
    * a new snapshot.
    *
    * Scale shape: each snapshot collapses to a key-cardinality profile
    * via partial-aggregated groupBy BEFORE the full-outer join, so the
    * join touches profiles, never raw rows. Counters coalesce to 0 for
    * a missing side; value sums stay NULL there (sum over nothing is
    * undefined, and that distinction matters in an audit).
    */
  def snapshotDrift(a: DataFrame, b: DataFrame, keyCol: String,
      valueCol: String): DataFrame = {
    def prof(df: DataFrame, suf: String) =
      df.groupBy(col(keyCol).as("key" + suf)).agg(
        count(lit(1)).as("n" + suf),
        sum(when(col(valueCol).isNull, 1L).otherwise(0L))
          .as("nulls" + suf),
        sum(round(col(valueCol) * 100).cast("long")).as("cents" + suf))
    // null-safe full outer: a NULL-key group present in BOTH snapshots
    // must read as ONE 'common' row, not a 'removed' + 'added' pair
    // (plain equi-join keys never match NULL against NULL)
    prof(a, "_a").join(prof(b, "_b"),
        col("key_a") <=> col("key_b"), "full_outer")
      .select(coalesce(col("key_a"), col("key_b")).as("key"),
        when(col("n_a").isNull, lit("added"))
          .when(col("n_b").isNull, lit("removed"))
          .otherwise(lit("common")).as("status"),
        coalesce(col("n_a"), lit(0L)).as("n_a"),
        coalesce(col("n_b"), lit(0L)).as("n_b"),
        (coalesce(col("n_b"), lit(0L)) - coalesce(col("n_a"), lit(0L)))
          .as("delta_n"),
        coalesce(col("nulls_a"), lit(0L)).as("nulls_a"),
        coalesce(col("nulls_b"), lit(0L)).as("nulls_b"),
        col("cents_a"), col("cents_b"))
  }

  /** Functional-dependency / candidate-key discovery over a DECLARED
    * hypothesis list — the schema-inference profile a pipeline runs on
    * an unfamiliar drop ("is this column a key? does region determine
    * segment?") before choosing merge keys and partition columns.
    *
    * Each hypothesis is (determinant columns → dependent column); the
    * FD holds iff no determinant-value group contains two distinct
    * dependent values. The output also answers candidate-key-ness for
    * free: a determinant with `n_groups == n_rows` is unique.
    *
    * Scale shape: ONE scan. Every row explodes into |hypotheses| light
    * (pair_id, det, dep) tuples — strings only, no payload — which
    * partial-aggregate map-side on (pair_id, det) before the single
    * shuffle; the per-pair rollup then runs over group frames, never
    * raw rows. P scans (one groupBy per hypothesis) would re-read the
    * corpus P times at 100 TB; this shape reads it once and pays one
    * P×-wider exchange of narrow keys instead.
    *
    * Null semantics (document, don't guess): determinant tuples group
    * by SQL row equality — NULLs compare equal to each other and
    * distinct from every value, position preserved ((NULL,"x") and
    * ("x",NULL) are different groups); NULL dependents are ignored by
    * the distinct count (SQL COUNT(DISTINCT) semantics), so a group
    * of only-NULL dependents counts zero dependents and cannot
    * violate.
    */
  def functionalDependencies(df: DataFrame,
      hypotheses: Seq[(Seq[String], String)]): DataFrame = {
    require(hypotheses.nonEmpty, "need at least one FD hypothesis")
    val tuples = hypotheses.zipWithIndex.map { case ((det, dep), i) =>
      // INJECTIVE determinant encoding: to_json of a positionally-
      // named struct. JSON escaping kills separator-in-data
      // collisions, and the default null-field omission makes NULL
      // position-distinguishing ({"c1":"x"} vs {"c0":"x"}) — a
      // concat_ws encoding collapsed (NULL,"x") with ("x",NULL) and
      // fabricated violations (round-8 review finding)
      struct(lit(i).as("pair_id"),
        to_json(struct(det.zipWithIndex.map { case (c, j) =>
          col(c).cast("string").as(s"c$j") }: _*)).as("det_val"),
        col(dep).cast("string").as("dep_val"))
    }
    val labels = hypotheses.map { case (det, dep) =>
      det.mkString(",") + "->" + dep }
    val groups = df
      .select(explode(array(tuples: _*)).as("t")).select("t.*")
      .groupBy(col("pair_id"), col("det_val"))
      .agg(countDistinct(col("dep_val")).as("n_dep"),
        count(lit(1)).as("n_rows"))
    groups.groupBy(col("pair_id"))
      .agg(count(lit(1)).as("n_groups"),
        sum(col("n_rows")).as("n_rows"),
        sum(when(col("n_dep") > 1, 1L).otherwise(0L))
          .as("violating_groups"),
        max(col("n_dep")).as("max_dep_per_det"))
      .select(
        element_at(array(labels.map(lit): _*), col("pair_id") + 1)
          .as("hypothesis"),
        col("n_groups"), col("n_rows"), col("violating_groups"),
        col("max_dep_per_det"),
        (col("violating_groups") === 0).as("holds"),
        (col("n_groups") === col("n_rows")).as("det_is_unique"))
  }

  /** Benford first-significant-digit audit over an exact-cent money
    * column — the classic fabricated-data screen: organically grown
    * magnitudes follow log10(1+1/d); synthetic or tampered columns
    * drift from it, and the per-digit excess localizes where.
    *
    * Exactness discipline: values quantize to integer cents
    * (`round(x*100)` — the money rule momentPartials documents), the
    * leading digit comes from the cents' DECIMAL STRING (locale-free,
    * identical across engines — no log10/floor near power-of-ten
    * boundaries), and the expected shares are 15-digit decimal
    * LITERALS replicated on both sides, so the only runtime floats are
    * single IEEE divisions/subtractions over exact integers.
    *
    * Scale shape: scan-side arithmetic, one 9-key partial-aggregated
    * groupBy; the share window runs over the 9-row digit frame.
    */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    // log10(1 + 1/d), d = 1..9, printed to 15 significant decimals —
    // decimal→double parse is correctly rounded in both engines
    val expected = Seq(
      0.301029995663981, 0.176091259055681, 0.124938736608300,
      0.096910013008056, 0.079181246047625, 0.066946789630613,
      0.057991946977687, 0.051152522447381, 0.045757490560675)
    // Benford audits the MAGNITUDE: a ledger's refunds/credits are
    // exactly where fabricated entries hide, so negative amounts
    // participate via abs() instead of being silently excluded.
    val cents = abs(round(col(valueCol) * 100).cast("long"))
    // gate on CENTS >= 1, not value != 0: a value below half a cent
    // rounds to zero cents, whose "first digit" is 0 — and
    // element_at(expected, 0) is a runtime error (round-8 review
    // finding). No first significant cent digit exists ⇒ excluded.
    val digits = df.filter(col(valueCol).isNotNull && cents >= 1)
      .select(substring(cents.cast("string"), 1, 1).cast("int")
        .as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
      .coalesce(1) // report-sized: keep mini-jobs below at 1 task
      .localCheckpoint(true) // ≤9 rows, read twice below — ONE corpus scan
    // total as a one-row broadcast, NOT a whole-frame window:
    // partitionBy(lit(1)) is the folded-partition-key trap — Catalyst
    // removes the foldable key from the spec, leaving an unpartitioned
    // WindowExec (round-16 plan audit)
    val total = digits.agg(sum(col("n")).as("__tot"))
    digits.crossJoin(broadcast(total))
      .withColumn("frac_r",
        roundz(col("n").cast("double") / col("__tot").cast("double"), 9))
      .withColumn("expected",
        element_at(array(expected.map(lit): _*), col("digit")))
      .withColumn("excess_r", roundz(col("frac_r") - col("expected"), 9))
      .drop("__tot")
  }

  /** Mergeable count-min sketch partials — the FREQUENCY member of
    * the sketch family ([[momentPartials]] moments,
    * [[distinctPartials]] HLL, [[binnedQuantilePartials]] ranks):
    * per-slice d×w integer count matrices that merge by addition into
    * any coarser slice's sketch, answering "how often does key k
    * appear" with one-sided error (estimate ≥ truth, over by at most
    * εN with ε = e/w at the usual guarantees) without storing per-key
    * state.
    *
    * Hashing is DECLARED integer arithmetic —
    * h_i(k) = ((k·(2i+3) + 5i+11) mod (2³¹−1)) mod w — so sketches
    * are deterministic across engines, epochs, and partitionings
    * (an oracle replays bucket assignment exactly; a seeded-xxhash
    * variant would be opaque). Keys are integers by contract; hash
    * string keys to longs first.
    *
    * Scale shape: one scan exploding each row into `depth` light
    * (slice, i, bucket) tuples that partial-aggregate map-side; the
    * sketch is slices×d×w rows no matter the corpus.
    */
  def cmsPartials(df: DataFrame, sliceCol: org.apache.spark.sql.Column,
      keyCol: org.apache.spark.sql.Column, depth: Int = 4,
      width: Int = 64): DataFrame = {
    require(depth >= 1 && width >= 1,
      s"depth/width must be positive, got $depth/$width")
    val entries = (0 until depth).map { i =>
      struct(lit(i).as("row_i"), cmsBucket(keyCol, i, width).as("bucket"))
    }
    df.select(sliceCol.as("slice"), explode(array(entries: _*)).as("e"))
      .groupBy(col("slice"), col("e.row_i").as("row_i"),
        col("e.bucket").as("bucket"))
      .agg(count(lit(1)).as("cnt"))
      // build parameters ride IN the frame so estimates can verify
      // them — width is otherwise unverifiable (a width-8 sketch is
      // indistinguishable from a sparse width-64 one)
      .withColumn("cms_depth", lit(depth))
      .withColumn("cms_width", lit(width))
  }

  private def cmsBucket(key: org.apache.spark.sql.Column, i: Int,
      width: Int): org.apache.spark.sql.Column =
    // the key is reduced mod p BEFORE the multiply: k·(2i+3) overflows
    // int64 for |k| > ~1e18 (an ANSI ArithmeticException on exactly
    // the full-range xxhash64 keys the scaladoc tells callers to use);
    // (k mod p)·a + b ≡ k·a + b (mod p), so buckets are unchanged
    // wherever the old form didn't overflow
    pmod(pmod(pmod(key.cast("long"), lit(2147483647L)) * lit(2L * i + 3)
      + lit(5L * i + 11), lit(2147483647L)), lit(width.toLong))

  /** Add a partial frame into ONE combined sketch (slice = label).
    * Associative and exact: integer adds per (row, bucket) cell; the
    * build-parameter columns propagate when present. */
  def cmsCombine(partials: DataFrame,
      label: String = "__ALL__"): DataFrame = {
    val hasMeta = partials.columns.contains("cms_depth")
    val metaAggs =
      if (hasMeta) Seq(first(col("cms_depth")).as("cms_depth"),
        first(col("cms_width")).as("cms_width"))
      else Nil
    val combined = partials.groupBy(col("row_i"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"), metaAggs: _*)
    val base = Seq(lit(label).as("slice"), col("row_i"), col("bucket"),
      col("cnt"))
    combined.select(base ++ (if (hasMeta)
      Seq(col("cms_depth"), col("cms_width")) else Nil): _*)
  }

  /** Point-frequency estimates for a probe-key frame: min over sketch
    * rows of the key's bucket count (0 when the bucket is empty).
    * Any partial frame is accepted — cells pre-sum per (row, bucket)
    * so a multi-slice input can't double-join. The sketch side is
    * d×w rows, so the join broadcasts.
    *
    * Dimension guard (round-8 review findings, both passes): a
    * depth/width mismatch between build and estimate silently
    * UNDERcounts — the inverted CMS guarantee. Frames built by
    * [[cmsPartials]] carry their parameters and are verified
    * exactly; bare frames (e.g. read back from a database) get the
    * observational check — depth fully, width only as an upper
    * bound, because a narrow sketch is indistinguishable from a
    * sparse wide one. Callers reconstructing frames are responsible
    * for passing the build parameters. */
  def cmsEstimate(sketch: DataFrame, probes: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 64): DataFrame = {
    // ≤d×w rows, read by the guard AND the estimate join: checkpoint
    // once so the sketch's (possibly corpus-sized) lineage is not
    // recomputed per consumer — meta rides through the same pass
    val hasMeta = sketch.columns.contains("cms_depth")
    val metaAggs = if (hasMeta)
      Seq(first(col("cms_depth")).as("cms_depth"),
        first(col("cms_width")).as("cms_width")) else Nil
    val cells = sketch.groupBy(col("row_i"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"), metaAggs: _*)
      .localCheckpoint(true)
    // Guards read via cast("long") + getLong: a sketch frame read back
    // from a database can come back with row_i/bucket/meta widened to
    // BIGINT, and this observational check targets exactly that
    // round-trip — it must `require`, not ClassCastException.
    if (hasMeta) {
      cells.select(col("cms_depth").cast("long"),
          col("cms_width").cast("long")).take(1)
        .foreach { meta =>
          require(meta.getLong(0) == depth && meta.getLong(1) == width,
            s"cmsEstimate: sketch was built with depth=${meta.getLong(0)} " +
              s"width=${meta.getLong(1)}, estimate called with " +
              s"depth=$depth width=$width")
        }
    } else {
      val dims = cells.agg(min(col("row_i").cast("long")),
        max(col("row_i").cast("long")),
        max(col("bucket").cast("long")), count(lit(1))).head()
      if (dims.getLong(3) > 0) {
        require(dims.getLong(0) == 0L && dims.getLong(1) == depth - 1,
          s"cmsEstimate: sketch rows ${dims.getLong(0)}.." +
            s"${dims.getLong(1)} do not match depth=$depth — estimate " +
            "with the sketch's build parameters")
        require(dims.getLong(2) < width,
          s"cmsEstimate: sketch bucket ${dims.getLong(2)} outside " +
            s"width=$width — estimate with the sketch's build parameters")
      }
    }
    val pk = (0 until depth).map { i =>
      struct(lit(i).as("row_i"),
        cmsBucket(col(keyCol), i, width).as("bucket"))
    }
    probes.select(col(keyCol).as("key"), explode(array(pk: _*)).as("e"))
      .select(col("key"), col("e.row_i").as("row_i"),
        col("e.bucket").as("bucket"))
      .join(broadcast(cells), Seq("row_i", "bucket"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Per-group OLS trend over integer-valued observations — "is this
    * source's volume growing, and how fast" as a closed-form
    * regression: slope, intercept (at the frame's min x — x shifts
    * there so the Σ products stay small), and r² per group, all
    * derived from six BIGINT sums (n, Σx, Σy, Σxy, Σx², Σy²) with
    * single IEEE divisions — deterministic across engines because
    * both sides compute identical integer sums and identical
    * division shapes.
    *
    * Integer contract (documented like [[momentPartials]]): x and y
    * must be integer-valued and modest (the r² numerator squares
    * n·Σxy−ΣxΣy in BIGINT — magnitudes beyond ~3·10⁹ need a scaled
    * variant). Degenerate groups (single x value ⇒ denom 0) emit
    * null slope/intercept/r².
    *
    * Scale shape: one (group)-keyed partial-aggregated groupBy over
    * the observation frame; the min-x normalization is a one-row
    * broadcast. Observations are usually an aggregate themselves
    * (daily counts), so nothing corpus-sized reaches this operator.
    */
  def groupTrend(obs: DataFrame, groupCol: org.apache.spark.sql.Column,
      xCol: org.apache.spark.sql.Column,
      yCol: org.apache.spark.sql.Column): DataFrame = {
    // NULL x or y rows are excluded entirely — counting them in n
    // while the sums skip them would make the six sums internally
    // inconsistent and the regression silently wrong (round-8 review
    // finding, second pass)
    val clean = obs.filter(xCol.isNotNull && yCol.isNotNull)
    val xmin = clean.agg(min(xCol.cast("long")).as("__xmin"))
    val x = xCol.cast("long") - col("__xmin")
    val y = yCol.cast("long")
    val sums = clean.crossJoin(broadcast(xmin))
      .groupBy(groupCol.as("group"))
      .agg(count(lit(1)).as("n"), sum(x).as("sx"), sum(y).as("sy"),
        sum(x * y).as("sxy"), sum(x * x).as("sxx"),
        sum(y * y).as("syy"))
    val num = col("n") * col("sxy") - col("sx") * col("sy")
    val denX = col("n") * col("sxx") - col("sx") * col("sx")
    val denY = col("n") * col("syy") - col("sy") * col("sy")
    sums.select(col("group"), col("n"),
      when(denX > 0, roundz(num.cast("double") / denX.cast("double"), 9))
        .as("slope_r"),
      when(denX > 0, roundz(
        (col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double")
          / denX.cast("double"), 9)).as("intercept_r"),
      when(denX > 0 && denY > 0, roundz(
        (num * num).cast("double") / (denX * denY).cast("double"), 9))
        .as("r2_r"))
  }

  /** Per-group Gini concentration index over a non-negative integer
    * column — "is this source's token mass spread evenly or owned by
    * a few documents", the inequality statistic behind mixture
    * re-weighting decisions. For sorted values x_1..x_n,
    * G = 2Σi·x_i/(nΣx) − (n+1)/n; the rank-weighted sum folds over
    * TIES in closed form — 2Σi·x_i = Σ_v x_v·c_v·(2·cum_before + c_v
    * + 1) — so it is computed on the (group, value, count) frame,
    * never by ranking raw rows. Pure BIGINT until two final IEEE
    * divisions: bit-exact across engines.
    *
    * Magnitude contract (the groupTrend rule): n·total and the rank
    * sum (≈2·n·total) must stay under 2⁶³ — n·mean(value) beyond
    * ~4·10¹⁸ needs the value column scaled down first (e.g. chars →
    * KB); Spark would wrap silently where the oracle errors.
    *
    * Scale shape: one map-side-combined (group, value) groupBy — the
    * only corpus-sized exchange; the cumulative window runs per group
    * over distinct-value frames (the x111 counts-then-window
    * discipline).
    */
  def giniIndex(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val v = col(valueCol).cast("long")
    val byVal = df.filter(v.isNotNull && v >= 0)
      .groupBy(col(groupCol).as("group"), v.as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = Window.partitionBy(col("group")).orderBy(col("__v"))
      .rowsBetween(Window.unboundedPreceding, -1)
    byVal
      .withColumn("__cb", coalesce(sum(col("__c")).over(cum), lit(0L)))
      .withColumn("__rw",
        col("__v") * col("__c") * (lit(2) * col("__cb") + col("__c") + 1))
      .groupBy(col("group"))
      .agg(sum(col("__c")).as("n"), sum(col("__v") * col("__c")).as("total"),
        sum(col("__rw")).as("__num"))
      .select(col("group"), col("n"), col("total"),
        when(col("total") > 0 && col("n") > 1, roundz(
          col("__num").cast("double") /
            (col("n") * col("total")).cast("double") -
            (col("n") + 1).cast("double") / col("n").cast("double"), 9))
          .as("gini_r"))
  }

  /** Population stability index between two snapshots of a numeric
    * column — THE distribution-drift monitor ML pipelines run between
    * training and serving data. Bins are a DECLARED [lo,hi]×nBins
    * domain (the x103 rule: declared ⇒ comparable across epochs;
    * data-derived ranges would not be), edges clamped so outliers
    * land in the boundary bins. Output is per-bin rows (n_a, n_b,
    * exact shares, and the PSI term (p_a−p_b)·ln(p_a/p_b)) — a
    * single-row Σ would sum doubles in engine order; the reader sums
    * the 4-dp terms. Bins empty on EITHER side emit a null term
    * (the standard smoothing choices are a policy, not a fact — the
    * counts are there for the caller's own epsilon).
    *
    * Scale shape: both snapshots collapse map-side to ≤nBins keys in
    * one union scan; shares and terms are windows/arithmetic over
    * the bin frame.
    */
  def psi(a: DataFrame, b: DataFrame, valueCol: String, lo: Double,
      hi: Double, nBins: Int): DataFrame = {
    require(nBins >= 1 && hi > lo, s"bad psi domain [$lo,$hi]×$nBins")
    val width = (hi - lo) / nBins
    def binned(df: DataFrame, tag: Int) =
      df.filter(col(valueCol).isNotNull)
        .select(least(greatest(
          floor((col(valueCol).cast("double") - lo) / width), lit(0L)),
          lit(nBins - 1L)).cast("long").as("bin"), lit(tag).as("side"))
    val bins = binned(a, 0).unionByName(binned(b, 1))
      .groupBy(col("bin"))
      .agg(sum(when(col("side") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("side") === 1, 1L).otherwise(0L)).as("n_b"))
      .coalesce(1) // report-sized: keep mini-jobs below at 1 task
      .localCheckpoint(true) // ≤nBins rows, read twice — ONE union scan
    // side totals as a one-row broadcast — partitionBy(lit(1)) folds
    // to an unpartitioned WindowExec (round-16 plan audit)
    val totals = bins.agg(sum(col("n_a")).as("__ta"),
      sum(col("n_b")).as("__tb"))
    bins.crossJoin(broadcast(totals))
      // null shares (not 0/0 = NaN) when a snapshot is empty — NaN
      // would leak into every row of the surviving side's report
      .withColumn("p_a", when(col("__ta") > 0,
        col("n_a").cast("double") / col("__ta").cast("double")))
      .withColumn("p_b", when(col("__tb") > 0,
        col("n_b").cast("double") / col("__tb").cast("double")))
      .withColumn("psi_term_r",
        when(col("n_a") > 0 && col("n_b") > 0,
          roundz((col("p_a") - col("p_b")) * log(col("p_a") / col("p_b")),
            4)))
      .withColumn("p_a_r", roundz(col("p_a"), 9))
      .withColumn("p_b_r", roundz(col("p_b"), 9))
      .drop("p_a", "p_b", "__ta", "__tb")
  }

  /** Exact-integer CUSUM change-point profile over per-bucket event
    * counts — "did the volume regime shift, and on which day?" for a
    * pipeline watching its own intake. The standard CUSUM statistic
    * C_i = Σ_{j≤i}(c_j − mean) peaks at the shift point; to keep it
    * oracle-exact it is emitted SCALED by the bucket count D:
    * D·C_i = D·Σ_{j≤i}c_j − i·T — pure BIGINT arithmetic, no float
    * mean anywhere. The peak row (max |D·C_i|) is flagged.
    *
    * Scale shape: the only corpus-sized operation is the bucket
    * groupBy (partial-aggregated map-side). The tail — index, running
    * sum, totals, peak flag — is |buckets|-row arithmetic, and
    * |buckets| is report-sized by the operator's own premise (a CUSUM
    * over >`maxBuckets` time buckets is not a change-point question),
    * so it runs on the DRIVER off ONE bounded sorted collect and
    * returns a LocalRelation. The round-16 history of this tail:
    * the original `partitionBy(lit(1))` windows were genuinely
    * unpartitioned after constant folding (plan audit); the
    * window-free distributed helpers fixed that but paid ~6 extra
    * Spark jobs on a 30-row frame (bench: 0.15 s → 0.54 s); one
    * driver pass is both window-free AND single-job. The cap FAILS
    * LOUDLY, and the integer arithmetic uses Math.*Exact so overflow
    * throws exactly like the ANSI SQL form it replaces. Raw rows are
    * never windowed or collected (the x103/x112 counts-then-window
    * discipline).
    */
  def cusumChangePoint(df: DataFrame,
      bucketCol: org.apache.spark.sql.Column,
      maxBuckets: Int = 1 << 16): DataFrame = {
    require(maxBuckets >= 1, s"maxBuckets must be positive: $maxBuckets")
    val spark = df.sparkSession
    val counts = df.groupBy(bucketCol.as("bucket"))
      .agg(count(lit(1)).as("n"))
    val taken = counts.orderBy(col("bucket")).limit(maxBuckets + 1).collect()
    if (taken.length > maxBuckets) throw new IllegalStateException(
      s"cusumChangePoint: ${taken.length} buckets exceed " +
        s"maxBuckets=$maxBuckets — coarsen the bucket column (a CUSUM " +
        "over that many buckets is noise, not a change-point signal)")
    val d = taken.length.toLong
    var t = 0L
    taken.foreach(r => t = Math.addExact(t, r.getLong(1)))
    val scaled = new Array[Long](taken.length)
    var excl = 0L
    var peak = 0L
    var i = 0
    while (i < taken.length) {
      val n = taken(i).getLong(1)
      // D·C_i = D·(excl + n) − i·T, i 1-based — the same exact-integer
      // formula as the SQL form; Math.*Exact throws on overflow like
      // the ANSI arithmetic it replaces
      scaled(i) = Math.subtractExact(
        Math.multiplyExact(d, Math.addExact(excl, n)),
        Math.multiplyExact(i + 1L, t))
      val a = Math.absExact(scaled(i))
      if (a > peak) peak = a
      excl = Math.addExact(excl, n)
      i += 1
    }
    val outSchema = org.apache.spark.sql.types.StructType(
      counts.schema.fields ++ Seq(
        org.apache.spark.sql.types.StructField("cusum_scaled",
          org.apache.spark.sql.types.LongType, nullable = false),
        org.apache.spark.sql.types.StructField("is_peak",
          org.apache.spark.sql.types.BooleanType, nullable = false)))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](taken.length)
    i = 0
    while (i < taken.length) {
      // a flat series (cusum 0 everywhere) has NO change-point — the
      // peak > 0 guard keeps a constant series from flagging every row
      // (round-8 review finding)
      rows.add(org.apache.spark.sql.Row.fromSeq(taken(i).toSeq ++
        Seq(scaled(i), Math.absExact(scaled(i)) == peak && peak > 0)))
      i += 1
    }
    spark.createDataFrame(rows, outSchema)
  }
}
