package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling for corpus re-balancing (e.g.
  * downsampling the dominant language before training). The keep/drop
  * decision is a pure function of the row key — `md5(salt || key)`
  * compared against a per-stratum threshold — so it is:
  *
  *   - reproducible across runs, engines and cluster sizes (no RNG
  *     state, no partition dependence — unlike `df.sample`);
  *   - a plain filter: no shuffle, no aggregation, evaluated at the
  *     scan, trivially parallel at 100 TB;
  *   - stable under re-partitioning and incremental re-runs — a doc's
  *     fate never changes when the corpus around it grows.
  *
  * The threshold compare happens on the md5 hex string directly:
  * lowercase hex is character-ordered consistently with the numeric
  * value, so `hex < threshold_hex` selects a uniform `rate` fraction
  * without any engine-specific hex→int conversion (keeps the DuckDB
  * oracle byte-identical).
  */
object Sampling {

  /** First-8-hex-chars threshold for a keep rate in [0, 1].
    *
    * rate ≥ 1.0 returns the FULL-KEEP sentinel "g": every hex string
    * sorts below 'g', so `hex < "g"` keeps every row. The old
    * "ffffffff" cap silently dropped keys hashing to exactly ffffffff
    * (p = 2⁻³²) — ~23 documents per 10¹¹ at corpus scale, a real
    * violation of mixtureSample's "binding group kept whole" contract
    * (round-15 review). The x53 oracle carries the same sentinel in
    * lockstep. */
  def rateThreshold(rate: Double): String = {
    val clamped = math.max(0.0, math.min(1.0, rate))
    if (clamped >= 1.0) "g"
    else f"${math.round(clamped * 4294967296.0).min(4294967295L)}%08x"
  }

  /** Uniform deterministic sample: keep rows whose key-hash falls
    * under the rate threshold. */
  def uniform(df: DataFrame, keyCol: Column, rate: Double,
      salt: String = ""): DataFrame =
    df.filter(keepExpr(keyCol, lit(rateThreshold(rate)), salt))

  /** Stratified sample: per-stratum keep rates, with a default for
    * strata not listed. */
  def stratified(df: DataFrame, keyCol: Column, strataCol: Column,
      rates: Map[String, Double], defaultRate: Double,
      salt: String = ""): DataFrame = {
    val threshold = rates.foldLeft(
      when(lit(false), lit("")).otherwise(lit(rateThreshold(defaultRate)))) {
      case (acc, (stratum, rate)) =>
        when(strataCol === stratum, lit(rateThreshold(rate))).otherwise(acc)
    }
    df.filter(keepExpr(keyCol, threshold, salt))
  }

  private def keepExpr(keyCol: Column, thresholdHex: Column,
      salt: String): Column =
    substring(md5(concat(lit(salt), keyCol.cast("string"))), 1, 8) <
      thresholdHex

  /** Leakage-free train/val/test split: the split is a pure function
    * of the GROUP key's hash, so every row of a group (all docs of one
    * source/domain, all turns of one conversation) lands in the SAME
    * split — the grouping is what keeps near-duplicates from straddling
    * train and eval. Scan-side CASE over the md5 hex (no shuffle, no
    * RNG state); split boundaries are cumulative rate thresholds, so
    * membership is stable under corpus growth exactly like [[uniform]].
    *
    * @param splits (name, weight) pairs; weights are normalized
    * @return df plus a `split` column
    */
  def groupSplit(df: DataFrame, groupCol: Column,
      splits: Seq[(String, Double)], salt: String = ""): DataFrame = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 > 0), s"weights must be positive: $splits")
    val total = splits.map(_._2).sum
    val h = substring(md5(concat(lit(salt), groupCol.cast("string"))), 1, 8)
    val cum = splits.scanLeft(0.0)(_ + _._2).tail.map(_ / total)
    // last split is the unconditional tail — boundary rounding can
    // never drop a row
    val expr = splits.init.zip(cum.init).reverse.foldLeft(
      lit(splits.last._1)) { case (acc, ((name, _), upper)) =>
      when(h < lit(rateThreshold(upper)), lit(name)).otherwise(acc)
    }
    df.withColumn("split", expr)
  }

  /** Mixture-targeted sampling: choose per-group keep rates so the
    * sampled corpus hits target mixture WEIGHTS at the largest
    * feasible size — the "dataset mixing" step that turns raw
    * per-source counts into a training recipe (e.g. 50% web / 30%
    * books / 20% code). The binding group (smallest `n_g / w_g`) is
    * kept whole; every other group downsamples to match:
    * `T = min_g n_g / w_g`, `rate_g = w_g * T / n_g`. Groups without a
    * weight are dropped. Weights are RELATIVE (never normalized — the
    * rates are scale-invariant, and skipping normalization keeps the
    * arithmetic bit-identical to the x53 oracle's).
    *
    * One count aggregation whose result (≤ |weights| rows — the recipe
    * size, not the corpus) crosses the driver to fix the rates; the
    * sample itself is then the same scan-side md5-threshold filter as
    * [[stratified]] — deterministic, no shuffle, stable under corpus
    * growth within a group count. Weighted groups absent from the data
    * fail loudly: silently emitting a mixture missing a requested
    * component is the one wrong answer this op can produce. */
  def mixtureSample(df: DataFrame, keyCol: Column, groupCol: Column,
      weights: Map[String, Double], salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "at least one weighted group required")
    require(weights.values.forall(_ > 0), s"weights must be positive: $weights")
    // cast to string for the recipe-sized collect: the weights map is
    // string-keyed either way, and a non-string group column would
    // otherwise ClassCastException on getString
    val counts = df.filter(groupCol.isin(weights.keys.toSeq: _*))
      .groupBy(groupCol.cast("string").as("__g")).agg(count(lit(1)).as("__n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val missing = weights.keySet -- counts.keySet
    require(missing.isEmpty, s"weighted groups absent from data: $missing")
    val t = weights.map { case (g, w) => counts(g) / w }.min
    val rates = weights.map { case (g, w) => g -> (w * t) / counts(g) }
    stratified(df, keyCol, groupCol, rates, defaultRate = 0.0, salt)
  }

  /** Per-group CAP: deterministically keep at most `k` rows per group
    * (e.g. "≤100k docs per domain"), choosing the k smallest key
    * hashes so membership is reproducible and, like [[uniform]],
    * monotone — a kept row stays kept when k grows. Rate-based
    * sampling can't bound a pathological group; this is the other half
    * of corpus re-balancing. One group-keyed shuffle; the rank ≤ k
    * filter is a WindowGroupLimit, so partial top-k runs map-side
    * before the exchange (same shape as the posting-list build).
    *
    * Determinism: rows tie on the hash exactly when their key values
    * are equal, so with DUPLICATE keys inside a group the rank among
    * the duplicates would be partition-order-dependent. The window
    * therefore orders by (hash, key, tieBreak*): callers whose keys
    * are unique per group need nothing more; callers with duplicate
    * keys pass `tieBreak` columns that distinguish the duplicates to
    * keep membership (and the k5 ⊆ k9 monotonicity) reproducible. */
  def kPerGroup(df: DataFrame, keyCol: Column, groupCol: Column, k: Int,
      salt: String = "", tieBreak: Seq[Column] = Nil): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    val h = md5(concat(lit(salt), keyCol.cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy((Seq(h, keyCol) ++ tieBreak): _*)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** WEIGHTED k-per-group sampling without replacement
    * (Efraimidis–Spirakis A-ES): each row draws priority
    * `ln(u) / w` with `u` a pure hash function of its key, and the k
    * highest-priority rows per group win — inclusion probability is
    * proportional to weight, membership is deterministic and
    * engine-reproducible like every sampler here (no RNG state).
    * The importance-weighted counterpart of [[kPerGroup]]: "keep 20
    * docs per source, preferring the long ones".
    *
    * `u` is the md5 60-bit hex prefix mapped into (0, 1] — wide enough
    * that distinct keys never tie on `u` in practice; exact priority
    * ties (identical key AND weight) still break on (key, tieBreak*)
    * in the window order. `ln`/division are IEEE-deterministic given
    * identical inputs, so cross-engine agreement holds whenever no two
    * priorities sit within libm's last-ulp disagreement (~1e-15
    * relative) of each other — callers hashing a differential gate
    * should probe rank-boundary margins like the x65 query does.
    *
    * One group-keyed shuffle; rank <= k is a map-side
    * WindowGroupLimit, same shape as [[kPerGroup]].
    *
    * @param weightCol strictly positive weight
    * @return df plus the winner's `rank` (1..k, priority-descending)
    */
  def weightedKPerGroup(df: DataFrame, keyCol: Column, groupCol: Column,
      weightCol: Column, k: Int, salt: String = "",
      tieBreak: Seq[Column] = Nil): DataFrame = {
    require(k >= 1, s"k must be positive, got $k")
    // 15 hex chars = 60 bits; +1 keeps u in (0, 1] so ln(u) is finite
    val h = conv(substring(md5(concat(lit(salt), keyCol.cast("string"))),
      1, 15), 16, 10).cast("long") + lit(1L)
    val u = h.cast("double") / lit(1152921504606846976L).cast("double")
    // a non-positive (or NULL) weight flips ln(u)/w POSITIVE — the row
    // would silently take rank 1 in its group; fail loudly instead
    // (round-15 review; the scaladoc contract was unenforced)
    val wSafe = when(weightCol.isNull || weightCol.cast("double") <= 0.0,
      raise_error(lit("weightedKPerGroup: weight must be strictly " +
        "positive and non-null")).cast("double"))
      .otherwise(weightCol.cast("double"))
    val priority = log(u) / wSafe
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol)
      .orderBy((Seq(priority.desc, keyCol) ++ tieBreak): _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
  }

  /** Temperature-scaled mixture weights over domains — the standard
    * multilingual/multi-domain rebalancing rule (mBERT/XLM-R's
    * `p^alpha` sampling, and the starting point DoReMi-style methods
    * iterate from): a domain with token mass `T_d` samples at rate
    * `T_d^alpha / Σ_d T_d^alpha`. `alpha = 1` reproduces natural
    * proportions; lower alpha flattens toward uniform, upweighting
    * low-resource domains.
    *
    * 100 TB shape: one group aggregate (domain-count keys, partial
    * map-side combine) and a one-row total broadcast — the output is a
    * RECIPE frame (one row per domain) that feeds [[mixtureSample]]'s
    * per-group rates; nothing here scales with corpus size.
    *
    * Determinism: mass is an exact integer sum; `pow`/division are the
    * only float ops. Cross-engine, libm `pow` can differ in the last
    * ulp — round emitted weights and probe grid margins when hashing a
    * differential (the x98 discipline).
    *
    * @param massExpr per-row mass (e.g. a token count) — summed
    *                 exactly per group
    * @return (group, n_rows, mass, weight, rate), one row per group
    */
  def temperatureWeights(df: DataFrame, groupCol: Column, massExpr: Column,
      alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    val per = df.groupBy(groupCol.as("group"))
      .agg(count(lit(1)).as("n_rows"), sum(massExpr).as("mass"))
      .withColumn("weight", pow(col("mass").cast("double"), lit(alpha)))
    val tot = per.agg(sum(col("weight")).as("__tw"))
    per.crossJoin(broadcast(tot))
      .select(col("group"), col("n_rows"), col("mass"), col("weight"),
        (col("weight") / col("__tw")).as("rate"))
  }

  /** Per-group TOKEN-BUDGET selection — "take N tokens per domain",
    * the allocation step that turns mixture rates (x53/x98) into an
    * actual training subset: within each group, documents are taken
    * in deterministic `orderCol` order until the group's cumulative
    * token mass reaches `budget` (the document that crosses the
    * budget is the last one kept, so every non-empty group gets at
    * least one document and the overshoot is bounded by one document).
    *
    * One key-partitioned window (shuffle on the group, per-group sort)
    * — the x63-rolling shape. For a corpus where ONE group's rows
    * exceed a task, pre-slice by a secondary hash or use the
    * hierarchical `Packing.prefixSum` per group; at realistic domain
    * cardinalities the per-group window is the right plan.
    *
    * @return input columns + `cum_tokens` (cumulative including the
    *         row) for the selected rows only
    */
  def tokenBudgetTake(df: DataFrame, groupCol: Column, orderCol: Column,
      nTokens: Column, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    // NULL token counts would vanish at the final filter (NULL
    // comparison) and negative ones corrupt every later row's
    // cumulative — both are caller data errors; fail loudly
    // (round-15 review)
    val nt = when(nTokens.isNull || nTokens.cast("long") < 0L,
      raise_error(lit("tokenBudgetTake: token count must be " +
        "non-null and non-negative")).cast("long"))
      .otherwise(nTokens.cast("long"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(groupCol).orderBy(orderCol)
    df.withColumn("cum_tokens",
        sum(nt).over(
          w.rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)))
      .filter(col("cum_tokens") - nt < budget)
  }
}
