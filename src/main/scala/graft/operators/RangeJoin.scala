package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window (range) join without a nested loop: probe side explodes
  * to the fixed set of time bins its window overlaps, the join is an
  * equi-join on the bin, and the exact range predicate filters inside
  * the bin. Work scales with (rows × bins-per-window × bin occupancy)
  * instead of |left| × |right| — the standard windowed-join shape for
  * event correlation at scale.
  */
object RangeJoin {

  /** For each probe row, the build rows whose `buildTs` lies within
    * [probeTs - before, probeTs + after] (same units as the ts
    * columns). Bin width is `before + after` so every window overlaps
    * at most 2 bins.
    *
    * @return probe rows joined to matching build rows (inner).
    */
  def timeWindow(probe: DataFrame, build: DataFrame, probeTs: Column,
      buildTs: Column, before: Long, after: Long): DataFrame = {
    require(before >= 0 && after >= 0 && before + after > 0)
    val width = before + after
    // integral FLOOR division: plain `div` truncates toward zero, so
    // pre-epoch (negative) timestamps would mis-bin at bin boundaries;
    // subtracting pmod first makes the dividend an exact multiple.
    // Stays integral throughout — nanosecond epochs exceed 2^53 and
    // would mis-bin under double rounding.
    def bin(ts: Column): Column =
      call_function("div", ts - pmod(ts, lit(width)), lit(width))
    val lo = probeTs - before
    val hi = probeTs + after
    val probeBins = array_distinct(array(bin(lo), bin(hi)))
    val p = probe.withColumn("__bin", explode(probeBins))
      .withColumn("__pts", probeTs)
    val b = build.withColumn("__bin", bin(buildTs))
      .withColumn("__bts", buildTs)
    p.join(b, Seq("__bin"))
      .filter(col("__bts") >= col("__pts") - before &&
        col("__bts") <= col("__pts") + after)
      .drop("__bin", "__pts", "__bts")
  }

  /** INTERVAL-overlap join: pairs ([aLo,aHi], [bLo,bHi]) with
    * `aLo <= bHi && bLo <= aHi` (closed ends) — sessions × sessions,
    * spans × annotations, the two-sided sibling of [[timeWindow]]'s
    * point-in-window. Same no-nested-loop discipline: both sides
    * explode to the fixed-width bins they cover, the join is an
    * equi-join on the bin, the exact predicate filters inside it —
    * work scales with bin occupancy, never |a| × |b|.
    *
    * A pair overlapping several shared bins would duplicate; each
    * surviving pair is attributed to exactly ONE bin — the bin
    * containing the overlap's START (`greatest(aLo, bLo)`, always a
    * bin both sides cover) — so downstream aggregates count pairs
    * exactly once with no distinct pass.
    *
    * Loud failure over silent wrong answers (assert_true runs inside
    * the row filter, so pruning can't drop it): inverted intervals
    * (lo > hi) and intervals covering more than `maxBinsPerInterval`
    * bins (a runaway explode at scale — raise the cap or the width
    * deliberately) fail the job.
    *
    * @param binWidth bin width in the interval columns' units; pick
    *                 it near the typical interval length so most
    *                 intervals cover 1-2 bins
    * @return a rows joined to overlapping b rows; the two frames must
    *         not share column names
    */
  def intervalOverlap(a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      binWidth: Long, maxBinsPerInterval: Long = 4096L): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    require(maxBinsPerInterval >= 1, s"bad cap $maxBinsPerInterval")
    val shared = a.columns.toSet.intersect(b.columns.toSet)
    require(shared.isEmpty, s"a and b share column names: $shared")
    def bin(c: Column): Column =
      call_function("div", c - pmod(c, lit(binWidth)), lit(binWidth))
    def binned(df: DataFrame, lo: String, hi: String): DataFrame = {
      val ok = assert_true(
        col(lo) <= col(hi) &&
          bin(col(hi)) - bin(col(lo)) < lit(maxBinsPerInterval),
        concat(lit(s"intervalOverlap: inverted interval or > " +
          s"$maxBinsPerInterval bins at width $binWidth: ["),
          col(lo), lit(", "), col(hi), lit("]")))
      df.filter(ok.isNull) // assert_true: null when ok, throws when not
        .withColumn("__bin",
          explode(sequence(bin(col(lo)), bin(col(hi)))))
    }
    binned(a, aLo, aHi).join(binned(b, bLo, bHi), Seq("__bin"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(bin(greatest(col(aLo), col(bLo))) === col("__bin"))
      .drop("__bin")
  }
}
