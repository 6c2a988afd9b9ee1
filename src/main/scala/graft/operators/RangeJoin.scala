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
}
