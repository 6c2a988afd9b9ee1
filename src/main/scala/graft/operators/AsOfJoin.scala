package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the payload of the
  * latest right row with rightTs ≤ leftTs (backward) or the earliest
  * with rightTs ≥ leftTs (forward) within the same key, optionally
  * only within a `tolerance` of the left timestamp — the
  * feature-lookup / backfill join every training pipeline needs and
  * Spark has no primitive for (the pandas `merge_asof` surface:
  * direction + tolerance).
  *
  * Implementation is the scalable union trick, not a range join: tag
  * both inputs, union, sort by (key, ts, side) — ascending for
  * backward, descending for forward — and carry the nearest preceding
  * right payload with `last(ignoreNulls)` over the RUNNING frame
  * (unboundedPreceding..currentRow, a single O(n) pass in both
  * directions), keep left rows. One shuffle on the key,
  * within-partition sort, no range explosion — the plan a 100 TB
  * backfill wants. (Preference (a) of SURVEY §7.3: composition beats a
  * custom SparkPlan here.) Tolerance is enforced AFTER the carry by
  * nulling the payload when the matched timestamp is too far: the
  * carry itself stays a single window pass.
  *
  * The right payload is carried as ONE struct (with the matched
  * timestamp alongside) so all columns come from the same matched row
  * even when some of its fields are null.
  */
object AsOfJoin {

  /** Backward as-of: latest right row with rightTs ≤ leftTs.
    * @param rightCols right payload columns, already aliased as they
    *                  should appear in the output
    * @param rightTieBreak extra ordering among right rows at equal
    *                  (key, ts) — the last one wins
    * @param tolerance max allowed `leftTs - matchedTs` (same units as
    *                  the ts expressions); None = unbounded
    */
  def lastPrior(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: Column, rightTs: Column, rightCols: Seq[Column],
      rightTieBreak: Seq[Column] = Seq.empty,
      tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, keyCols, leftTs, rightTs, rightCols,
      rightTieBreak, tolerance, forward = false)

  /** Forward as-of: earliest right row with rightTs ≥ leftTs; ties at
    * equal (key, ts) break by `rightTieBreak` ascending, first wins.
    * @param tolerance max allowed `matchedTs - leftTs`; None = unbounded
    */
  def firstAfter(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: Column, rightTs: Column, rightCols: Seq[Column],
      rightTieBreak: Seq[Column] = Seq.empty,
      tolerance: Option[Column] = None): DataFrame =
    asOf(left, right, keyCols, leftTs, rightTs, rightCols,
      rightTieBreak, tolerance, forward = true)

  /** NEAREST as-of: for each left row, the right row minimizing
    * |rightTs − leftTs| within the key (pandas merge_asof
    * `direction='nearest'`) — sensor alignment, closest-reading
    * lookup. Composes the two running-frame carries ([[lastPrior]] +
    * [[firstAfter]] — still two single-pass windows over one key
    * shuffle each, never a range join) and picks the closer side per
    * row; equal distances prefer the BACKWARD match (the
    * earlier-information rule). Side-internal ties keep the sibling
    * semantics: backward takes the largest `rightTieBreak`, forward
    * the smallest.
    *
    * @param rightCols (column, output name) pairs — explicit names
    *        because BOTH directional carries materialize each column
    *        before the pick; the matched timestamp is emitted as
    *        `nearestTsCol`
    * @param tolerance max |rightTs − leftTs|; a left row with no
    *        right row inside it keeps nulls
    */
  def nearest(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: Column, rightTs: Column, rightCols: Seq[(Column, String)],
      rightTieBreak: Seq[Column] = Seq.empty,
      tolerance: Option[Column] = None,
      nearestTsCol: String = "nearest_ts"): DataFrame = {
    val named = rightCols
    require(!named.exists(_._2 == nearestTsCol),
      s"rightCols may not alias to nearestTsCol ($nearestTsCol)")
    // "ts" would collide with the internal matched-timestamp slot
    // after prefixing ("__b_ts"); "__"-prefixed names with the
    // internal columns themselves
    require(!named.exists(n => n._2 == "ts" || n._2.startsWith("__")),
      s"rightCols output names may not be 'ts' or start with '__': " +
        s"${named.map(_._2).mkString(", ")}")
    def side(prefix: String) =
      named.map { case (c, n) => c.as(prefix + n) } :+
        rightTs.as(prefix + "ts")
    val withB = lastPrior(left, right, keyCols, leftTs, rightTs,
      side("__b_"), rightTieBreak, tolerance = None)
    val withBF = firstAfter(withB, right, keyCols, leftTs, rightTs,
      side("__f_"), rightTieBreak, tolerance = None)
    val bd = leftTs - col("__b_ts")
    val fd = col("__f_ts") - leftTs
    // a null left timestamp is unmatchable in EITHER direction — the
    // descending forward sort would otherwise place null-ts left rows
    // after every right row and hand them the earliest right match
    val bOk = leftTs.isNotNull && col("__b_ts").isNotNull &&
      tolerance.map(t => bd <= t).getOrElse(lit(true))
    val fOk = leftTs.isNotNull && col("__f_ts").isNotNull &&
      tolerance.map(t => fd <= t).getOrElse(lit(true))
    val useB = bOk && (!fOk || bd <= fd)
    val useF = fOk && !useB
    val out = named.map { case (_, n) =>
      when(useB, col("__b_" + n)).when(useF, col("__f_" + n)).as(n)
    } :+ when(useB, col("__b_ts")).when(useF, col("__f_ts"))
      .as(nearestTsCol)
    val keep = left.columns.map(col).toSeq
    withBF.select(keep ++ out: _*)
  }

  /** Point-in-time join against an SCD2 dimension: for each fact row,
    * the dimension row whose half-open validity interval
    * `[validFrom, validTo)` contains the fact timestamp (`validTo`
    * null = still open). The feature-store lookup that makes training
    * features leakage-free: a fact only ever sees dimension state that
    * was current when it happened.
    *
    * Within a key the intervals of an SCD2 history partition the
    * timeline, so the containing interval is exactly the latest row
    * with `validFrom ≤ factTs` — a backward as-of carry, NOT an
    * interval join: one shuffle on the key, no range explosion, and a
    * fact in a coverage gap (after a closed interval, before the next)
    * is nulled by the `validTo` check after the carry. Zero-width
    * intervals (`validFrom == validTo`, produced by same-timestamp
    * state flips) contain nothing and are skipped by the same check
    * because the carry's tie-break takes the LAST row at equal
    * `validFrom` — callers must pass a tie-break that sorts the
    * surviving interval last (an SCD2 `version` column does).
    *
    * @param dimCols dimension payload columns as they should appear in
    *                the output (aliased); `validFrom`/`validTo` are
    *                referenced separately and may also appear here
    * @param dimTieBreak ordering among dimension rows at equal
    *                (key, validFrom); the last one wins — pass the
    *                SCD2 version column
    */
  def pointInTime(facts: DataFrame, dim: DataFrame, keyCols: Seq[String],
      factTs: Column, validFrom: Column, validTo: Column,
      dimCols: Seq[Column], dimTieBreak: Seq[Column]): DataFrame = {
    val carried = asOf(facts, dim, keyCols, factTs, validFrom,
      dimCols :+ validTo.as("__valid_to"), dimTieBreak,
      tolerance = None, forward = false)
    val inInterval = col("__valid_to").isNull || factTs < col("__valid_to")
    val payload = carried.columns.toIndexedSeq
      .filterNot(_ == "__valid_to")
      .filterNot(facts.columns.contains)
    payload.foldLeft(carried) { (d, c) =>
      d.withColumn(c, when(inInterval, col(c)))
    }.drop("__valid_to")
  }

  private def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: Column, rightTs: Column, rightCols: Seq[Column],
      rightTieBreak: Seq[Column], tolerance: Option[Column],
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    // at equal ts the matching right row must fall INSIDE the left
    // row's frame: backward frame ends at the left row (right sorts
    // first), forward frame starts at it (left sorts first)
    val (leftSide, rightSide) = if (forward) (0, 1) else (1, 0)
    // tie-break is carried as ONE struct of all declared columns (any
    // types) — truncating to the first column or casting to a fixed
    // numeric type would silently break the documented ordering
    val tieType = if (rightTieBreak.isEmpty)
      org.apache.spark.sql.types.LongType
    else right.select(struct(rightTieBreak: _*).as("t")).schema("t").dataType
    val payloadType = right.select(rightCols: _*).schema
      .fields.foldLeft(new org.apache.spark.sql.types.StructType)(
        (st, f) => st.add(f))
    val carriedType = new org.apache.spark.sql.types.StructType()
      .add("__mts", right.select(rightTs.as("t")).schema("t").dataType)
      .add("__p", payloadType)
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(leftSide))
      .withColumn("__tie", lit(null).cast(tieType))
      .withColumn("__right", lit(null).cast(carriedType))
    val tie = if (rightTieBreak.isEmpty) lit(0L)
      else struct(rightTieBreak: _*)
    // null-ts RIGHT rows drop at source: their carried struct is
    // NON-null (struct(null, payload)), so a left row with no real
    // match would otherwise "match" one — with a null matched-ts that
    // even the tolerance check can't veto when tolerance is None
    // (round-15 review)
    val r = right
      .withColumn("__ts", rightTs)
      .filter(col("__ts").isNotNull)
      .withColumn("__side", lit(rightSide))
      .withColumn("__tie", tie)
      .withColumn("__right",
        struct(rightTs.as("__mts"), struct(rightCols: _*).as("__p")))
      .select((Seq(col("__ts"), col("__side"), col("__tie"), col("__right")) ++
        keyCols.map(col)): _*)
    val lNorm = l.select((Seq(col("__ts"), col("__side"), col("__tie"),
      col("__right")) ++ keyCols.map(col) ++
      leftCols.filterNot(keyCols.contains).map(col)): _*)
    val rNorm = leftCols.filterNot(keyCols.contains)
      .foldLeft(r)((d, c) => d.withColumn(c,
        lit(null).cast(left.schema(c).dataType)))
      .select(lNorm.columns.toIndexedSeq.map(col): _*)
    // Both directions are the O(n) RUNNING frame (unboundedPreceding ..
    // currentRow): Spark evaluates it as a single forward pass, while
    // the naive forward frame (currentRow .. unboundedFollowing with
    // first(ignoreNulls)) rescans from each row to the partition end —
    // quadratic in rows-per-key. Forward is therefore expressed as the
    // MIRRORED backward carry: sort (ts, side, tie) descending, and
    // "earliest right row at-or-after this left row" becomes "nearest
    // preceding non-null", which last(ignoreNulls) over the running
    // frame answers in one pass. Descending side order keeps the
    // equal-ts right row inside the left row's frame, and descending
    // tie order makes the SMALLEST tie the nearest preceding — the
    // documented first-wins tie-break.
    val base =
      if (forward)
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__ts").desc, col("__side").desc, col("__tie").desc)
      else
        Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col("__ts"), col("__side"), col("__tie"))
    val carried =
      last(col("__right"), ignoreNulls = true)
        .over(base.rowsBetween(Window.unboundedPreceding, 0))
    val gap = tolerance.map { tol =>
      val mts = col("__carried").getField("__mts")
      if (forward) mts - col("__ts") <= tol
      else col("__ts") - mts <= tol
    }.getOrElse(lit(true))
    val rightFields = payloadType.fieldNames.toIndexedSeq
    // `__ts.isNotNull`: a null-ts left row is unmatchable in EITHER
    // direction by definition — without the guard, the DESCENDING
    // forward sort (nulls last) parks null-ts left rows after every
    // right row and last(ignoreNulls) hands them the earliest right
    // match. Previously only the `nearest` wrapper defended this;
    // direct firstAfter callers were exposed (round-15 review).
    lNorm.unionByName(rNorm)
      .withColumn("__carried", carried)
      .filter(col("__side") === leftSide)
      .withColumn("__ok",
        col("__ts").isNotNull && col("__carried").isNotNull && gap)
      .select((leftCols.map(col) ++
        rightFields.map(f => when(col("__ok"),
          col("__carried").getField("__p").getField(f)).as(f))): _*)
  }
}
