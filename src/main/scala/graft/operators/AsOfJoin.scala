package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the payload of the
  * latest right row with rightTs ≤ leftTs within the same key — the
  * feature-lookup / backfill join every training pipeline needs and
  * Spark has no primitive for.
  *
  * Implementation is the scalable union trick, not a range join: tag
  * both inputs, union, sort by (key, ts, side), carry the last right
  * payload forward with `last(ignoreNulls)`, keep left rows. One
  * shuffle on the key, within-partition sort, no range explosion —
  * the plan a 100 TB backfill wants. (Preference (a) of SURVEY §7.3:
  * composition beats a custom SparkPlan here.)
  *
  * The right payload is carried as ONE struct so all columns come from
  * the same matched row even when some of its fields are null.
  */
object AsOfJoin {

  /** @param rightCols right payload columns, already aliased as they
    *                  should appear in the output
    * @param rightTieBreak extra ordering among right rows at equal
    *                  (key, ts) — the last one wins
    */
  def lastPrior(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: Column, rightTs: Column, rightCols: Seq[Column],
      rightTieBreak: Seq[Column] = Seq.empty): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    // tie-break is carried as ONE struct of all declared columns (any
    // types) — truncating to the first column or casting to a fixed
    // numeric type would silently break the documented ordering
    val tieType = if (rightTieBreak.isEmpty)
      org.apache.spark.sql.types.LongType
    else right.select(struct(rightTieBreak: _*).as("t")).schema("t").dataType
    val l = left
      .withColumn("__ts", leftTs)
      .withColumn("__side", lit(1))
      .withColumn("__tie", lit(null).cast(tieType))
      .withColumn("__right",
        lit(null).cast(right.select(rightCols: _*).schema
          .fields.foldLeft(new org.apache.spark.sql.types.StructType)(
            (st, f) => st.add(f))))
    val tie = if (rightTieBreak.isEmpty) lit(0L)
      else struct(rightTieBreak: _*)
    val r = right
      .withColumn("__ts", rightTs)
      .withColumn("__side", lit(0))
      .withColumn("__tie", tie)
      .withColumn("__right", struct(rightCols: _*))
      .select((Seq(col("__ts"), col("__side"), col("__tie"), col("__right")) ++
        keyCols.map(col)): _*)
    val lNorm = l.select((Seq(col("__ts"), col("__side"), col("__tie"),
      col("__right")) ++ keyCols.map(col) ++
      leftCols.filterNot(keyCols.contains).map(col)): _*)
    val rNorm = leftCols.filterNot(keyCols.contains)
      .foldLeft(r)((d, c) => d.withColumn(c,
        lit(null).cast(left.schema(c).dataType)))
      .select(lNorm.columns.toIndexedSeq.map(col): _*)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__ts"), col("__side"), col("__tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val rightFields = right.select(rightCols: _*).schema.fieldNames.toIndexedSeq
    lNorm.unionByName(rNorm)
      .withColumn("__carried", last(col("__right"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((leftCols.map(col) ++
        rightFields.map(f => col("__carried").getField(f).as(f))): _*)
  }
}
