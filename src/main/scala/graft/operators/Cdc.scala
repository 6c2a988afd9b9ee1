package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Change-data-capture without ORM callbacks (S9/S10): the engine
  * derives "what changed" by comparing snapshots / consecutive
  * versions, honoring a watched-attribute list (reference:
  * `lib/deimos/kafka_source.rb:10-60` — update events fire only when
  * watched attrs changed).
  */
object Cdc {

  /** Rows of `current` that are new or changed w.r.t. `previous`,
    * comparing only `watched` columns (empty ⇒ all non-key columns).
    * One shuffle on the key (full outer not needed — left join).
    * Deletes are `previous` keys absent from `current` (tombstones).
    * Returns (changedOrNew, deletedKeys).
    */
  def changedSince(current: DataFrame, previous: DataFrame,
      keyCols: Seq[String], watched: Seq[String] = Seq.empty)
      : (DataFrame, DataFrame) = {
    val cmpCols =
      (if (watched.nonEmpty) watched
      else current.columns.toSeq.filterNot(keyCols.contains))
        .filter(c => previous.columns.contains(c) &&
          current.columns.contains(c))
    val prev = previous.select(
      (keyCols.map(col) ++ cmpCols.map(c => col(c).as(s"__prev_$c"))
        :+ lit(true).as("__prev_present")): _*)
    val joined = current.join(prev, keyCols, "left")
    val isNew = col("__prev_present").isNull
    // empty comparable set (schema drift) degrades to new-rows-only
    val changed = cmpCols.map(c => !(col(c) <=> col(s"__prev_$c")))
      .foldLeft(lit(false))(_ || _)
    val changedOrNew = joined.filter(changed || isNew)
      .select(current.columns.toIndexedSeq.map(col): _*)
    val deleted = previous.select(keyCols.map(col): _*)
      .join(current.select(keyCols.map(col): _*), keyCols, "left_anti")
    (changedOrNew, deleted)
  }

  /** One-frame snapshot diff (SCD-style CDC over two table versions):
    * classifies every key as 'added' / 'deleted' / 'changed', dropping
    * unchanged keys. Comparison is over `watched` columns (empty ⇒ all
    * shared non-key columns), null-safe. One full-outer shuffle join on
    * the key — the minimal plan for a two-sided diff; both sides'
    * non-compared columns are pruned before the shuffle.
    */
  def snapshotDiff(previous: DataFrame, current: DataFrame,
      keyCols: Seq[String], watched: Seq[String] = Seq.empty): DataFrame = {
    val cmpCols =
      (if (watched.nonEmpty) watched
      else current.columns.toSeq.filterNot(keyCols.contains))
        .filter(c => previous.columns.contains(c) &&
          current.columns.contains(c))
    val prev = previous.select(
      (keyCols.map(col) ++ cmpCols.map(c => col(c).as(s"__prev_$c"))
        :+ lit(true).as("__prev_present")): _*)
    val curr = current.select(
      (keyCols.map(col) ++ cmpCols.map(col)
        :+ lit(true).as("__curr_present")): _*)
    val joined = curr.join(prev, keyCols, "full_outer")
    val changed = cmpCols.map(c => !(col(c) <=> col(s"__prev_$c")))
      .foldLeft(lit(false))(_ || _)
    val status = when(col("__prev_present").isNull, lit("added"))
      .when(col("__curr_present").isNull, lit("deleted"))
      .when(changed, lit("changed"))
    joined.filter(status.isNotNull)
      .select((keyCols.map(col) :+ status.as("status")): _*)
  }

  /** SCD2 history build: collapse an ordered change stream into
    * effective-dated state intervals — one row per (key, state run)
    * with `eff_from`/`eff_to` (null eff_to = current) and a 1-based
    * `version`. Consecutive events with the same state collapse into
    * one interval (only CHANGES open a new version), the classic
    * slowly-changing-dimension type-2 materialization.
    *
    * Plan: both windows partition on the key, so the whole build is
    * ONE key-shuffle; the second window runs on the already-collapsed
    * (much smaller) change rows. `tieBreak` makes ordering total when
    * timestamps collide — same discipline as the sessionization op.
    */
  def scd2History(events: DataFrame, keyCol: String, stateCol: String,
      tsCol: String, tieBreak: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieBreak))
    // row_number (not lag-is-null) marks the first event: a lag of
    // NULL is ambiguous when the state column itself can be null
    val changes = events
      .withColumn("__rn", row_number().over(w))
      .withColumn("__prev_state", lag(col(stateCol), 1).over(w))
      .filter(col("__rn") === 1 ||
        !(col(stateCol) <=> col("__prev_state")))
    changes
      .withColumn("version", row_number().over(w).cast("long"))
      .withColumn("eff_from", col(tsCol))
      .withColumn("eff_to", lead(col(tsCol), 1).over(w))
      .select(col(keyCol), col("version"), col(stateCol),
        col("eff_from"), col("eff_to"))
  }
}
