package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental source scans — the engine's version of the reference's DB
  * poller (`lib/deimos/utils/db_poller/time_based.rb:56-66`,
  * `state_based.rb:36-58`, predicate from
  * `lib/deimos/active_record_producer.rb:104-117`).
  *
  * The cursor predicate, ordering, and limit are all plain Catalyst
  * expressions, so against a JDBC (or parquet) source they push down to
  * the scan — the 100 TB property we need: each poll reads only the new
  * slice, never the full table.
  */
object Poller {

  /** Poll cursor: (last timestamp, last id at that timestamp) — the
    * reference's `deimos_poll_info` row (`lib/deimos/poll_info.rb:5-9`). */
  final case class Cursor(lastTs: java.sql.Timestamp, lastId: Long)

  /** S6 — time-based incremental scan.
    * Predicate (reference `active_record_producer.rb:104-117`):
    * `((ts = from AND id > minId) OR ts > from) AND ts <= to`,
    * ordered by (ts, id), limited to the batch size
    * (`time_based.rb:64-65`, BATCH_SIZE=1000 `db_poller/base.rb:17`).
    */
  def timeBasedScan(df: DataFrame, tsCol: Column, idCol: Column,
      from: Column, minId: Column, to: Column,
      batchSize: Int = 1000): DataFrame =
    df.filter(((tsCol === from && idCol > minId) || tsCol > from) && tsCol <= to)
      .orderBy(tsCol, idCol)
      .limit(batchSize)

  /** Advance the cursor to the max (ts, id) of a fetched batch
    * (reference: `time_based.rb:76-83`). Driver-side, O(1) rows. */
  def advanceCursor(batch: DataFrame, tsCol: String, idCol: String): Option[Cursor] = {
    val r = batch.agg(max(struct(col(tsCol), col(idCol))).as("m"))
      .select(col("m").getField(tsCol), col("m").getField(idCol)).collect()(0)
    if (r.isNullAt(0)) None
    else Some(Cursor(r.getTimestamp(0), r.getLong(1)))
  }

  /** S7 — state-based scan: rows in a publishable state
    * (reference: `state_based.rb:36-41`). */
  def stateBasedScan(df: DataFrame, stateCol: Column, publishableState: String,
      batchSize: Int = 1000): DataFrame =
    df.filter(stateCol === publishableState).limit(batchSize)

  /** S7 — post-publish state flip, expressed as the new frame state
    * (reference `finalize_batch`, `state_based.rb:43-58`: success →
    * published_state + timestamp, failure → failed_state). Against a JDBC
    * target this becomes an UPDATE statement; see JdbcMerger.
    */
  def finalizeBatch(df: DataFrame, idCol: String, publishedIds: DataFrame,
      stateCol: String, publishedState: String, failedState: String,
      tsCol: String): DataFrame = {
    val flagged = df.join(
      publishedIds.select(col(idCol)).withColumn("__ok", lit(true)),
      Seq(idCol), "left")
    flagged
      .withColumn(stateCol,
        when(col("__ok"), lit(publishedState)).otherwise(lit(failedState)))
      .withColumn(tsCol,
        when(col("__ok"), current_timestamp()).otherwise(col(tsCol)))
      .drop("__ok")
  }
}
