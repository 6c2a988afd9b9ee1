package graft.poller

import java.nio.file.{Files, Path, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Poller

/** The poller control loop (S6): page through new rows in (ts,id)
  * order, hand each page to a produce function, persist the cursor —
  * the engine's `rake deimos:db_poller` equivalent
  * (reference: `utils/db_poller/base.rb:57-175`, `time_based.rb:21-83`).
  *
  * The cursor store is a tiny driver-side file (the reference's
  * `deimos_poll_info` row); the scans themselves are executor-side with
  * the predicate pushed to the source. `delay_time` lag allowance and
  * retry policy mirror the reference defaults.
  */
class PollerRunner(
    source: () => DataFrame,
    tsCol: String,
    idCol: String,
    cursorPath: String,
    batchSize: Int = 1000,
    delayMillis: Long = 2000L,
    retries: Int = 1) {

  private val path: Path = Paths.get(cursorPath)

  def loadCursor(): Poller.Cursor = {
    if (Files.exists(path)) {
      val Array(ts, id) = Files.readString(path).trim.split('|')
      Poller.Cursor(java.sql.Timestamp.valueOf(ts), id.toLong)
    } else Poller.Cursor(new java.sql.Timestamp(0L), 0L)
  }

  def saveCursor(c: Poller.Cursor): Unit =
    Files.writeString(path, s"${c.lastTs}|${c.lastId}")

  /** One `process_updates` sweep: page until short page or `to` is
    * reached. Returns pages processed. Produce failures retry
    * `retries` times then skip the batch, cursor still advanced —
    * at-least-once, same as the reference's skip-after-retries
    * (`db_poller/base.rb:149-160`). */
  def processUpdates(now: java.sql.Timestamp)(
      produce: DataFrame => Unit): Int = {
    var cursor = loadCursor()
    val to = new java.sql.Timestamp(now.getTime - delayMillis)
    var pages = 0
    var done = false
    while (!done) {
      val page = Poller.timeBasedScan(source(), col(tsCol), col(idCol),
        lit(cursor.lastTs), lit(cursor.lastId), lit(to), batchSize)
        .cache()
      try {
        val n = page.count()
        if (n == 0) done = true
        else {
          var attempt = 0
          var ok = false
          while (!ok && attempt <= retries) {
            try { produce(page); ok = true }
            catch { case _: Exception if attempt < retries => attempt += 1 }
          }
          pages += 1
          Poller.advanceCursor(page, tsCol, idCol).foreach { c =>
            cursor = c
            saveCursor(c)
          }
          if (n < batchSize) done = true
        }
      } finally page.unpersist()
    }
    pages
  }
}

/** State-based poller sweep (S7): publish rows in the publishable
  * state, then flip state columns (reference: `state_based.rb:28-58`).
  * Returns the post-publish frame for the caller to write back. */
object StatePoller {
  def sweep(source: DataFrame, stateCol: String, idCol: String,
      publishable: String, published: String, failed: String,
      tsCol: String, batchSize: Int = 1000)(
      produce: DataFrame => DataFrame): DataFrame = {
    // pin the scan: filter+limit with no ordering is nondeterministic
    // across evaluations, and produce + finalize MUST see the same rows
    val batch = Poller.stateBasedScan(source, col(stateCol), publishable,
      batchSize).cache()
    try {
      batch.count() // materialize before handing out
      val publishedIds = produce(batch)
      // localCheckpoint cuts the lineage so the returned frame no
      // longer depends on the cached scan after unpersist
      Poller.finalizeBatch(batch, idCol, publishedIds, stateCol,
        published, failed, tsCol).localCheckpoint(true)
    } finally batch.unpersist(blocking = false)
  }
}
