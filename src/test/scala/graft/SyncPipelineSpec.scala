package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.{Materialize, SnapshotStore}
import graft.poller.PollerRunner

/** The reference's core value prop end-to-end: an incrementally polled
  * source table kept in sync with a materialized target — poller pages
  * by (ts,id) cursor, each page merges into the versioned snapshot.
  */
class SyncPipelineSpec extends SparkSpec {
  import spark.implicits._

  // a "database table": (id, updated_at, widget, state); rows updated
  // over time, state='deleted' acts as the tombstone
  private def sourceRows(upTo: Int) = Seq(
    (1L, "2024-01-01 00:01:00", "A", "ok"),
    (2L, "2024-01-01 00:02:00", "B", "ok"),
    (3L, "2024-01-01 00:03:00", "A", "updated"),
    (4L, "2024-01-01 00:10:00", "C", "ok"),
    (5L, "2024-01-01 00:11:00", "B", "deleted"),
    (6L, "2024-01-01 00:12:00", "A", "final"))
    .take(upTo)
    .map { case (id, ts, w, st) => (id, Timestamp.valueOf(ts), w, st) }
    .toDF("id", "updated_at", "widget", "state")

  test("poll → merge keeps the snapshot in sync across cycles") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sync")
    val snap = new SnapshotStore(spark, dir.resolve("table").toString,
      keyCols = Seq("widget"))
    def sync(upTo: Int, now: String): Unit = {
      val runner = new PollerRunner(() => sourceRows(upTo), "updated_at",
        "id", dir.resolve("cursor").toString, batchSize = 2,
        delayMillis = 0L)
      runner.processUpdates(Timestamp.valueOf(now)) { page =>
        snap.commit(page, col("id"), col("state") === "deleted")
        ()
      }
    }
    // cycle 1: first three rows exist
    sync(3, "2024-01-01 00:05:00")
    val afterC1 = snap.read().get.select("widget", "state")
      .as[(String, String)].collect().toMap
    assert(afterC1 === Map("A" -> "updated", "B" -> "ok"))
    // cycle 2: three more rows appeared (B deleted, A finalized)
    sync(6, "2024-01-01 00:20:00")
    val afterC2 = snap.read().get.select("widget", "state")
      .as[(String, String)].collect().toMap
    assert(afterC2 === Map("A" -> "final", "C" -> "ok"))
    // equivalently: one-shot replay of the whole source
    val replay = Materialize.applyEvents(sourceRows(6), Seq("widget"),
      col("id"), col("state") === "deleted")
      .select("widget", "state").as[(String, String)].collect().toMap
    assert(afterC2 === replay)
    // snapshot versions accumulated one per committed page
    assert(snap.currentVersion.exists(_ >= 2))
  }
}
