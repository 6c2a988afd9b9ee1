package graft.streaming

import java.nio.file.{Files, Path, Paths}

/** Exactly-once-over-at-least-once: foreachBatch can replay a batchId
  * after a failure; sinks that aren't key-idempotent (plain inserts,
  * external POSTs) wrap their work in a batch-commit log so replays
  * no-op. The log is one marker per committed batchId, written AFTER
  * the sink work — the standard transactional-sink pattern when the
  * target can't participate in a transaction with the checkpoint.
  */
class IdempotentSink(commitDir: String) extends Serializable {
  private def marker(batchId: Long): Path =
    Paths.get(commitDir, s"batch-$batchId")

  def alreadyCommitted(batchId: Long): Boolean = Files.exists(marker(batchId))

  /** Run `work` once per batchId; replays are skipped. Returns true if
    * the work ran. */
  def runOnce(batchId: Long)(work: => Unit): Boolean = {
    if (alreadyCommitted(batchId)) false
    else {
      Files.createDirectories(Paths.get(commitDir))
      work
      Files.writeString(marker(batchId), "")
      true
    }
  }
}
