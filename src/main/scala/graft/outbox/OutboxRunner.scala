package graft.outbox

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.MessageCols
import graft.observe.Metrics
import graft.operators.Outbox

/** Outbox drain loop (S8): stage → drain per topic in id order →
  * produce → delete drained — the engine's `OutboxProducer`
  * (reference: `utils/outbox_producer.rb:33-134`).
  *
  * The staging store is a parquet directory (stands in for the
  * `kafka_messages` table); per-topic ordering comes from the drain's
  * repartition+sortWithinPartitions, so no lease table is needed —
  * the drain job is the single writer per topic by construction.
  * Per-topic error cooldown (60 s in the reference) is tracked
  * driver-side.
  */
class OutboxRunner(
    spark: SparkSession,
    stagingDir: String,
    metrics: Metrics = Metrics.noop,
    batchSize: Int = 1000,
    errorCooldownMillis: Long = 60000L,
    clock: () => Long = () => System.currentTimeMillis()) {

  private val cooldownUntil = scala.collection.mutable.Map[String, Long]()

  // staging is a versioned directory (immutable version dirs + atomic
  // pointer) so a crash mid-delete leaves the previous staging intact —
  // drained-but-undeleted messages reproduce, which is the same
  // at-least-once contract as the reference's delete-after-produce.
  private val pointer = java.nio.file.Paths.get(stagingDir, "_LATEST")

  private def currentVersion: Option[Long] =
    if (java.nio.file.Files.exists(pointer))
      Some(java.nio.file.Files.readString(pointer).trim.toLong)
    else None

  private def versionDir(v: Long): String = s"$stagingDir/v=$v"

  private def commitVersion(df: DataFrame): Unit = {
    val next = currentVersion.map(_ + 1).getOrElse(0L)
    df.write.mode("overwrite").parquet(versionDir(next))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(stagingDir))
    val tmp = java.nio.file.Paths.get(stagingDir, s"_LATEST.tmp$next")
    java.nio.file.Files.writeString(tmp, next.toString)
    java.nio.file.Files.move(tmp, pointer,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // previous version is dead weight once the pointer moved
    currentVersion.filter(_ > 0).foreach { v =>
      val old = java.nio.file.Paths.get(versionDir(v - 1))
      if (java.nio.file.Files.exists(old))
        java.nio.file.Files.walk(old)
          .sorted(java.util.Comparator.reverseOrder())
          .forEach(p => java.nio.file.Files.delete(p))
    }
  }

  def staged: DataFrame = currentVersion match {
    case Some(v) => spark.read.parquet(versionDir(v))
    case None => spark.emptyDataFrame
  }

  /** Stage encoded messages (S3 — the outbox *backend*). */
  def stage(messages: DataFrame): Unit = {
    metrics.count(Metrics.OutboxProduce, messages.count())
    val next = currentVersion match {
      case Some(_) => staged.unionByName(messages)
      case None => messages
    }
    commitVersion(next)
  }

  /** One sweep over all topics: drain ≤batchSize per topic in id
    * order, produce, remove drained rows. Topics in error cooldown are
    * skipped this sweep. Returns drained count. */
  def sweep(compactTopics: Set[String] = Set.empty)(
      produce: DataFrame => Unit): Long = {
    val now = clock()
    if (currentVersion.isEmpty) return 0L
    val all = staged
    val eligibleTopics = all.select(col(MessageCols.Topic)).distinct()
      .collect().map(_.getString(0))
      .filter(t => cooldownUntil.getOrElse(t, 0L) <= now)
    if (eligibleTopics.isEmpty) return 0L
    val drained = Outbox.drainBatch(
      all.filter(col(MessageCols.Topic).isin(eligibleTopics.toSeq: _*)),
      MessageCols.Topic, "id", MessageCols.Key,
      compactTopics = compactTopics, batchSize = batchSize)
      .cache()
    try {
      // per-topic row counts in ONE job (a count() per topic would be
      // O(topics) Spark jobs per sweep — the scale hazard at
      // thousands of topics)
      val counts = drained.groupBy(col(MessageCols.Topic))
        .agg(count(lit(1)).as("n")).collect()
        .map(r => r.getString(0) -> r.getAs[Long]("n")).toMap
      val nonEmpty = eligibleTopics.filter(counts.getOrElse(_, 0L) > 0)
      var total = 0L
      val okTopics = scala.collection.mutable.ArrayBuffer[String]()
      var firstError: Option[Exception] = None
      // OPTIMISTIC produce: all topics in one call (the sink handles a
      // mixed-topic frame natively) — the happy path is O(1) jobs per
      // sweep regardless of topic count. Only on failure fall back to
      // per-topic produces so the bad topic cools ITSELF down
      // (reference: crashed topic locked out 60 s; healthy topics keep
      // draining). A mid-batch failure may re-produce some messages in
      // the fallback — within the at-least-once contract, same as the
      // reference's delete-after-produce.
      if (nonEmpty.nonEmpty) {
        try {
          produce(drained)
          okTopics ++= nonEmpty
          total = nonEmpty.map(counts).sum
        } catch {
          case _: Exception =>
            nonEmpty.foreach { t =>
              try {
                produce(drained.filter(col(MessageCols.Topic) === t))
                okTopics += t
                total += counts(t)
              } catch {
                case e: Exception =>
                  cooldownUntil(t) = now + errorCooldownMillis
                  if (firstError.isEmpty) firstError = Some(e)
              }
            }
        }
      }
      if (okTopics.nonEmpty)
        commitVersion(Outbox.deleteDrained(all,
          drained.filter(col(MessageCols.Topic).isin(okTopics.toSeq: _*)),
          "id"))
      metricsReport()
      firstError.foreach(throw _)
      total
    } finally drained.unpersist()
  }

  /** Pending metrics (A6) — pending_db_messages_count / max_wait. */
  def metricsReport(): Unit = {
    if (currentVersion.isEmpty) return
    val rows = Outbox.pendingMetrics(staged, MessageCols.Topic, "created_at")
      .collect()
    rows.foreach { r =>
      metrics.count(Metrics.PendingCount, r.getAs[Long]("pending_count"),
        Map("topic" -> r.getAs[String](MessageCols.Topic)))
    }
  }
}
