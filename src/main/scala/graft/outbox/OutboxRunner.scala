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

  def staged: DataFrame = spark.read.parquet(stagingDir)

  /** Stage encoded messages (S3 — the outbox *backend*). */
  def stage(messages: DataFrame): Unit = {
    metrics.count(Metrics.OutboxProduce, messages.count())
    messages.write.mode("append").parquet(stagingDir)
  }

  /** One sweep over all topics: drain ≤batchSize per topic in id
    * order, produce, remove drained rows. Topics in error cooldown are
    * skipped this sweep. Returns drained count. */
  def sweep(compactTopics: Set[String] = Set.empty)(
      produce: DataFrame => Unit): Long = {
    val now = clock()
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
      val n = drained.count()
      if (n > 0) {
        try produce(drained)
        catch {
          case e: Exception =>
            // reference: crashed topic is locked out for 60 s
            eligibleTopics.foreach(t =>
              cooldownUntil(t) = now + errorCooldownMillis)
            throw e
        }
        val remaining = Outbox.deleteDrained(all, drained, "id")
        val tmp = stagingDir + ".tmp"
        remaining.write.mode("overwrite").parquet(tmp)
        spark.read.parquet(tmp).write.mode("overwrite").parquet(stagingDir)
      }
      metricsReport()
      n
    } finally drained.unpersist()
  }

  /** Pending metrics (A6) — pending_db_messages_count / max_wait. */
  def metricsReport(): Unit = {
    val rows = Outbox.pendingMetrics(staged, MessageCols.Topic, "created_at")
      .collect()
    rows.foreach { r =>
      metrics.count(Metrics.PendingCount, r.getAs[Long]("pending_count"),
        Map("topic" -> r.getAs[String](MessageCols.Topic)))
    }
  }
}
