package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Outbox staging + drain — the engine's version of the reference's
  * transactional-outbox backend (`lib/deimos/backends/outbox.rb:12-31`,
  * drain loop `lib/deimos/utils/outbox_producer.rb:91-226`).
  *
  * The reference serializes per topic with a DB lease table; in Spark the
  * same ordering guarantee comes from partitioning the drain by topic and
  * sorting within the partition — no lease needed, one shuffle.
  */
object Outbox {

  /** A6 — pending metrics: COUNT(*), MIN(created_at) per topic
    * (reference: `outbox_producer.rb:165-198`). */
  def pendingMetrics(staged: DataFrame, topicCol: String = "topic",
      createdCol: String = "created_at"): DataFrame =
    staged.groupBy(col(topicCol))
      .agg(count(lit(1)).as("pending_count"),
        min(col(createdCol)).as("min_created_at"))

  /** A7 — distinct topics with staged messages
    * (reference: `outbox_producer.rb:65-67`). */
  def distinctTopics(staged: DataFrame, topicCol: String = "topic"): DataFrame =
    staged.select(col(topicCol)).distinct()

  /** S8/O2/A2 — one drain batch: per topic, the oldest `batchSize`
    * messages in insertion-id order, optionally last-wins-compacted first
    * (reference: `process_topic_batch` `outbox_producer.rb:91-123`,
    * ordering `:148-150`, compaction `:218-226`).
    *
    * Returned frame is partitioned by topic and sorted by id within each
    * partition, so a Kafka sink writes each topic's messages in order.
    */
  def drainBatch(staged: DataFrame, topicCol: String, idCol: String,
      keyCol: String, compactTopics: Set[String] = Set.empty,
      compactAll: Boolean = false, batchSize: Int = 1000): DataFrame = {
    val w = Window.partitionBy(col(topicCol)).orderBy(col(idCol))
    val limited = staged
      .withColumn("__graft_rn", row_number().over(w))
      .filter(col("__graft_rn") <= batchSize)
      .drop("__graft_rn")
    // blank-key guard (reference outbox_producer.rb:218-219): unkeyed
    // rows are never compacted — lastWinsKeyed unions them through
    val compacted =
      if (compactAll)
        Compaction.lastWinsKeyed(limited, Seq(topicCol, keyCol), col(idCol))
      else if (compactTopics.nonEmpty) {
        val (toCompact, asIs) =
          (limited.filter(col(topicCol).isin(compactTopics.toSeq: _*)),
            limited.filter(!col(topicCol).isin(compactTopics.toSeq: _*)))
        Compaction.lastWinsKeyed(toCompact, Seq(topicCol, keyCol), col(idCol))
          .unionByName(asIs)
      } else limited
    compacted
      .repartition(col(topicCol))
      .sortWithinPartitions(col(topicCol), col(idCol))
  }

  /** Remove drained ids from the staging set (the engine-side analog of
    * the reference's chunked DELETE, `outbox_producer.rb:127-134`). */
  def deleteDrained(staged: DataFrame, drained: DataFrame, idCol: String): DataFrame =
    staged.join(drained.select(col(idCol)), Seq(idCol), "left_anti")
}
