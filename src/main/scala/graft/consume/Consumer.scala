package graft.consume

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.{MessageCols, TopicConfig}
import graft.operators.Materialize
import graft.schema.SchemaBackend
import graft.streaming.Streams

/** The engine's public consumer extension API — the U4 hook set of the
  * reference (`active_record_consumer.rb:96-117`,
  * `batch_consumption.rb:103-113,203-208`,
  * `message_consumption.rb:19-31,78-84`), re-typed for DataFrames:
  * per-row hooks are `Column` predicates (stay in codegen), shaping
  * hooks are `DataFrame => DataFrame` transforms, lifecycle hooks are
  * driver-side callbacks.
  */
trait ConsumerHooks extends Serializable {
  /** P3: `process_message?` — rows filtered out but offsets committed. */
  def processMessage: Column = lit(true)
  /** P4: `should_consume?` — record-level validity; failures counted. */
  def shouldConsume: Column = lit(true)
  /** U2: `record_attributes` — payload → target-row shaping. */
  def recordAttributes(payload: DataFrame): DataFrame = payload
  /** tombstone/delete predicate (`delete_record?`). */
  def isTombstone: Column
  /** S9: `watched_attributes` — only changes on these trigger CDC. */
  def watchedAttributes: Seq[String] = Seq.empty
  /** lifecycle: `pre_process` / `post_process_batch`. */
  def preProcess(batch: DataFrame): Unit = ()
  def postProcessBatch(valid: DataFrame, invalid: DataFrame): Unit = ()
  /** T6: errors are swallowed (batch skipped) unless fatal — the
    * reference's `fatal_error?` / `reraise_errors` policy
    * (`consumer.rb:42-54`). Default: everything is fatal (safer than
    * the reference's swallow-by-default; opt in to skipping). */
  def fatalError(e: Throwable): Boolean = true
  def onError(e: Throwable, batchId: Long): Unit = ()
}

/** Batch consumer pipeline: decode → hooks → compact → merge, the full
  * §3.2 consume lifecycle as one object. The sink receives compacted
  * (upserts, deletes) per micro-batch.
  */
class BatchConsumer(
    val cfg: TopicConfig,
    val backend: SchemaBackend,
    val hooks: ConsumerHooks,
    val keyCols: Seq[String],
    val orderCol: String,
    val metrics: graft.observe.Metrics = graft.observe.Metrics.noop,
    val tracer: graft.observe.Tracing = graft.observe.Tracing.noop,
    /** Opt-in dead-letter queue: when set, value decode is lenient
      * (per-record — `SchemaBackend.decodeLenientExpr`) and frames
      * whose non-null value failed to decode are handed here, raw
      * bytes intact, before the batch proceeds without them. Unset
      * (default), any corrupt frame fails the batch — T6's
      * maximally-safe default at record grain.
      *
      * Delivery contract: AT-LEAST-ONCE, same as the main path (T1) —
      * in streaming mode the handler runs inside `foreachBatch`
      * before the checkpoint commit, so a crash after delivery
      * replays the batch and re-delivers the same rows (pinned by
      * ConsumerSpec's crash-replay test). Point it at an idempotent
      * target (PK on (topic, offset), keyed upsert) exactly like the
      * merge sink.
      *
      * Operational note: the lenient decode routes ANY NonFatal
      * decode failure here, including transient non-data faults (a
      * registry outage mid-decode looks like poison). ALERT on the
      * `Metrics.DeadLetters` counter rate — a corpus emits poison at
      * a trickle; a step change means infrastructure, not data, and
      * the quarantined raw bytes are replayable once it heals. */
    val deadLetterSink: Option[DataFrame => Unit] = None,
    /** Key codec for `decoded_key` (strict by default). Without one,
      * keys pass through as a string cast (never fails). */
    val keyBackend: Option[SchemaBackend] = None,
    /** Round-11 opt-in THIRD error mode: also quarantine rows whose
      * KEY fails lenient decode (raw key+value bytes to the DLQ).
      * Default false — a corrupt key still kills the job even when a
      * `deadLetterSink` handles corrupt values, because a lost key is
      * not separable from data loss (it breaks compaction grouping
      * and merge identity); quarantining keys is a deliberate,
      * per-topic decision. Requires `deadLetterSink` and a
      * `keyBackend`. The three modes, ConsumerSpec-pinned:
      *  1. strict (default): any corrupt frame fails the batch;
      *  2. value-DLQ: corrupt values quarantine, corrupt keys kill;
      *  3. key+value-DLQ: both quarantine, raw bytes intact. */
    val quarantineKeys: Boolean = false) {

  require(!quarantineKeys || (deadLetterSink.isDefined && keyBackend.isDefined),
    "quarantineKeys needs both a deadLetterSink (quarantine target) and " +
      "a keyBackend (a string-cast key cannot fail decode)")

  /** Batch-mode consume of a Kafka-shaped frame; returns final
    * (upserts, deletes) after hooks + compaction. Wrapped in a tracer
    * span named like the reference's (`consumer.rb:28-31`: span
    * 'deimos-consumer', resource = consumer class) with errors
    * recorded on the span before the T6 policy sees them. */
  def consumeBatch(kafka: DataFrame): (DataFrame, DataFrame) =
    tracer.withSpan("graft-consumer", cfg.fullTopic) {
      consumeBatchInner(kafka)
    }

  /** Decode with the configured error mode (see [[quarantineKeys]]). */
  private def decodeFrame(kafka: DataFrame): DataFrame =
    Streams.fromKafkaFrame(kafka, backend, keyBackend,
      lenient = deadLetterSink.isDefined, lenientKeys = quarantineKeys)

  /** A row is poison when its non-null value failed decode — and, in
    * the key-quarantine mode, when its non-null key did. */
  private def poisonPredicate: org.apache.spark.sql.Column = {
    val v = graft.operators.Pipeline.undecodable(
      col(MessageCols.Value), col("payload"))
    if (quarantineKeys)
      v || graft.operators.Pipeline.undecodable(
        col(MessageCols.Key), col("decoded_key"))
    else v
  }

  private def consumeBatchInner(kafka: DataFrame): (DataFrame, DataFrame) = {
    metrics.count(graft.observe.Metrics.ConsumeBatch, 1L)
    val decodedAll = decodeFrame(kafka)
    val poison = poisonPredicate
    val decoded = deadLetterSink match {
      case Some(dlq) =>
        // persist the (small) poison side so count + sink read it
        // once; the surviving side decodes in the normal pipeline
        val dead = decodedAll.filter(poison)
          .drop("payload", "decoded_key").persist()
        try {
          val n = dead.count()
          if (metrics ne graft.observe.Metrics.noop)
            metrics.count(graft.observe.Metrics.DeadLetters, n)
          if (n > 0) dlq(dead) // sink consumes eagerly (contract)
        } finally dead.unpersist(false)
        decodedAll.filter(!poison)
      case None => decodedAll
    }
    hooks.preProcess(decoded)
    val processed = decoded.filter(hooks.processMessage)
    val (valid, invalid) =
      graft.operators.Pipeline.partitionValid(processed, hooks.shouldConsume)
    // counting forces extra pipeline evaluations — only pay for it
    // when a real metrics provider is attached
    if (metrics ne graft.observe.Metrics.noop) {
      metrics.count(graft.observe.Metrics.ValidRecords, valid.count())
      metrics.count(graft.observe.Metrics.InvalidRecords, invalid.count())
    }
    hooks.postProcessBatch(valid, invalid)
    val shaped = hooks.recordAttributes(valid)
    val compacted = if (cfg.compacted)
      graft.operators.Compaction.lastWins(shaped, keyCols, col(orderCol))
    else shaped
    Materialize.splitTombstones(compacted, hooks.isTombstone)
  }

  /** Streaming-mode consume via foreachBatch, with the T6 error
    * policy: non-fatal sink errors skip the batch (offsets advance,
    * at-least-once preserved by the next batch's key-idempotent
    * merge); fatal errors fail the query. An error is fatal when
    * EITHER the hook (`fatalError`, code-level) or the topic's
    * declarative `errorPolicy` (config-level) keeps it fatal — each
    * layer starts maximally safe (both default fatal) and may only
    * RELAX its own default, so a batch skips only when both layers
    * opted in. (Deliberate divergence from the reference's
    * escalate-on-either: its default hook is all-SKIP, ours is
    * all-fatal, so escalate-on-either would make the config setting
    * dead code here.) JVM-fatal throwables (OutOfMemoryError,
    * interrupts — anything outside `NonFatal`) always propagate, no
    * matter what either layer says. */
  def stream(kafka: DataFrame)(
      sink: (DataFrame, DataFrame, Long) => Unit) = {
    val decoded = decodeFrame(kafka)
    val guarded: (DataFrame, DataFrame, Long) => Unit = (up, del, id) =>
      try sink(up, del, id)
      catch {
        case e: Throwable
            if scala.util.control.NonFatal(e) &&
              (!hooks.fatalError(e) || !cfg.errorPolicy.isFatal(e)) =>
          hooks.onError(e, id)
      }
    // the DLQ split runs per micro-batch INSIDE mergeSink, before the
    // process-message filter and tombstone classification — a poison
    // frame's null payload must neither read as a delete nor be
    // silently dropped by a user predicate before quarantine
    val dlqSplit = deadLetterSink.map { dlq =>
      (poisonPredicate,
        (dead: DataFrame, batchId: Long) => {
          if (metrics ne graft.observe.Metrics.noop)
            metrics.count(graft.observe.Metrics.DeadLetters, dead.count())
          dlq(dead.drop("payload", "decoded_key"))
        })
    }
    // recordAttributes shapes the MAIN side only, after the DLQ
    // split (as a `shape` hook inside mergeSink): shaping the whole
    // stream first let a column-narrowing hook break the poison
    // predicate and strip raw bytes off quarantined rows — and
    // diverged from consumeBatch, which shapes only valid rows
    Streams.mergeSink(decoded, keyCols,
      col(orderCol), hooks.isTombstone, cfg.compacted,
      processMessage = hooks.processMessage && hooks.shouldConsume,
      sideSplit = dlqSplit,
      shape = hooks.recordAttributes)(guarded)
  }
}
