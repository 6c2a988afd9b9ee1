package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Core data-model abstractions of the engine.
  *
  * Mirrors the reference's message/topic model (reference:
  * `lib/deimos/message.rb:5-32`, `lib/deimos/ext/schema_route.rb:10-29`)
  * re-expressed on Spark's Kafka-source column contract
  * (`key, value, topic, partition, offset, timestamp, headers`).
  */
object MessageCols {
  val Key = "key"
  val Value = "value"
  val Topic = "topic"
  val Partition = "partition"
  val Offset = "offset"
  val Timestamp = "timestamp"
  val Headers = "headers"
  val PartitionKey = "partition_key"

  /** Tombstone = nil payload (reference: `lib/deimos/message.rb:98-100`). */
  def isTombstone(value: Column): Column = value.isNull

  /** Kafka wire shape of the headers column — Spark's Kafka
    * source/sink contract: `ARRAY<STRUCT<key STRING, value BINARY>>`.
    * The user-facing shape is the reference's headers Hash
    * (`lib/deimos/message.rb:11,25-30`): `MAP<STRING, STRING>`. */
  val HeadersWireType: org.apache.spark.sql.types.DataType =
    org.apache.spark.sql.types.DataType.fromDDL(
      "ARRAY<STRUCT<key: STRING, value: BINARY>>")

  /** headers map → Kafka wire entries (insertion order preserved). */
  def headersToWire(h: Column): Column =
    transform(map_entries(h), e => struct(
      e.getField("key").as("key"),
      e.getField("value").cast("binary").as("value")))

  /** Kafka wire entries → headers map. Kafka allows duplicate header
    * keys; a Ruby Hash keeps the LAST value, so an entry survives only
    * if no later entry reuses its key (headers are tiny — the O(n²)
    * scan beats tripping `spark.sql.mapKeyDedupPolicy=EXCEPTION`). */
  def wireToHeaders(h: Column): Column =
    map_from_entries(transform(
      filter(h, (e, i) => !exists(slice(h, i + lit(2), size(h)),
        e2 => e2.getField("key") === e.getField("key"))),
      e => struct(
        e.getField("key").as("key"),
        e.getField("value").cast("string").as("value"))))

  /** The frame's headers column as the user-facing
    * `MAP<STRING,STRING>`, whatever shape it carries (a map passes
    * through; wire entries convert) — the ONE shape dispatch every
    * consume/log/capture site shares, so header normalization can't
    * drift between them. */
  def headersAsMap(df: DataFrame): Column =
    df.schema(Headers).dataType match {
      case _: org.apache.spark.sql.types.MapType => col(Headers)
      case _ => wireToHeaders(col(Headers))
    }

  /** The inverse dispatch for the produce path: the headers column in
    * Spark's Kafka wire shape (a map converts; an already-wire-shaped
    * column passes through). */
  def headersAsWire(df: DataFrame): Column =
    df.schema(Headers).dataType match {
      case _: org.apache.spark.sql.types.MapType =>
        headersToWire(col(Headers))
      case _ => col(Headers)
    }
}

/** Key configuration, one of the reference's four modes
  * (reference: `lib/deimos/shared_config.rb:57-64`).
  */
sealed trait KeyConfig
object KeyConfig {
  /** Unkeyed topic. */
  case object NoKey extends KeyConfig
  /** Key = the named payload field passed through unencoded
    * (string/bytes). The field is explicit — keying on positional
    * column order would silently mis-key reordered frames. */
  final case class Plain(field: String) extends KeyConfig
  /** Key extracted from a payload field (possibly nested, dot-separated;
    * reference: `lib/deimos/ext/producer_middleware.rb:108-122`). */
  final case class Field(path: String) extends KeyConfig
  /** Key encoded with its own schema. */
  final case class Schema(name: String) extends KeyConfig
}

/** T6 per-topic error policy — the reference's `reraise_errors` /
  * `fatal_error?` pair (`consumer.rb:42-54`) as a typed setting:
  * `Fatal` fails the query (our safer default), `Skip` swallows the
  * batch after `onError`. Consumers wire it as
  * `override def fatalError(e) = cfg.errorPolicy.isFatal(e)`. */
sealed trait ErrorPolicy { def isFatal(e: Throwable): Boolean }
object ErrorPolicy {
  case object Fatal extends ErrorPolicy {
    def isFatal(e: Throwable): Boolean = true
  }
  case object Skip extends ErrorPolicy {
    def isFatal(e: Throwable): Boolean = false
  }
}

/** P14 payload-log shaping style per topic (reference
  * `topic.payload_log`: log full payloads, keys only, only a count,
  * or only the message headers — `lib/deimos/logging.rb:67-96`).
  * Applied by [[graft.observe.Observe.payloadLogFrame]]. */
sealed trait PayloadLog
object PayloadLog {
  case object Full extends PayloadLog
  case object Keys extends PayloadLog
  case object Count extends PayloadLog
  /** `:headers` style (`logging.rb:84`): log each message's headers. */
  case object Headers extends PayloadLog
}

/** Per-topic configuration mirroring the reference routing DSL
  * (reference: `lib/deimos/ext/schema_route.rb:31-95`,
  * `consumer_route.rb:5-35`, `producer_route.rb:5-33`).
  *
  * @param topic          physical topic name (before prefixing)
  * @param schemaName     value schema name
  * @param namespace      schema namespace
  * @param keyConfig      key mode
  * @param topicPrefix    global prefix applied on produce
  *                       (reference: `producer_middleware.rb:35`)
  * @param compacted      last-write-wins compaction before merge
  *                       (reference: `active_record_consumer.rb:76`)
  * @param maxDbBatchSize sub-batch cap for sink statements
  *                       (reference: `batch_consumption.rb:148-163`)
  * @param bootstrapServers per-cluster override
  *                       (reference: `lib/deimos.rb:183-198`)
  * @param saveAssociationsFirst M5 direction flag (reference topic
  *                       setting `consumer_route.rb:13`,
  *                       `active_record_consumer.rb:64-66`): the
  *                       primary rows BELONG TO their nested
  *                       association — save the association table
  *                       first, then write primaries with the real
  *                       foreign key filled back
  *                       ([[graft.operators.Materialize.extractAssociationsFirst]])
  */
final case class TopicConfig(
    topic: String,
    schemaName: String,
    namespace: String = "",
    keyConfig: KeyConfig = KeyConfig.NoKey,
    topicPrefix: String = "",
    compacted: Boolean = true,
    maxDbBatchSize: Option[Int] = None,
    bootstrapServers: Option[String] = None,
    errorPolicy: ErrorPolicy = ErrorPolicy.Fatal,
    payloadLog: PayloadLog = PayloadLog.Full,
    saveAssociationsFirst: Boolean = false) {
  def fullTopic: String = topicPrefix + topic
}

/** Engine-wide switches (reference: producer kill-switch,
  * `lib/deimos/producer.rb:16-57`). Thread-safe via volatile. */
object EngineConfig {
  @volatile var producersDisabled: Boolean = false
  @volatile private var disabledClasses: Set[String] = Set.empty
  def disable(clazz: String): Unit = synchronized { disabledClasses += clazz }
  def enable(clazz: String): Unit = synchronized { disabledClasses -= clazz }
  def producerEnabled(clazz: String): Boolean =
    !producersDisabled && !disabledClasses.contains(clazz)
}
