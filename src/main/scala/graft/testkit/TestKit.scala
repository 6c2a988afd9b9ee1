package graft.testkit

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.model.MessageCols
import graft.schema.SchemaBackend

/** Test support — the engine's version of the reference test helpers
  * (`lib/deimos/test_helpers.rb:118-264`: in-memory sink, `have_sent`
  * matcher that decodes sent messages, consumer drivers).
  */
object TestKit {

  /** In-memory produced-message capture (reference `Backends::Test`,
    * `backends/test.rb:6-20`): collect a produced Kafka-shaped frame,
    * decoded for assertion. `headers` is None for frames produced
    * without a headers column (the reference's nil headers);
    * `partitionKey` is None when the frame carried a null
    * partition_key. */
  final case class Sent(topic: String, key: Option[String],
      payload: Option[Row], headers: Option[Map[String, String]] = None,
      partitionKey: Option[String] = None)

  /** @param topicPrefix when the producer config carries a topic
    *   prefix, test assertions run against the LOGICAL topic — the
    *   prefix is stripped on capture, mirroring the reference's
    *   test-decode path (`lib/deimos.rb:145-157`: `decode_message`
    *   subs `producers.topic_prefix` off before config lookup). */
  class CapturingSink(backend: SchemaBackend,
      topicPrefix: Option[String] = None) extends Serializable {
    private val buffer = scala.collection.mutable.ArrayBuffer[Sent]()

    private def logicalTopic(topic: String): String = topicPrefix match {
      case Some(p) if topic.startsWith(p) => topic.substring(p.length)
      case _ => topic
    }

    def publish(frame: DataFrame): Unit = {
      // headers come back as the human map (wire frames convert) —
      // the matcher compares hashes like the reference's have_sent
      // (`test_helpers.rb:118-141`), not wire byte arrays
      val headerCol =
        if (!frame.columns.contains(MessageCols.Headers))
          lit(null).cast("map<string,string>")
        else MessageCols.headersAsMap(frame)
      val pkCol =
        if (frame.columns.contains(MessageCols.PartitionKey))
          col(MessageCols.PartitionKey).cast("string")
        else lit(null).cast("string")
      val decoded = frame.select(
        col(MessageCols.Topic),
        col(MessageCols.Key).cast("string").as("k"),
        when(col(MessageCols.Value).isNotNull,
          backend.decodeExpr(col(MessageCols.Value))).as("p"),
        headerCol.as("h"),
        pkCol.as("pk"))
        .collect()
      buffer.synchronized {
        buffer ++= decoded.map(r => Sent(
          logicalTopic(r.getString(0)),
          Option(r.getString(1)),
          Option(r.getAs[Row]("p")),
          Option(r.getAs[scala.collection.Map[String, String]]("h"))
            .map(_.toMap),
          Option(r.getAs[String]("pk"))))
      }
    }

    def sent: Seq[Sent] = buffer.synchronized(buffer.toSeq)
    def clear(): Unit = buffer.synchronized(buffer.clear())

    /** `have_sent` analog: was a message with this topic + payload
      * field values produced? The optional args mirror the reference
      * matcher's full signature
      * (`test_helpers.rb:118`: msg, key, partition_key, headers):
      * `key`/`partitionKey` must equal the sent message's when given;
      * `headers` is an exact hash match (`test_helpers.rb:137-141`).
      * Omitted args skip their check, like the reference's
      * `key.present?` guards. */
    def hasSent(topic: String, fields: Map[String, Any],
        headers: Option[Map[String, String]] = None,
        key: Option[String] = None,
        partitionKey: Option[String] = None): Boolean =
      sent.exists(s => s.topic == topic && s.payload.exists(p =>
        fields.forall { case (f, v) =>
          // a fields key that is not a payload field doesn't match —
          // Ruby's hash-include semantics (getAs would throw instead)
          p.schema.fieldNames.contains(f) &&
          Option(p.getAs[Any](f)).map(_.toString) == Option(v).map(_.toString)
        }) && headers.forall(h => s.headers.contains(h)) &&
        key.forall(k => s.key.contains(k)) &&
        partitionKey.forall(pk => s.partitionKey.contains(pk)))

    /** The reference's DEFAULT `have_sent` is an EXACT payload match
      * ([[hasSent]] is its `have_sent_including` subset form): every
      * payload field must equal the given value, and a field omitted
      * from `fields` must be NULL in the sent payload (the reference
      * deletes nil payload_key before the hash match —
      * `test_helpers.rb:125-129` — and any other missing key fails
      * it). A `fields` key that is not a payload field never
      * matches. */
    def hasSentExactly(topic: String, fields: Map[String, Any],
        headers: Option[Map[String, String]] = None,
        key: Option[String] = None,
        partitionKey: Option[String] = None): Boolean =
      sent.exists(s => s.topic == topic && s.payload.exists { p =>
        val names = p.schema.fieldNames.toSet
        fields.keys.forall(names.contains) &&
        names.forall(f =>
          Option(p.getAs[Any](f)).map(_.toString) ==
            fields.get(f).flatMap(Option(_)).map(_.toString))
      } && headers.forall(h => s.headers.contains(h)) &&
        key.forall(k => s.key.contains(k)) &&
        partitionKey.forall(pk => s.partitionKey.contains(pk)))
  }

  /** Drive a consumer with literal rows, the raw-frame variant: build
    * a Kafka-shaped frame from (offset, key, jsonValue) triples (null
    * json ⇒ tombstone). For the schema-validating path use
    * [[testConsumeBatch]]. */
  def kafkaFrameOf(spark: org.apache.spark.sql.SparkSession,
      rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("offset", "k", "json").select(
      col("offset"),
      col("k").cast("binary").as(MessageCols.Key),
      col("json").cast("binary").as(MessageCols.Value))
  }

  /** `test_consume_batch` analog (`test_helpers.rb:219-264`): drive a
    * BatchConsumer with literal payload rows THROUGH THE REAL ENCODE
    * PATH — payloads are encoded with the consumer's backend, framed
    * kafka-shaped, then decoded/hooked/compacted by `consumeBatch` —
    * so one call validates the schema round-trip AND the consumer
    * logic, which is exactly what the reference's helper exists for
    * (a payload that doesn't fit the schema fails the encode loudly
    * instead of silently producing garbage frames).
    *
    * @param payloads   rows with an `offset` column (explicit
    *                   ordering beats hidden arrival order in tests)
    *                   plus the payload fields
    * @param keyCol     expression over the payload row producing the
    *                   message key (encoded as a UTF-8 string key)
    * @param tombstones keys to append as null-value tombstone frames,
    *                   at offsets after every payload
    * @return consumeBatch's (upserts, deletes)
    */
  def testConsumeBatch(consumer: graft.consume.BatchConsumer,
      payloads: DataFrame, keyCol: org.apache.spark.sql.Column,
      tombstones: Seq[String] = Nil): (DataFrame, DataFrame) = {
    require(payloads.columns.contains("offset"),
      "payloads need an explicit offset column")
    val payloadCols = payloads.columns.filterNot(_ == "offset").toIndexedSeq
    val frame = payloads.select(
      // tolerate Int offsets (Seq((1, ...)).toDF infers IntegerType)
      col("offset").cast("long").as("offset"),
      keyCol.cast("string").cast("binary").as(MessageCols.Key),
      consumer.backend.encodeExpr(struct(payloadCols.map(col): _*))
        .as(MessageCols.Value))
    val withTombs =
      if (tombstones.isEmpty) frame
      else {
        val spark = payloads.sparkSession
        import spark.implicits._
        // coalesce handles an empty payload frame (null max): the
        // tombstones then start at offset 1
        val maxOff = payloads
          .agg(coalesce(max(col("offset").cast("long")), lit(0L)))
          .head.getLong(0)
        frame.unionByName(
          tombstones.zipWithIndex.map { case (k, i) => (maxOff + i + 1, k) }
            .toDF("offset", "k")
            .select(col("offset"),
              col("k").cast("binary").as(MessageCols.Key),
              lit(null).cast("binary").as(MessageCols.Value)))
      }
    consumer.consumeBatch(withTombs)
  }

  /** `test_consume_message` analog: the single-row sugar. */
  def testConsumeMessage(consumer: graft.consume.BatchConsumer,
      payload: DataFrame,
      keyCol: org.apache.spark.sql.Column): (DataFrame, DataFrame) =
    testConsumeBatch(consumer,
      payload.withColumn("offset", lit(1L)), keyCol)
}
