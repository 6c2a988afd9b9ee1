package graft.testkit

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.{KeyConfig, TopicConfig}
import graft.schema.PlainJsonBackend
import graft.streaming.Streams

class TestKitSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("wid", StringType), StructField("n", LongType),
    StructField("message_id", StringType),
    StructField("timestamp", StringType)))
  private val backend = new PlainJsonBackend(schema)

  test("capturing sink records produced messages; hasSent matches") {
    val sink = new TestKit.CapturingSink(backend)
    val payloads = Seq(("w1", 5L), ("w2", 7L)).toDF("wid", "n")
      .withColumn("message_id", org.apache.spark.sql.functions.lit("m"))
      .withColumn("timestamp", org.apache.spark.sql.functions.lit("t"))
    val frame = Streams.toKafkaFrame(payloads,
      TopicConfig("widgets", "W", keyConfig = KeyConfig.NoKey), backend)
    sink.publish(frame)
    assert(sink.sent.size === 2)
    assert(sink.hasSent("widgets", Map("wid" -> "w1", "n" -> 5L)))
    assert(!sink.hasSent("widgets", Map("wid" -> "w1", "n" -> 99L)))
    assert(!sink.hasSent("other", Map("wid" -> "w1")))
    sink.clear()
    assert(sink.sent.isEmpty)
  }

  test("capturing sink strips the topic prefix so assertions use logical topics") {
    // reference parity: decode_message subs producers.topic_prefix off
    // before config lookup (lib/deimos.rb:145-157)
    val sink = new TestKit.CapturingSink(backend, topicPrefix = Some("pre."))
    val payloads = Seq(("w1", 5L)).toDF("wid", "n")
      .withColumn("message_id", org.apache.spark.sql.functions.lit("m"))
      .withColumn("timestamp", org.apache.spark.sql.functions.lit("t"))
    val frame = Streams.toKafkaFrame(payloads,
      TopicConfig("widgets", "W", topicPrefix = "pre.",
        keyConfig = KeyConfig.NoKey), backend)
    sink.publish(frame)
    assert(sink.sent.map(_.topic) === Seq("widgets"))
    assert(sink.hasSent("widgets", Map("wid" -> "w1")))
    assert(!sink.hasSent("pre.widgets", Map("wid" -> "w1")))
  }

  test("kafkaFrameOf drives a consumer with tombstones") {
    val frame = TestKit.kafkaFrameOf(spark, Seq(
      (1L, "A", """{"wid":"A","n":1}"""), (2L, "A", null)))
    val decoded = Streams.fromKafkaFrame(frame, backend)
    assert(decoded.filter(org.apache.spark.sql.functions.col("payload").isNull)
      .count() === 1)
  }
}
