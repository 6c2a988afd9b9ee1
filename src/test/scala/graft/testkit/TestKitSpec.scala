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
    // a fields key that is not a payload field doesn't match (hash
    // include semantics), it must not throw
    assert(!sink.hasSent("widgets", Map("ghost" -> "x")))
    sink.clear()
    assert(sink.sent.isEmpty)
  }

  test("have_sent headers arg: exact hash match on captured headers") {
    import org.apache.spark.sql.functions._
    val sink = new TestKit.CapturingSink(backend)
    val payloads = Seq(("w1", 5L)).toDF("wid", "n")
      .withColumn("message_id", lit("m"))
      .withColumn("timestamp", lit("t"))
      .withColumn("headers",
        map(lit("trace"), lit("t1"), lit("src"), lit("svc")))
    sink.publish(Streams.toKafkaFrame(payloads,
      TopicConfig("widgets", "W", keyConfig = KeyConfig.NoKey), backend))
    assert(sink.sent.head.headers ===
      Some(Map("trace" -> "t1", "src" -> "svc")))
    assert(sink.hasSent("widgets", Map("wid" -> "w1"),
      headers = Some(Map("trace" -> "t1", "src" -> "svc"))))
    // reference matcher semantics (test_helpers.rb:137-141): the
    // headers arg is an exact hash match — a subset or a wrong value
    // does not match; omitting the arg skips the check entirely
    assert(!sink.hasSent("widgets", Map("wid" -> "w1"),
      headers = Some(Map("trace" -> "t1"))))
    assert(!sink.hasSent("widgets", Map("wid" -> "w1"),
      headers = Some(Map("trace" -> "XX", "src" -> "svc"))))
    assert(sink.hasSent("widgets", Map("wid" -> "w1")))
    // header-less frames capture None and never match a headers arg
    sink.clear()
    sink.publish(Streams.toKafkaFrame(payloads.drop("headers"),
      TopicConfig("widgets", "W", keyConfig = KeyConfig.NoKey), backend))
    assert(sink.sent.head.headers === None)
    assert(!sink.hasSent("widgets", Map("wid" -> "w1"),
      headers = Some(Map("trace" -> "t1"))))
  }

  test("have_sent key and partition_key args match like the reference matcher") {
    import org.apache.spark.sql.functions._
    val sink = new TestKit.CapturingSink(backend)
    val payloads = Seq(("w1", 5L)).toDF("wid", "n")
      .withColumn("message_id", lit("m"))
      .withColumn("timestamp", lit("t"))
      .withColumn("partition_key", lit("pk-7"))
    sink.publish(Streams.toKafkaFrame(payloads,
      TopicConfig("widgets", "W", keyConfig = KeyConfig.Plain("wid")),
      backend))
    assert(sink.sent.head.key === Some("w1"))
    assert(sink.sent.head.partitionKey === Some("pk-7"))
    assert(sink.hasSent("widgets", Map("n" -> 5L), key = Some("w1")))
    assert(!sink.hasSent("widgets", Map("n" -> 5L), key = Some("w2")))
    assert(sink.hasSent("widgets", Map("n" -> 5L),
      partitionKey = Some("pk-7")))
    assert(!sink.hasSent("widgets", Map("n" -> 5L),
      partitionKey = Some("pk-8")))
    // all four dimensions at once, reference-signature style
    assert(sink.hasSent("widgets", Map("wid" -> "w1", "n" -> 5L),
      headers = None, key = Some("w1"), partitionKey = Some("pk-7")))
  }

  test("hasSentExactly: the reference's default exact-payload match semantics") {
    import org.apache.spark.sql.functions._
    val sink = new TestKit.CapturingSink(backend)
    val payloads = Seq(("w1", 5L)).toDF("wid", "n")
      .withColumn("message_id", lit("m"))
      .withColumn("timestamp", lit("t"))
    sink.publish(Streams.toKafkaFrame(payloads,
      TopicConfig("widgets", "W", keyConfig = KeyConfig.NoKey), backend))
    val full = Map[String, Any]("wid" -> "w1", "n" -> 5L,
      "message_id" -> "m", "timestamp" -> "t")
    assert(sink.hasSentExactly("widgets", full))
    // the subset matcher accepts partial fields; the exact one rejects
    // them (a field omitted from the expectation must be null)
    assert(sink.hasSent("widgets", Map("wid" -> "w1")))
    assert(!sink.hasSentExactly("widgets", Map("wid" -> "w1")))
    // a wrong value or a non-payload key never matches
    assert(!sink.hasSentExactly("widgets", full.updated("n", 6L)))
    assert(!sink.hasSentExactly("widgets", full + ("ghost" -> "x")))
    // a genuinely-null payload field matches when omitted — built as a
    // raw frame: toKafkaFrame's autoFields would FILL a null
    // message_id with a uuid, which is exactly the reference's
    // produce behavior too
    val withNull = Seq(("w2", 7L)).toDF("wid", "n")
      .withColumn("message_id", lit(null).cast("string"))
      .withColumn("timestamp", lit("t"))
    val rawFrame = withNull.select(lit("widgets").as("topic"),
      lit(null).cast("binary").as("key"),
      backend.encodeExpr(struct(col("wid"), col("n"),
        col("message_id"), col("timestamp"))).as("value"))
    sink.clear()
    sink.publish(rawFrame)
    assert(sink.hasSentExactly("widgets",
      Map("wid" -> "w2", "n" -> 7L, "timestamp" -> "t")))
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

  test("testConsumeBatch: real encode path + consumer logic in one call") {
    import org.apache.spark.sql.functions._
    object Hooks extends graft.consume.ConsumerHooks {
      override def isTombstone = col("payload").isNull
    }
    val consumer = new graft.consume.BatchConsumer(
      TopicConfig("widgets", "W", keyConfig = KeyConfig.Plain("wid")),
      backend, Hooks, keyCols = Seq("decoded_key"), orderCol = "offset")
    val payloads = Seq((1L, "A", 5L), (2L, "A", 6L), (3L, "B", 9L))
      .toDF("offset", "wid", "n")
      .withColumn("message_id", lit("m")).withColumn("timestamp", lit("t"))
    val (up, del) = TestKit.testConsumeBatch(consumer, payloads,
      keyCol = col("wid"), tombstones = Seq("B"))
    val ups = up.select(col("decoded_key"), col("payload.n"))
      .as[(String, Long)].collect().toSet
    assert(ups === Set(("A", 6L))) // compacted to the last version
    assert(del.select("decoded_key").as[String].collect().toSeq === Seq("B"))
  }

  test("testConsumeBatch tolerates Int offsets and empty payload frames") {
    import org.apache.spark.sql.functions._
    object Hooks extends graft.consume.ConsumerHooks {
      override def isTombstone = col("payload").isNull
    }
    val consumer = new graft.consume.BatchConsumer(
      TopicConfig("widgets", "W", keyConfig = KeyConfig.Plain("wid")),
      backend, Hooks, keyCols = Seq("decoded_key"), orderCol = "offset")
    // Scala Int tuples infer IntegerType for offset — must not crash
    val intOffsets = Seq((1, "A", 5L)).toDF("offset", "wid", "n")
      .withColumn("message_id", lit("m")).withColumn("timestamp", lit("t"))
    val (up, _) = TestKit.testConsumeBatch(consumer, intOffsets,
      keyCol = col("wid"), tombstones = Seq("Z"))
    assert(up.count() === 1)
    // empty payloads + tombstones: deletes only, no NPE on the max
    val empty = intOffsets.filter(lit(false))
    val (up2, del2) = TestKit.testConsumeBatch(consumer, empty,
      keyCol = col("wid"), tombstones = Seq("Z"))
    assert(up2.count() === 0)
    assert(del2.select("decoded_key").as[String].collect().toSeq === Seq("Z"))
  }

  test("testConsumeMessage validates the schema: a misfit payload fails loudly") {
    import org.apache.spark.sql.functions._
    object Hooks extends graft.consume.ConsumerHooks {
      override def isTombstone = col("payload").isNull
    }
    // Avro backend: encode enforces the declared record shape
    val avro = new graft.schema.AvroBackend(
      """{"type":"record","name":"W","fields":[
        | {"name":"wid","type":"string"},{"name":"n","type":"long"}
        |]}""".stripMargin)
    val consumer = new graft.consume.BatchConsumer(
      TopicConfig("widgets", "W", keyConfig = KeyConfig.Plain("wid")),
      avro, Hooks, keyCols = Seq("decoded_key"), orderCol = "offset")
    val good = Seq(("A", 5L)).toDF("wid", "n")
    val (up, _) = TestKit.testConsumeMessage(consumer, good, col("wid"))
    assert(up.select(col("payload.n")).as[Long].collect().toSeq === Seq(5L))
    // wrong shape (missing required field): the ENCODE fails — the
    // reference helper's "schema is correct" check
    val bad = Seq(Tuple1("A")).toDF("wid")
    intercept[Exception] {
      TestKit.testConsumeMessage(consumer, bad, col("wid"))._1.collect()
    }
  }
}
