package graft.streaming

import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.model.TopicConfig

/** S1/S2/S5 option-matrix pin. The sandbox has neither a Kafka broker
  * nor the spark-sql-kafka connector jar, so `.load()`/`.start()` can
  * never run — the deepest testable boundary is the CONSTRUCTED
  * DataStreamReader/DataStreamWriter. These specs introspect the
  * builders' accumulated state (format, options, trigger) so a
  * refactor can't silently drop the per-topic cluster override (T10),
  * the topic prefix, the checkpoint, or the pacing cap (T8). The
  * environment limit is recorded in COVERAGE.md §2.1; the reference's
  * broker-backed produce/consume specs
  * (`lib/deimos/test_helpers.rb:118-264`) are mirrored value-level by
  * `StreamsSpec`'s kafka-shaped-frame round-trips instead.
  */
class KafkaWiringSpec extends SparkSpec {

  /** Every field value reachable on the object across its class
    * hierarchy — builder internals are private and name-mangled, so
    * match by VALUE shape instead of field name. */
  private def fieldValues(obj: AnyRef): Seq[Any] = {
    val out = scala.collection.mutable.ArrayBuffer[Any]()
    var c: Class[_] = obj.getClass
    while (c != null) {
      c.getDeclaredFields.foreach { f =>
        if (!java.lang.reflect.Modifier.isStatic(f.getModifiers)) {
          f.setAccessible(true)
          out += f.get(obj)
        }
      }
      c = c.getSuperclass
    }
    out.toSeq
  }

  private def options(obj: AnyRef): Map[String, String] =
    fieldValues(obj).collectFirst {
      case m: scala.collection.Map[_, _]
          if m.keys.forall(_.isInstanceOf[String]) && m.nonEmpty =>
        m.map { case (k, v) => k.toString.toLowerCase -> v.toString }.toMap
    }.getOrElse(fail(s"no options map found on ${obj.getClass}"))

  private def formatOf(obj: AnyRef): String =
    fieldValues(obj).collectFirst { case s: String if s == "kafka" => s }
      .getOrElse(fail(s"source format 'kafka' not found on ${obj.getClass}"))

  private val cfg = TopicConfig(topic = "orders", schemaName = "Order", namespace = "com.example", keyConfig = graft.model.KeyConfig.NoKey, topicPrefix = "prod.")

  test("S5 source: prefixed subscribe, default cluster, earliest offsets") {
    val r = Streams.kafkaSource(spark, cfg, "broker-a:9092")
    assert(formatOf(r) === "kafka")
    val o = options(r)
    assert(o("kafka.bootstrap.servers") === "broker-a:9092")
    assert(o("subscribe") === "prod.orders")
    assert(o("startingoffsets") === "earliest")
    assert(!o.contains("maxoffsetspertrigger"))
  }

  test("T10: per-topic bootstrap override beats the engine default") {
    val multi = cfg.copy(bootstrapServers = Some("cluster-b:9092"))
    val o = options(Streams.kafkaSource(spark, multi, "broker-a:9092"))
    assert(o("kafka.bootstrap.servers") === "cluster-b:9092")
  }

  test("T8: per-trigger offset cap lands in the source options") {
    val o = options(Streams.kafkaSource(spark, cfg, "b:9092",
      maxOffsetsPerTrigger = Some(500000L)))
    assert(o("maxoffsetspertrigger") === "500000")
  }

  test("headers: includeHeaders opt-in lands in the source options") {
    // Spark's Kafka source omits the headers column unless asked —
    // consumers that read message headers (message.rb:79-88) opt in
    val o = options(Streams.kafkaSource(spark, cfg, "b:9092",
      includeHeaders = true))
    assert(o("includeheaders") === "true")
    assert(!options(Streams.kafkaSource(spark, cfg, "b:9092"))
      .contains("includeheaders"))
  }

  test("multi-topic source: comma-list subscribe, single-cluster guard") {
    val a = TopicConfig(topic = "orders", schemaName = "Order", namespace = "com.example", keyConfig = graft.model.KeyConfig.NoKey, topicPrefix = "prod.")
    val b = TopicConfig(topic = "users", schemaName = "User", namespace = "com.example", keyConfig = graft.model.KeyConfig.NoKey, topicPrefix = "prod.")
    val o = options(Streams.kafkaSourceMulti(spark, Seq(a, b), "b:9092"))
    assert(o("subscribe") === "prod.orders,prod.users")
    assert(o("kafka.bootstrap.servers") === "b:9092")
    // configs that agree on an override use it
    val c1 = a.copy(bootstrapServers = Some("x:1"))
    val c2 = b.copy(bootstrapServers = Some("x:1"))
    assert(options(Streams.kafkaSourceMulti(spark, Seq(c1, c2), "b:9092"))(
      "kafka.bootstrap.servers") === "x:1")
    // mixed clusters fail loudly instead of silently dropping topics
    intercept[IllegalArgumentException] {
      Streams.kafkaSourceMulti(spark,
        Seq(c1, b.copy(bootstrapServers = Some("y:1"))), "b:9092")
    }
    // one override + one default-cluster config is ALSO mixed: the
    // comparison is on EFFECTIVE clusters, so the override can't drag
    // default-cluster topics onto its cluster silently
    intercept[IllegalArgumentException] {
      Streams.kafkaSourceMulti(spark, Seq(c1, b), "b:9092")
    }
    // ...unless the override matches the default (same effective cluster)
    assert(options(Streams.kafkaSourceMulti(spark,
      Seq(a.copy(bootstrapServers = Some("b:9092")), b), "b:9092"))(
      "kafka.bootstrap.servers") === "b:9092")
    intercept[IllegalArgumentException] {
      Streams.kafkaSourceMulti(spark, Seq.empty, "b:9092")
    }
  }

  // writeStream demands a streaming frame: the built-in rate source
  // stands in for the produce chain's output
  private def streamingFrame = {
    import org.apache.spark.sql.functions._
    spark.readStream.format("rate").load().select(
      lit("prod.orders").as("topic"),
      lit(null).cast("binary").as("key"),
      col("value").cast("string").cast("binary").as("value"))
  }

  test("S1/S2 sink: format, cluster, checkpoint, trigger") {
    val frame = streamingFrame
    val w = Streams.kafkaSink(frame, "broker-a:9092", "/tmp/ck",
      trigger = Trigger.ProcessingTime("5 seconds"))
    assert(formatOf(w) === "kafka")
    val o = options(w)
    assert(o("kafka.bootstrap.servers") === "broker-a:9092")
    assert(o("checkpointlocation") === "/tmp/ck")
    val trig = fieldValues(w).collectFirst { case t: Trigger => t }
      .getOrElse(fail("no trigger recorded on the writer"))
    assert(trig === Trigger.ProcessingTime("5 seconds"))
    // default trigger: 1s micro-batches (the reference's near-realtime
    // produce cadence)
    val triggers = fieldValues(Streams.kafkaSink(frame, "b:9092", "/tmp/ck"))
      .collect { case t: Trigger => t }
    assert(triggers === Seq(Trigger.ProcessingTime("1 second")))
  }

  test("the produced frame routes by its topic column (one sink, many topics)") {
    // kafkaSink sets no "topic" option: Spark's kafka sink then requires
    // a topic column and routes per row — that is the contract that
    // lets one writer serve every TopicConfig in a fleet
    val o = options(Streams.kafkaSink(streamingFrame, "b:9092", "/tmp/ck"))
    assert(!o.contains("topic"))
  }
}
