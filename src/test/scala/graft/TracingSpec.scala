package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.consume.{BatchConsumer, ConsumerHooks}
import graft.model.{KeyConfig, TopicConfig}
import graft.observe.Tracing
import graft.schema.PlainJsonBackend

/** Tracing facade (reference `tracing/provider.rb` surface: start /
  * finish / set_error / active_span / set_tag / get_tag): in-memory
  * recorder semantics, consumer span integration, and the Spark-native
  * provider's job-group mapping. */
class TracingSpec extends SparkSpec {
  import spark.implicits._

  test("in-memory tracer: start/finish/tags/active-span/error surface") {
    val t = new Tracing.InMemory
    assert(t.activeSpan.isEmpty)
    val span = t.start("unit-of-work", "resource-1")
    assert(t.activeSpan.contains(span))
    t.setTag("topic", "widgets") // tags the active span
    assert(t.getTag("topic").contains("widgets"))
    t.setTag("k", "v", Some(span))
    t.finish(span)
    assert(t.activeSpan.isEmpty)
    val f = t.finishedSpans
    assert(f.size === 1 && f.head.name === "unit-of-work")
    assert(f.head.resource === "resource-1")
    assert(f.head.getTag("k").contains("v"))
    assert(f.head.durationNanos >= 0)
    // withSpan records the error AND finishes, then rethrows
    intercept[RuntimeException] {
      t.withSpan("boom") { throw new RuntimeException("x") }
    }
    val errSpan = t.finishedSpans.find(_.name == "boom").get
    assert(errSpan.error.exists(_.getMessage == "x"))
  }

  private val payloadType = StructType(Seq(
    StructField("widget_id", StringType), StructField("amount", LongType)))

  private object Hooks extends ConsumerHooks {
    override def isTombstone: Column = col("payload").isNull
  }

  private def kafkaFrame: DataFrame =
    Seq((1L, "A", """{"widget_id":"A","amount":5}"""))
      .toDF("offset", "k", "json")
      .select(col("offset"), col("k").cast("binary").as("key"),
        col("json").cast("binary").as("value"))

  test("consumeBatch runs inside a graft-consumer span with the topic as resource") {
    val tracer = new Tracing.InMemory
    val consumer = new BatchConsumer(
      TopicConfig("widgets", "Widget", keyConfig = KeyConfig.Plain("widget_id")),
      new PlainJsonBackend(payloadType), Hooks,
      keyCols = Seq("decoded_key"), orderCol = "offset", tracer = tracer)
    consumer.consumeBatch(kafkaFrame)
    val spans = tracer.finishedSpans
    assert(spans.size === 1)
    assert(spans.head.name === "graft-consumer")
    assert(spans.head.resource === "widgets")
    assert(spans.head.error.isEmpty)
  }

  test("a failing consume records the error on the span before rethrowing") {
    val tracer = new Tracing.InMemory
    val badHooks = new ConsumerHooks {
      override def isTombstone: Column = col("payload").isNull
      override def preProcess(batch: DataFrame): Unit =
        throw new IllegalStateException("pre_process exploded")
    }
    val consumer = new BatchConsumer(
      TopicConfig("widgets", "Widget", keyConfig = KeyConfig.Plain("widget_id")),
      new PlainJsonBackend(payloadType), badHooks,
      keyCols = Seq("decoded_key"), orderCol = "offset", tracer = tracer)
    intercept[IllegalStateException] { consumer.consumeBatch(kafkaFrame) }
    val span = tracer.finishedSpans.head
    assert(span.error.exists(_.getMessage == "pre_process exploded"))
  }

  test("nested spans restore the parent: active span and job-group attribution") {
    val mem = new Tracing.InMemory
    mem.withSpan("outer", "o") {
      mem.withSpan("inner", "i") {
        assert(mem.activeSpan.map(_.name).contains("inner"))
      }
      // inner finished → outer is active again; tags land on outer
      assert(mem.activeSpan.map(_.name).contains("outer"))
      mem.setTag("after-inner", "yes")
    }
    assert(mem.activeSpan.isEmpty)
    val outer = mem.finishedSpans.find(_.name == "outer").get
    assert(outer.getTag("after-inner").contains("yes"))

    val ui = new Tracing.SparkUi(spark)
    val o = ui.start("outer-ui", "o")
    val i = ui.start("inner-ui", "i")
    assert(spark.sparkContext.getLocalProperty("spark.jobGroup.id")
      === "inner-ui")
    ui.finish(i)
    // parent's attribution restored, not cleared
    assert(spark.sparkContext.getLocalProperty("spark.jobGroup.id")
      === "outer-ui")
    assert(ui.activeSpan.contains(o))
    ui.finish(o)
    assert(spark.sparkContext.getLocalProperty("spark.jobGroup.id") === null)
  }

  test("SparkUi tracer maps spans onto job groups/descriptions") {
    val tracer = new Tracing.SparkUi(spark)
    val span = tracer.start("graft-sweep", "outbox")
    try {
      // every job launched inside the span carries its group id
      assert(spark.sparkContext.getLocalProperty("spark.jobGroup.id")
        === "graft-sweep")
      assert(spark.sparkContext.getLocalProperty("spark.job.description")
        === "graft-sweep [outbox]")
      assert(tracer.activeSpan.contains(span))
    } finally tracer.finish(span)
    assert(spark.sparkContext.getLocalProperty("spark.jobGroup.id") === null)
    assert(tracer.activeSpan.isEmpty)
  }
}
