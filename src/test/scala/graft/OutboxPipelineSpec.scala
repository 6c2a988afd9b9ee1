package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.{KeyConfig, TopicConfig}
import graft.outbox.OutboxRunner
import graft.produce.Producer
import graft.schema.PlainJsonBackend
import graft.testkit.TestKit

/** §3.1 outbox path end-to-end: produce chain → staged outbox →
  * ordered drain → capturing sink, with decode-level assertions —
  * the reference's DATABASE_BACKEND flow in one test. */
class OutboxPipelineSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("wid", StringType), StructField("n", LongType),
    StructField("message_id", StringType),
    StructField("timestamp", StringType)))
  private val backend = new PlainJsonBackend(schema)

  test("produce → stage → drain → capture, ordered per topic") {
    val cfg = TopicConfig("widgets", "W", keyConfig = KeyConfig.NoKey)
    val attrs = Seq(("w1", 1L), ("w2", 2L), ("w1", 3L)).toDF("wid", "n")
      .withColumn("message_id", lit("m")).withColumn("timestamp", lit("t"))
    val (frame, _) = Producer.produceFrame(attrs, cfg, backend)
    // stage with a monotonic outbox id (the reference's auto-increment)
    val staged = frame.withColumn("id",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("value"))).cast("long"))
      .withColumn("created_at", lit(java.sql.Timestamp.valueOf(
        "2024-01-01 00:00:00")))
    val runner = new OutboxRunner(spark,
      java.nio.file.Files.createTempDirectory("graft-obp")
        .resolve("staging").toString)
    runner.stage(staged)
    val sink = new TestKit.CapturingSink(backend)
    val drained = runner.sweep()(df => sink.publish(df))
    assert(drained === 3)
    assert(sink.sent.size === 3)
    assert(sink.hasSent("widgets", Map("wid" -> "w1", "n" -> 1L)))
    assert(sink.hasSent("widgets", Map("wid" -> "w2", "n" -> 2L)))
    // staging fully drained; a second sweep is a no-op
    assert(runner.staged.count() === 0)
    assert(runner.sweep()(_ => fail("empty")) === 0)
  }
}
