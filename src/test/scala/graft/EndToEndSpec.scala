package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.consume.{BatchConsumer, ConsumerHooks}
import graft.model.{KeyConfig, TopicConfig}
import graft.schema.PlainJsonBackend

/** The q5 pipeline end-to-end through the STREAMING path on the real
  * driver testdata: file-stream the events table micro-batched through
  * the consumer, materialize into mutable state, assert the final
  * state equals the batch q5 result (SURVEY §7.2's minimum slice, but
  * through Structured Streaming). */
class EndToEndSpec extends SparkSpec {
  import spark.implicits._

  private val sfDir = "/root/testdata/sf0.001"

  test("streamed events materialize to the same state as batch q5") {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    // stage as ordered range files — the file-stream analog of a Kafka
    // partition replayed in offset order (one file per micro-batch)
    val staged = java.nio.file.Files.createTempDirectory("graft-e2e-src")
    spark.read.parquet(s"$sfDir/events.parquet")
      .repartitionByRange(4, col("event_id"))
      .write.mode("overwrite").parquet(staged.toString)
    val eventsSchema = spark.read.parquet(staged.toString).schema

    // kafka-shape the events: key=user_id, offset=event_id,
    // value=json payload, tombstone on event_type='error'
    val payloadType = StructType(Seq(
      StructField("event_type", StringType), StructField("value", DoubleType)))
    val backend = new PlainJsonBackend(payloadType)

    val stream = spark.readStream.schema(eventsSchema)
      .option("maxFilesPerTrigger", "1")
      .parquet(staged.toString)
      .select(
        col("event_id").as("offset"),
        col("user_id").cast("string").cast("binary").as("key"),
        when(col("event_type") =!= "error",
          to_json(struct(col("event_type"), col("value"))).cast("binary"))
          .as("value"))

    object Hooks extends ConsumerHooks {
      override def isTombstone: Column = col("payload").isNull
    }
    val consumer = new BatchConsumer(
      TopicConfig("events", "Event", keyConfig = KeyConfig.Plain("user_id")),
      backend, Hooks, keyCols = Seq("decoded_key"), orderCol = "offset")

    // version-guarded merge: apply a change only if its offset is newer
    // than what the table holds — the sink shape that stays correct
    // when micro-batches replay out of order (file source has no
    // cross-file order guarantee; Kafka partitions do, but a rebalance
    // can still interleave). Tombstones are versioned entries too.
    val state = scala.collection.mutable
      .Map[String, (Long, Option[(String, Double)])]()
    def applyIfNewer(k: String, off: Long, v: Option[(String, Double)]): Unit =
      if (state.get(k).forall(_._1 < off)) state(k) = (off, v)
    val q = consumer.stream(stream) { (up, del, _) =>
      up.select(col("decoded_key"), col("offset"),
        col("payload.event_type"), col("payload.value"))
        .collect().foreach(r => applyIfNewer(r.getString(0), r.getLong(1),
          Some((r.getString(2), r.getDouble(3)))))
      del.select(col("decoded_key"), col("offset")).collect()
        .foreach(r => applyIfNewer(r.getString(0), r.getLong(1), None))
    }.option("checkpointLocation",
      java.nio.file.Files.createTempDirectory("graft-e2e").toString)
      .start()
    try q.processAllAvailable() finally q.stop()
    val finalState = state.collect {
      case (k, (off, Some((et, v)))) => k -> ((off, et, v))
    }.toMap

    val want = SparkEntry.queries("q5_materialize")(spark, sfDir)
      .select(col("user_id").cast("string"), col("last_event_id"),
        col("event_type"), col("value"))
      .as[(String, Long, String, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(finalState === want)
  }

  test("non-fatal sink errors skip the batch; fatal ones fail the query") {
    implicit val sqlCtx = spark.sqlContext
    val payloadType = StructType(Seq(StructField("v", LongType)))
    val backend = new PlainJsonBackend(payloadType)
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, String)]
    val frame = input.toDF().toDF("offset", "k", "json").select(
      col("offset"), col("k").cast("binary").as("key"),
      col("json").cast("binary").as("value"))
    object SkippingHooks extends ConsumerHooks {
      override def isTombstone: Column = col("payload").isNull
      override def fatalError(e: Throwable): Boolean =
        !e.getMessage.contains("transient")
      var skipped = 0
      override def onError(e: Throwable, batchId: Long): Unit = skipped += 1
    }
    val consumer = new BatchConsumer(
      TopicConfig("t", "T", keyConfig = KeyConfig.Plain("user_id")), backend,
      SkippingHooks, Seq("decoded_key"), "offset")
    var fail = true
    val q = consumer.stream(frame) { (up, _, _) =>
      if (fail) throw new RuntimeException("transient broker hiccup")
      up.count()
      ()
    }.option("checkpointLocation",
      java.nio.file.Files.createTempDirectory("graft-err").toString).start()
    try {
      input.addData((1L, "A", """{"v":1}"""))
      q.processAllAvailable() // would throw if the error propagated
      assert(SkippingHooks.skipped === 1)
      fail = false
      input.addData((2L, "B", """{"v":2}"""))
      q.processAllAvailable()
    } finally q.stop()
  }
}
