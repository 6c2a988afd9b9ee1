package graft.observe

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Metrics/tracing facade (U7) + instrumentation event names (U8) —
  * the engine analog of the reference's pluggable providers
  * (`metrics/provider.rb`, `tracing/provider.rb`) and
  * `Karafka.monitor.instrument` events (`lib/deimos.rb:47-53`).
  */
trait Metrics extends Serializable {
  def count(metric: String, value: Long, tags: Map[String, String] = Map.empty): Unit
  def gauge(metric: String, value: Double, tags: Map[String, String] = Map.empty): Unit
  def timed[T](metric: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body finally gauge(metric, (System.nanoTime() - t0) / 1e6)
  }
}

object Metrics {
  /** Reference event names, kept verbatim minus the framework prefix
    * (reference fires: deimos.encode_message,
    * deimos.ar_consumer.consume_batch,
    * deimos.batch_consumption.valid_records / invalid_records,
    * deimos.outbox.produce). */
  val EncodeMessage = "graft.encode_message"
  val ConsumeBatch = "graft.ar_consumer.consume_batch"
  val ValidRecords = "graft.batch_consumption.valid_records"
  val InvalidRecords = "graft.batch_consumption.invalid_records"
  val OutboxProduce = "graft.outbox.produce"
  /** Poison frames handed to the opt-in dead-letter sink (engine
    * addition — the reference has no per-record skip). */
  val DeadLetters = "graft.batch_consumption.dead_letters"
  val PendingCount = "graft.pending_db_messages_count"
  val PendingMaxWait = "graft.pending_db_messages_max_wait"

  val noop: Metrics = new Metrics {
    def count(m: String, v: Long, t: Map[String, String]): Unit = ()
    def gauge(m: String, v: Double, t: Map[String, String]): Unit = ()
  }

  /** In-memory provider (test backend, reference `Metrics::Mock`). */
  class InMemory extends Metrics {
    val counts = new ConcurrentHashMap[String, java.lang.Long]()
    val gauges = new ConcurrentHashMap[String, java.lang.Double]()
    def count(m: String, v: Long, t: Map[String, String]): Unit =
      counts.merge(m, v, (a, b) => a + b)
    def gauge(m: String, v: Double, t: Map[String, String]): Unit =
      gauges.put(m, v)
  }
}

object Observe {
  /** P14/A6-style observability without a second pass: attach named
    * aggregates to the frame; they surface in QueryExecution listeners
    * and StreamingQueryProgress.observedMetrics. */
  def counted(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))

  /** P14: shape a batch for payload logging per the topic's
    * `payload_log` style (reference `payload_log: :full/:keys/:count`,
    * karafka ext): `Full` passes the frame through, `Keys` projects
    * the key columns, `Count` reduces to one count row — so the
    * logging sink's volume is a per-topic decision, not a code change.
    */
  def payloadLogFrame(df: DataFrame, style: graft.model.PayloadLog,
      keyCols: Seq[String]): DataFrame = style match {
    case graft.model.PayloadLog.Full => df
    case graft.model.PayloadLog.Keys =>
      df.select(keyCols.map(org.apache.spark.sql.functions.col): _*)
    case graft.model.PayloadLog.Count =>
      df.agg(count(lit(1)).as("rows"))
    case graft.model.PayloadLog.Headers =>
      // reference :headers style (`logging.rb:84`): one headers hash
      // per message. Wire-shaped frames log the human map; a frame
      // with no headers column logs nulls (the reference maps
      // messages without headers to nil the same way).
      import graft.model.MessageCols
      import org.apache.spark.sql.functions.{lit => l}
      if (!df.columns.contains(MessageCols.Headers))
        df.select(l(null).cast("map<string,string>").as("payload_headers"))
      else df.select(MessageCols.headersAsMap(df).as("payload_headers"))
  }

  /** Consume-side metadata log shape (reference
    * `Logging.metadata_log_text`, `logging.rb:33-35`: the consumed
    * batch's metadata sliced to timestamp / offsets / partition /
    * topic / size, attached to every `*.consume_batch` log line —
    * `consume/batch_consumption.rb:38,53`). The batch analog over a
    * Kafka-shaped frame: one row per (topic, partition) with the
    * offset span, row count, and the slice's timestamp (the LATEST
    * message's, karafka batch-metadata semantics). One partial
    * aggregation over columns the Kafka scan already carries — no
    * second source pass, broadcastable output (≤ one row per
    * topic-partition). */
  def metadataLogFrame(df: DataFrame): DataFrame =
    df.groupBy(col("topic"), col("partition"))
      .agg(max(col("timestamp")).as("timestamp"),
        min(col("offset")).as("first_offset"),
        max(col("offset")).as("last_offset"),
        count(lit(1)).as("size"))

  /** StreamingQueryListener that forwards batch progress (rows/sec,
    * observed metrics) to a Metrics facade — the engine's
    * `producer_metrics_listener.rb` equivalent. */
  class MetricsListener(metrics: Metrics) extends StreamingQueryListener {
    override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
      metrics.count("graft.stream.rows", e.progress.numInputRows)
      metrics.gauge("graft.stream.rows_per_sec",
        e.progress.processedRowsPerSecond)
    }
  }
}
