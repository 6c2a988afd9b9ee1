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
    * decoded for assertion. */
  final case class Sent(topic: String, key: Option[String], payload: Option[Row])

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
      val decoded = frame.select(
        col(MessageCols.Topic),
        col(MessageCols.Key).cast("string").as("k"),
        when(col(MessageCols.Value).isNotNull,
          backend.decodeExpr(col(MessageCols.Value))).as("p"))
        .collect()
      buffer.synchronized {
        buffer ++= decoded.map(r => Sent(
          logicalTopic(r.getString(0)),
          Option(r.getString(1)),
          Option(r.getAs[Row]("p"))))
      }
    }

    def sent: Seq[Sent] = buffer.synchronized(buffer.toSeq)
    def clear(): Unit = buffer.synchronized(buffer.clear())

    /** `have_sent` analog: was a message with this topic + payload
      * field values produced? */
    def hasSent(topic: String, fields: Map[String, Any]): Boolean =
      sent.exists(s => s.topic == topic && s.payload.exists(p =>
        fields.forall { case (f, v) =>
          Option(p.getAs[Any](f)).map(_.toString) == Option(v).map(_.toString)
        }))
  }

  /** Drive a consumer with literal rows, the `test_consume_batch`
    * analog: build a Kafka-shaped frame from (offset, key, jsonValue)
    * triples (null json ⇒ tombstone). */
  def kafkaFrameOf(spark: org.apache.spark.sql.SparkSession,
      rows: Seq[(Long, String, String)]): DataFrame = {
    import spark.implicits._
    rows.toDF("offset", "k", "json").select(
      col("offset"),
      col("k").cast("binary").as(MessageCols.Key),
      col("json").cast("binary").as(MessageCols.Value))
  }
}
