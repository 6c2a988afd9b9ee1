package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.schema.{InMemoryRegistryTransport, SchemaRegistryClient}

/** The registry-resolved decode inside Structured Streaming: the
  * dispatching reader built by [[SchemaRegistryClient]] must
  * serialize into streaming tasks (schemas are baked as literals
  * into the codegen'd expression) and the registry must see ZERO
  * traffic after planning — the scale contract that makes the
  * client safe on a 1000-executor streaming job. */
class StreamRegistryDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val v1Json =
    """{"type":"record","name":"E","fields":[
      | {"name":"a","type":"long"}]}""".stripMargin
  private val v2Json =
    """{"type":"record","name":"E","fields":[
      | {"name":"a","type":"long"},
      | {"name":"extra","type":"string"}]}""".stripMargin
  private val readerJson =
    """{"type":"record","name":"E","fields":[
      | {"name":"a","type":"long"},
      | {"name":"extra","type":"string","default":"d"}]}""".stripMargin

  test("mixed-writer frames decode across micro-batches, zero registry traffic") {
    implicit val sqlCtx = spark.sqlContext
    val registry = new InMemoryRegistryTransport
    val producer = new SchemaRegistryClient(registry)
    val w1 = producer.framedBackend("s-value", v1Json)
    val w2 = producer.framedBackend("s-value", v2Json)
    def frame1(a: Long): Array[Byte] = spark.range(1)
      .select(w1.encodeExpr(struct(lit(a).as("a"))).as("bin"))
      .as[Array[Byte]].head()
    def frame2(a: Long, x: String): Array[Byte] = spark.range(1)
      .select(w2.encodeExpr(struct(lit(a).as("a"), lit(x).as("extra")))
        .as("bin"))
      .as[Array[Byte]].head()

    val consumer = new SchemaRegistryClient(registry)
    val reader = consumer.framedBackend("s-value", readerJson,
      writerIds = Seq(w1.schemaId, w2.schemaId))
    val fetchesAfterPlanning = registry.fetchCount

    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[Array[Byte]]
    val q = input.toDS()
      .select(reader.decodeExpr(col("value")).as("p"))
      .select("p.*")
      .writeStream.outputMode("append")
      .format("memory").queryName("reg_stream")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-regstream").toString)
      .start()
    try {
      input.addData(frame1(1L), frame2(2L, "x"))
      q.processAllAvailable()
      input.addData(frame2(3L, "y"), frame1(4L))
      q.processAllAvailable()
      val got = spark.table("reg_stream").as[(Long, String)].collect().toSet
      assert(got === Set((1L, "d"), (2L, "x"), (3L, "y"), (4L, "d")))
      // every id was resolved at plan time; micro-batches added nothing
      assert(registry.fetchCount === fetchesAfterPlanning)
    } finally q.stop()
  }
}
