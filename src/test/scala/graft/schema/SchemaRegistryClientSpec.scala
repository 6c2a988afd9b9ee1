package graft.schema

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The schema-registry client abstraction (reference:
  * `avro_schema_registry.rb:10-30` — encode/decode delegate to a
  * memoized registry client): register + fetch-by-id with a
  * per-client cache, and the decode-side id dispatch driven entirely
  * through the client instead of a caller-built Map. */
class SchemaRegistryClientSpec extends SparkSpec {
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
      | {"name":"added","type":"string","default":"dflt"}]}""".stripMargin

  test("register is idempotent and allocates per distinct schema") {
    val t = new InMemoryRegistryTransport
    val c = new SchemaRegistryClient(t)
    val id1 = c.register("topic-value", v1Json)
    val id2 = c.register("topic-value", v2Json)
    assert(id1 != id2)
    // same schema, same subject → cached, no transport call
    assert(c.register("topic-value", v1Json) == id1)
    assert(t.registerCount == 2)
    // same schema, DIFFERENT subject → transport call, but the
    // registry's global-id semantics return the existing id
    assert(c.register("other-value", v1Json) == id1)
    assert(t.registerCount == 3)
  }

  test("fetchById caches: N fetches, one transport hit; unknown id fails") {
    val t = new InMemoryRegistryTransport
    val c = new SchemaRegistryClient(t)
    val id = c.register("topic-value", v1Json)
    // register primes the id cache — the fetch below never hits the wire
    (1 to 5).foreach(_ => assert(c.fetchById(id) == v1Json))
    assert(t.fetchCount == 0)
    // a fresh client (cold cache) fetches once, then serves cached
    val c2 = new SchemaRegistryClient(t)
    (1 to 5).foreach(_ => assert(c2.fetchById(id) == v1Json))
    assert(t.fetchCount == 1)
    val e = intercept[IllegalArgumentException](c2.fetchById(404))
    assert(e.getMessage.contains("schema id 404 not found"))
  }

  test("decode dispatch driven through the client: mid-stream schema bump") {
    val t = new InMemoryRegistryTransport
    val producerClient = new SchemaRegistryClient(t)
    // two producer generations register their writer schemas
    val w1 = producerClient.framedBackend("topic-value", v1Json)
    val w2 = producerClient.framedBackend("topic-value", v2Json)
    val frames = spark.range(1)
      .select(w1.encodeExpr(struct(lit(10L).as("a"))).as("bin"))
      .union(spark.range(1).select(
        w2.encodeExpr(struct(lit(20L).as("a"), lit("x").as("extra"))).as("bin")))
    // the consumer, on a DIFFERENT client instance, resolves both
    // writer ids from the registry and reads the mixed stream
    val consumerClient = new SchemaRegistryClient(t)
    val observedIds = frames
      .select(graft.schema.AvroExpressions.schemaIdOf(col("bin")).as("id"))
      .as[Int].collect().toSeq.distinct.sorted
    val reader = consumerClient.framedBackend("topic-value", readerJson,
      writerIds = observedIds)
    val got = frames.select(reader.decodeExpr(col("bin")).as("p"))
      .select("p.*").as[(Long, String)].collect().toSet
    assert(got === Set((10L, "dflt"), (20L, "dflt")))
    // both writers resolved with ONE transport fetch each, despite the
    // bulk writerSchemas call also passing through fetchById
    assert(t.fetchCount == observedIds.size)
  }

  test("readerBackend decodes without ever writing to the registry") {
    val t = new InMemoryRegistryTransport
    val producerClient = new SchemaRegistryClient(t)
    val w1 = producerClient.framedBackend("topic-value", v1Json)
    val w2 = producerClient.framedBackend("topic-value", v2Json)
    val frames = spark.range(1)
      .select(w1.encodeExpr(struct(lit(10L).as("a"))).as("bin"))
      .union(spark.range(1).select(
        w2.encodeExpr(struct(lit(20L).as("a"), lit("x").as("extra"))).as("bin")))
    val registersBefore = t.registerCount
    // the pure-consumer path: a principal with READ-ONLY registry
    // ACLs resolves writers by id and decodes — zero register calls
    val consumer = new SchemaRegistryClient(t)
    val reader = consumer.readerBackend(readerJson,
      writerIds = Seq(w1.schemaId, w2.schemaId))
    val got = frames.select(reader.decodeExpr(col("bin")).as("p"))
      .select("p.*").as[(Long, String)].collect().toSet
    assert(got === Set((10L, "dflt"), (20L, "dflt")))
    assert(t.registerCount === registersBefore)
    assert(t.fetchCount === 2)
    val e = intercept[IllegalArgumentException](
      consumer.readerBackend(readerJson, Nil))
    assert(e.getMessage.contains("writer ids"))
    // encoding through the decode-only backend fails AT PLAN TIME:
    // it would frame reader-schema bytes under a writer's id
    val enc = intercept[UnsupportedOperationException](
      reader.encodeExpr(struct(lit(1L).as("a"))))
    assert(enc.getMessage.contains("decode-only"))
    intercept[UnsupportedOperationException](
      reader.encodeKeyExpr(struct(lit(1L).as("a"))))
  }

  test("frame from an unregistered writer fails loudly through the client") {
    val t = new InMemoryRegistryTransport
    val c = new SchemaRegistryClient(t)
    val rogue = new RegistryFramedBackend(v1Json, schemaId = 99)
    val frames = spark.range(1)
      .select(rogue.encodeExpr(struct(lit(1L).as("a"))).as("bin"))
    val reader = c.framedBackend("topic-value", v1Json,
      writerIds = Seq(c.register("topic-value", v1Json)))
    val e = intercept[Exception] {
      frames.select(reader.decodeExpr(col("bin"))).collect()
    }
    def msgs(x: Throwable): Seq[String] =
      Option(x).toSeq.flatMap(y => Option(y.getMessage).toSeq ++ msgs(y.getCause))
    assert(msgs(e).exists(_.contains("unknown schema id 99")))
  }

  test("writerSchemas bulk-resolves distinct ids once") {
    val t = new InMemoryRegistryTransport
    val pc = new SchemaRegistryClient(t)
    val id1 = pc.register("s", v1Json)
    val id2 = pc.register("s", v2Json)
    val cc = new SchemaRegistryClient(t)
    val m = cc.writerSchemas(Seq(id1, id2, id1, id2, id1))
    assert(m === Map(id1 -> v1Json, id2 -> v2Json))
    assert(t.fetchCount == 2)
  }
}
