package graft.schema

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec

/** Edge cases of the Avro codec beyond the main round-trips. */
class AvroEdgeCasesSpec extends SparkSpec {
  import spark.implicits._

  test("bytes fields round-trip binary payloads") {
    val schemaJson =
      """{"type":"record","name":"B","fields":[
        | {"name":"raw","type":"bytes"}]}""".stripMargin
    val backend = new AvroBackend(schemaJson)
    val payload = Array[Byte](0, 1, -1, 127, -128)
    val rt = spark.range(1)
      .select(backend.encodeExpr(struct(lit(payload).as("raw"))).as("b"))
      .select(backend.decodeExpr(col("b")).getField("raw"))
      .as[Array[Byte]].collect()(0)
    assert(rt.toSeq === payload.toSeq)
  }

  test("maps with nullable values round-trip nulls") {
    val schemaJson =
      """{"type":"record","name":"M","fields":[
        | {"name":"attrs","type":{"type":"map","values":["null","long"]}}]}"""
        .stripMargin
    val backend = new AvroBackend(schemaJson)
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Map("a" -> 1L, "b" -> null)))),
      backend.sparkSchema)
    val rt = df.select(backend.encodeExpr(struct(col("attrs"))).as("b"))
      .select(backend.decodeExpr(col("b")).getField("attrs"))
      .as[Map[String, Option[Long]]].collect()(0)
    assert(rt === Map("a" -> Some(1L), "b" -> None))
  }

  test("deeply nested records keep name alignment") {
    val schemaJson =
      """{"type":"record","name":"Outer","fields":[
        | {"name":"inner","type":{"type":"record","name":"Inner","fields":[
        |   {"name":"x","type":"long"},{"name":"y","type":"string"}]}}]}"""
        .stripMargin
    val backend = new AvroBackend(schemaJson)
    // inner struct built in (y, x) order — must land by name
    val rt = spark.range(1)
      .select(backend.encodeExpr(struct(
        struct(lit("why").as("y"), lit(5L).as("x")).as("inner"))).as("b"))
      .select(backend.decodeExpr(col("b")).as("p"))
      .select(col("p.inner.x"), col("p.inner.y"))
      .as[(Long, String)].collect()(0)
    assert(rt === ((5L, "why")))
  }

  test("absent nullable field with a non-null declared default encodes the default") {
    // round-16 advice: the isNullable arm used to shadow
    // hasDefaultValue, so ["string","null"] default "hello" encoded
    // null when the input struct lacked the field
    val schemaJson =
      """{"type":"record","name":"D","fields":[
        | {"name":"id","type":"long"},
        | {"name":"note","type":["string","null"],"default":"hello"},
        | {"name":"tag","type":["null","string"],"default":null}]}"""
        .stripMargin
    val backend = new AvroBackend(schemaJson)
    val rt = spark.range(1)
      .select(backend.encodeExpr(struct(lit(7L).as("id"))).as("b"))
      .select(backend.decodeExpr(col("b")).as("p"))
      .select(col("p.id"), col("p.note"), col("p.tag"))
      .as[(Long, Option[String], Option[String])].collect()(0)
    assert(rt === ((7L, Some("hello"), None)))
  }

  test("registry schema id survives framing for arbitrary ids") {
    Seq(0, 1, 255, 65536, Int.MaxValue).foreach { id =>
      val backend = new RegistryFramedBackend(
        """{"type":"record","name":"R","fields":[{"name":"v","type":"long"}]}""",
        schemaId = id)
      val got = spark.range(1)
        .select(backend.encodeExpr(struct(lit(1L).as("v"))).as("b"))
        .select(backend.schemaIdExpr(col("b")))
        .as[Int].collect()(0)
      assert(got === id)
    }
  }
}
