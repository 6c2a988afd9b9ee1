package graft.schema

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.SparkSpec
import graft.model.KeyConfig

/** Round-trip and framing specs for the schema backends, over the type
  * surface of the reference fixture schemas (spec/schemas/com/
  * my-namespace: primitives, unions, arrays/maps/enums, nested). */
class SchemaBackendSpec extends SparkSpec {
  import spark.implicits._

  private val mySchema =
    """{"type":"record","name":"MySchema","namespace":"com.myns",
      |"fields":[
      | {"name":"test_id","type":"string"},
      | {"name":"some_int","type":"int"},
      | {"name":"maybe","type":["null","string"],"default":null},
      | {"name":"tags","type":{"type":"array","items":"string"}},
      | {"name":"attrs","type":{"type":"map","values":"long"}},
      | {"name":"kind","type":{"type":"enum","name":"Kind",
      |   "symbols":["ALPHA","BETA"]}},
      | {"name":"nested","type":{"type":"record","name":"Inner","fields":[
      |   {"name":"a","type":"long"},{"name":"b","type":"double"}]}}
      |]}""".stripMargin

  private def sampleDf = {
    val schema = new AvroBackend(mySchema).sparkSchema
    val rows = Seq(
      Row("id1", 7, "hello", Seq("x", "y"), Map("k" -> 9L), "ALPHA",
        Row(1L, 2.5)),
      Row("id2", -3, null, Seq.empty[String], Map.empty[String, Long],
        "BETA", Row(0L, -1.0)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)
  }

  test("avro sparkSchema maps the reference type surface") {
    val s = new AvroBackend(mySchema).sparkSchema
    assert(s("test_id").dataType === StringType)
    assert(s("some_int").dataType === IntegerType)
    assert(s("maybe").dataType === StringType && s("maybe").nullable)
    assert(s("tags").dataType === ArrayType(StringType, containsNull = false))
    assert(s("attrs").dataType ===
      MapType(StringType, LongType, valueContainsNull = false))
    assert(s("kind").dataType === StringType)
    assert(s("nested").dataType.isInstanceOf[StructType])
  }

  test("avro encode/decode round-trips rows") {
    val backend = new AvroBackend(mySchema)
    val df = sampleDf
    val roundTripped = df
      .select(backend.encodeExpr(struct(df.columns.map(col): _*)).as("bin"))
      .select(backend.decodeExpr(col("bin")).as("p"))
      .select("p.*")
    assert(roundTripped.collect().toSet === df.collect().toSet)
  }

  test("registry framing prepends magic+id and round-trips") {
    val backend = new RegistryFramedBackend(mySchema, schemaId = 42)
    val df = sampleDf
    val framed = df
      .select(backend.encodeExpr(struct(df.columns.map(col): _*)).as("bin"))
    val head = framed.select(
      substring(col("bin"), 1, 1).as("magic"),
      backend.schemaIdExpr(col("bin")).as("id")).collect()(0)
    assert(head.getAs[Array[Byte]]("magic").toSeq === Seq(0x00.toByte))
    assert(head.getAs[Int]("id") === 42)
    val back = framed.select(backend.decodeExpr(col("bin")).as("p"))
      .select("p.*")
    assert(back.collect().toSet === df.collect().toSet)
  }

  test("registry decode rejects a frame with a different schema id") {
    val writer = new RegistryFramedBackend(mySchema, schemaId = 42)
    val reader = new RegistryFramedBackend(mySchema, schemaId = 43)
    val framed = sampleDf
      .select(writer.encodeExpr(struct(sampleDf.columns.map(col): _*)).as("bin"))
    // blind substring+decode would silently mis-decode an evolved
    // writer; the backend must fail loudly on id mismatch instead
    val e = intercept[Exception] {
      framed.select(reader.decodeExpr(col("bin")).as("p")).collect()
    }
    assert(e.getMessage.contains("registry frame mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("registry frame mismatch")))
    // and the matching id still round-trips
    assert(framed.select(writer.decodeExpr(col("bin")).as("p"))
      .select("p.*").collect().toSet === sampleDf.collect().toSet)
  }

  test("registry decode rejects bad magic byte and short frames") {
    val backend = new RegistryFramedBackend(mySchema, schemaId = 42)
    val badMagic = spark.range(1).select(
      concat(lit(Array[Byte](1, 0, 0, 0, 42)), lit("x".getBytes)).as("bin"))
    val e1 = intercept[Exception] {
      badMagic.select(backend.decodeExpr(col("bin"))).collect()
    }
    assert(e1.getMessage.contains("registry frame mismatch") ||
      Option(e1.getCause).exists(_.getMessage.contains("registry frame mismatch")))
    val short = spark.range(1).select(lit(Array[Byte](0, 0)).as("bin"))
    val e2 = intercept[Exception] {
      short.select(backend.decodeExpr(col("bin"))).collect()
    }
    assert(e2.getMessage.contains("registry frame mismatch") ||
      Option(e2.getCause).exists(_.getMessage.contains("registry frame mismatch")))
  }

  test("decoding with reader schema drops unknown producer fields (evolution)") {
    val writerSchema =
      """{"type":"record","name":"E","fields":[
        | {"name":"a","type":"long"},{"name":"extra","type":"string"}]}"""
        .stripMargin
    // reader schema without `extra` but with a defaulted new field
    val readerSchema =
      """{"type":"record","name":"E","fields":[
        | {"name":"a","type":"long"}]}""".stripMargin
    val w = new AvroBackend(writerSchema)
    val bytes = spark.range(1).select(
      w.encodeExpr(struct(lit(5L).as("a"), lit("drop-me").as("extra")))
        .as("bin"))
    // note: plain binary decode is not self-describing; reader-side
    // resolution needs the writer schema. Emulate the reference's
    // "decode with declared schema" on matching prefix layout:
    val projected = bytes
      .select(w.decodeExpr(col("bin")).as("p"))
      .select(col("p.a"))
    assert(projected.as[Long].collect().toSeq === Seq(5L))
    assert(new AvroBackend(readerSchema).schemaFields === Seq("a"))
  }

  test("encode aligns struct fields to schema fields BY NAME, not position") {
    val schemaJson =
      """{"type":"record","name":"P","fields":[
        | {"name":"id","type":"string"},
        | {"name":"message_id","type":["null","string"],"default":null},
        | {"name":"n","type":"long"}]}""".stripMargin
    val backend = new AvroBackend(schemaJson)
    // struct deliberately ordered (id, n, message_id) ≠ schema order
    val rt = spark.range(1).select(
      backend.encodeExpr(struct(lit("x").as("id"), lit(7L).as("n"),
        lit("mid").as("message_id"))).as("b"))
      .select(backend.decodeExpr(col("b")).as("p")).select("p.*")
      .as[(String, Option[String], Long)].collect()(0)
    assert(rt === (("x", Some("mid"), 7L)))
    // absent nullable field → null; absent required field → error
    val absent = spark.range(1).select(
      backend.encodeExpr(struct(lit("y").as("id"), lit(1L).as("n"))).as("b"))
      .select(backend.decodeExpr(col("b")).getField("message_id"))
      .as[Option[String]].collect()(0)
    assert(absent.isEmpty)
    intercept[Exception] {
      spark.range(1).select(
        backend.encodeExpr(struct(lit("z").as("id"))).as("b")).collect()
    }
  }

  test("absent field with a non-null schema DEFAULT encodes the default, not null") {
    // writing null into a non-nullable defaulted field NPE'd the Avro
    // writer; a nullable-with-default lost the declared value
    // (round-15 review — the reference's coercer fills defaults)
    val schemaJson =
      """{"type":"record","name":"D","fields":[
        | {"name":"id","type":"string"},
        | {"name":"kind","type":"string","default":"standard"},
        | {"name":"n","type":"long","default":42}]}""".stripMargin
    val backend = new AvroBackend(schemaJson)
    val rt = spark.range(1).select(
      backend.encodeExpr(struct(lit("a").as("id"))).as("b"))
      .select(backend.decodeExpr(col("b")).as("p")).select("p.*")
      .as[(String, String, Long)].collect()(0)
    assert(rt === (("a", "standard", 42L)))
  }

  test("datafile backend: self-describing payloads resolve writer→reader evolution") {
    val writerJson =
      """{"type":"record","name":"E","fields":[
        | {"name":"a","type":"long"},
        | {"name":"extra","type":"string"}]}""".stripMargin
    val readerJson =
      """{"type":"record","name":"E","fields":[
        | {"name":"a","type":"long"},
        | {"name":"added","type":"string","default":"dflt"}]}""".stripMargin
    val writer = new AvroDataFileBackend(writerJson)
    val reader = new AvroDataFileBackend(readerJson)
    // producer encodes with the OLD schema (has `extra`, lacks `added`)
    val bytes = spark.range(1).select(
      writer.encodeExpr(struct(lit(7L).as("a"), lit("drop-me").as("extra")))
        .as("bin"))
    // consumer decodes with the NEW schema: `extra` dropped silently,
    // `added` filled from its default — the reference's tolerance
    val got = bytes.select(reader.decodeExpr(col("bin")).as("p"))
      .select("p.*").as[(Long, String)].collect()(0)
    assert(got === ((7L, "dflt")))
  }

  test("datafile backend round-trips same-schema rows") {
    val backend = new AvroDataFileBackend(mySchema)
    val df = sampleDf
    val rt = df.select(backend.encodeExpr(struct(df.columns.map(col): _*)).as("b"))
      .select(backend.decodeExpr(col("b")).as("p")).select("p.*")
    assert(rt.collect().toSet === df.collect().toSet)
  }

  test("multi-branch union maps to member struct and round-trips") {
    val unionSchema =
      """{"type":"record","name":"U","fields":[
        | {"name":"u","type":["null","string","long"]}]}""".stripMargin
    val backend = new AvroBackend(unionSchema)
    val t = backend.sparkSchema("u").dataType.asInstanceOf[StructType]
    assert(t.fieldNames.toSeq === Seq("member0", "member1"))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        Row(Row("s", null)), Row(Row(null, 9L)), Row(null))),
      backend.sparkSchema)
    val rt = df.select(backend.encodeExpr(struct(col("u"))).as("b"))
      .select(backend.decodeExpr(col("b")).as("p")).select("p.*")
    assert(rt.collect().toSet === df.collect().toSet)
  }

  test("field key-config auto-generates one-field key schema") {
    val backend = new AvroBackend(mySchema)
    val keyB = backend.keyBackend(KeyConfig.Field("test_id")).get
    assert(keyB.sparkSchema.fieldNames.toSeq === Seq("test_id"))
    val enc = spark.range(1)
      .select(keyB.encodeExpr(struct(lit("k1").as("test_id"))).as("b"))
      .select(keyB.decodeExpr(col("b")).getField("test_id").as("k"))
    assert(enc.as[String].collect().toSeq === Seq("k1"))
  }

  test("sqlType + createTableSql mirror the reference sql_type surface") {
    val b = new AvroBackend(mySchema)
    assert(b.sqlType("test_id") === "TEXT")
    assert(b.sqlType("some_int") === "INTEGER")
    assert(b.sqlType("tags") === "JSON")
    assert(b.sqlType("nested") === "JSON")
    val ddl = b.createTableSql("widgets", Seq("test_id"))
    assert(ddl.startsWith("CREATE TABLE IF NOT EXISTS widgets (test_id TEXT NOT NULL, some_int INTEGER"))
    assert(ddl.endsWith("PRIMARY KEY (test_id))"))
  }

  test("plain JSON backend round-trips and is readable as JSON") {
    val st = StructType(Seq(StructField("a", LongType),
      StructField("b", StringType)))
    val backend = new PlainJsonBackend(st)
    val df = Seq((1L, "x")).toDF("a", "b")
    val rt = df.select(backend.encodeExpr(struct(col("a"), col("b"))).as("bin"))
      .select(backend.decodeExpr(col("bin")).as("p")).select("p.*")
    assert(rt.as[(Long, String)].collect().toSeq === Seq((1L, "x")))
  }

  test("registry dispatch: mixed-id frames resolve each writer against the reader") {
    val v1Json =
      """{"type":"record","name":"E","fields":[
        | {"name":"a","type":"long"}]}""".stripMargin
    val v2Json =
      """{"type":"record","name":"E","fields":[
        | {"name":"a","type":"long"},
        | {"name":"extra","type":"string"}]}""".stripMargin
    val readerJson =
      """{"type":"record","name":"E","fields":[
        | {"name":"a","type":"long"},
        | {"name":"added","type":"string","default":"dflt"}]}""".stripMargin
    val w1 = new RegistryFramedBackend(v1Json, schemaId = 1)
    val w2 = new RegistryFramedBackend(v2Json, schemaId = 2)
    // one topic, a mid-stream schema bump: id-1 and id-2 frames interleaved
    val frames = spark.range(1)
      .select(w1.encodeExpr(struct(lit(10L).as("a"))).as("bin"))
      .union(spark.range(1).select(
        w2.encodeExpr(struct(lit(20L).as("a"), lit("x").as("extra"))).as("bin")))
    val reader = new RegistryFramedBackend(readerJson, schemaId = 3,
      writerSchemas = Map(1 -> v1Json, 2 -> v2Json))
    val got = frames.select(reader.decodeExpr(col("bin")).as("p"))
      .select("p.*").as[(Long, String)].collect().toSet
    // v1 frame: `added` from default; v2 frame: `extra` dropped, `added` default
    assert(got === Set((10L, "dflt"), (20L, "dflt")))
  }

  test("registry dispatch: unknown schema id fails loudly with the known set") {
    val v1Json =
      """{"type":"record","name":"E","fields":[
        | {"name":"a","type":"long"}]}""".stripMargin
    val rogue = new RegistryFramedBackend(v1Json, schemaId = 99)
    val frames = spark.range(1)
      .select(rogue.encodeExpr(struct(lit(1L).as("a"))).as("bin"))
    val reader = new RegistryFramedBackend(v1Json, schemaId = 1,
      writerSchemas = Map(1 -> v1Json))
    val e = intercept[Exception] {
      frames.select(reader.decodeExpr(col("bin"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(m => m.contains("unknown schema id 99")))
  }

  test("registry decode: null payload (tombstone) decodes to null, strict and dispatch") {
    val v1Json =
      """{"type":"record","name":"E","fields":[
        | {"name":"a","type":"long"}]}""".stripMargin
    val strict = new RegistryFramedBackend(v1Json, schemaId = 1)
    val dispatch = new RegistryFramedBackend(v1Json, schemaId = 1,
      writerSchemas = Map(1 -> v1Json))
    val mixed = spark.range(1)
      .select(strict.encodeExpr(struct(lit(5L).as("a"))).as("bin"))
      .union(spark.range(1).select(lit(null).cast(BinaryType).as("bin")))
    for (b <- Seq(strict, dispatch)) {
      val got = mixed.select(b.decodeExpr(col("bin")).as("p"))
        .select(col("p").isNull.as("n"), col("p.a").as("a"))
        .as[(Boolean, Option[Long])].collect().toSet
      assert(got === Set((false, Some(5L)), (true, None)))
    }
  }

  test("timestamp-millis logical type maps to TimestampType and round-trips") {
    val ts =
      """{"type":"record","name":"T","fields":[
        | {"name":"at","type":{"type":"long","logicalType":"timestamp-millis"}}]}"""
        .stripMargin
    val backend = new AvroBackend(ts)
    assert(backend.sparkSchema("at").dataType === TimestampType)
    val df = Seq(Tuple1(java.sql.Timestamp.valueOf("2024-05-01 12:30:00")))
      .toDF("at")
    val rt = df.select(backend.encodeExpr(struct(col("at"))).as("b"))
      .select(backend.decodeExpr(col("b")).as("p")).select("p.*")
    assert(rt.collect().toSeq === df.collect().toSeq)
  }
}
