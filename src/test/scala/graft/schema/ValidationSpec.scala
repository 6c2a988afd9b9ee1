package graft.schema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.operators.Pipeline

/** Backend `validate` surface (reference `base.rb:163-165`,
  * `avro_base.rb:85-89`: recursive, fail-on-extra-fields, aggregated
  * errors instead of first-failure encode exceptions). */
class ValidationSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("name", StringType, nullable = false),
    StructField("note", StringType, nullable = true),
    StructField("addr", StructType(Seq(
      StructField("city", StringType, nullable = false),
      StructField("zip", StringType, nullable = true))), nullable = true)))
  private val backend = new PlainJsonBackend(schema)

  test("valid payloads report an empty error array") {
    val df = Seq((1L, "a", Option("n"))).toDF("id", "name", "note")
    val actual = StructType(Seq("id", "name", "note").map(df.schema(_)))
    val errs = df.select(backend.validateExpr(
      struct(col("id"), col("name"), col("note")), actual).as("e"))
      .as[Seq[String]].collect()
    assert(errs.head === Seq.empty)
  }

  test("null in a required field is a per-row error; others stay valid") {
    val df = Seq((1L, Option("ok")), (2L, Option.empty[String]))
      .toDF("id", "name")
    // name arrives nullable from the frame but the schema requires it
    val actual = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val got = df.select(col("id"), backend.validateExpr(
      struct(col("id"), col("name")), actual).as("e"))
      .as[(Long, Seq[String])].collect().toMap
    assert(got(1L) === Seq.empty)
    assert(got(2L) === Seq("name: null for required field"))
  }

  test("missing required field and extra field are structural errors on every row") {
    val df = Seq((1L, "x")).toDF("id", "bogus")
    val actual = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("bogus", StringType)))
    val errs = df.select(backend.validateExpr(
      struct(col("id"), col("bogus")), actual).as("e"))
      .as[Seq[String]].collect().head
    assert(errs.contains("name: missing required field"))
    assert(errs.contains("bogus: field not in schema"))
  }

  test("un-coercible type aggregates with other errors (not first-failure)") {
    val df = Seq(("not-a-long", Option.empty[String])).toDF("id", "name")
    val actual = StructType(Seq(
      StructField("id", StringType, nullable = false),
      StructField("name", StringType, nullable = true)))
    val errs = df.select(backend.validateExpr(
      struct(col("id"), col("name")), actual).as("e"))
      .as[Seq[String]].collect().head
    assert(errs.toSet === Set(
      "id: string not coercible to bigint",
      "name: null for required field"))
  }

  test("nested struct fields validate recursively with dotted paths") {
    val df = Seq((1L, "a", "c")).toDF("id", "name", "city")
      .select(col("id"), col("name"),
        struct(lit(null).cast("string").as("city"),
          lit("1").as("zip")).as("addr"))
    val actual = StructType(Seq(
      df.schema("id"), df.schema("name"), df.schema("addr")))
    val errs = df.select(backend.validateExpr(
      struct(col("id"), col("name"), col("addr")), actual).as("e"))
      .as[Seq[String]].collect().head
    assert(errs === Seq("addr.city: null for required field"))
  }

  test("struct elements inside containers validate structurally") {
    // array<struct<a:int>> into array<struct<b:string>> must be an
    // error, not a silent pass that later dies inside the encoder
    val arrayBackend = new PlainJsonBackend(StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("tags", ArrayType(StructType(Seq(
        StructField("b", StringType, nullable = false)))), nullable = true))))
    val df = Seq(1L).toDF("id")
      .withColumn("tags", array(struct(lit(7).as("a"))))
    val actual = StructType(Seq(df.schema("id"), df.schema("tags")))
    val errs = df.select(arrayBackend.validateExpr(
      struct(col("id"), col("tags")), actual).as("e"))
      .as[Seq[String]].collect().head
    assert(errs.exists(_.startsWith("tags: ")), s"expected tags error, got $errs")
    // and a compatible element shape passes
    val ok = df.select(col("id"),
      array(struct(lit("x").as("b"))).as("tags"))
    val okActual = StructType(Seq(ok.schema("id"), ok.schema("tags")))
    val okErrs = ok.select(arrayBackend.validateExpr(
      struct(col("id"), col("tags")), okActual).as("e"))
      .as[Seq[String]].collect().head
    assert(okErrs === Seq.empty)
  }

  test("integral widening is accepted (int payload into long slot)") {
    val df = Seq((1, "a")).toDF("id", "name")
    val actual = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType, nullable = false)))
    val errs = df.select(backend.validateExpr(
      struct(col("id"), col("name")), actual).as("e"))
      .as[Seq[String]].collect().head
    assert(errs === Seq.empty)
  }

  test("partitionSchemaValid routes invalid rows to the side output with errors") {
    val df = Seq(
      (1L, Option("a")), (2L, Option.empty[String]), (3L, Option("c")))
      .toDF("id", "name")
    val (valid, invalid) = Pipeline.partitionSchemaValid(df, backend)
    assert(valid.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    val bad = invalid.select(col("id"), col("validation_errors"))
      .as[(Long, Seq[String])].collect().toMap
    assert(bad.keySet === Set(2L))
    assert(bad(2L) === Seq("name: null for required field"))
  }

  test("Avro backend inherits the validate surface") {
    val avro = new AvroBackend(
      """{"type":"record","name":"V","fields":[
        | {"name":"a","type":"long"},
        | {"name":"b","type":["null","string"],"default":null}]}"""
        .stripMargin)
    val df = Seq((Option.empty[java.lang.Long], Option("x"))).toDF("a", "b")
    val actual = StructType(Seq(df.schema("a"), df.schema("b")))
    val errs = df.select(avro.validateExpr(
      struct(col("a"), col("b")), actual).as("e"))
      .as[Seq[String]].collect().head
    assert(errs === Seq("a: null for required field"))
  }
}
