package graft.schema

import org.scalatest.funsuite.AnyFunSuite

/** Generator parity with the reference's schema-class generator
  * (`schema_class_generator.rb` + snapshot specs): records become case
  * classes, enums become enumerations, nested types are discovered
  * recursively, key classes derive from the generated key schema. */
class SchemaClassGenSpec extends AnyFunSuite {

  private val schema =
    """{"type":"record","name":"Order","namespace":"com.example.orders",
      | "doc":"An order event.",
      | "fields":[
      |  {"name":"order_id","type":"long"},
      |  {"name":"status","type":{"type":"enum","name":"Status",
      |    "symbols":["OPEN","SHIPPED","CANCELLED"]}},
      |  {"name":"note","type":["null","string"],"default":null},
      |  {"name":"tags","type":{"type":"array","items":"string"}},
      |  {"name":"attrs","type":{"type":"map","values":"long"}},
      |  {"name":"item","type":{"type":"record","name":"Item","fields":[
      |    {"name":"sku","type":"string"},
      |    {"name":"qty","type":"int","default":1}]}},
      |  {"name":"type","type":"string"},
      |  {"name":"message_id","type":["null","string"],"default":null},
      |  {"name":"timestamp","type":["null","string"],"default":null}
      |]}""".stripMargin

  test("discovers main record, nested record and enum; main first") {
    val classes = SchemaClassGen.generate(schema)
    assert(classes.map(_._1) === Seq("Order", "Status", "Item"))
  }

  test("record source: case class with Option defaults, keyword escape, schema constant") {
    val src = SchemaClassGen.generate(schema).head._2
    assert(src.contains("package com.example.orders"))
    assert(src.contains("/** An order event. */"))
    assert(src.contains("final case class Order("))
    assert(src.contains("  order_id: Long"))
    assert(src.contains("  status: Status.Value"))
    assert(src.contains("  note: Option[String] = None"))
    assert(src.contains("  tags: Seq[String]"))
    assert(src.contains("  attrs: Map[String, Long]"))
    assert(src.contains("  item: Item"))
    assert(src.contains("  `type`: String"))
    // message_id/timestamp stay fillable by the pipeline (P5), but the
    // nullable union still defaults to None so literals can omit them
    assert(src.contains("  message_id: Option[String] = None"))
    assert(src.contains("val SchemaJson: String"))
  }

  test("nested record keeps its own defaults") {
    val item = SchemaClassGen.generate(schema)
      .find(_._1 == "Item").get._2
    assert(item.contains("  sku: String"))
    assert(item.contains("  qty: Int = 1"))
  }

  test("enum source enumerates the declared symbols") {
    val status = SchemaClassGen.generate(schema)
      .find(_._1 == "Status").get._2
    assert(status.contains("object Status extends Enumeration"))
    assert(status.contains("""val OPEN: Value = Value("OPEN")"""))
    assert(status.contains("""val CANCELLED: Value = Value("CANCELLED")"""))
  }

  test("multi-branch union maps to the member-struct tuple convention") {
    val s =
      """{"type":"record","name":"U","namespace":"g.t","fields":[
        | {"name":"v","type":["long","string"]},
        | {"name":"ov","type":["null","long","string"],"default":null}]}"""
        .stripMargin
    val src = SchemaClassGen.generate(s).head._2
    // matches AvroConverters.toSparkType's member0/member1 struct:
    // exactly one Option is populated
    assert(src.contains("  v: (Option[Long], Option[String])"))
    assert(src.contains("  ov: Option[(Option[Long], Option[String])] = None"))
  }

  test("key class generates from the derived one-field key schema") {
    val backend = new AvroBackend(schema)
    val (name, src) = SchemaClassGen.generateKeyClass(backend, "order_id")
    assert(name === "Order_key")
    assert(src.contains("final case class Order_key("))
    assert(src.contains("  order_id: Long"))
  }

  test("same simple name in two namespaces fails loudly instead of silently dropping one") {
    val s =
      """{"type":"record","name":"Root","namespace":"g.t","fields":[
        | {"name":"x","type":{"type":"record","name":"Address",
        |   "namespace":"com.a","fields":[{"name":"a","type":"int"}]}},
        | {"name":"y","type":{"type":"record","name":"Address",
        |   "namespace":"com.b","fields":[{"name":"b","type":"string"}]}}
        |]}""".stripMargin
    val e = intercept[IllegalArgumentException] {
      SchemaClassGen.generate(s)
    }
    assert(e.getMessage.contains("com.a.Address"))
    assert(e.getMessage.contains("com.b.Address"))
  }

  test("writeTo emits one file per named type") {
    val dir = java.nio.file.Files.createTempDirectory("graft-gen")
    val files = SchemaClassGen.writeTo(dir, schema)
    assert(files.map(_.getFileName.toString).toSet ===
      Set("Order.scala", "Status.scala", "Item.scala"))
    val order = new String(java.nio.file.Files.readAllBytes(
      dir.resolve("Order.scala")), "UTF-8")
    assert(order.contains("final case class Order("))
  }

  test("writeMigration emits the CREATE TABLE file from the value schema") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mig")
    val backend = new AvroBackend(
      """{"type":"record","name":"Widget","fields":[
        | {"name":"wid","type":"string"},
        | {"name":"amount","type":"long"},
        | {"name":"note","type":["null","string"],"default":null}
        |]}""".stripMargin)
    val p = SchemaClassGen.writeMigration(dir, backend, "widgets",
      keyCols = Seq("wid"), version = 3)
    assert(p.getFileName.toString === "V003__create_widgets.sql")
    val sql = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
    assert(sql ===
      "CREATE TABLE IF NOT EXISTS widgets (wid TEXT NOT NULL, " +
        "amount BIGINT, note TEXT, PRIMARY KEY (wid));\n")
  }

  test("generated source for a self-contained record parses as the expected snapshot") {
    val tiny =
      """{"type":"record","name":"Ping","namespace":"g.t","fields":[
        | {"name":"id","type":"long"},
        | {"name":"tag","type":["null","string"],"default":null}]}"""
        .stripMargin
    val src = SchemaClassGen.generate(tiny).head._2
    val expectedHeader =
      """package g.t
        |
        |final case class Ping(
        |  id: Long,
        |  tag: Option[String] = None)
        |
        |object Ping {""".stripMargin
    assert(src.startsWith(expectedHeader))
  }
}
