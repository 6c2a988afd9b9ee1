package graft.schema

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Golden-snapshot test for the schema-class generator — the engine's
  * analog of the reference's `spec/snapshots` suite (.snap files)
  * (`generators/deimos/schema_class_generator.rb` output pinned file
  * by file). Fixture schemas live in `src/test/resources/schemagen/`
  * and cover the same type surface as the reference's fixtures: flat
  * records with defaults + docs, nested records, arrays of records, a
  * multi-branch record union under a nullable union, map/bytes/fixed/
  * enum, a keyword-named field, and a hyphenated namespace (the
  * reference's `com.my-namespace` case — emitted backtick-quoted so
  * the file still compiles).
  *
  * Regenerate after an INTENTIONAL generator change with:
  * `GRAFT_REGEN_SNAPSHOTS=1 sbt "testOnly graft.schema.SchemaClassGenSnapshotSpec"`
  * and review the diff like any code change.
  */
class SchemaClassGenSnapshotSpec extends AnyFunSuite {

  private val fixtureDir = Paths.get("src/test/resources/schemagen")
  // goldens live in the TEST SOURCE tree: sbt compiles them on every
  // run, so the snapshot suite proves the generated code COMPILES
  // (package/backtick/default-value emission), not merely that the
  // generator's text is stable
  private val goldenDir = Paths.get("src/test/scala/schemagen_golden")
  private val regen = sys.env.contains("GRAFT_REGEN_SNAPSHOTS")

  private def fixtures: Seq[Path] =
    Files.list(fixtureDir).iterator.asScala
      .filter(_.toString.endsWith(".avsc")).toSeq.sortBy(_.toString)

  test("fixtures cover >=3 schemas including a nested union") {
    assert(fixtures.size >= 3)
    assert(fixtures.exists(_.getFileName.toString == "PaymentEvent.avsc"))
  }

  test("writeTo emits one compilable-named file per reachable type") {
    val out = Files.createTempDirectory("schemagen-out")
    val written = SchemaClassGen.writeTo(out,
      Files.readString(fixtureDir.resolve("PaymentEvent.avsc")))
    assert(written.map(_.getFileName.toString).toSet ===
      Set("PaymentEvent.scala", "CardPayment.scala", "BankTransfer.scala",
        "StoreCredit.scala"))
    written.foreach(p => assert(Files.size(p) > 0))
  }

  test("generated sources match the committed goldens byte-for-byte") {
    val mismatches = scala.collection.mutable.ArrayBuffer[String]()
    fixtures.foreach { f =>
      val schemaJson = Files.readString(f)
      SchemaClassGen.generate(schemaJson).foreach { case (name, src) =>
        val golden = goldenDir.resolve(s"$name.scala")
        if (regen) {
          Files.createDirectories(goldenDir)
          Files.writeString(golden, src)
        } else if (!Files.exists(golden)) {
          mismatches += s"$name: no golden file (run with GRAFT_REGEN_SNAPSHOTS=1)"
        } else {
          val want = Files.readString(golden)
          if (want != src)
            mismatches += s"$name: differs from golden\n--- golden\n$want\n--- generated\n$src"
        }
      }
    }
    assert(mismatches.isEmpty, mismatches.mkString("\n\n"))
  }

  test("goldens have no orphans: every golden is still generated") {
    if (!regen) {
      val generated = fixtures.flatMap(f =>
        SchemaClassGen.generate(Files.readString(f)).map(_._1 + ".scala"))
        .toSet
      val onDisk = Files.list(goldenDir).iterator.asScala
        .map(_.getFileName.toString).toSet
      assert(onDisk === generated)
    }
  }

  test("hyphenated namespaces emit backtick-quoted packages") {
    val srcs = SchemaClassGen.generate(
      Files.readString(fixtureDir.resolve("CatalogComplex.avsc"))).toMap
    assert(srcs("CatalogComplex").contains("package com.`acme-labs`.catalog"))
    // keyword-named field is backtick-quoted too
    assert(srcs("CatalogComplex").contains("`type`: ItemKind.Value"))
  }

  test("invalid simple names the lenient parser admits emit backticked, never bare") {
    // the lenient-name parser exists for hyphenated NAMESPACES, but it
    // also admits hyphenated record/field/enum-symbol names — those
    // must quote everywhere they appear or the emitted file won't
    // compile
    val srcs = SchemaClassGen.generate(
      """{"type":"record","name":"my-rec","namespace":"com.x","fields":[
        | {"name":"my-field","type":"string"},
        | {"name":"mode","type":{"type":"enum","name":"my-enum",
        |   "symbols":["on","class"]},"default":"class"},
        | {"name":"child","type":{"type":"record","name":"ok-child",
        |   "namespace":"com.x.sub","fields":[
        |     {"name":"v","type":"long"}]}}
        |]}""".stripMargin).toMap
    val rec = srcs("my-rec")
    assert(rec.contains("final case class `my-rec`("))
    assert(rec.contains("`my-field`: String"))
    assert(rec.contains("mode: `my-enum`.Value = `my-enum`.`class`"))
    // cross-namespace reference to a quoted name stays quoted
    assert(rec.contains("child: com.x.sub.`ok-child`"))
    assert(srcs("my-enum").contains("object `my-enum` extends Enumeration"))
    assert(srcs("my-enum").contains("val `class`: Value = Value(\"class\")"))
  }
}
