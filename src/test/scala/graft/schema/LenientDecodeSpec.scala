package graft.schema

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Pipeline

/** Record-level lenient decode + dead-letter split: one poison frame
  * must quarantine, not kill the job; tombstones must stay on the
  * decoded side (they are protocol); the strict path must still
  * throw. Corruption shapes covered: truncated Avro body, wrong magic
  * byte, unknown schema id, arbitrary garbage. */
class LenientDecodeSpec extends SparkSpec {
  import spark.implicits._

  private val schemaJson =
    """{"type":"record","name":"E","fields":[
      | {"name":"a","type":"long"},
      | {"name":"s","type":"string"}]}""".stripMargin

  private def backend = new RegistryFramedBackend(schemaJson, schemaId = 7)

  private def goodFrame(a: Long, s: String): Array[Byte] = spark.range(1)
    .select(backend.encodeExpr(
      struct(lit(a).as("a"), lit(s).as("s"))).as("bin"))
    .as[Array[Byte]].head()

  private def corpus(): Seq[(Long, Array[Byte])] = {
    val good = goodFrame(1L, "ok")
    val truncated = good.dropRight(2)
    val badMagic = { val b = good.clone(); b(0) = 1.toByte; b }
    val unknownId = { val b = good.clone(); b(4) = 99.toByte; b }
    val garbage = Array[Byte](0, 0, 0, 0, 7, 127, -1, -1, -1, -1, -1)
    Seq(1L -> good, 2L -> truncated, 3L -> badMagic, 4L -> unknownId,
      5L -> garbage, 6L -> null, 7L -> goodFrame(7L, "also ok"))
  }

  test("lenient decode nulls every corruption shape, decodes the good rows") {
    val df = corpus().toDF("id", "bin")
    val out = df.select(col("id"),
      when(col("bin").isNotNull, backend.decodeLenientExpr(col("bin")))
        .as("p"))
      .select(col("id"), col("p.a").as("a"), col("p.s").as("s"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)), Option(r.get(2))))
      .toSet
    assert(out === Set(
      (1L, Some(1L), Some("ok")),
      (2L, None, None), (3L, None, None), (4L, None, None),
      (5L, None, None), (6L, None, None),
      (7L, Some(7L), Some("also ok"))))
  }

  test("partitionDecodable: tombstones decode-side, corruption quarantined with bytes") {
    val df = corpus().toDF("id", "bin")
    val (decoded, dead) = Pipeline.partitionDecodable(df, backend, col("bin"))
    assert(decoded.select("id").as[Long].collect().toSet === Set(1L, 6L, 7L))
    // tombstone: null payload, null bytes — protocol, not corruption
    assert(decoded.filter(col("id") === 6L)
      .select(col("payload").isNull && col("bin").isNull)
      .as[Boolean].head())
    val deadRows = dead.select("id", "bin")
      .as[(Long, Array[Byte])].collect().toMap
    assert(deadRows.keySet === Set(2L, 3L, 4L, 5L))
    // the DLQ carries the raw bytes for replay
    assert(deadRows(2L) sameElements goodFrame(1L, "ok").dropRight(2))
  }

  test("lenient decode equals strict decode on every valid frame") {
    // TryEval must only catch corruption — if it ever masked a decode
    // difference on VALID frames, poison-vs-good classification would
    // silently rot. 200 adversarial-ish payloads round-trip both ways.
    val rows = (0 until 200).map { i =>
      val s = i % 5 match {
        case 0 => ""                       // empty string
        case 1 => "plain " + i
        case 2 => "ünïcödé-世界-" + i
        case 3 => "\"quotes\" and \n newlines " + i
        case 4 => "x" * (i + 1)            // growing lengths
      }
      (i.toLong * 1000003L - 100L, s)      // negatives included
    }
    val df = rows.toDF("a", "s")
    val frames = df.select(backend.encodeExpr(
      struct(col("a"), col("s"))).as("bin"))
    val strict = frames.select(backend.decodeExpr(col("bin")).as("p"))
      .select("p.*").as[(Long, String)].collect().toSet
    val lenient = frames.select(backend.decodeLenientExpr(col("bin")).as("p"))
      .select("p.*").as[(Long, String)].collect().toSet
    assert(strict === rows.toSet)
    assert(lenient === strict)
  }

  test("the trait default covers the proto backend too") {
    import graft.schema.ProtoWire.{PString, ProtoField, ProtoMessage}
    val pb = new ProtoRegistryFramedBackend(
      ProtoMessage("E", Seq(ProtoField("s", 1, PString))), schemaId = 9)
    val good = spark.range(1)
      .select(pb.encodeExpr(struct(lit("ok").as("s"))).as("bin"))
      .as[Array[Byte]].head()
    val badMagic = { val b = good.clone(); b(0) = 1.toByte; b }
    val out = Seq(1L -> good, 2L -> badMagic).toDF("id", "bin")
      .select(col("id"), pb.decodeLenientExpr(col("bin")).as("p"))
      .select(col("id"), col("p.s").as("s"))
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toSet
    assert(out === Set((1L, Some("ok")), (2L, None)))
  }

  test("the strict path still throws on the same corruption") {
    val df = Seq(1L -> goodFrame(1L, "ok").dropRight(2)).toDF("id", "bin")
    // the truncated body surfaces as a task failure (an EOF-shaped
    // exception, often message-less) — the strictness is the throw
    // itself, in contrast to the lenient null above
    intercept[Exception] {
      df.select(backend.decodeExpr(col("bin"))).collect()
    }
  }
}
