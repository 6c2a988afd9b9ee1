package graft.schema

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import ProtoWire._

/** Wire-format conformance pinned to the PUBLIC protobuf encoding
  * examples (golden bytes from the published wire-format docs), plus
  * round-trips through the Catalyst expressions — parity surface of
  * the reference's proto backend (`proto_local.rb:12-20`,
  * `proto_base.rb:9-26`). */
class ProtoSpec extends SparkSpec {
  import spark.implicits._

  private def hex(bytes: Array[Byte]): String =
    bytes.map(b => f"${b & 0xff}%02x").mkString(" ")

  test("golden bytes: int32 a=150 encodes as 08 96 01 (docs example)") {
    val m = ProtoMessage("Test1", Seq(ProtoField("a", 1, PInt32)))
    val df = Seq(Tuple1(150)).toDF("a")
    val bytes = df.select(ProtoExpressions.encodeProto(
      struct(col("a")), m).as("b")).as[Array[Byte]].collect().head
    assert(hex(bytes) === "08 96 01")
  }

  test("golden bytes: string b=\"testing\" encodes as 12 07 + utf8 (docs example)") {
    val m = ProtoMessage("Test2", Seq(ProtoField("b", 2, PString)))
    val df = Seq(Tuple1("testing")).toDF("b")
    val bytes = df.select(ProtoExpressions.encodeProto(
      struct(col("b")), m).as("x")).as[Array[Byte]].collect().head
    assert(hex(bytes) === "12 07 74 65 73 74 69 6e 67")
  }

  test("golden bytes: packed repeated int32 f=4 [3,270,86942] (docs example)") {
    val m = ProtoMessage("Test4",
      Seq(ProtoField("f", 4, PInt32, repeated = true)))
    val df = Seq(Tuple1(Seq(3, 270, 86942))).toDF("f")
    val bytes = df.select(ProtoExpressions.encodeProto(
      struct(col("f")), m).as("x")).as[Array[Byte]].collect().head
    assert(hex(bytes) === "22 06 03 8e 02 9e a7 05")
  }

  test("golden bytes: nested message c.a=150 encodes as 1a 03 08 96 01 (docs example)") {
    val inner = ProtoMessage("Test1", Seq(ProtoField("a", 1, PInt32)))
    val m = ProtoMessage("Test3",
      Seq(ProtoField("c", 3, PMessage(inner))))
    val df = Seq(Tuple1(150)).toDF("a")
    val bytes = df.select(ProtoExpressions.encodeProto(
      struct(struct(col("a")).as("c")), m).as("x"))
      .as[Array[Byte]].collect().head
    assert(hex(bytes) === "1a 03 08 96 01")
  }

  test("zigzag: sint32 -1→1, 1→2, -2→3; sint64 matches") {
    assert(zigzag32(0) === 0L)
    assert(zigzag32(-1) === 1L)
    assert(zigzag32(1) === 2L)
    assert(zigzag32(-2) === 3L)
    assert(zigzag32(2147483647) === 4294967294L)
    assert(zigzag32(-2147483648) === 4294967295L)
    assert(zigzag64(-1L) === 1L)
    assert(unzigzag(zigzag64(Long.MinValue)) === Long.MinValue)
    assert(unzigzag(zigzag64(Long.MaxValue)) === Long.MaxValue)
  }

  private val kitchenSink = ProtoMessage("Sink", Seq(
    ProtoField("i32", 1, PInt32), ProtoField("i64", 2, PInt64),
    ProtoField("si32", 3, PSInt32), ProtoField("si64", 4, PSInt64),
    ProtoField("u32", 5, PUInt32), ProtoField("u64", 6, PUInt64),
    ProtoField("f32", 7, PFixed32), ProtoField("f64", 8, PFixed64),
    ProtoField("sf32", 9, PSFixed32), ProtoField("sf64", 10, PSFixed64),
    ProtoField("b", 11, PBool), ProtoField("fl", 12, PFloat),
    ProtoField("db", 13, PDouble), ProtoField("s", 14, PString),
    ProtoField("by", 15, PBytes),
    ProtoField("tags", 16, PString, repeated = true),
    ProtoField("nums", 17, PSInt64, repeated = true)))

  test("kitchen-sink round-trip through encode→decode expressions") {
    val backend = new ProtoBackend(kitchenSink)
    val row = (
      -42, -7L, -1, -2L, 7, 9L, 100, 200L, -300, -400L,
      true, 1.5f, 2.25, "héllo", Array[Byte](1, 2, 3))
    val df = Seq(row).toDF("i32", "i64", "si32", "si64", "u32", "u64",
      "f32", "f64", "sf32", "sf64", "b", "fl", "db", "s", "by")
      .withColumn("tags", array(lit("x"), lit("y")))
      .withColumn("nums", array(lit(-5L), lit(0L), lit(5L)))
    val cols = kitchenSink.fields.map(f => col(f.name))
    val back = df
      .select(backend.encodeExpr(struct(cols: _*)).as("bin"))
      .select(backend.decodeExpr(col("bin")).as("p"))
      .select("p.*")
    val got = back.collect().head
    assert(got.getInt(0) === -42 && got.getLong(1) === -7L)
    assert(got.getInt(2) === -1 && got.getLong(3) === -2L)
    assert(got.getInt(4) === 7 && got.getLong(5) === 9L)
    assert(got.getInt(6) === 100 && got.getLong(7) === 200L)
    assert(got.getInt(8) === -300 && got.getLong(9) === -400L)
    assert(got.getBoolean(10) === true)
    assert(got.getFloat(11) === 1.5f && got.getDouble(12) === 2.25)
    assert(got.getString(13) === "héllo")
    assert(got.getAs[Array[Byte]](14).toSeq === Seq[Byte](1, 2, 3))
    assert(got.getSeq[String](15) === Seq("x", "y"))
    assert(got.getSeq[Long](16) === Seq(-5L, 0L, 5L))
  }

  test("proto3 defaults: nulls and zeros are omitted; absent decodes to defaults") {
    val m = ProtoMessage("D", Seq(
      ProtoField("a", 1, PInt64), ProtoField("s", 2, PString),
      ProtoField("b", 3, PBool),
      ProtoField("r", 4, PInt32, repeated = true)))
    val backend = new ProtoBackend(m)
    val df = spark.range(1).select(
      lit(null).cast("long").as("a"), lit("").as("s"),
      lit(false).as("b"), array().cast("array<int>").as("r"))
    val enc = df.select(backend.encodeExpr(
      struct(col("a"), col("s"), col("b"), col("r"))).as("bin"))
    assert(enc.as[Array[Byte]].collect().head.length === 0)
    val dec = enc.select(backend.decodeExpr(col("bin")).as("p")).select("p.*")
      .collect().head
    assert(dec.getLong(0) === 0L && dec.getString(1) === "")
    assert(dec.getBoolean(2) === false && dec.getSeq[Int](3) === Seq.empty)
  }

  test("decoder accepts UNPACKED repeated numerics and skips unknown fields") {
    // hand-built frame: field 1 (int32) twice unpacked [08 05, 08 07],
    // unknown field 9 (varint) + unknown field 10 (length-delimited)
    val m = ProtoMessage("U", Seq(
      ProtoField("r", 1, PInt32, repeated = true)))
    val frame = Array[Byte](
      0x08, 0x05, // r += 5 (unpacked)
      0x48, 0x63, // field 9 varint 99 — unknown, skip
      0x52, 0x02, 0x61, 0x62, // field 10 bytes "ab" — unknown, skip
      0x08, 0x07) // r += 7
    val got = ProtoWire.decode(frame, m)
    assert(got.getArray(0).toIntArray().toSeq === Seq(5, 7))
  }

  test("non-repeated field appearing twice: last value wins (proto3 rule)") {
    val m = ProtoMessage("L", Seq(ProtoField("a", 1, PInt32)))
    val frame = Array[Byte](0x08, 0x05, 0x08, 0x09)
    assert(ProtoWire.decode(frame, m).getInt(0) === 9)
  }

  test("proto key config: JSON-encoded key round-trips (proto_base.rb:58-66)") {
    val m = ProtoMessage("K", Seq(ProtoField("id", 1, PInt64)))
    val backend = new ProtoBackend(m)
    val df = Seq(Tuple1(77L)).toDF("id")
    val key = df.select(backend.encodeKeyExpr(struct(col("id"))).as("k"))
    assert(key.select(col("k").cast("string")).as[String].collect().head
      === """{"id":77}""")
    val back = key.select(backend.decodeKeyExpr(col("k")).as("p"))
      .select("p.*")
    assert(back.as[Long].collect().head === 77L)
  }

  test("sqlType mirrors the reference SQL_MAP surface") {
    val backend = new ProtoBackend(kitchenSink)
    assert(backend.sqlType("i32") === "INTEGER")
    assert(backend.sqlType("u64") === "BIGINT")
    assert(backend.sqlType("b") === "BOOLEAN")
    assert(backend.sqlType("s") === "TEXT")
    assert(backend.sqlType("by") === "TEXT")
    assert(backend.sqlType("fl") === "REAL")
    assert(backend.sqlType("tags") === "JSON")
  }

  test("mismatched wire type on a known field is skipped as unknown, not a desync") {
    // writer evolved field 1 from int32 to string; reader still declares
    // PInt32. Frame: field1="hi" (0a 02 68 69) + field2 int32=7 (10 07).
    // Decoding "hi" as a varint would desync and poison field 2; the
    // protobuf convention is treat-mismatched-wire-type-as-unknown.
    val m = ProtoMessage("M", Seq(
      ProtoField("a", 1, PInt32), ProtoField("b", 2, PInt32)))
    val frame = Array[Byte](0x0a, 0x02, 0x68, 0x69, 0x10, 0x07)
    val row = ProtoWire.decode(frame, m)
    assert(row.getInt(0) === 0) // mismatched field left at default
    assert(row.getInt(1) === 7) // following field decodes intact
    // repeated variant: declared repeated string, writer sent varint
    val mr = ProtoMessage("MR", Seq(
      ProtoField("s", 1, PString, repeated = true),
      ProtoField("b", 2, PInt32)))
    val frame2 = Array[Byte](0x08, 0x05, 0x10, 0x09) // f1 varint=5, f2=9
    val row2 = ProtoWire.decode(frame2, mr)
    assert(row2.getArray(0).numElements() === 0)
    assert(row2.getInt(1) === 9)
  }

  test("registry-framed proto validates the frame and round-trips") {
    val m = ProtoMessage("F", Seq(ProtoField("a", 1, PInt64)))
    val writer = new ProtoRegistryFramedBackend(m, schemaId = 7)
    val framed = Seq(Tuple1(5L)).toDF("a")
      .select(writer.encodeExpr(struct(col("a"))).as("bin"))
    assert(framed.select(writer.decodeExpr(col("bin")).as("p"))
      .select("p.*").as[Long].collect().head === 5L)
    val other = new ProtoRegistryFramedBackend(m, schemaId = 8)
    val e = intercept[Exception] {
      framed.select(other.decodeExpr(col("bin"))).collect()
    }
    assert(e.getMessage.contains("registry frame mismatch") ||
      Option(e.getCause).exists(_.getMessage.contains("registry frame mismatch")))
  }

  test("registry reader dispatches per-frame on the embedded writer id") {
    // v1 declares price as SINT64 (zigzag); v2 declares it INT64 and
    // adds a note field. A mid-stream schema bump means one column
    // carries both ids — the reader must decode each frame with its
    // OWN writer descriptor (reader-descriptor decode would misread
    // v1's zigzag bytes) and default the field v1 never wrote.
    val v1 = ProtoMessage("E", Seq(
      ProtoField("k", 1, PInt64), ProtoField("price", 2, PSInt64)))
    val v2 = ProtoMessage("E", Seq(
      ProtoField("k", 1, PInt64), ProtoField("price", 2, PInt64),
      ProtoField("note", 3, PString)))
    val w1 = new ProtoRegistryFramedBackend(v1, schemaId = 1)
    val w2 = new ProtoRegistryFramedBackend(v2, schemaId = 2)
    val reader = new ProtoRegistryFramedBackend(v2, schemaId = 2,
      writerMessages = Map(1 -> v1, 2 -> v2))
    val src = Seq((1L, -42L, "a"), (2L, 1000L, "b"), (3L, -7L, "c"))
      .toDF("k", "price", "note")
    val mixed = src.select(
      when(col("k") % 2 === 1,
        w1.encodeExpr(struct(col("k"), col("price"))))
        .otherwise(w2.encodeExpr(struct(col("k"), col("price"), col("note"))))
        .as("bin"))
    val got = mixed.select(reader.decodeExpr(col("bin")).as("p"))
      .select("p.*").as[(Long, Long, String)].collect().sortBy(_._1)
    // v1 frames: zigzag price survives resolution, note defaults to ""
    assert(got.toSeq === Seq((1L, -42L, ""), (2L, 1000L, "b"), (3L, -7L, "")))

    // null frames (tombstones) decode to null rows, not errors
    val withNull = mixed.unionByName(
      Seq(Tuple1(null: Array[Byte])).toDF("bin"))
    assert(withNull.select(reader.decodeExpr(col("bin")).as("p"))
      .filter(col("p").isNull).count() === 1L)

    // an id outside the map fails loudly, naming the id and known set
    val w9 = new ProtoRegistryFramedBackend(v1, schemaId = 9)
    val e = intercept[Exception] {
      src.select(w9.encodeExpr(struct(col("k"), col("price"))).as("bin"))
        .select(reader.decodeExpr(col("bin"))).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("unknown schema id 9"), msgs)
  }

  test("resolveRow converts representations and recurses into nested messages") {
    import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
    import org.apache.spark.unsafe.types.UTF8String
    val wInner = ProtoMessage("I", Seq(ProtoField("x", 1, PInt32)))
    val rInner = ProtoMessage("I", Seq(ProtoField("x", 1, PInt64)))
    val writer = ProtoMessage("W", Seq(
      ProtoField("a", 1, PInt32),            // widens to int64
      ProtoField("b", 2, PString),           // string → bytes
      ProtoField("c", 3, PBool),             // bool → int32
      ProtoField("d", 4, PMessage(wInner)),  // nested recursion
      ProtoField("e", 5, PInt32, repeated = true))) // repeated widen
    val reader = ProtoMessage("R", Seq(
      ProtoField("a", 1, PInt64),
      ProtoField("b", 2, PBytes),
      ProtoField("c", 3, PInt32),
      ProtoField("d", 4, PMessage(rInner)),
      ProtoField("e", 5, PInt64, repeated = true),
      ProtoField("f", 6, PString)))          // absent in writer → default
    val row = ProtoWire.resolveRow(
      new GenericInternalRow(Array[Any](7,
        UTF8String.fromString("hi"), true,
        new GenericInternalRow(Array[Any](3)),
        new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array[Any](1, 2)))),
      writer, reader)
    assert(row.getLong(0) === 7L)
    assert(row.getBinary(1).toSeq === "hi".getBytes("UTF-8").toSeq)
    assert(row.getInt(2) === 1)
    assert(row.getStruct(3, 1).getLong(0) === 3L)
    assert(row.getArray(4).toLongArray().toSeq === Seq(1L, 2L))
    assert(row.getUTF8String(5).toString === "")
  }

  test("key proto emission: field keeps its number, path is snake_cased") {
    val m = ProtoMessage("MyOrder", Seq(
      ProtoField("note", 1, PString),
      ProtoField("order_id", 3, PInt64)))
    val text = keyProtoText(m, "com.example.orders", "order_id")
    assert(text ===
      """syntax = "proto3";
        |package com.example.orders;
        |
        |message MyOrderKey {
        |  int64 order_id = 3;
        |}
        |""".stripMargin)
    val dir = java.nio.file.Files.createTempDirectory("graft-keyproto")
    val out = writeKeyProto(dir, m, "com.example.orders", "order_id")
    assert(out.endsWith(
      java.nio.file.Paths.get("com/example/orders/my_order_key.proto")))
    assert(new String(java.nio.file.Files.readAllBytes(out), "UTF-8")
      === text)
  }

  test("key proto emission fails loudly on bad key fields") {
    val nested = ProtoMessage("Inner", Seq(ProtoField("x", 1, PInt32)))
    val m = ProtoMessage("Outer", Seq(
      ProtoField("inner", 1, PMessage(nested)),
      ProtoField("tags", 2, PString, repeated = true)))
    intercept[IllegalArgumentException] {
      keyProtoText(m, "p", "inner") // message-typed
    }
    intercept[IllegalArgumentException] {
      keyProtoText(m, "p", "absent") // unknown field
    }
    // repeated scalar keys emit with the repeated label
    assert(keyProtoText(m, "p", "tags")
      .contains("repeated string tags = 2;"))
  }

  test("split embedded message occurrences MERGE (spec rule), scalars last-win") {
    // a conformant writer may split one nested message across two
    // length-delimited occurrences; the parser must merge them —
    // {a:5} then {b:7} yields {a:5, b:7}, not {a:0, b:7}
    val inner = ProtoMessage("In",
      Seq(ProtoField("a", 1, PInt32), ProtoField("b", 2, PInt32)))
    val m = ProtoMessage("Out", Seq(ProtoField("c", 3, PMessage(inner))))
    val frame = Array[Byte](
      0x1a, 0x02, 0x08, 0x05, // c += {a:5}
      0x1a, 0x02, 0x10, 0x07) // c += {b:7}
    val row = ProtoWire.decode(frame, m)
    val c = row.getStruct(0, 2)
    assert(c.getInt(0) === 5 && c.getInt(1) === 7)
    // within the merged payload, a repeated SCALAR occurrence still
    // last-wins: {a:5} ++ {a:9} -> a=9
    val frame2 = Array[Byte](0x1a, 0x02, 0x08, 0x05, 0x1a, 0x02, 0x08, 0x09)
    assert(ProtoWire.decode(frame2, m).getStruct(0, 2).getInt(0) === 9)
  }

  test("uint32 widening to a 64-bit reader zero-extends") {
    // writer uint32 carrying 3e9 (raw negative Int bits) must resolve
    // to 3000000000L for an int64 reader, not -1294967296L
    val w = ProtoMessage("W", Seq(ProtoField("v", 1, PUInt32)))
    val r = ProtoMessage("R", Seq(ProtoField("v", 1, PInt64)))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](3000000000L.toInt))
    assert(ProtoWire.resolveRow(row, w, r).getLong(0) === 3000000000L)
    // signed widening still sign-extends
    val ws = ProtoMessage("Ws", Seq(ProtoField("v", 1, PInt32)))
    val rowS = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](-5))
    assert(ProtoWire.resolveRow(rowS, ws, r).getLong(0) === -5L)
  }

  test("malformed frames fail loudly: out-of-range tag, oversized length") {
    val m = ProtoMessage("M", Seq(ProtoField("a", 1, PInt32)))
    // field number with bits above the 29-bit proto range: 5L << 38
    val bigTag = {
      val out = new java.io.ByteArrayOutputStream()
      ProtoWire.writeVarint(out, (5L << 38) | 0L)
      out.toByteArray
    }
    val e = intercept[IllegalArgumentException](ProtoWire.decode(bigTag, m))
    assert(e.getMessage.contains("malformed tag"))
    // 64-bit length that would truncate to a small positive Int
    val bigLen = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(0x0a) // field 1, wire type 2 (pretend bytes field)
      ProtoWire.writeVarint(out, 0x100000003L)
      out.write(1); out.write(2); out.write(3)
      out.toByteArray
    }
    val m2 = ProtoMessage("M2", Seq(ProtoField("a", 1, PBytes)))
    val e2 = intercept[IllegalArgumentException](ProtoWire.decode(bigLen, m2))
    assert(e2.getMessage.contains("truncated"))
  }

  test("null element in a repeated field fails with the field name") {
    val m = ProtoMessage("N",
      Seq(ProtoField("tags", 1, PString, repeated = true)))
    val df = Seq(Tuple1(Seq(Some("a"), None: Option[String])))
      .toDF("tags")
    val e = intercept[Exception](
      df.select(ProtoExpressions.encodeProto(struct(col("tags")), m))
        .collect())
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("tags"),
      s"expected the field-named null-element error, got ${chain(e)}")
  }

  test("a 5-byte registry frame (empty payload) decodes to all defaults") {
    val m = ProtoMessage("E",
      Seq(ProtoField("a", 1, PInt32), ProtoField("s", 2, PString)))
    val backend = new ProtoRegistryFramedBackend(m, schemaId = 42)
    val frame = Array[Byte](0x00, 0, 0, 0, 42) // magic + id, no payload
    val df = Seq(Tuple1(frame)).toDF("v")
    val row = df.select(backend.decodeExpr(col("v")).as("p"))
      .select("p.a", "p.s").collect().head
    assert(row.getInt(0) === 0 && row.getString(1) === "")
  }
}
