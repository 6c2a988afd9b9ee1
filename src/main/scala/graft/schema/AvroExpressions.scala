package graft.schema

import java.io.ByteArrayOutputStream

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{BinaryEncoder, DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Catalyst expressions for Avro binary encode/decode (P8/P9 of the
  * operator inventory; reference: `lib/deimos/schema_backends/
  * avro_local.rb:10-30`, `base.rb:85-100`).
  *
  * Spark-first: the codec is a scan/projection-level expression, so
  * encode/decode run inside the executor task with zero extra shuffle.
  *
  * Hot-path hygiene (round 2):
  *  - `doGenCode` emits a call onto the expression instance (via a
  *    codegen reference object), so the produce/consume pipeline stays
  *    one WholeStageCodegen span instead of bouncing through
  *    interpreted fallback;
  *  - the output buffer and Avro BinaryEncoder/BinaryDecoder are
  *    REUSED per thread (ThreadLocal) — the Avro factories support
  *    explicit reuse; per-row allocation was the dominant constant
  *    cost of the encode path.
  */
object AvroExpressions {

  // constructing any expression below inits this object first —
  // guarantee the decode allocation limits are live before a decode
  // can run (see AvroConverters)
  AvroConverters.ensureLimits()

  /** struct → Avro single-object binary (schema known out-of-band). */
  case class AvroEncodeExpr(child: Expression, schemaJson: String)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    @transient private lazy val schema =
      AvroConverters.parseSchema(schemaJson)
    @transient private lazy val writer =
      new GenericDatumWriter[Any](schema)
    @transient private lazy val outTL: ThreadLocal[ByteArrayOutputStream] =
      ThreadLocal.withInitial(() => new ByteArrayOutputStream(512))
    @transient private lazy val encTL: ThreadLocal[BinaryEncoder] =
      new ThreadLocal[BinaryEncoder]

    /** Per-row kernel — called from both eval and generated code. */
    def encodeRow(input: Any): Array[Byte] = {
      val datum = AvroConverters.toAvroDatum(input, schema, child.dataType)
      val out = outTL.get()
      out.reset()
      val enc = EncoderFactory.get().binaryEncoder(out, encTL.get())
      encTL.set(enc)
      writer.write(datum, enc)
      enc.flush()
      out.toByteArray
    }

    override def nullSafeEval(input: Any): Any = encodeRow(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("avroEncode", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeRow($c);")
    }
    override protected def withNewChildInternal(c: Expression): AvroEncodeExpr =
      copy(child = c)
  }

  /** Avro binary → struct, decoding with the declared reader schema —
    * unknown writer fields are dropped, exactly the reference's
    * evolution tolerance (`schema_class/record.rb:76-90`). */
  case class AvroDecodeExpr(child: Expression, schemaJson: String)
      extends UnaryExpression {
    @transient private lazy val schema =
      AvroConverters.parseSchema(schemaJson)
    override def dataType: DataType = AvroConverters.toSparkType(schema)
    @transient private lazy val reader =
      new GenericDatumReader[Any](schema)
    @transient private lazy val decTL: ThreadLocal[org.apache.avro.io.BinaryDecoder] =
      new ThreadLocal[org.apache.avro.io.BinaryDecoder]

    def decodeRow(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val dec = DecoderFactory.get().binaryDecoder(bytes, decTL.get())
      decTL.set(dec)
      AvroConverters.fromAvroDatum(reader.read(null, dec), schema)
    }

    override def nullSafeEval(input: Any): Any = decodeRow(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("avroDecode", this, getClass.getName)
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = (InternalRow) $ref.decodeRow($c);")
    }
    override protected def withNewChildInternal(c: Expression): AvroDecodeExpr =
      copy(child = c)
  }

  /** struct → Avro Object Container File bytes (schema embedded) —
    * the reference's actual avro_local payload format
    * (`avro_local.rb:18-30` uses DataFileWriter per message). */
  case class AvroDataFileEncodeExpr(child: Expression, schemaJson: String)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    @transient private lazy val schema =
      AvroConverters.parseSchema(schemaJson)

    def encodeRow(input: Any): Array[Byte] = {
      val datum = AvroConverters.toAvroDatum(input, schema, child.dataType)
      val out = new ByteArrayOutputStream()
      val w = new org.apache.avro.file.DataFileWriter[Any](
        new GenericDatumWriter[Any](schema))
      w.create(schema, out)
      w.append(datum)
      w.close()
      out.toByteArray
    }

    override def nullSafeEval(input: Any): Any = encodeRow(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ocfEncode", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeRow($c);")
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** OCF bytes → struct, resolved against the declared READER schema.
    * The writer schema travels in the container, so producer-side
    * evolution (extra fields, defaulted additions) resolves exactly as
    * the reference's `new_from_message` tolerance
    * (`schema_class/record.rb:76-90`). */
  case class AvroDataFileDecodeExpr(child: Expression, readerSchemaJson: String)
      extends UnaryExpression {
    @transient private lazy val readerSchema =
      AvroConverters.parseSchema(readerSchemaJson)
    override def dataType: DataType = AvroConverters.toSparkType(readerSchema)

    def decodeRow(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      // DataFileStream allocates its block buffer at the DECLARED
      // block byte-size before any bound is checked (the
      // org.apache.avro.limits.* properties do NOT cover it —
      // measured: a one-varint corruption in a 144-byte OCF throws
      // "Requested array size exceeds VM limit"), so validate every
      // declared size against the frame we actually hold first
      // (round-16 fuzz campaign). Loud on corruption, like the rest
      // of the frame checks.
      AvroExpressions.validateOcfFrame(bytes)
      val reader = new GenericDatumReader[Any](null, readerSchema)
      val stream = new org.apache.avro.file.DataFileStream[Any](
        new java.io.ByteArrayInputStream(bytes), reader)
      try {
        if (!stream.hasNext) null
        else AvroConverters.fromAvroDatum(stream.next(), readerSchema)
      } finally stream.close()
    }

    override def nullSafeEval(input: Any): Any = decodeRow(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("ocfDecode", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = (InternalRow) $ref.decodeRow($c);
        if (${ev.value} == null) { ${ev.isNull} = true; }
      """)
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Registry-framed bytes → struct with WRITER-SCHEMA DISPATCH: the
    * frame's embedded schema id selects the writer schema from a
    * provided id→json map, and Avro writer→reader resolution decodes it
    * against the single declared reader schema. This is the reference's
    * registry-backend decode semantics (`avro_schema_registry.rb:10-12`
    * resolves the writer by embedded id via avro_turf), so a topic with
    * a mid-stream schema bump decodes old and new messages in one scan.
    *
    * Unknown ids fail LOUDLY with the id and the known set — a wrong
    * map is corruption-shaped, and a silent null would hide it. Null
    * input decodes to null (tombstones). Resolving readers are built
    * once per (writer, reader) pair and reused across rows.
    */
  case class AvroResolvingDecodeExpr(child: Expression,
      readerSchemaJson: String, writerSchemasById: Map[Int, String])
      extends UnaryExpression {
    @transient private lazy val readerSchema =
      AvroConverters.parseSchema(readerSchemaJson)
    override def dataType: DataType = AvroConverters.toSparkType(readerSchema)
    override def nullable: Boolean = true
    @transient private lazy val readers: Map[Int, GenericDatumReader[Any]] =
      writerSchemasById.map { case (id, json) =>
        id -> new GenericDatumReader[Any](
          AvroConverters.parseSchema(json), readerSchema)
      }
    @transient private lazy val decTL: ThreadLocal[org.apache.avro.io.BinaryDecoder] =
      new ThreadLocal[org.apache.avro.io.BinaryDecoder]

    def decodeRow(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      // 5 header bytes (magic + id) + payload; the frame check is
      // about the HEADER — a 5-byte frame is structurally valid (an
      // empty-record schema encodes to zero bytes), and a payload too
      // short for its schema fails in the Avro decoder with the right
      // error instead of a misleading frame-mismatch
      if (b.length < 5 || b(0) != 0x00)
        throw new IllegalArgumentException(
          s"registry frame mismatch: expected magic 0x00 + int32 schema " +
            s"id, got ${b.length}-byte frame")
      val id = ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) |
        ((b(3) & 0xff) << 8) | (b(4) & 0xff)
      val reader = readers.getOrElse(id,
        throw new IllegalArgumentException(
          s"unknown schema id $id in registry frame (known: " +
            s"${writerSchemasById.keys.toSeq.sorted.mkString(",")})"))
      val dec = DecoderFactory.get().binaryDecoder(b, 5, b.length - 5, decTL.get())
      decTL.set(dec)
      AvroConverters.fromAvroDatum(reader.read(null, dec), readerSchema)
    }

    override def nullSafeEval(input: Any): Any = decodeRow(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("avroResolve", this, getClass.getName)
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = (InternalRow) $ref.decodeRow($c);")
    }
    override protected def withNewChildInternal(c: Expression): AvroResolvingDecodeExpr =
      copy(child = c)
  }

  /** Big-endian int32 from the first 4 bytes at `offset` — used to read
    * the schema id out of registry-framed messages. */
  case class ReadInt32BE(child: Expression, offset: Int)
      extends UnaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    def readAt(b: Array[Byte]): Any =
      if (b.length < offset + 4) null
      else java.lang.Integer.valueOf(
        ((b(offset) & 0xff) << 24) | ((b(offset + 1) & 0xff) << 16) |
          ((b(offset + 2) & 0xff) << 8) | (b(offset + 3) & 0xff))

    override def nullSafeEval(input: Any): Any =
      readAt(input.asInstanceOf[Array[Byte]])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("readI32", this, getClass.getName)
      // fresh temp name: two instances of this expression can inline
      // into ONE generated method (non-nullable children skip the
      // brace-wrapped null guard), and a fixed `Object r` would then be
      // a duplicate local — janino error → silent interpreted fallback
      val r = ctx.freshName("readI32Res")
      nullSafeCodeGen(ctx, ev, c => s"""
        Object $r = $ref.readAt($c);
        if ($r == null) { ${ev.isNull} = true; }
        else { ${ev.value} = ((Integer) $r).intValue(); }
      """)
    }
    override protected def withNewChildInternal(c: Expression): ReadInt32BE =
      copy(child = c)
  }

  def encodeAvro(payload: Column, schemaJson: String): Column =
    GraftSqlBridge.column(
      AvroEncodeExpr(GraftSqlBridge.expression(payload), schemaJson))

  def decodeAvro(bytes: Column, schemaJson: String): Column =
    GraftSqlBridge.column(
      AvroDecodeExpr(GraftSqlBridge.expression(bytes), schemaJson))

  def decodeAvroResolving(framed: Column, readerSchemaJson: String,
      writerSchemasById: Map[Int, String]): Column =
    GraftSqlBridge.column(
      AvroResolvingDecodeExpr(GraftSqlBridge.expression(framed),
        readerSchemaJson, writerSchemasById))

  def schemaIdOf(framed: Column): Column =
    GraftSqlBridge.column(
      ReadInt32BE(GraftSqlBridge.expression(framed), offset = 1))

  def encodeAvroDataFile(payload: Column, schemaJson: String): Column =
    GraftSqlBridge.column(
      AvroDataFileEncodeExpr(GraftSqlBridge.expression(payload), schemaJson))

  def decodeAvroDataFile(bytes: Column, readerSchemaJson: String): Column =
    GraftSqlBridge.column(
      AvroDataFileDecodeExpr(GraftSqlBridge.expression(bytes), readerSchemaJson))

  /** Structural walk of an OCF frame validating every DECLARED length
    * against the bytes actually held, BEFORE Avro's DataFileStream
    * trusts them into allocations: magic, the metadata map's
    * string/bytes entry lengths, the 16-byte sync, then each data
    * block's (count, byte-size) pair — a block size past the frame
    * end is the allocation bomb this guards. Throws
    * IllegalArgumentException (loud, quarantine-able) on any lie;
    * returns normally on a structurally sane frame (whose CONTENT
    * corruption DataFileStream then reports with its own errors). */
  private[schema] def validateOcfFrame(b: Array[Byte]): Unit = {
    def fail(msg: String): Nothing =
      throw new IllegalArgumentException(s"corrupt OCF frame: $msg")
    if (b.length < 4 + 1 + 16) fail(s"${b.length} bytes is too short")
    if (!(b(0) == 'O' && b(1) == 'b' && b(2) == 'j' && b(3) == 1))
      fail("bad magic")
    var pos = 4
    def readLong(): Long = { // Avro zigzag-varint long
      var shift = 0
      var v = 0L
      while (true) {
        if (pos >= b.length) fail("truncated varint")
        val byte = b(pos); pos += 1
        v |= (byte & 0x7fL) << shift
        if ((byte & 0x80) == 0) return (v >>> 1) ^ -(v & 1)
        shift += 7
        if (shift >= 64) fail("varint too long")
      }
      0L // unreachable
    }
    def skipSized(what: String): Unit = {
      val n = readLong()
      if (n < 0 || n > (b.length - pos).toLong) fail(s"$what length $n lies")
      pos += n.toInt
    }
    // metadata map: blocks of entries; a negative count carries an
    // explicit byte size for the whole block (Avro map encoding)
    var mapCount = readLong()
    while (mapCount != 0) {
      if (mapCount < 0) skipSized("meta block")
      else {
        if (mapCount > (b.length - pos).toLong) fail("meta count lies")
        var i = 0L
        while (i < mapCount) {
          skipSized("meta key"); skipSized("meta value")
          i += 1
        }
      }
      mapCount = readLong()
    }
    if (pos + 16 > b.length) fail("truncated header sync")
    pos += 16
    // data blocks: count, byte size, data, sync
    while (pos < b.length) {
      val count = readLong()
      if (count < 0) fail(s"negative block count $count")
      skipSized("block")
      if (pos + 16 > b.length) fail("truncated block sync")
      pos += 16
    }
  }
}
