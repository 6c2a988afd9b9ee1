package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import ProtoWire.{PMessage, ProtoMessage, ProtoType}

/** Catalyst expressions wrapping the hand-rolled proto3 wire codec
  * ([[ProtoWire]]). Same plan position as the Avro expressions: the
  * codec is a projection-level expression, zero extra shuffle, and
  * `doGenCode` keeps the surrounding pipeline in one WholeStageCodegen
  * span (the generated code calls back into the expression instance
  * via a codegen reference). */
object ProtoExpressions {

  case class ProtoEncodeExpr(child: Expression, message: ProtoMessage)
      extends UnaryExpression {
    override def dataType: DataType = BinaryType
    def encodeRow(input: Any): Array[Byte] =
      ProtoWire.encode(input.asInstanceOf[InternalRow], message)
    override def nullSafeEval(input: Any): Any = encodeRow(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("protoEncode", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.encodeRow($c);")
    }
    override protected def withNewChildInternal(c: Expression): ProtoEncodeExpr =
      copy(child = c)
  }

  case class ProtoDecodeExpr(child: Expression, message: ProtoMessage)
      extends UnaryExpression {
    override def dataType: DataType = ProtoWire.sparkSchemaOf(message)
    def decodeRow(input: Any): InternalRow =
      ProtoWire.decode(input.asInstanceOf[Array[Byte]], message)
    override def nullSafeEval(input: Any): Any = decodeRow(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("protoDecode", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.decodeRow($c);")
    }
    override protected def withNewChildInternal(c: Expression): ProtoDecodeExpr =
      copy(child = c)
  }

  /** Per-frame registry dispatch (the proto analog of
    * [[AvroExpressions.AvroResolvingDecodeExpr]]): validate the
    * Confluent frame, look the embedded id up in the writer-descriptor
    * map, decode the payload with THAT writer's descriptor, then
    * re-shape to the reader schema by field number
    * ([[ProtoWire.resolveRow]]). Unknown ids fail loudly with the id
    * and the known set — decoding with a guessed descriptor would
    * mis-read silently. */
  case class ProtoResolvingDecodeExpr(child: Expression,
      reader: ProtoMessage, writersById: Map[Int, ProtoMessage])
      extends UnaryExpression {
    override def dataType: DataType = ProtoWire.sparkSchemaOf(reader)
    override def nullable: Boolean = true

    def decodeRow(input: Any): InternalRow = {
      val b = input.asInstanceOf[Array[Byte]]
      // 5 header bytes (magic + id) + payload; a 5-byte frame is LEGAL
      // — it carries an empty payload, which is a valid all-defaults
      // proto3 message
      if (b.length < 5 || b(0) != 0x00)
        throw new IllegalArgumentException(
          s"registry frame mismatch: expected magic 0x00 + int32 schema " +
            s"id, got ${b.length}-byte frame")
      val id = ((b(1) & 0xff) << 24) | ((b(2) & 0xff) << 16) |
        ((b(3) & 0xff) << 8) | (b(4) & 0xff)
      val writer = writersById.getOrElse(id,
        throw new IllegalArgumentException(
          s"unknown schema id $id in registry frame (known: " +
            s"${writersById.keys.toSeq.sorted.mkString(",")})"))
      ProtoWire.resolveRow(
        ProtoWire.decodeRange(b, writer, 5, b.length), writer, reader)
    }

    override def nullSafeEval(input: Any): Any = decodeRow(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("protoResolve", this, getClass.getName)
      nullSafeCodeGen(ctx, ev,
        c => s"${ev.value} = (InternalRow) $ref.decodeRow($c);")
    }
    override protected def withNewChildInternal(c: Expression): ProtoResolvingDecodeExpr =
      copy(child = c)
  }

  def encodeProto(payload: Column, message: ProtoMessage): Column =
    GraftSqlBridge.column(
      ProtoEncodeExpr(GraftSqlBridge.expression(payload), message))

  def decodeProto(bytes: Column, message: ProtoMessage): Column =
    GraftSqlBridge.column(
      ProtoDecodeExpr(GraftSqlBridge.expression(bytes), message))

  def decodeProtoResolving(framed: Column, reader: ProtoMessage,
      writersById: Map[Int, ProtoMessage]): Column =
    GraftSqlBridge.column(
      ProtoResolvingDecodeExpr(GraftSqlBridge.expression(framed),
        reader, writersById))
}

/** Protobuf schema backend — the engine's version of the reference's
  * `proto_local` (`lib/deimos/schema_backends/proto_local.rb:12-20`:
  * msgclass encode/decode on the standard wire format). The schema is
  * declared programmatically as a [[ProtoWire.ProtoMessage]] (the
  * analog of a compiled descriptor in the generated pool,
  * `proto_base.rb:28-35`).
  *
  * Keys are JSON-encoded per the reference (`proto_base.rb:58-66`:
  * `encode_proto_key` emits the sorted hash as JSON, decode parses
  * it) — callers pass key structs with fields already in sorted
  * order (the engine builds them that way from schemaFields).
  */
class ProtoBackend(val message: ProtoMessage) extends SchemaBackend {
  override lazy val sparkSchema: StructType = ProtoWire.sparkSchemaOf(message)
  override def encodeExpr(payload: Column): Column =
    ProtoExpressions.encodeProto(payload, message)
  override def decodeExpr(bytes: Column): Column =
    ProtoExpressions.decodeProto(bytes, message)
  override def encodeKeyExpr(key: Column): Column =
    to_json(key).cast(BinaryType)
  override def decodeKeyExpr(bytes: Column): Column =
    from_json(bytes.cast(StringType), sparkSchema)

  /** SQL DDL type per the reference's SQL_MAP
    * (`proto_base.rb:9-26,69-80`): 32-bit ints → INTEGER, 64-bit →
    * BIGINT, bytes → TEXT (reference maps bytes to string), repeated
    * and message → JSON. Deviation as in [[AvroBackend]]: double maps
    * to DOUBLE PRECISION instead of the reference's lossy float. */
  def sqlType(field: String): String = {
    val f = message.fields.find(_.name == field).getOrElse(
      throw new IllegalArgumentException(
        s"field $field not in message ${message.name}"))
    if (f.repeated) "JSON"
    else f.ptype match {
      case ProtoWire.PInt32 | ProtoWire.PUInt32 | ProtoWire.PSInt32 |
          ProtoWire.PFixed32 | ProtoWire.PSFixed32 | ProtoWire.PEnum => "INTEGER"
      case ProtoWire.PInt64 | ProtoWire.PUInt64 | ProtoWire.PSInt64 |
          ProtoWire.PFixed64 | ProtoWire.PSFixed64 => "BIGINT"
      case ProtoWire.PBool => "BOOLEAN"
      case ProtoWire.PFloat => "REAL"
      case ProtoWire.PDouble => "DOUBLE PRECISION"
      case ProtoWire.PString | ProtoWire.PBytes => "TEXT"
      case _: PMessage => "JSON"
    }
  }
}

/** Confluent-style registry framing over proto payloads — the
  * engine-side analog of the reference's `proto_schema_registry`
  * backend: 0x00 magic + int32 schema id + wire bytes, with the same
  * loud frame validation as [[RegistryFramedBackend]].
  *
  * `writerMessages` mirrors the Avro backend's `writerSchemas`: when
  * non-empty, decode DISPATCHES on each frame's embedded id, decodes
  * with that writer's descriptor, and resolves to this reader schema
  * by field number (reference `proto_schema_registry.rb:12-14`
  * resolves the writer by embedded id) — so a topic with a mid-stream
  * schema bump decodes in one scan, and representation changes
  * (sint32 → int64, string → bytes) keep their values. Unknown ids
  * fail loudly. When empty, decode validates strictly against this
  * backend's own `schemaId` (any other id is corruption). */
class ProtoRegistryFramedBackend(message: ProtoMessage, val schemaId: Int,
    writerMessages: Map[Int, ProtoMessage] = Map.empty)
    extends ProtoBackend(message) {
  override def encodeExpr(payload: Column): Column =
    concat(lit(RegistryFraming.header(schemaId)), super.encodeExpr(payload))
  override def decodeExpr(bytes: Column): Column =
    if (writerMessages.nonEmpty)
      ProtoExpressions.decodeProtoResolving(bytes, message,
        // the backend's own message is always a known writer
        writerMessages.updated(schemaId,
          writerMessages.getOrElse(schemaId, message)))
    else
      RegistryFraming.decodeValidated(bytes, schemaId)(super.decodeExpr)
}
