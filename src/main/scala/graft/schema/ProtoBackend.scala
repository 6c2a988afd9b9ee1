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

  def encodeProto(payload: Column, message: ProtoMessage): Column =
    GraftSqlBridge.column(
      ProtoEncodeExpr(GraftSqlBridge.expression(payload), message))

  def decodeProto(bytes: Column, message: ProtoMessage): Column =
    GraftSqlBridge.column(
      ProtoDecodeExpr(GraftSqlBridge.expression(bytes), message))
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
  * loud frame validation as [[RegistryFramedBackend]]. */
class ProtoRegistryFramedBackend(message: ProtoMessage, val schemaId: Int)
    extends ProtoBackend(message) {
  override def encodeExpr(payload: Column): Column =
    concat(lit(RegistryFraming.header(schemaId)), super.encodeExpr(payload))
  override def decodeExpr(bytes: Column): Column =
    RegistryFraming.decodeValidated(bytes, schemaId)(super.decodeExpr)
}
