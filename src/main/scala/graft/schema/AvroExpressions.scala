package graft.schema

import java.io.ByteArrayOutputStream

import org.apache.avro.{Schema => AvroSchema}
import org.apache.avro.generic.{GenericDatumReader, GenericDatumWriter}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Catalyst expressions for Avro binary encode/decode (P8/P9 of the
  * operator inventory; reference: `lib/deimos/schema_backends/
  * avro_local.rb:10-30`, `base.rb:85-100`).
  *
  * Spark-first: the codec is a scan/projection-level expression, so
  * encode/decode run inside the executor task with zero extra shuffle;
  * writer/reader objects are lazily initialized once per task thread.
  */
object AvroExpressions {

  /** struct → Avro single-object binary (schema known out-of-band). */
  case class AvroEncodeExpr(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    @transient private lazy val schema =
      new AvroSchema.Parser().parse(schemaJson)
    @transient private lazy val writer =
      new GenericDatumWriter[Any](schema)
    override def nullSafeEval(input: Any): Any = {
      val datum = AvroConverters.toAvroDatum(input, schema, child.dataType)
      val out = new ByteArrayOutputStream()
      val enc = EncoderFactory.get().binaryEncoder(out, null)
      writer.write(datum, enc)
      enc.flush()
      out.toByteArray
    }
    override protected def withNewChildInternal(c: Expression): AvroEncodeExpr =
      copy(child = c)
  }

  /** Avro binary → struct, decoding with the declared reader schema —
    * unknown writer fields are dropped, exactly the reference's
    * evolution tolerance (`schema_class/record.rb:76-90`). */
  case class AvroDecodeExpr(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val schema =
      new AvroSchema.Parser().parse(schemaJson)
    override def dataType: DataType = AvroConverters.toSparkType(schema)
    @transient private lazy val reader =
      new GenericDatumReader[Any](schema)
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val dec = DecoderFactory.get().binaryDecoder(bytes, null)
      AvroConverters.fromAvroDatum(reader.read(null, dec), schema)
    }
    override protected def withNewChildInternal(c: Expression): AvroDecodeExpr =
      copy(child = c)
  }

  /** struct → Avro Object Container File bytes (schema embedded) —
    * the reference's actual avro_local payload format
    * (`avro_local.rb:18-30` uses DataFileWriter per message). */
  case class AvroDataFileEncodeExpr(child: Expression, schemaJson: String)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = BinaryType
    @transient private lazy val schema =
      new AvroSchema.Parser().parse(schemaJson)
    override def nullSafeEval(input: Any): Any = {
      val datum = AvroConverters.toAvroDatum(input, schema, child.dataType)
      val out = new ByteArrayOutputStream()
      val w = new org.apache.avro.file.DataFileWriter[Any](
        new GenericDatumWriter[Any](schema))
      w.create(schema, out)
      w.append(datum)
      w.close()
      out.toByteArray
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** OCF bytes → struct, resolved against the declared READER schema.
    * The writer schema travels in the container, so producer-side
    * evolution (extra fields, defaulted additions) resolves exactly as
    * the reference's `new_from_message` tolerance
    * (`schema_class/record.rb:76-90`). */
  case class AvroDataFileDecodeExpr(child: Expression, readerSchemaJson: String)
      extends UnaryExpression with CodegenFallback {
    @transient private lazy val readerSchema =
      new AvroSchema.Parser().parse(readerSchemaJson)
    override def dataType: DataType = AvroConverters.toSparkType(readerSchema)
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val reader = new GenericDatumReader[Any](null, readerSchema)
      val stream = new org.apache.avro.file.DataFileStream[Any](
        new java.io.ByteArrayInputStream(bytes), reader)
      try {
        if (!stream.hasNext) null
        else AvroConverters.fromAvroDatum(stream.next(), readerSchema)
      } finally stream.close()
    }
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Big-endian int32 from the first 4 bytes at `offset` — used to read
    * the schema id out of registry-framed messages. */
  case class ReadInt32BE(child: Expression, offset: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = IntegerType
    override def nullSafeEval(input: Any): Any = {
      val b = input.asInstanceOf[Array[Byte]]
      if (b.length < offset + 4) null
      else ((b(offset) & 0xff) << 24) | ((b(offset + 1) & 0xff) << 16) |
        ((b(offset + 2) & 0xff) << 8) | (b(offset + 3) & 0xff)
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

  def schemaIdOf(framed: Column): Column =
    GraftSqlBridge.column(
      ReadInt32BE(GraftSqlBridge.expression(framed), offset = 1))

  def encodeAvroDataFile(payload: Column, schemaJson: String): Column =
    GraftSqlBridge.column(
      AvroDataFileEncodeExpr(GraftSqlBridge.expression(payload), schemaJson))

  def decodeAvroDataFile(bytes: Column, readerSchemaJson: String): Column =
    GraftSqlBridge.column(
      AvroDataFileDecodeExpr(GraftSqlBridge.expression(bytes), readerSchemaJson))
}
