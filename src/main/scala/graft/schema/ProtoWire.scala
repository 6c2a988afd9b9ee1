package graft.schema

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Protobuf wire-format model + codec, hand-rolled on the PUBLIC wire
  * spec (varint / zigzag / fixed / length-delimited; tag =
  * field_number << 3 | wire_type) — no protobuf runtime needed. Covers
  * the scalar surface of the reference's proto backend
  * (`lib/deimos/schema_backends/proto_base.rb:9-26` SQL_MAP) plus
  * `repeated` → array (`proto_base.rb:75-80`) and nested messages.
  *
  * proto3 semantics throughout: scalar fields at their default value
  * (0 / false / "" / empty bytes) and null fields are omitted on
  * encode; absent fields decode to defaults. Repeated numeric scalars
  * encode packed (wire type 2) and decode both packed and unpacked.
  * uint32/uint64 carry raw two's-complement bits in int/long, the
  * standard JVM convention.
  */
object ProtoWire {

  sealed trait ProtoType
  case object PInt32 extends ProtoType
  case object PInt64 extends ProtoType
  case object PUInt32 extends ProtoType
  case object PUInt64 extends ProtoType
  case object PSInt32 extends ProtoType
  case object PSInt64 extends ProtoType
  case object PFixed32 extends ProtoType
  case object PFixed64 extends ProtoType
  case object PSFixed32 extends ProtoType
  case object PSFixed64 extends ProtoType
  case object PBool extends ProtoType
  case object PEnum extends ProtoType
  case object PFloat extends ProtoType
  case object PDouble extends ProtoType
  case object PString extends ProtoType
  case object PBytes extends ProtoType
  final case class PMessage(message: ProtoMessage) extends ProtoType

  final case class ProtoField(name: String, number: Int, ptype: ProtoType,
      repeated: Boolean = false) {
    require(number >= 1, s"field number must be >= 1: $name")
  }

  final case class ProtoMessage(name: String, fields: Seq[ProtoField]) {
    require(fields.map(_.number).distinct.size == fields.size,
      s"duplicate field numbers in $name")
    require(fields.map(_.name).distinct.size == fields.size,
      s"duplicate field names in $name")
    /** Nesting depth of this descriptor (1 = no message fields).
      * Nested descriptors exist before their parents (immutable
      * construction — cycles are unrepresentable), so this reads each
      * child's already-computed depth: O(fields) per constructor. */
    val depth: Int = 1 + (fields.map(_.ptype).collect {
      case PMessage(sub) => sub.depth
    } :+ 0).max
    // decode/encode/sparkSchema recursion follows the DESCRIPTOR (the
    // wire can never push deeper — nested payloads accumulate as bytes
    // first), so bounding descriptor depth at construction bounds
    // every per-row recursion. 100 = protobuf's own public default
    // recursion limit; a deeper descriptor would StackOverflowError
    // (an Error, not the loud-NonFatal contract) at decode time.
    require(depth <= 100,
      s"descriptor $name nests ${depth} levels (> 100, protobuf's " +
        "recursion limit) — refusing: per-row decode recursion would " +
        "be unbounded")
    /** Per-message decode lookup, built once — decode runs per row
      * (and per nested message per row); rebuilding this map there
      * would dominate the per-row constant cost. Transient: cheap to
      * recompute after deserialization on the executor. */
    @transient lazy val byNumber: Map[Int, (ProtoField, Int)] =
      fields.zipWithIndex.map { case (f, i) => f.number -> ((f, i)) }.toMap
    /** Cached Spark schema — encode also runs per row (and per nested
      * message per row); rebuilding the StructType there dominated the
      * per-row constant cost (same rationale as [[byNumber]]). */
    @transient lazy val sparkSchema: StructType =
      StructType(fields.map { f =>
        val base = sparkTypeOf(f.ptype)
        val t = if (f.repeated) ArrayType(base, containsNull = false)
          else base
        StructField(f.name, t, nullable = true)
      })
  }

  /** proto3 text name of a type, for `.proto` emission. */
  def typeName(t: ProtoType): String = t match {
    case PInt32 => "int32"
    case PInt64 => "int64"
    case PUInt32 => "uint32"
    case PUInt64 => "uint64"
    case PSInt32 => "sint32"
    case PSInt64 => "sint64"
    case PFixed32 => "fixed32"
    case PFixed64 => "fixed64"
    case PSFixed32 => "sfixed32"
    case PSFixed64 => "sfixed64"
    case PBool => "bool"
    case PEnum => "int32" // enums are carried by number in this model
    case PFloat => "float"
    case PDouble => "double"
    case PString => "string"
    case PBytes => "bytes"
    case PMessage(m) => m.name
  }

  /** Key-schema `.proto` text: a `<Name>Key` message carrying only the
    * named key field, same package — what the registry needs to
    * validate keys independently of values (reference:
    * `proto_schema_registry.rb:61-80` `write_key_proto`, driven by the
    * `deimos:generate_key_protos` rake task). The field keeps its
    * original number so key frames produced from the value descriptor
    * stay wire-compatible. Message-typed key fields fail loudly — a
    * nested message is not a valid partition key and the emitted file
    * would not compile stand-alone. */
  def keyProtoText(m: ProtoMessage, pkg: String, fieldName: String): String = {
    val f = m.fields.find(_.name == fieldName).getOrElse(
      throw new IllegalArgumentException(
        s"key field $fieldName not in message ${m.name} " +
          s"(has ${m.fields.map(_.name).mkString(", ")})"))
    f.ptype match {
      case PMessage(_) => throw new IllegalArgumentException(
        s"key field $fieldName of ${m.name} is message-typed — " +
          "not a valid partition key")
      case _ => ()
    }
    val rep = if (f.repeated) "repeated " else ""
    s"""syntax = "proto3";
       |package $pkg;
       |
       |message ${m.name}Key {
       |  $rep${typeName(f.ptype)} ${f.name} = ${f.number};
       |}
       |""".stripMargin
  }

  /** Write [[keyProtoText]] under `dir/<pkg as path>/<name>_key.proto`
    * with the message name snake_cased — the reference's output path
    * convention. */
  def writeKeyProto(dir: java.nio.file.Path, m: ProtoMessage, pkg: String,
      fieldName: String): java.nio.file.Path = {
    // two-rule underscore (Rails convention the reference inherits):
    // the acronym rule first, so HTTPOrder → http_order, not httporder
    val snake = m.name
      .replaceAll("([A-Z]+)([A-Z][a-z])", "$1_$2")
      .replaceAll("([a-z0-9])([A-Z])", "$1_$2").toLowerCase
    val out = dir.resolve(pkg.replace('.', '/')).resolve(s"${snake}_key.proto")
    java.nio.file.Files.createDirectories(out.getParent)
    java.nio.file.Files.write(out,
      keyProtoText(m, pkg, fieldName).getBytes("UTF-8"))
  }

  /** Spark type for a proto scalar (reference SQL_MAP parity:
    * 32-bit ints → int, 64-bit → bigint, bool/float/double/string/
    * bytes as themselves, enum carried by number). */
  def sparkTypeOf(t: ProtoType): DataType = t match {
    case PInt32 | PUInt32 | PSInt32 | PFixed32 | PSFixed32 | PEnum => IntegerType
    case PInt64 | PUInt64 | PSInt64 | PFixed64 | PSFixed64 => LongType
    case PBool => BooleanType
    case PFloat => FloatType
    case PDouble => DoubleType
    case PString => StringType
    case PBytes => BinaryType
    case PMessage(m) => sparkSchemaOf(m)
  }

  def sparkSchemaOf(m: ProtoMessage): StructType = m.sparkSchema

  // ---- wire primitives -------------------------------------------------

  private def wireTypeOf(t: ProtoType): Int = t match {
    case PInt32 | PInt64 | PUInt32 | PUInt64 | PSInt32 | PSInt64 |
        PBool | PEnum => 0
    case PFixed64 | PSFixed64 | PDouble => 1
    case PString | PBytes | _: PMessage => 2
    case PFixed32 | PSFixed32 | PFloat => 5
  }

  private[schema] def writeVarint(out: ByteArrayOutputStream, v0: Long): Unit = {
    var v = v0
    while ((v & ~0x7fL) != 0L) {
      out.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    out.write((v & 0x7f).toInt)
  }

  private[schema] def zigzag32(n: Int): Long = ((n << 1) ^ (n >> 31)).toLong & 0xffffffffL
  private[schema] def zigzag64(n: Long): Long = (n << 1) ^ (n >> 63)
  private[schema] def unzigzag(n: Long): Long = (n >>> 1) ^ -(n & 1)

  private def writeTag(out: ByteArrayOutputStream, number: Int, wt: Int): Unit =
    writeVarint(out, ((number.toLong << 3) | wt))

  private def writeFixed32(out: ByteArrayOutputStream, bits: Int): Unit = {
    out.write(bits & 0xff); out.write((bits >>> 8) & 0xff)
    out.write((bits >>> 16) & 0xff); out.write((bits >>> 24) & 0xff)
  }

  private def writeFixed64(out: ByteArrayOutputStream, bits: Long): Unit = {
    var i = 0
    while (i < 8) { out.write(((bits >>> (8 * i)) & 0xff).toInt); i += 1 }
  }

  // ---- encode ----------------------------------------------------------

  /** Scalar value (as its Spark-internal representation) → wire bytes
    * appended WITHOUT tag. */
  private def writeScalar(out: ByteArrayOutputStream, t: ProtoType, v: Any): Unit =
    t match {
      case PInt32 | PEnum =>
        // negative int32 sign-extends to 10 varint bytes, per spec
        writeVarint(out, v.asInstanceOf[Int].toLong)
      case PUInt32 => writeVarint(out,
        v.asInstanceOf[Int].toLong & 0xffffffffL)
      case PInt64 | PUInt64 => writeVarint(out, v.asInstanceOf[Long])
      case PSInt32 => writeVarint(out, zigzag32(v.asInstanceOf[Int]))
      case PSInt64 => writeVarint(out, zigzag64(v.asInstanceOf[Long]))
      case PBool => writeVarint(out, if (v.asInstanceOf[Boolean]) 1L else 0L)
      case PFixed32 | PSFixed32 => writeFixed32(out, v.asInstanceOf[Int])
      case PFixed64 | PSFixed64 => writeFixed64(out, v.asInstanceOf[Long])
      case PFloat => writeFixed32(out,
        java.lang.Float.floatToIntBits(v.asInstanceOf[Float]))
      case PDouble => writeFixed64(out,
        java.lang.Double.doubleToLongBits(v.asInstanceOf[Double]))
      case PString =>
        val b = v.asInstanceOf[UTF8String].getBytes
        writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
      case PBytes =>
        val b = v.asInstanceOf[Array[Byte]]
        writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
      case PMessage(m) =>
        val b = encode(v.asInstanceOf[InternalRow], m)
        writeVarint(out, b.length.toLong); out.write(b, 0, b.length)
    }

  private def isDefault(t: ProtoType, v: Any): Boolean = t match {
    case PInt32 | PUInt32 | PSInt32 | PFixed32 | PSFixed32 | PEnum =>
      v.asInstanceOf[Int] == 0
    case PInt64 | PUInt64 | PSInt64 | PFixed64 | PSFixed64 =>
      v.asInstanceOf[Long] == 0L
    case PBool => !v.asInstanceOf[Boolean]
    case PFloat => v.asInstanceOf[Float] == 0.0f
    case PDouble => v.asInstanceOf[Double] == 0.0
    case PString => v.asInstanceOf[UTF8String].numBytes == 0
    case PBytes => v.asInstanceOf[Array[Byte]].isEmpty
    case _: PMessage => false // message presence is explicit
  }

  private def getElem(arr: ArrayData, i: Int, dt: DataType): Any =
    dt match {
      case IntegerType => arr.getInt(i)
      case LongType => arr.getLong(i)
      case BooleanType => arr.getBoolean(i)
      case FloatType => arr.getFloat(i)
      case DoubleType => arr.getDouble(i)
      case StringType => arr.getUTF8String(i)
      case BinaryType => arr.getBinary(i)
      case st: StructType => arr.getStruct(i, st.size)
      case other => throw new IllegalArgumentException(s"proto elem $other")
    }

  /** InternalRow (shaped as [[sparkSchemaOf]]) → proto3 message bytes.
    * Fields emit in declaration order; null / default-valued scalars
    * and empty repeateds are omitted (proto3). */
  def encode(row: InternalRow, m: ProtoMessage): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val schema = sparkSchemaOf(m)
    m.fields.zipWithIndex.foreach { case (f, i) =>
      if (!row.isNullAt(i)) {
        if (f.repeated) {
          val arr = row.getArray(i)
          val n = arr.numElements()
          if (n > 0) {
            val elemT = schema(i).dataType.asInstanceOf[ArrayType].elementType
            // loud null-element check: the declared schema says
            // containsNull=false, but the caller's frame may violate
            // it — typed accessors would otherwise NPE (strings) or
            // silently write 0 (unboxed numerics) with no field context
            def checkElem(j: Int): Unit =
              if (arr.isNullAt(j)) throw new IllegalArgumentException(
                s"null element at index $j of repeated proto field " +
                  s"${f.name} — proto3 repeated fields cannot carry null")
            wireTypeOf(f.ptype) match {
              case 2 => // strings/bytes/messages: one tag per element
                var j = 0
                while (j < n) {
                  checkElem(j)
                  writeTag(out, f.number, 2)
                  writeScalar(out, f.ptype, getElem(arr, j, elemT))
                  j += 1
                }
              case _ => // numeric scalars: packed, per proto3 default
                val body = new ByteArrayOutputStream()
                var j = 0
                while (j < n) {
                  checkElem(j)
                  writeScalar(body, f.ptype, getElem(arr, j, elemT))
                  j += 1
                }
                writeTag(out, f.number, 2)
                val b = body.toByteArray
                writeVarint(out, b.length.toLong)
                out.write(b, 0, b.length)
            }
          }
        } else {
          val value: Any = f.ptype match {
            case _: PMessage => row.getStruct(i,
              schema(i).dataType.asInstanceOf[StructType].size)
            case _ => readRowScalar(row, i, schema(i).dataType)
          }
          if (!isDefault(f.ptype, value)) {
            writeTag(out, f.number, wireTypeOf(f.ptype))
            writeScalar(out, f.ptype, value)
          }
        }
      }
    }
    out.toByteArray
  }

  private def readRowScalar(row: InternalRow, i: Int, dt: DataType): Any =
    dt match {
      case IntegerType => row.getInt(i)
      case LongType => row.getLong(i)
      case BooleanType => row.getBoolean(i)
      case FloatType => row.getFloat(i)
      case DoubleType => row.getDouble(i)
      case StringType => row.getUTF8String(i)
      case BinaryType => row.getBinary(i)
      case other => throw new IllegalArgumentException(s"proto scalar $other")
    }

  // ---- decode ----------------------------------------------------------

  private final class Reader(val bytes: Array[Byte], var pos: Int,
      val end: Int) {
    def hasMore: Boolean = pos < end
    def readVarint(): Long = {
      var shift = 0
      var v = 0L
      while (true) {
        require(pos < end, "truncated varint")
        val b = bytes(pos); pos += 1
        v |= (b & 0x7fL) << shift
        if ((b & 0x80) == 0) return v
        shift += 7
        require(shift < 64, "varint too long")
      }
      v
    }
    def readFixed32(): Int = {
      require(pos + 4 <= end, "truncated fixed32")
      val v = (bytes(pos) & 0xff) | ((bytes(pos + 1) & 0xff) << 8) |
        ((bytes(pos + 2) & 0xff) << 16) | ((bytes(pos + 3) & 0xff) << 24)
      pos += 4; v
    }
    def readFixed64(): Long = {
      require(pos + 8 <= end, "truncated fixed64")
      var v = 0L
      var i = 0
      while (i < 8) { v |= (bytes(pos + i) & 0xffL) << (8 * i); i += 1 }
      pos += 8; v
    }
    def readBytes(): Array[Byte] = {
      // length compared in LONG before the Int narrowing: a malformed
      // 64-bit length like 0x1_0000_0003 would otherwise truncate to a
      // small positive len, pass the bound, and silently desync the
      // parse; pos+len can likewise overflow Int
      val lenL = readVarint()
      require(lenL >= 0L && lenL <= (end - pos).toLong,
        "truncated length-delimited")
      val len = lenL.toInt
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + len)
      pos += len; out
    }
    def skip(wt: Int): Unit = wt match {
      case 0 => readVarint(); ()
      case 1 => readFixed64(); ()
      case 2 => readBytes(); ()
      case 5 => readFixed32(); ()
      case other => throw new IllegalArgumentException(
        s"unsupported wire type $other")
    }
  }

  private def decodeScalar(r: Reader, t: ProtoType, wt: Int): Any = t match {
    case PInt32 | PEnum => r.readVarint().toInt
    case PUInt32 => r.readVarint().toInt
    case PInt64 | PUInt64 => r.readVarint()
    case PSInt32 => unzigzag(r.readVarint()).toInt
    case PSInt64 => unzigzag(r.readVarint())
    case PBool => r.readVarint() != 0L
    case PFixed32 | PSFixed32 => r.readFixed32()
    case PFixed64 | PSFixed64 => r.readFixed64()
    case PFloat => java.lang.Float.intBitsToFloat(r.readFixed32())
    case PDouble => java.lang.Double.longBitsToDouble(r.readFixed64())
    case PString => UTF8String.fromBytes(r.readBytes())
    case PBytes => r.readBytes()
    case PMessage(m) =>
      // in-place range decode — no per-element payload copy (the
      // range form exists for exactly this)
      val lenL = r.readVarint()
      require(lenL >= 0L && lenL <= (r.end - r.pos).toLong,
        "truncated length-delimited")
      val start = r.pos
      r.pos += lenL.toInt
      decode(r.bytes, m, start, start + lenL.toInt)
  }

  private def defaultOf(t: ProtoType): Any = t match {
    case PInt32 | PUInt32 | PSInt32 | PFixed32 | PSFixed32 | PEnum => 0
    case PInt64 | PUInt64 | PSInt64 | PFixed64 | PSFixed64 => 0L
    case PBool => false
    case PFloat => 0.0f
    case PDouble => 0.0
    case PString => UTF8String.EMPTY_UTF8
    case PBytes => Array.emptyByteArray
    case _: PMessage => null
  }

  /** proto3 message bytes → InternalRow shaped as [[sparkSchemaOf]].
    * Unknown fields are skipped by wire type; repeated occurrences of
    * a non-repeated SCALAR field last-win (proto3 rule), while
    * repeated occurrences of an embedded MESSAGE field MERGE
    * (concatenated-payload decode — the spec's merge semantics);
    * repeated numerics accept packed and unpacked encodings. */
  def decode(bytes: Array[Byte], m: ProtoMessage): InternalRow =
    decode(bytes, m, 0, bytes.length)

  /** Range form of [[decode]] for callers that strip framing without
    * copying the payload (registry-framed messages). */
  private[schema] def decodeRange(bytes: Array[Byte], m: ProtoMessage,
      from: Int, to: Int): InternalRow = decode(bytes, m, from, to)

  // ---- writer→reader resolution ---------------------------------------

  private object Unconvertible

  /** Writer-typed value → reader-typed value, by proto's evolution
    * rules at the decoded-representation level: numeric widening AND
    * narrowing (int32↔int64 truncate, proto's rule), float↔double,
    * bool↔varint ints, string↔bytes, enum↔int32 (same repr), nested
    * message recursion. Anything else is [[Unconvertible]] — the
    * caller substitutes the reader default, same as an absent field. */
  private def convertScalar(v: Any, wt: ProtoType, rt: ProtoType): Any = {
    if (v == null) return null
    (wt, rt) match {
      case (PMessage(wm), PMessage(rm)) =>
        resolveRow(v.asInstanceOf[InternalRow], wm, rm)
      case (_: PMessage, _) | (_, _: PMessage) => Unconvertible
      case _ => (sparkTypeOf(wt), sparkTypeOf(rt)) match {
        case (a, b) if a == b => v
        case (IntegerType, LongType) => wt match {
          // unsigned writer types carry raw bits in Int; widening must
          // ZERO-extend (uint32 3000000000 is 3000000000 to a 64-bit
          // reader, not -1294967296 — the C++-cast rule the resolution
          // contract follows)
          case PUInt32 | PFixed32 => v.asInstanceOf[Int].toLong & 0xffffffffL
          case _ => v.asInstanceOf[Int].toLong
        }
        case (LongType, IntegerType) => v.asInstanceOf[Long].toInt
        case (FloatType, DoubleType) => v.asInstanceOf[Float].toDouble
        case (DoubleType, FloatType) => v.asInstanceOf[Double].toFloat
        case (BooleanType, IntegerType) => if (v.asInstanceOf[Boolean]) 1 else 0
        case (BooleanType, LongType) => if (v.asInstanceOf[Boolean]) 1L else 0L
        case (IntegerType, BooleanType) => v.asInstanceOf[Int] != 0
        case (LongType, BooleanType) => v.asInstanceOf[Long] != 0L
        case (StringType, BinaryType) => v.asInstanceOf[UTF8String].getBytes
        case (BinaryType, StringType) =>
          UTF8String.fromBytes(v.asInstanceOf[Array[Byte]])
        case _ => Unconvertible
      }
    }
  }

  /** Re-shape a row decoded with the WRITER descriptor into the
    * READER's schema. Field NUMBER is the identity (the proto
    * contract — names are documentation); a reader field absent from
    * the writer gets the reader default, exactly as if the wire had
    * omitted it. Decoding with the true writer descriptor first is
    * what makes representation changes safe: e.g. a writer that
    * declared a field sint32 (zigzag) keeps its values when the
    * reader declares plain int64 — interpreting those bytes with the
    * reader's descriptor alone would silently unzigzag-skip them. */
  def resolveRow(row: InternalRow, writer: ProtoMessage,
      reader: ProtoMessage): InternalRow = {
    val values = new Array[Any](reader.fields.size)
    var i = 0
    reader.fields.foreach { rf =>
      val resolved = writer.byNumber.get(rf.number) match {
        case None => Unconvertible
        case Some((wf, wi)) =>
          // generic InternalRow/ArrayData accessors, NOT a
          // GenericInternalRow cast: the public signature accepts any
          // Catalyst row representation (an UnsafeRow from a caller
          // that round-tripped through a projection must work too)
          val wdt = sparkSchemaOf(writer)(wi).dataType
          val wv = if (row.isNullAt(wi)) null else row.get(wi, wdt)
          if (wf.repeated != rf.repeated) Unconvertible
          else if (rf.repeated) {
            val arr = wv.asInstanceOf[ArrayData]
              .toObjectArray(sparkTypeOf(wf.ptype))
            val out = arr.map(e => convertScalar(e, wf.ptype, rf.ptype))
            if (out.contains(Unconvertible)) Unconvertible
            else new GenericArrayData(out)
          } else convertScalar(wv, wf.ptype, rf.ptype)
      }
      values(i) =
        if (resolved.asInstanceOf[AnyRef] ne Unconvertible) resolved
        else if (rf.repeated) new GenericArrayData(Array.empty[Any])
        else defaultOf(rf.ptype)
      i += 1
    }
    new GenericInternalRow(values)
  }

  private def decode(bytes: Array[Byte], m: ProtoMessage, from: Int,
      to: Int): InternalRow = {
    val byNumber = m.byNumber
    val values = new Array[Any](m.fields.size)
    val repeated = Array.fill(m.fields.size)(
      null: scala.collection.mutable.ArrayBuffer[Any])
    // non-repeated MESSAGE fields accumulate raw payload bytes: the
    // protobuf spec mandates that repeated occurrences of an embedded
    // message field MERGE (a conformant writer may legally split one
    // message across occurrences), and concatenated-payload decode IS
    // the spec's merge — scalars last-win, repeateds append, nested
    // messages merge recursively. Last-value-wins applies to scalars
    // only.
    val msgBufs = new Array[ByteArrayOutputStream](m.fields.size)
    val r = new Reader(bytes, from, to)
    while (r.hasMore) {
      val tag = r.readVarint()
      val numberL = tag >>> 3
      // field numbers are 1..2^29-1 by spec; a tag whose high bits are
      // set is a malformed frame — truncating with .toInt could alias
      // it onto a REAL field and decode garbage as data
      require(numberL >= 1L && numberL <= 536870911L,
        s"malformed tag: field number $numberL out of proto range")
      val number = numberL.toInt
      val wt = (tag & 0x7).toInt
      byNumber.get(number) match {
        case None => r.skip(wt)
        case Some((f, i)) =>
          val expectedWt = wireTypeOf(f.ptype)
          if (f.repeated) {
            if (repeated(i) == null)
              repeated(i) = scala.collection.mutable.ArrayBuffer[Any]()
            if (wt == 2 && expectedWt != 2) {
              // packed: a length-delimited run of scalars
              val body = r.readBytes()
              val pr = new Reader(body, 0, body.length)
              while (pr.hasMore)
                repeated(i) += decodeScalar(pr, f.ptype, expectedWt)
            } else if (wt != expectedWt) {
              // wire type doesn't match the declared field type (writer
              // evolved e.g. int32→string): treat as unknown per
              // protobuf convention — decoding by declared type would
              // desync the reader and poison the whole message
              r.skip(wt)
            } else {
              repeated(i) += decodeScalar(r, f.ptype, wt)
            }
          } else if (wt != expectedWt) {
            r.skip(wt) // mismatched wire type: unknown field, keep default
          } else f.ptype match {
            case PMessage(_) =>
              val b = r.readBytes()
              if (msgBufs(i) == null) msgBufs(i) = new ByteArrayOutputStream()
              msgBufs(i).write(b, 0, b.length)
            case _ =>
              values(i) = decodeScalar(r, f.ptype, wt)
          }
      }
    }
    m.fields.zipWithIndex.foreach { case (f, i) =>
      if (f.repeated) {
        values(i) = new GenericArrayData(
          if (repeated(i) == null) Array.empty[Any]
          else repeated(i).toArray)
      } else f.ptype match {
        case PMessage(sub) =>
          if (msgBufs(i) != null) {
            val b = msgBufs(i).toByteArray
            values(i) = decode(b, sub, 0, b.length)
          } // else stays null (message presence is explicit)
        case _ =>
          if (values(i) == null) values(i) = defaultOf(f.ptype)
      }
    }
    new GenericInternalRow(values)
  }
}
