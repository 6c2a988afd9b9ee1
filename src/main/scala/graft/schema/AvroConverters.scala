package graft.schema

import scala.jdk.CollectionConverters._

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.generic.GenericData
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Avro ⇄ Catalyst conversion (schema and value level).
  *
  * Hand-rolled because the spark-avro connector is not on this
  * classpath — only avro-core. Supports the type surface the reference
  * exercises (SURVEY.md §1.2): primitives, bytes/fixed, enum (as
  * string), record, array, map, nullable unions, multi-branch unions
  * (spark-avro-style member0/member1 struct), timestamp-millis/micros.
  */
object AvroConverters {

  /** Decode-side allocation guard (round-16 fuzz campaign): Avro's
    * BinaryDecoder allocates a string/bytes buffer — and
    * GenericDatumReader pre-sizes a collection — of the DECLARED
    * length before checking it against the remaining input, so a
    * 5-byte poison frame declaring a 2 GiB string OOMs the executor
    * instead of failing the one record (measured: OutOfMemoryError at
    * -Xmx1g in ~30 ms). Avro's official guard is the
    * `org.apache.avro.limits.*` system properties, read once at
    * SystemLimitException class-init; this object loads at PLAN time
    * on every graft Avro path (toSparkType/toAvroDatum), before any
    * decode executes, so setting them here bounds every decode. User
    * overrides win — values are only set if absent. A frame that
    * trips a limit fails LOUDLY with SystemLimitException, which
    * `decodeLenientExpr` quarantines like any other corruption. */
  private def setLimitIfUnset(prop: String, v: Long): Unit =
    if (System.getProperty(prop) == null) System.setProperty(prop, v.toString)
  setLimitIfUnset("org.apache.avro.limits.bytes.maxLength", 128L << 20)
  setLimitIfUnset("org.apache.avro.limits.string.maxLength", 128L << 20)
  setLimitIfUnset("org.apache.avro.limits.collectionItems.maxLength", 1L << 24)
  // SystemLimitException snapshots the properties at ITS class-init —
  // if any other Avro decode in the JVM ran first (test-suite
  // parallelism, a co-resident Avro user), the values above would be
  // ignored. Its package-private resetLimits() re-reads them; invoke
  // it reflectively so the guard holds regardless of load order. If
  // the method ever disappears, the property path still covers the
  // common first-loader case.
  try {
    val m = Class.forName("org.apache.avro.SystemLimitException")
      .getDeclaredMethod("resetLimits")
    m.setAccessible(true)
    m.invoke(null)
  } catch { case _: Throwable => () }

  /** Forces this object's init (the limit setup above) — called from
    * every Avro codec object so constructing ANY graft Avro
    * expression guarantees the decode limits are live. */
  def ensureLimits(): Unit = ()

  /** Max schema nesting the engine accepts — matches protobuf's public
    * default recursion limit (100), far above any real event schema. */
  val MaxSchemaDepth = 100

  /** Parse an Avro schema JSON and validate it is BOUNDED: no
    * recursive named-type reference and nesting ≤ [[MaxSchemaDepth]].
    *
    * Depth bombs (round-17 fuzz family): a RECURSIVE schema — a
    * record whose field references itself by name, legal Avro and
    * parseable by `Schema.Parser` — would send [[toSparkType]] (and a
    * crafted frame would send Avro's own `GenericDatumReader`, whose
    * recursion is DATA-driven and unbounded by the
    * `org.apache.avro.limits.*` properties) into StackOverflowError:
    * an Error, not the loud-NonFatal contract. Schema JSON arrives
    * from the network (registry responses), so every graft parse site
    * goes through here; rejection is an IllegalArgumentException at
    * plan/handshake time, never a stack blow at decode time. */
  def parseSchema(json: String): AvroSchema = {
    val s = new AvroSchema.Parser().parse(json)
    validateBounded(s)
    s
  }

  /** See [[parseSchema]] — exposed for schemas that arrive already
    * parsed (builder APIs). */
  def validateBounded(s: AvroSchema): Unit = {
    def walk(sch: AvroSchema, path: List[String], depth: Int): Unit = {
      if (depth > MaxSchemaDepth) throw new IllegalArgumentException(
        s"avro schema nesting exceeds $MaxSchemaDepth levels — refusing " +
          "(decode recursion is data-driven past this point)")
      sch.getType match {
        case AvroSchema.Type.RECORD =>
          val name = sch.getFullName
          if (path.contains(name)) throw new IllegalArgumentException(
            s"recursive avro schema: record '$name' references itself " +
              s"(cycle: ${(name :: path).reverse.mkString(" -> ")}) — " +
              "unbounded decode recursion; refusing")
          sch.getFields.asScala.foreach(f =>
            walk(f.schema, name :: path, depth + 1))
        case AvroSchema.Type.ARRAY =>
          walk(sch.getElementType, path, depth + 1)
        case AvroSchema.Type.MAP =>
          walk(sch.getValueType, path, depth + 1)
        case AvroSchema.Type.UNION =>
          sch.getTypes.asScala.foreach(walk(_, path, depth + 1))
        case _ => ()
      }
    }
    walk(s, Nil, 0)
  }

  /** Avro schema → Spark type. */
  def toSparkType(s: AvroSchema): DataType = s.getType match {
    case AvroSchema.Type.BOOLEAN => BooleanType
    case AvroSchema.Type.INT => IntegerType
    case AvroSchema.Type.LONG =>
      s.getLogicalType match {
        case _: LogicalTypes.TimestampMillis | _: LogicalTypes.TimestampMicros =>
          TimestampType
        case _ => LongType
      }
    case AvroSchema.Type.FLOAT => FloatType
    case AvroSchema.Type.DOUBLE => DoubleType
    case AvroSchema.Type.STRING => StringType
    case AvroSchema.Type.BYTES | AvroSchema.Type.FIXED => BinaryType
    case AvroSchema.Type.ENUM => StringType
    case AvroSchema.Type.NULL => NullType
    case AvroSchema.Type.RECORD =>
      StructType(s.getFields.asScala.toSeq.map { f =>
        StructField(f.name, toSparkType(f.schema), nullable = isNullable(f.schema))
      })
    case AvroSchema.Type.ARRAY =>
      ArrayType(toSparkType(s.getElementType), isNullable(s.getElementType))
    case AvroSchema.Type.MAP =>
      MapType(StringType, toSparkType(s.getValueType), isNullable(s.getValueType))
    case AvroSchema.Type.UNION =>
      val branches = s.getTypes.asScala.filterNot(_.getType == AvroSchema.Type.NULL)
      if (branches.size == 1) toSparkType(branches.head)
      else StructType(branches.zipWithIndex.map { case (b, i) =>
        StructField(s"member$i", toSparkType(b), nullable = true)
      }.toSeq)
  }

  def isNullable(s: AvroSchema): Boolean =
    s.getType == AvroSchema.Type.NULL ||
      (s.getType == AvroSchema.Type.UNION &&
        s.getTypes.asScala.exists(_.getType == AvroSchema.Type.NULL))

  private def nonNull(s: AvroSchema): AvroSchema =
    if (s.getType != AvroSchema.Type.UNION) s
    else {
      val b = s.getTypes.asScala.filterNot(_.getType == AvroSchema.Type.NULL)
      if (b.size == 1) b.head else s
    }

  /** Catalyst value (as stored per `toSparkType`) → Avro datum.
    *
    * @param inputType the Catalyst type of `value` when known. Records
    *   are mapped to Avro fields BY NAME using it (extra input fields
    *   ignored, absent nullable schema fields → null) — positional
    *   mapping would silently mis-assign values whenever the struct's
    *   column order differs from the schema's field order. When null,
    *   the type is derived from the Avro schema (schema-ordered input).
    */
  def toAvroDatum(value: Any, s: AvroSchema, inputType: DataType = null): Any = {
    if (value == null) return null
    val sch = nonNull(s)
    sch.getType match {
      case AvroSchema.Type.BOOLEAN | AvroSchema.Type.INT |
           AvroSchema.Type.FLOAT | AvroSchema.Type.DOUBLE => value
      case AvroSchema.Type.LONG =>
        // Catalyst timestamps are micros; Avro logical millis wants ms
        sch.getLogicalType match {
          case _: LogicalTypes.TimestampMillis => value.asInstanceOf[Long] / 1000L
          case _ => value
        }
      case AvroSchema.Type.STRING => value.toString
      case AvroSchema.Type.ENUM =>
        new GenericData.EnumSymbol(sch, value.toString)
      case AvroSchema.Type.BYTES =>
        java.nio.ByteBuffer.wrap(value.asInstanceOf[Array[Byte]])
      case AvroSchema.Type.FIXED =>
        new GenericData.Fixed(sch, value.asInstanceOf[Array[Byte]])
      case AvroSchema.Type.RECORD =>
        val row = value.asInstanceOf[InternalRow]
        val rec = new GenericData.Record(sch)
        inputType match {
          case st: StructType =>
            // name-aligned mapping from the actual input struct
            val idx = st.fieldNames.zipWithIndex.toMap
            sch.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
              idx.get(f.name) match {
                case Some(j) if !row.isNullAt(j) =>
                  rec.put(i, toAvroDatum(
                    row.get(j, st(j).dataType), f.schema, st(j).dataType))
                case Some(_) => rec.put(i, null)
                case None if f.hasDefaultValue =>
                  // the declared default, NOT null — and checked BEFORE
                  // nullability: a nullable union field with a non-null
                  // declared default must encode that default, not null.
                  // getDefaultValue returns the generic-model deep copy
                  // of the schema's default literal (null for a null
                  // default, so this arm is uniformly correct for
                  // nullable-with-null-default too).
                  rec.put(i, GenericData.get().getDefaultValue(f))
                case None if isNullable(f.schema) => rec.put(i, null)
                case None => throw new IllegalArgumentException(
                  s"input struct has no field '${f.name}' required by " +
                    s"schema ${sch.getFullName} (have: ${st.fieldNames.mkString(",")})")
              }
            }
          case _ =>
            // schema-ordered input (no type info available)
            val sparkType = toSparkType(sch).asInstanceOf[StructType]
            sch.getFields.asScala.zipWithIndex.foreach { case (f, i) =>
              val v =
                if (row.isNullAt(i)) null
                else toAvroDatum(row.get(i, sparkType(i).dataType), f.schema)
              rec.put(i, v)
            }
        }
        rec
      case AvroSchema.Type.ARRAY =>
        val arr = value.asInstanceOf[ArrayData]
        val elemT = inputType match {
          case ArrayType(et, _) => et
          case _ => toSparkType(sch.getElementType)
        }
        (0 until arr.numElements()).map { i =>
          if (arr.isNullAt(i)) null
          else toAvroDatum(arr.get(i, elemT), sch.getElementType, elemT)
        }.asJava
      case AvroSchema.Type.MAP =>
        val m = value.asInstanceOf[org.apache.spark.sql.catalyst.util.MapData]
        val valT = inputType match {
          case MapType(_, vt, _) => vt
          case _ => toSparkType(sch.getValueType)
        }
        val keys = m.keyArray()
        val vals = m.valueArray()
        val out = new java.util.HashMap[String, Any]()
        (0 until m.numElements()).foreach { i =>
          val v = if (vals.isNullAt(i)) null
            else toAvroDatum(vals.get(i, valT), sch.getValueType, valT)
          out.put(keys.getUTF8String(i).toString, v)
        }
        out
      case AvroSchema.Type.UNION =>
        // multi-branch union: Catalyst side is a member0/member1 struct;
        // emit the first non-null member
        val row = value.asInstanceOf[InternalRow]
        val branches = sch.getTypes.asScala
          .filterNot(_.getType == AvroSchema.Type.NULL).toSeq
        val sparkType = toSparkType(sch).asInstanceOf[StructType]
        branches.zipWithIndex.collectFirst {
          case (b, i) if !row.isNullAt(i) =>
            toAvroDatum(row.get(i, sparkType(i).dataType), b)
        }.orNull
      case other =>
        throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  /** Avro datum → Catalyst value matching `toSparkType`. */
  def fromAvroDatum(value: Any, s: AvroSchema): Any = {
    if (value == null) return null
    val sch = nonNull(s)
    sch.getType match {
      case AvroSchema.Type.BOOLEAN | AvroSchema.Type.INT |
           AvroSchema.Type.FLOAT | AvroSchema.Type.DOUBLE => value
      case AvroSchema.Type.LONG =>
        sch.getLogicalType match {
          case _: LogicalTypes.TimestampMillis => value.asInstanceOf[Long] * 1000L
          case _ => value
        }
      case AvroSchema.Type.STRING | AvroSchema.Type.ENUM =>
        UTF8String.fromString(value.toString)
      case AvroSchema.Type.BYTES =>
        val bb = value.asInstanceOf[java.nio.ByteBuffer]
        val out = new Array[Byte](bb.remaining())
        bb.duplicate().get(out)
        out
      case AvroSchema.Type.FIXED =>
        value.asInstanceOf[GenericData.Fixed].bytes().clone()
      case AvroSchema.Type.RECORD =>
        val rec = value.asInstanceOf[org.apache.avro.generic.GenericRecord]
        val fields = sch.getFields.asScala
        InternalRow.fromSeq(fields.map(f =>
          fromAvroDatum(rec.get(f.pos), f.schema)).toSeq)
      case AvroSchema.Type.ARRAY =>
        val xs = value.asInstanceOf[java.util.Collection[_]].asScala
        new GenericArrayData(xs.map(fromAvroDatum(_, sch.getElementType)).toArray)
      case AvroSchema.Type.MAP =>
        val m = value.asInstanceOf[java.util.Map[_, _]].asScala
        val keys = m.keys.map(k => UTF8String.fromString(k.toString)).toArray[Any]
        val vals = m.values.map(fromAvroDatum(_, sch.getValueType)).toArray[Any]
        ArrayBasedMapData(keys, vals)
      case AvroSchema.Type.UNION =>
        val branches = sch.getTypes.asScala
          .filterNot(_.getType == AvroSchema.Type.NULL).toSeq
        val idx = branches.indexWhere(b => datumMatches(value, b))
        val vals = Array.fill[Any](branches.size)(null)
        if (idx >= 0) vals(idx) = fromAvroDatum(value, branches(idx))
        InternalRow.fromSeq(vals.toIndexedSeq)
      case other =>
        throw new IllegalArgumentException(s"unsupported avro type $other")
    }
  }

  /** Runtime branch dispatch for multi-branch unions — the engine-side
    * analog of the reference's `find_schema_type`
    * (avro_schema_coercer.rb:29-61). */
  private def datumMatches(v: Any, s: AvroSchema): Boolean = s.getType match {
    case AvroSchema.Type.BOOLEAN => v.isInstanceOf[java.lang.Boolean]
    case AvroSchema.Type.INT => v.isInstanceOf[java.lang.Integer]
    case AvroSchema.Type.LONG => v.isInstanceOf[java.lang.Long]
    case AvroSchema.Type.FLOAT => v.isInstanceOf[java.lang.Float]
    case AvroSchema.Type.DOUBLE => v.isInstanceOf[java.lang.Double]
    case AvroSchema.Type.STRING =>
      v.isInstanceOf[CharSequence]
    case AvroSchema.Type.BYTES => v.isInstanceOf[java.nio.ByteBuffer]
    case AvroSchema.Type.ENUM => v.isInstanceOf[GenericData.EnumSymbol]
    case AvroSchema.Type.RECORD =>
      v.isInstanceOf[org.apache.avro.generic.GenericRecord] &&
        v.asInstanceOf[org.apache.avro.generic.GenericRecord]
          .getSchema.getFullName == s.getFullName
    case AvroSchema.Type.ARRAY => v.isInstanceOf[java.util.Collection[_]]
    case AvroSchema.Type.MAP => v.isInstanceOf[java.util.Map[_, _]]
    case AvroSchema.Type.FIXED => v.isInstanceOf[GenericData.Fixed]
    case _ => false
  }
}
