package graft.schema

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Payload validation against a declared schema — the engine's version
  * of the reference backend contract's `validate(payload, schema:)`
  * (`lib/deimos/schema_backends/base.rb:163-165`, Avro impl
  * `avro_base.rb:85-89`: `Avro::SchemaValidator.validate!` with
  * `recursive: true, fail_on_extra_fields: true`).
  *
  * Errors AGGREGATE into one `array<string>` per row (empty = valid)
  * instead of surfacing as an opaque encode exception on the first bad
  * field. Structural facts (missing / extra / un-coercible fields) are
  * known at plan time and become constant error entries; null-in-
  * required-field is the per-row runtime check. Everything is pure
  * `Column` arithmetic — validation rides the scan inside codegen, no
  * UDF, no extra pass.
  */
object SchemaValidation {

  /** Can a value of `actual` type be encoded into an `expected` slot
    * without loss? Exact match, safe integral/float widening, and
    * recursively compatible containers. Structs compare STRUCTURALLY
    * here (field names + types, extra fields rejected) — per-row null
    * checks inside container elements aren't expressible as flat
    * Column arithmetic, but shape mismatches still surface at plan
    * time instead of as opaque encode exceptions. Top-level struct
    * FIELDS take the field-wise errorExprs recursion instead (which
    * adds the runtime null checks). */
  private def compat(actual: DataType, expected: DataType): Boolean =
    (actual, expected) match {
      case (a, e) if a == e => true
      case (ByteType | ShortType | IntegerType, LongType) => true
      case (ByteType | ShortType, IntegerType) => true
      case (ByteType, ShortType) => true
      case (FloatType, DoubleType) => true
      case (a: StructType, e: StructType) =>
        val eByName = e.fields.map(f => f.name -> f).toMap
        // no extra fields; present fields type-compatible; required
        // expected fields present
        a.fields.forall(af => eByName.get(af.name)
          .exists(ef => compat(af.dataType, ef.dataType))) &&
          e.fields.filterNot(_.nullable)
            .forall(ef => a.fieldNames.contains(ef.name))
      case (ArrayType(a, _), ArrayType(e, _)) => compat(a, e)
      case (MapType(ak, av, _), MapType(ek, ev, _)) =>
        compat(ak, ek) && compat(av, ev)
      case _ => false
    }

  /** Per-field error expressions: null for a passing row, a message
    * string otherwise. Constant messages for structural mismatches. */
  private def errorExprs(payload: Column, actual: StructType,
      expected: StructType, path: String): Seq[Column] = {
    val actualByName = actual.fields.map(f => f.name -> f).toMap
    val expectedNames = expected.fieldNames.toSet
    // required fields absent from the payload shape: structural, every
    // row fails; optional (nullable) fields may be omitted — they
    // encode as null, same as the reference's defaulted fields
    val missing = expected.fields.toSeq
      .filter(f => !f.nullable && !actualByName.contains(f.name))
      .map(f => lit(s"$path${f.name}: missing required field"))
    // fail_on_extra_fields parity
    val extra = actual.fields.toSeq
      .filterNot(f => expectedNames.contains(f.name))
      .map(f => lit(s"$path${f.name}: field not in schema"))
    val perField = expected.fields.toSeq.flatMap { ef =>
      actualByName.get(ef.name).toSeq.flatMap { af =>
        val child = payload.getField(ef.name)
        val requiredErr =
          if (ef.nullable) Seq.empty[Column]
          else Seq(when(payload.isNotNull && child.isNull,
            s"$path${ef.name}: null for required field"))
        val typeErrs = (af.dataType, ef.dataType) match {
          case (a: StructType, e: StructType) =>
            errorExprs(child, a, e, s"$path${ef.name}.")
          case (a, e) if compat(a, e) => Seq.empty[Column]
          case (a, e) => Seq(lit(
            s"$path${ef.name}: ${a.simpleString} not coercible to ${e.simpleString}"))
        }
        requiredErr ++ typeErrs
      }
    }
    missing ++ extra ++ perField
  }

  /** Aggregated per-row error report: `array<string>`, empty = valid. */
  def validate(payload: Column, payloadType: StructType,
      schema: StructType): Column = {
    val errs = errorExprs(payload, payloadType, schema, "")
    if (errs.isEmpty) array().cast(ArrayType(StringType, containsNull = false))
    else filter(array(errs.map(_.cast(StringType)): _*), e => e.isNotNull)
  }
}
