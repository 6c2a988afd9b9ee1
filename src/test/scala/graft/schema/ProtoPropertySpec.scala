package graft.schema

import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import ProtoWire._

/** Property round-trips for the wire codec: decode(encode(x)) must
  * equal x up to proto3 default normalization (null and default-valued
  * scalars are indistinguishable from absent on the wire — both decode
  * to the default). Fixed seeds, raw ScalaCheck generators (the
  * scalatestplus bridge is not in the offline cache). */
class ProtoPropertySpec extends AnyFunSuite {

  private val msg = ProtoMessage("P", Seq(
    ProtoField("i32", 1, PInt32), ProtoField("i64", 2, PInt64),
    ProtoField("s32", 3, PSInt32), ProtoField("s64", 4, PSInt64),
    ProtoField("u32", 5, PUInt32), ProtoField("u64", 6, PUInt64),
    ProtoField("f32", 7, PFixed32), ProtoField("f64", 8, PFixed64),
    ProtoField("b", 9, PBool), ProtoField("fl", 10, PFloat),
    ProtoField("db", 11, PDouble), ProtoField("st", 12, PString),
    ProtoField("by", 13, PBytes),
    ProtoField("rs", 14, PString, repeated = true),
    ProtoField("rn", 15, PSInt64, repeated = true)))

  private val extremeInt = Gen.oneOf(Gen.choose(Int.MinValue, Int.MaxValue),
    Gen.oneOf(0, 1, -1, Int.MinValue, Int.MaxValue, 127, 128, 300))
  private val extremeLong = Gen.oneOf(Gen.choose(Long.MinValue, Long.MaxValue),
    Gen.oneOf(0L, 1L, -1L, Long.MinValue, Long.MaxValue, 1L << 35, -(1L << 35)))
  private val str = Gen.oneOf(Gen.alphaStr.map(_.take(12)),
    Gen.const(""), Gen.const("héllo wörld €世"))

  private val rowGen: Gen[Array[Any]] = for {
    i32 <- extremeInt; i64 <- extremeLong
    s32 <- extremeInt; s64 <- extremeLong
    u32 <- extremeInt; u64 <- extremeLong
    f32 <- extremeInt; f64 <- extremeLong
    b <- Gen.oneOf(true, false)
    fl <- Gen.oneOf(0.0f, 1.5f, -2.25f, Float.MaxValue, Float.MinPositiveValue)
    db <- Gen.oneOf(0.0, 3.25, -1e300, 1e-300)
    st <- str
    by <- Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.take(16))
    rs <- Gen.listOf(str).map(_.take(5))
    rn <- Gen.listOf(extremeLong).map(_.take(8))
  } yield Array[Any](i32, i64, s32, s64, u32, u64, f32, f64, b, fl, db,
    UTF8String.fromString(st), by.toArray,
    new GenericArrayData(rs.map(UTF8String.fromString).toArray[Any]),
    new GenericArrayData(rn.toArray[Any]))

  test("decode(encode(row)) == row for arbitrary values incl. boundaries") {
    (1 to 200).foreach { seed =>
      val values = rowGen.apply(Gen.Parameters.default, Seed(seed.toLong))
        .getOrElse(fail(s"gen failed at seed $seed"))
      val row = new GenericInternalRow(values.clone())
      val back = ProtoWire.decode(ProtoWire.encode(row, msg), msg)
      msg.fields.zipWithIndex.foreach { case (f, i) =>
        (f.ptype, values(i), back.get(i, sparkTypeOf(f.ptype))) match {
          case (PBytes, exp: Array[Byte], got: Array[Byte]) =>
            assert(got.toSeq === exp.toSeq, s"field ${f.name} seed $seed")
          case (_, exp: GenericArrayData, got: GenericArrayData) =>
            assert(got.array.toSeq.map {
              case u: UTF8String => u.toString
              case o => o
            } === exp.array.toSeq.map {
              case u: UTF8String => u.toString
              case o => o
            }, s"field ${f.name} seed $seed")
          case (_, exp, got) =>
            assert(got === exp, s"field ${f.name} seed $seed")
        }
      }
    }
  }

  test("null fields decode as proto3 defaults") {
    val row = new GenericInternalRow(Array.fill[Any](msg.fields.size)(null))
    val back = ProtoWire.decode(ProtoWire.encode(row, msg), msg)
    assert(back.getInt(0) === 0)
    assert(back.getLong(1) === 0L)
    assert(back.getBoolean(8) === false)
    assert(back.getUTF8String(11).toString === "")
    assert(back.getBinary(12).length === 0)
    assert(back.getArray(13).numElements() === 0)
    assert(back.getArray(14).numElements() === 0)
  }
}
