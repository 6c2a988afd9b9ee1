package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._

/** Custom Catalyst expressions for the sketch hot paths.
  *
  * The HOF formulations (transform/filter/aggregate) are semantically
  * fine but evaluate one lambda call per element per pass — a 64-bit
  * SimHash is 64 interpreted passes per row. These expressions do the
  * same work in one tight JVM loop per row, the preference order of
  * SURVEY.md §7.3 ((b): custom Expression before mapPartitions).
  * CodegenFallback: the per-row loop dominates; codegen of the loop
  * itself is a later optimization.
  */
object Expressions {

  private def col(e: Expression): Column = GraftSqlBridge.column(e)
  private def ex(c: Column): Expression = GraftSqlBridge.expression(c)

  /** splitmix64 — deterministic per-permutation constants. */
  private[functions] def splitmix64(seed: Long): Long = {
    var z = seed + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit SimHash over an array<bigint> of token hashes: bit i set
    * when the majority of token-hash bits i are set. One pass. */
  case class SimHash64Expr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val counts = new Array[Int](64)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          counts(b) += ((h >>> b) & 1L).toInt
          b += 1
        }
        i += 1
      }
      var out = 0L
      var b = 0
      while (b < 64) {
        if (counts(b) * 2 > n) out |= (1L << b)
        b += 1
      }
      out
    }
    override protected def withNewChildInternal(c: Expression): SimHash64Expr =
      copy(c)
  }

  /** k-permutation MinHash over an array<bigint> of element hashes.
    * Permutation p is the affine map a_p·h + b_p (a_p odd, from
    * splitmix64) — the standard one-hash-then-k-affine scheme; one pass
    * over the array for all k mins. */
  case class MinHashSigExpr(child: Expression, k: Int)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private lazy val as: Array[Long] =
      Array.tabulate(k)(p => splitmix64(2L * p) | 1L)
    private lazy val bs: Array[Long] =
      Array.tabulate(k)(p => splitmix64(2L * p + 1L))
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val n = arr.numElements()
      val out = Array.fill(k)(Long.MaxValue)
      var i = 0
      while (i < n) {
        val h = arr.getLong(i)
        var p = 0
        while (p < k) {
          val v = as(p) * h + bs(p)
          if (v < out(p)) out(p) = v
          p += 1
        }
        i += 1
      }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): MinHashSigExpr =
      copy(child = c)
  }

  /** Distinct hashes of the n-gram windows of a pre-hashed token array:
    * gram i is a polynomial mix of hashes i..i+n-1. One pass; output
    * order = first occurrence. Set arithmetic over these (Jaccard,
    * MinHash) is equivalent to string shingles up to 64-bit collisions.
    */
  case class NGramHashesExpr(child: Expression, n: Int,
      dedupe: Boolean = true)
      extends UnaryExpression with CodegenFallback {
    require(n >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val len = arr.numElements()
      if (len < n) return new GenericArrayData(Array.empty[Long])
      val seen = new java.util.HashSet[java.lang.Long]()
      val out = new scala.collection.mutable.ArrayBuffer[Long](len - n + 1)
      var i = 0
      while (i <= len - n) {
        var h = 1125899906842597L
        var j = 0
        while (j < n) {
          h = h * 0x100000001b3L + arr.getLong(i + j)
          j += 1
        }
        val g = splitmix64(h)
        if (!dedupe || seen.add(g)) out += g
        i += 1
      }
      new GenericArrayData(out.toArray)
    }
    override protected def withNewChildInternal(c: Expression): NGramHashesExpr =
      copy(child = c)
  }

  /** Winnowing document fingerprint (Schleimer/Wilkerson/Aiken):
    * Rabin-Karp rolling hash over the byte stream with window `w`;
    * from each window of `w` consecutive k-gram hashes keep the
    * minimum (rightmost on ties) — the classic plagiarism-detection
    * fingerprint set, robust to insertions. Output: distinct selected
    * hashes, first-occurrence order. One pass.
    */
  case class WinnowFingerprintExpr(child: Expression, k: Int, w: Int)
      extends UnaryExpression with CodegenFallback {
    require(k >= 1 && w >= 1)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    private val Base = 257L
    @transient private lazy val basePowK1: Long = {
      var p = 1L
      var i = 0
      while (i < k - 1) { p *= Base; i += 1 }
      p
    }
    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[Array[Byte]]
      val n = bytes.length
      if (n < k) return new GenericArrayData(Array.empty[Long])
      // rolling k-gram hashes
      val grams = new Array[Long](n - k + 1)
      var h = 0L
      var i = 0
      while (i < k) { h = h * Base + (bytes(i) & 0xff); i += 1 }
      grams(0) = splitmix64(h)
      i = k
      while (i < n) {
        h = (h - (bytes(i - k) & 0xff) * basePowK1) * Base + (bytes(i) & 0xff)
        grams(i - k + 1) = splitmix64(h)
        i += 1
      }
      // winnow: min per window, rightmost on ties
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      val m = grams.length
      if (m <= w) {
        var best = 0
        var j = 1
        while (j < m) { if (grams(j) <= grams(best)) best = j; j += 1 }
        seen.add(grams(best))
      } else {
        var start = 0
        while (start + w <= m) {
          var best = start
          var j = start + 1
          while (j < start + w) { if (grams(j) <= grams(best)) best = j; j += 1 }
          seen.add(grams(best))
          start += 1
        }
      }
      val out = new Array[Long](seen.size)
      val it = seen.iterator()
      var o = 0
      while (it.hasNext) { out(o) = it.next(); o += 1 }
      new GenericArrayData(out)
    }
    override protected def withNewChildInternal(c: Expression): WinnowFingerprintExpr =
      copy(child = c)
  }

  /** Unicode NFC normalization (java.text.Normalizer) — canonical
    * composition so visually-identical strings dedup/fingerprint
    * identically. Not exposed by Spark SQL builtins. */
  case class NormalizeNfcExpr(child: Expression)
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = StringType
    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
        .toString
      org.apache.spark.unsafe.types.UTF8String.fromString(
        java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
    }
    override protected def withNewChildInternal(c: Expression): NormalizeNfcExpr =
      copy(child = c)
  }

  /** Cosine similarity of two numeric arrays (float or double
    * elements), accumulated in double in one pass; 0.0 for zero-norm
    * inputs. */
  case class CosineSimExpr(left: Expression, right: Expression)
      extends BinaryExpression with CodegenFallback {
    override def dataType: DataType = DoubleType
    private def elemType(e: Expression): DataType =
      e.dataType.asInstanceOf[ArrayType].elementType
    private def read(a: ArrayData, i: Int, t: DataType): Double = t match {
      case FloatType => a.getFloat(i).toDouble
      case DoubleType => a.getDouble(i)
      case LongType => a.getLong(i).toDouble
      case IntegerType => a.getInt(i).toDouble
      case other => throw new IllegalArgumentException(
        s"cosine over unsupported element type $other")
    }
    override def nullSafeEval(l: Any, r: Any): Any = {
      val (la, ra) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
      val (lt, rt) = (elemType(left), elemType(right))
      val n = math.min(la.numElements(), ra.numElements())
      var dot = 0.0
      var na = 0.0
      var nb = 0.0
      var i = 0
      while (i < n) {
        val x = read(la, i, lt)
        val y = read(ra, i, rt)
        dot += x * y
        na += x * x
        nb += y * y
        i += 1
      }
      val denom = math.sqrt(na) * math.sqrt(nb)
      if (denom == 0.0) 0.0 else dot / denom
    }
    override protected def withNewChildrenInternal(l: Expression,
        r: Expression): CosineSimExpr = copy(l, r)
  }

  def simhash64(tokenHashes: Column): Column =
    col(SimHash64Expr(ex(tokenHashes)))

  def minhashSignature(tokenHashes: Column, k: Int): Column =
    col(MinHashSigExpr(ex(tokenHashes), k))

  def ngramHashes(tokenHashes: Column, n: Int): Column =
    col(NGramHashesExpr(ex(tokenHashes), n))

  def ngramHashesAll(tokenHashes: Column, n: Int): Column =
    col(NGramHashesExpr(ex(tokenHashes), n, dedupe = false))

  def winnowFingerprint(bytes: Column, k: Int = 5, w: Int = 4): Column =
    col(WinnowFingerprintExpr(ex(bytes), k, w))

  def normalizeNfc(text: Column): Column = col(NormalizeNfcExpr(ex(text)))

  def cosineSim(a: Column, b: Column): Column =
    col(CosineSimExpr(ex(a), ex(b)))
}
