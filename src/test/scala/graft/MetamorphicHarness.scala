package graft

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Shared machinery for the metamorphic spec family (round-17 verdict
  * item 1): ENGINE-ONLY invariants that need no oracle. The DuckDB
  * harness has one author writing both sides of every query — a
  * wrong-both-ways misunderstanding passes 173/173 forever. These
  * invariants are properties the OPERATOR must satisfy regardless of
  * what either side of the oracle pair believes the answer is:
  *
  *   - layout invariance: the result is a pure function of the input
  *     VALUES — re-ordering rows and re-splitting files changes
  *     nothing (MetamorphicLayoutSpec);
  *   - idempotence: curating an already-curated corpus is a no-op
  *     (MetamorphicIdempotenceSpec);
  *   - split-union consistency: op(A ∪ B) equals the merge of op(A)
  *     and op(B) for mergeable ops (MetamorphicSplitUnionSpec);
  *   - deletion monotonicity/stability: removing rows never grows a
  *     gate's pass set or invents dedup pairs
  *     (MetamorphicMonotonicitySpec).
  *
  * Every suite carries a TEETH test: a deliberately seeded mutant of
  * the operator (op composed with a layout-, position-, or
  * corpus-count-dependent corruption) must FAIL the invariant check —
  * proving the checker can actually catch the bug class it exists for.
  */
object MetamorphicHarness {

  /** Canonical string for one value: doubles/floats rounded to 9 dp
    * (the driver parity norm — cross-layout float aggregation differs
    * in the last ulp), binary as hex, containers recursed. */
  def canonVal(v: Any): String = v match {
    case null => "∅"
    case d: Double => canonDouble(d)
    case f: Float => canonDouble(f.toDouble)
    case bd: java.math.BigDecimal => bd.stripTrailingZeros.toPlainString
    case b: Array[Byte] => b.map(x => f"${x & 0xff}%02x").mkString
    case r: Row => r.toSeq.map(canonVal).mkString("(", ",", ")")
    case s: scala.collection.Seq[_] =>
      s.map(canonVal).mkString("[", ",", "]")
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${canonVal(k)}:${canonVal(x)}" }
        .toSeq.sorted.mkString("{", ",", "}")
    case other => String.valueOf(other)
  }

  private def canonDouble(d: Double): String =
    if (d.isNaN) "NaN"
    else if (d.isInfinite) { if (d > 0) "Inf" else "-Inf" }
    else new java.math.BigDecimal(d)
      .setScale(9, java.math.RoundingMode.HALF_EVEN)
      .stripTrailingZeros.toPlainString

  /** The frame as a sorted multiset of canonical row strings —
    * layout- and order-free identity. */
  def canon(df: DataFrame): Seq[String] =
    df.collect().toSeq.map(canonVal).sorted

  /** Multiset equality with a readable first-difference message.
    * Returns the diff description instead of throwing so the teeth
    * tests can assert the checker DOES flag a mutant. */
  def diff(a: DataFrame, b: DataFrame): Option[String] = {
    val ca = canon(a)
    val cb = canon(b)
    if (ca == cb) None
    else {
      val onlyA = ca.diff(cb)
      val onlyB = cb.diff(ca)
      Some(s"${ca.size} vs ${cb.size} rows; " +
        s"only-left ${onlyA.size} (first: ${onlyA.headOption.getOrElse("")
          .take(200)}); " +
        s"only-right ${onlyB.size} (first: ${onlyB.headOption.getOrElse("")
          .take(200)})")
    }
  }

  def assertSame(name: String, a: DataFrame, b: DataFrame): Unit =
    diff(a, b).foreach(d => throw new AssertionError(s"$name: $d"))

  /** Write a VALUE-identical but LAYOUT-permuted copy of every table
    * in `srcDir` into `destDir`: row order shuffled by a seeded rand,
    * single files re-split into several. Idempotent per JVM (marker
    * file). */
  def permutedCopy(spark: SparkSession, srcDir: String, destDir: String,
      seed: Long = 0x17AB17AB): Unit = {
    val marker = java.nio.file.Paths.get(destDir, "_PERMUTED_OK")
    if (java.nio.file.Files.exists(marker)) return
    val tables = new java.io.File(srcDir).list()
      .filter(_.endsWith(".parquet")).map(_.stripSuffix(".parquet"))
    tables.foreach { t =>
      val df = spark.read.parquet(s"$srcDir/$t.parquet")
      df.withColumn("__shuf", rand(seed + t.hashCode))
        .repartitionByRange(3, col("__shuf"))
        .sortWithinPartitions(col("__shuf"))
        .drop("__shuf")
        .write.mode("overwrite").parquet(s"$destDir/$t.parquet")
    }
    java.nio.file.Files.createDirectories(marker.getParent)
    java.nio.file.Files.write(marker, Array.emptyByteArray)
  }
}
