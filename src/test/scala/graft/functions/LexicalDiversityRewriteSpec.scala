package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-17 optimization guard: `lexicalDiversity` was rewritten from
  * the zip-of-slices formulation (≈8 evaluations of a
  * lambda-comparator sort per row — HOF subtrees are CSE-exempt) to
  * ONE `sort_array` + ONE run-length `aggregate` pass. This spec pins
  * the rewrite to the ORIGINAL formulation, inlined here verbatim, on
  * adversarial token multisets — plus the null-text shape the old form
  * produced (a NON-null struct of null fields, not a null struct). */
class LexicalDiversityRewriteSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{TextFunctions => T}

  /** The pre-rewrite formulation, verbatim. */
  private def oldLexicalDiversity(text: Column): Column = {
    val s = array_sort(T.tokens(text))
    val n = size(s)
    val sliceLen = greatest(n - 1, lit(0))
    val dupValues = filter(
      zip_with(slice(s, lit(1), sliceLen), slice(s, lit(2), sliceLen),
        (a, b) => when(a === b, a)),
      x => x.isNotNull)
    val nTypes = size(array_distinct(s))
    struct(n.cast("long").as("n_tokens"),
      nTypes.cast("long").as("n_types"),
      (nTypes - size(array_distinct(dupValues))).cast("long").as("hapax"))
  }

  test("rewrite ≡ original on adversarial token multisets") {
    val docs = Seq(
      "",                         // no tokens
      "solo",                     // single hapax
      "a a a a",                  // one all-repeat run
      "a b a c c c",              // mixed runs
      "z y x w v",                // all hapax, reverse input order
      "b a b a b a",              // two interleaved repeats, no hapax
      "The THE the tHe",          // case folding collapses to one type
      "x1 x2 x1 x3 x3 x4 x4 x4",  // alternating runs
      "čerešňa čerešňa jabĺčko",  // non-ASCII letters, one repeat
      "a-b a_b a b",              // separator class splits the hyphen
      (1 to 200).map(i => s"w${i % 7}").mkString(" ") // long, 7 types
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = docs.select(col("id"),
        T.lexicalDiversity(col("t")).as("ld"),
        oldLexicalDiversity(col("t")).as("old"))
      .select(col("id"),
        col("ld.n_tokens"), col("ld.n_types"), col("ld.hapax"),
        col("old.n_tokens"), col("old.n_types"), col("old.hapax"))
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    got.foreach { case (id, n1, t1, h1, n2, t2, h2) =>
      assert((n1, t1, h1) === ((n2, t2, h2)),
        s"rewrite diverges from original on doc $id")
    }
  }

  test("null text keeps the original shape: non-null struct, null fields") {
    val got = Seq[(Long, String)]((0L, null), (1L, "a a b"))
      .toDF("id", "t")
      .select(col("id"), T.lexicalDiversity(col("t")).as("ld"))
      .select(col("id"), col("ld").isNull.as("struct_null"),
        col("ld.n_tokens").isNull.as("n_null"))
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    // old form: struct(size(null)...) = a present struct of null fields
    assert(got === Seq((0L, false, true), (1L, false, false)))
  }
}
