package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Round-18 optimization guard: `dedupeLines` was rewritten from the
  * O(lines²) interpreted seen-set `aggregate` (an array_contains scan
  * plus an array-copying concat per line) to sort-by-(line, pos) +
  * neighbor-compare + re-sort-by-pos — O(n log n) with trivial-body
  * lambdas. This spec pins the rewrite to the ORIGINAL formulation,
  * inlined here verbatim, on adversarial line multisets. */
class DedupeLinesRewriteSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{TextFunctions => T}

  /** The pre-rewrite formulation, verbatim. */
  private def oldDedupeLines(text: Column): Column =
    aggregate(split(text, "\n"),
      struct(array().cast("array<string>").as("seen"),
        array().cast("array<string>").as("out")),
      (acc, l) => {
        val seen = acc.getField("seen")
        val out = acc.getField("out")
        val blank = l === ""
        val dup = !blank && array_contains(seen, l)
        struct(
          when(blank || dup, seen).otherwise(concat(seen, array(l)))
            .as("seen"),
          when(dup, out).otherwise(concat(out, array(l))).as("out"))
      },
      acc => array_join(acc.getField("out"), "\n"))

  test("rewrite ≡ original on adversarial line multisets") {
    val docs = Seq(
      "",                               // one blank line
      "only",                           // single line
      "a\nb\na\nc",                     // interior repeat
      "a\na\na",                        // all-repeat
      "x\n\ny\n\nx\n\ny",               // blanks always kept, lines deduped
      "\n\n\n",                         // blanks only
      "B\nb\nB",                        // case-sensitive identity
      "ä\nä\nz",                        // non-ASCII repeat
      "t \nt\nt ",                      // trailing-space distinguishes
      "last\nfirst\nlast\nfirst\nmid",  // order preservation
      (1 to 300).map(i => s"l${i % 11}").mkString("\n"), // long, 11 lines
      (1 to 50).map(_ => "same").mkString("\n")          // hot line
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val got = docs.select(col("id"),
        T.dedupeLines(col("t")).as("neu"),
        oldDedupeLines(col("t")).as("old"))
      .as[(Long, String, String)].collect()
    got.foreach { case (id, n, o) =>
      assert(n === o, s"rewrite diverges from original on doc $id")
    }
  }

  test("null text stays null, like the original") {
    val got = Seq[(Long, String)]((0L, null), (1L, "a\na"))
      .toDF("id", "t")
      .select(col("id"), T.dedupeLines(col("t")).isNull.as("n"),
        oldDedupeLines(col("t")).isNull.as("o"))
      .as[(Long, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(got === Seq((0L, true, true), (1L, false, false)))
  }
}
