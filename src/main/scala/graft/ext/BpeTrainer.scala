package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** BPE tokenizer training (vocab induction) — the step a training
  * pipeline runs BEFORE tokenize/pack: learn the merge table from the
  * corpus, then segment with it everywhere.
  *
  * Scale shape (the standard industry split, same pattern as IVF
  * centroid training): the CORPUS-sized work — word frequency
  * counting — is one distributed shuffle; the merge loop then runs on
  * the BOUNDED word-frequency dictionary (top `maxWords` word types;
  * HF-style trainers work from exactly such a word-count dict). The
  * loop is O(nMerges × dictChars) here — a recount per merge, honest
  * and deterministic; a production trainer at 100k merges would keep
  * an incremental pair-location index, which changes the constant,
  * not the statistics.
  *
  * Determinism: ties in pair frequency break lexicographically, the
  * dictionary bound takes the most frequent words (freq desc, word
  * asc), so the merge table is a pure function of the corpus.
  */
object BpeTrainer {

  /** One learned merge: rank is the application order. */
  final case class Merge(rank: Int, left: String, right: String,
      pairCount: Long)

  /** Initial symbol split, CODEPOINT-level: Java char-level `w.map`
    * shears supplementary-plane chars into half-surrogates — symbols
    * no UTF8String can carry (they encode to U+FFFD, collapsing
    * distinct tokens in the segmented output) and a split the DuckDB
    * oracle's codepoint semantics can never reproduce (round-15
    * review). BMP text is unaffected. */
  private[ext] def charSyms(w: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** Distributed word-frequency table: the only corpus-sized stage.
    * Lowercased whitespace words, one shuffle. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Learn `nMerges` merges from the corpus. Collects ONLY the bounded
    * top-`maxWords` word-frequency dictionary (deterministic order) —
    * never corpus-sized data. */
  def train(docs: DataFrame, textCol: String, nMerges: Int,
      maxWords: Int = 50000): Seq[Merge] = {
    val dict = wordCounts(docs, textCol)
      .orderBy(col("freq").desc, col("word"))
      .limit(maxWords)
      .collect()
      .map(r => (r.getString(0), r.getLong(1)))
    trainFromCounts(dict, nMerges)
  }

  /** The merge loop proper, exposed for spec-level golden tests. */
  def trainFromCounts(dict: Seq[(String, Long)], nMerges: Int): Seq[Merge] = {
    require(nMerges >= 0, s"nMerges must be >= 0, got $nMerges")
    // each word as its current symbol sequence (initially characters)
    val words = dict.map { case (w, f) =>
      (scala.collection.mutable.ArrayBuffer(charSyms(w): _*), f)
    }
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      words.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        // max by count, ties broken lexicographically — deterministic
        val (best, bestCount) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        merges += Merge(rank, best._1, best._2, bestCount)
        val joined = best._1 + best._2
        words.foreach { case (syms, _) =>
          var i = 0
          while (i < syms.length - 1) {
            if (syms(i) == best._1 && syms(i + 1) == best._2) {
              syms(i) = joined
              syms.remove(i + 1)
              // do NOT advance: the new symbol may pair with the next
              // occurrence left-to-right (aaa + merge(a,a) -> [aa, a])
            } else i += 1
          }
        }
        rank += 1
      }
    }
    merges.result()
  }

  /** Segment one word with a learned merge table: standard BPE encode —
    * repeatedly apply the LOWEST-rank merge present. */
  def segmentWord(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    if (word.isEmpty) return Nil
    var syms = charSyms(word).toVector
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        ranks.get((syms(i), syms(i + 1))).foreach { r =>
          if (r < bestRank) { bestRank = r; bestAt = i }
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else syms = (syms.take(bestAt) :+ (syms(bestAt) + syms(bestAt + 1))) ++
        syms.drop(bestAt + 2)
    }
    syms
  }

  /** Codegen'd per-row segmenter: lowercased whitespace words, each
    * segmented with the merge table (carried once as a codegen
    * reference object, same pattern as the proto/centroid
    * expressions). Scan-side, zero shuffle. */
  case class BpeSegmentExpr(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    @transient private lazy val ranks: Map[(String, String), Int] =
      merges.zipWithIndex.map { case (p, i) => p -> i }.toMap

    def segmentRow(input: Any): GenericArrayData = {
      val text = input.asInstanceOf[UTF8String].toString.toLowerCase
      val out = Array.newBuilder[Any]
      text.split("\\s+").foreach { w =>
        if (w.nonEmpty)
          segmentWord(w, ranks).foreach(p => out += UTF8String.fromString(p))
      }
      new GenericArrayData(out.result())
    }

    override def nullSafeEval(input: Any): Any = segmentRow(input)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bpeSegment", this, getClass.getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segmentRow($c);")
    }
    override protected def withNewChildInternal(c: Expression): BpeSegmentExpr =
      copy(child = c)
  }

  def segment(text: Column, merges: Seq[Merge]): Column =
    GraftSqlBridge.column(BpeSegmentExpr(GraftSqlBridge.expression(text),
      merges.map(m => (m.left, m.right))))
}
