package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** [EXT] Text-analysis primitives for large-scale training-data
  * pipelines: tokenization, language-ID heuristic, quality scoring,
  * fingerprinting. Everything is a pure `Column` expression built from
  * codegen'd built-ins — no UDFs — so at 100 TB these run inside
  * whole-stage codegen directly over the parquet scan.
  */
object TextFunctions {

  /** The token-separator class, Unicode-aware: anything that is not a
    * letter, digit, or underscore IN ANY SCRIPT. Java's bare `\W` is
    * ASCII-only ([^A-Za-z0-9_]) — under it every CJK/accented char is
    * a separator, so a pure-Chinese document tokenizes to NOTHING and
    * [[normFingerprint]] collapses ALL such documents to md5("") —
    * mass silent dedup loss on exactly the multilingual corpora the
    * langId surface advertises. `\p{L}\p{N}` is supported identically
    * by Java regex and RE2 (the DuckDB oracle side); on pure-ASCII
    * text the two classes agree exactly. */
  val NonWordClass = "[^\\p{L}\\p{N}_]"

  /** Lowercased word tokens, empties removed.
    *
    * `array_remove(..., "")`, not `filter(..., t => t =!= "")`: the
    * two produce the IDENTICAL array (split never yields nulls, and
    * both drop every "" while preserving order), but a lambda-bodied
    * higher-order function is interpreted per element and CSE-exempt,
    * while ArrayRemove is one ordinary expression — this is the single
    * hottest subtree of the text stack (every tokenize-bearing query
    * pays it scan-side; opt guide §4 "eliminate non-codegen
    * expressions in the hot path"). */
  def tokens(text: Column): Column =
    array_remove(split(lower(text), NonWordClass + "+"), "")

  /** Distinct token set. */
  def tokenSet(text: Column): Column = array_distinct(tokens(text))

  /** Whitespace token count. Same ArrayRemove-over-lambda rule as
    * [[tokens]]. */
  def wsTokenCount(text: Column): Column =
    size(array_remove(split(text, "\\s+"), "")).cast("long")

  /** BPE-ish subword proxy: count of letter-runs, digits, and other
    * non-space symbols — a cheap deterministic stand-in for a real BPE
    * vocabulary (which would ship as a broadcast trie at scale). */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9\\s]"
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit(BpeishPattern)).cast("long")

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Deliberately tiny and deterministic. */
  val StopwordLists: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "in", "a", "is"),
    "fr" -> Seq("le", "la", "les", "et", "des", "un", "est"),
    "es" -> Seq("el", "los", "las", "y", "que", "un", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "zu"),
    "zh" -> Seq("的", "是", "在", "了", "不", "我", "有"),
  )

  /** Escape regex metacharacters in a caller-supplied word — the
    * blocklist entry point must accept "c++" or "(a)" as LITERALS
    * (\Q…\E would be Java-only; RE2, the oracle side, lacks it, so
    * per-char escaping is the portable form). */
  private def escapeWord(w: String): String =
    w.replaceAll("([\\\\.\\[\\]{}()*+?^$|])", "\\\\$1")

  private def wordPattern(words: Seq[String],
      boundaries: Boolean = true): String = {
    val alt = "(" + words.map(escapeWord).mkString("|") + ")"
    if (boundaries) "\\b" + alt + "\\b" else alt
  }

  /** Stopword-hit count for one language over lowercased text.
    * @param boundaries word-boundary anchoring; pass false for
    *   scripts written WITHOUT spaces (Chinese, Japanese): `\b` can
    *   never fire between two CJK letter chars under Java's
    *   Unicode-aware rule (and RE2's ASCII rule disagrees with Java
    *   exactly there), so anchored CJK stopwords match nothing. */
  def stopwordHits(text: Column, words: Seq[String],
      boundaries: Boolean = true): Column =
    regexp_count(lower(text), lit(wordPattern(words, boundaries)))
      .cast("long")

  /** Scripts whose stopwords count as plain substrings (no `\b`) —
    * languages written without inter-word spaces. */
  private val NoBoundaryLangs = Set("zh")

  /** Language-ID: argmax of per-language stopword hits; ties and
    * zero-hit rows resolve in `StopwordLists` declaration order with
    * "und" (undetermined) when nothing matches. */
  def langId(text: Column): Column = {
    val scored = StopwordLists.map { case (lang, ws) =>
      (lang, stopwordHits(text, ws,
        boundaries = !NoBoundaryLangs.contains(lang)))
    }
    val best = scored.map(_._2).reduce((a, b) => greatest(a, b))
    scored.foldRight(lit("und"): Column) { case ((lang, s), acc) =>
      when(s > 0 && s === best, lit(lang)).otherwise(acc)
    }
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    regexp_count(text, lit("[^A-Za-z0-9\\s]")).cast("long")

  /** Quality heuristics: token count in range, stopword ratio, mean
    * word length in range — the classic C4/Gopher-style cheap filters.
    * Returns a 0..3 integer score (one point per passed check). */
  def qualityScore(nTokens: Column, stopHits: Column, nChars: Column): Column = {
    val stopRatio = stopHits.cast("double") / nTokens.cast("double")
    val meanWordLen = nChars.cast("double") / nTokens.cast("double")
    (when(nTokens >= 10 && nTokens <= 100000, 1).otherwise(0)
      + when(stopRatio > 0.0, 1).otherwise(0)
      + when(meanWordLen >= 2.0 && meanWordLen <= 12.0, 1).otherwise(0))
      .cast("long")
  }

  /** Content fingerprint: md5 of the whitespace-normalized text —
    * exact-dedup key. Unicode-aware separator class (see
    * [[NonWordClass]]): an ASCII `\W` collapsed every non-Latin
    * document to md5(""). */
  def normFingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), NonWordClass + "+", " ")))

  /** Bag fingerprint: md5 over the sorted distinct token set — catches
    * word-order-only edits. `sort_array` (ordinary expression), not
    * `array_sort` (lambda-comparator HOF, interpreted per comparison):
    * identical ascending order on the non-null tokens. */
  def bagFingerprint(text: Column): Column =
    md5(array_join(sort_array(tokenSet(text)), " "))

  /** PII redaction patterns (email, phone, IPv4) — identical meaning
    * under Java regex and RE2, so oracle-checkable. Applied in order:
    * emails before phones (phone pattern is digit-greedy). */
  val RedactionPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b" -> "<IP>",
    // >= 9 DIGITS (dashes optional between them), not >= 9 chars of
    // [\d-]: the char-counting form matched every ISO date
    // ("2026-08-16" — 8 digits) and year range, redacting all dates
    // in the corpus to <PHONE>
    "\\+?\\d(?:-?\\d){8,}" -> "<PHONE>")

  /** Redact PII spans (email/IP/phone) with typed placeholders —
    * the standard pre-training scrub pass. */
  def redactPii(text: Column): Column =
    RedactionPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Unicode NFC canonicalization — run before fingerprinting so
    * composed/decomposed variants of the same text dedup together. */
  def normalizeUnicode(text: Column): Column = Expressions.normalizeNfc(text)

  /** NFD-decompose and drop combining marks ('á' → 'a') — the accent
    * fold a cleaning pipeline applies before exact/fuzzy matching. */
  def stripAccents(text: Column): Column = Expressions.stripAccents(text)

  /** Within-document line dedup (boilerplate removal): keep the first
    * occurrence of each line, preserve order — the per-document half
    * of boilerplate stripping (cross-document boilerplate is the
    * line-frequency variant over an exploded lines table). */
  def dedupeLines(text: Column): Column = {
    // Sort + neighbor-compare + re-sort (round-18, opt guide §4): the
    // previous seen-set `aggregate` was O(lines²) INTERPRETED work per
    // row — an array_contains scan plus an array-copying concat per
    // line (fine on today's short docs, a scale trap on long ones,
    // the same class as the lexicalDiversity rewrite). Lines are
    // tagged with their position, sorted by (line, pos) so the first
    // occurrence of a line is the first of its run, kept iff blank or
    // different from the sorted predecessor, and re-sorted by pos to
    // restore document order — O(n log n) sorts plus trivial-body
    // per-element lambdas, nothing references an outer subtree from a
    // lambda body (the CSE-exemption trap). Blank lines are ALWAYS
    // kept: paragraph separators are document structure, not
    // boilerplate — deduping them welded every paragraph after the
    // second together. Equivalence pinned by DedupeLinesRewriteSpec.
    val tagged = sort_array(transform(split(text, "\n"),
      (l, i) => struct(l.as("line"), i.as("pos"))))
    // sentinel head so element k compares against element k-1; the
    // zip's one-longer left side pads the last cur with null, whose
    // null keep-flag the filter drops
    val sentinel = struct(lit(null).cast("string").as("line"),
      lit(-1).as("pos"))
    val marked = zip_with(concat(array(sentinel), tagged), tagged,
      (prev, cur) => struct(cur.getField("pos").as("pos"),
        cur.getField("line").as("line"),
        (cur.getField("line") === "" || prev.getField("line").isNull ||
          prev.getField("line") =!= cur.getField("line")).as("keep")))
    array_join(
      transform(
        sort_array(transform(filter(marked, s => s.getField("keep")),
          s => struct(s.getField("pos").as("pos"),
            s.getField("line").as("line")))),
        s => s.getField("line")),
      "\n")
  }

  /** Lexical-diversity stats as a struct (n_tokens, n_types, hapax):
    * type-token ratio and hapax share are the standard cheap signals
    * separating natural prose from keyword-stuffed / template text.
    * Computed entirely scan-side from the sorted token array: a type
    * is REPEATED iff it equals its sorted successor somewhere, so
    * hapax = types − distinct(equal-neighbor values). No explode, no
    * shuffle.
    *
    * PERF TRAP (measured, 60× on the sf0.1 surface): indexing the
    * sorted array per element inside a higher-order lambda
    * (`filter(sequence(...), i => element_at(s, i))`) re-evaluates the
    * ENTIRE `array_sort(tokens(...))` subtree per element — lambda
    * bodies run interpreted with no subexpression reuse — turning the
    * row cost quadratic. The zip-of-slices form below references the
    * array only from non-lambda argument positions, so the sort runs
    * a constant number of times per row. */
  def lexicalDiversity(text: Column): Column = {
    // ONE sort + ONE aggregate pass (round-17 optimization, guide §4):
    // the zip-of-slices form was already safe from the per-element
    // trap, but it still evaluated the (lambda-comparator, interpreted)
    // sort subtree ~8× per row — once per struct-field reference, since
    // higher-order subtrees are CSE-exempt. Equal values are adjacent
    // after sorting, so run-length counting in a single qualityGate-
    // style pass yields the same exact integers: n_tokens = element
    // count, n_types = number of runs, hapax = number of length-1 runs.
    // `sort_array` (ordinary expression) replaces `array_sort` (lambda
    // HOF) — identical ascending order on the non-null tokens; the ""
    // accumulator sentinel can never equal a token (empties removed).
    val agg = aggregate(sort_array(tokens(text)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("n"),
        lit(0L).as("types"), lit(0L).as("hapax")),
      (acc, x) => {
        val isNew = x =!= acc.getField("prev")
        struct(x.as("prev"),
          when(isNew, lit(1L)).otherwise(acc.getField("run") + 1L).as("run"),
          (acc.getField("n") + 1L).as("n"),
          (acc.getField("types") + when(isNew, 1L).otherwise(0L)).as("types"),
          // a run CLOSES when a new value starts; the closed run was a
          // hapax iff its length was exactly 1 (run=0 start never fires)
          (acc.getField("hapax") +
            when(isNew && acc.getField("run") === 1L, 1L).otherwise(0L))
            .as("hapax"))
      },
      acc => struct(acc.getField("n").as("n_tokens"),
        acc.getField("types").as("n_types"),
        // account the final (still-open) run
        (acc.getField("hapax") +
          when(acc.getField("run") === 1L, 1L).otherwise(0L)).as("hapax")))
    // null text: the old form returned a NON-null struct of null
    // fields (size(null) = null per field); aggregate(null) would
    // return a null struct — preserve the original shape exactly
    val nullL = lit(null).cast("long")
    when(text.isNotNull, agg).otherwise(struct(nullL.as("n_tokens"),
      nullL.as("n_types"), nullL.as("hapax")))
  }

  /** Composite Gopher/C4-style quality gate as one scan-side struct:
    * word count, mean/max word length, stopword hits, top-token share
    * (max in-doc token multiplicity / word count), and the combined
    * keep verdict. Every metric is exact integers or an exact-int
    * ratio, so the gate is cross-engine hash-checkable with no
    * rounding discipline. The max-multiplicity scan runs over the
    * sorted token array via `aggregate` with O(1) work per element —
    * the array itself is only referenced from a non-lambda argument
    * position (see the PERF TRAP note on [[lexicalDiversity]]).
    *
    * Reference thresholds follow the published Gopher rules shape
    * (word-count window, mean-word-length window, ≥1 stopword,
    * repetition cap); all are parameters.
    */
  def qualityGate(text: Column, stopwords: Seq[String],
      minWords: Long = 5L, maxWords: Long = 200L,
      minMeanLen: Double = 2.0, maxMeanLen: Double = 10.0,
      maxTopShare: Double = 0.2): Column = {
    val hits = stopwordHits(text, stopwords)
    // ONE pass over ONE sorted-array reference computes every counter;
    // higher-order subtrees are exempt from Spark's subexpression
    // elimination, so naming each metric as its own struct field would
    // re-run tokenize+sort per field. Callers should extract the struct
    // fields ABOVE an exchange (orderBy first, select fields after) so
    // the struct itself is materialized once per row.
    aggregate(sort_array(tokens(text)),
      struct(lit("").as("prev"), lit(0L).as("run"), lit(0L).as("best"),
        lit(0L).as("total"), lit(0L).as("n"), lit(0L).as("max_len")),
      (acc, x) => {
        val run = when(x === acc.getField("prev"),
          acc.getField("run") + 1L).otherwise(lit(1L))
        val len = length(x).cast("long")
        struct(x.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"),
          (acc.getField("total") + len).as("total"),
          (acc.getField("n") + 1L).as("n"),
          greatest(acc.getField("max_len"), len).as("max_len"))
      },
      acc => {
        val n = acc.getField("n")
        val topCnt = acc.getField("best")
        val meanLen =
          when(n > 0, acc.getField("total").cast("double") / n.cast("double"))
        val topShare =
          when(n > 0, topCnt.cast("double") / n.cast("double"))
        val kept = n >= minWords && n <= maxWords &&
          meanLen >= minMeanLen && meanLen <= maxMeanLen &&
          hits >= 1L && topShare <= maxTopShare
        struct(n.as("n_words"), meanLen.as("mean_len"),
          acc.getField("max_len").as("max_len"), hits.as("stop_hits"),
          topCnt.as("top_count"), topShare.as("top_share"),
          coalesce(kept, lit(false)).as("kept"))
      })
  }

  /** Entity → replacement pairs for [[stripHtml]], applied in order.
    * `&amp;` decodes LAST so double-escaped text (`&amp;lt;`) yields
    * the literal entity, not a second decode pass — the conservative
    * single-decode rule crawl pipelines use. Mirrored 1:1 by the
    * DuckDB oracle. */
  val HtmlEntities: Seq[(String, String)] = Seq(
    "&nbsp;" -> " ", "&lt;" -> "<", "&gt;" -> ">",
    "&quot;" -> "\"", "&#39;" -> "'", "&apos;" -> "'",
    "&amp;" -> "&")

  /** HTML → text: comments, `<script>`/`<style>` blocks (with their
    * contents), then all remaining tags are replaced by a space (never
    * deleted — deletion would weld `…word</p><p>word…` together);
    * entities decode per [[HtmlEntities]]; whitespace collapses to
    * single spaces. Pure chained `regexp_replace` — codegen'd,
    * scan-side, no UDF. Unknown entities (`&copy;`) pass through
    * unchanged by design: silently guessing decodes corrupts corpora.
    */
  def stripHtml(html: Column): Column = {
    val noComments = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript = regexp_replace(noComments,
      "(?is)<script[^>]*>.*?</script\\s*>", " ")
    val noStyle = regexp_replace(noScript,
      "(?is)<style[^>]*>.*?</style\\s*>", " ")
    // quoted attribute values may contain '>' (alt text, inline JSON,
    // handlers) — the tag pattern skips over quoted runs so
    // <img alt="a>b"> is consumed whole instead of leaving `b">` as
    // corpus text. RE2-compatible (no backrefs), mirrored by the
    // oracle.
    val noTags = regexp_replace(noStyle,
      "<[^>\"']*(?:\"[^\"]*\"[^>\"']*|'[^']*'[^>\"']*)*>", " ")
    val decoded = HtmlEntities.foldLeft(noTags) { case (c, (ent, rep)) =>
      regexp_replace(c, ent, rep)
    }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Word n-grams (joined by single spaces), distinct. Built from n
    * shifted slices zipped together, so the transform lambda touches
    * only its own element — the index-into-`toks`-per-element form
    * re-ran tokenization once per n-gram (the [[lexicalDiversity]]
    * PERF TRAP); this shape evaluates it a constant n times per row. */
  def wordNGrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be positive: $n")
    val toks = tokens(text)
    val m = greatest(size(toks) - (n - 1), lit(0))
    val zipped = arrays_zip((0 until n).map(k =>
      slice(toks, lit(k + 1), m)): _*)
    array_distinct(transform(zipped, s =>
      concat_ws(" ", (0 until n).map(i => s.getField(i.toString)): _*)))
  }
}
