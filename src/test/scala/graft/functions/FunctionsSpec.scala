package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{TextFunctions => T}

  test("tokens lowercases and drops empties") {
    val got = Seq("  Hello, World!  ").toDF("t")
      .select(T.tokens(col("t"))).as[Seq[String]].collect()(0)
    assert(got === Seq("hello", "world"))
  }

  test("lexicalDiversity counts types and hapaxes from the sorted array") {
    // "a b a c c c" -> 6 tokens, 3 types, hapax = {b} = 1
    val got = Seq("a b a c c c", "", "solo")
      .toDF("t").select(T.lexicalDiversity(col("t")).as("ld"))
      .select("ld.n_tokens", "ld.n_types", "ld.hapax")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((6L, 3L, 1L), (0L, 0L, 0L), (1L, 1L, 1L)))
  }

  test("lexicalDiversity agrees with the exploded-count formulation") {
    val docs = (1L to 50L).map(i =>
      (i, (1L to (i % 13 + 2)).map(j => s"w${j % (i % 5 + 2)}")
        .mkString(" "))).toDF("doc_id", "t")
    val scan = docs.select(col("doc_id"),
        T.lexicalDiversity(col("t")).as("ld"))
      .select(col("doc_id"), col("ld.n_tokens"), col("ld.n_types"),
        col("ld.hapax")).as[(Long, Long, Long, Long)].collect().toSet
    val exploded = docs.select(col("doc_id"),
        explode(T.tokens(col("t"))).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id").agg(sum("count").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(when(col("count") === 1, 1L).otherwise(0L)).as("hapax"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(scan === exploded)
  }

  test("qualityGate: metrics and verdict on crafted docs") {
    val en = T.StopwordLists.head._2
    val docs = Seq(
      // passes every rule: 6 words, mean 2.5, has "the", top share 1/6
      "the cat sat on my mat",
      // repetition cap: "spam" 5/8 > 0.2
      "the spam spam spam spam spam cat dog",
      // no stopword hit
      "quick brown foxes jump over lazy dogs",
      // too short
      "the end",
      // empty
      "")
      .toDF("t").select(T.qualityGate(col("t"), en).as("q"))
      .select("q.n_words", "q.top_count", "q.stop_hits", "q.kept")
      .as[(Long, Long, Long, Boolean)].collect().toSeq
    assert(docs(0) === ((6L, 1L, 1L, true)))
    assert(docs(1) === ((8L, 5L, 1L, false)))
    assert(docs(2)._3 === 0L && !docs(2)._4)
    assert(docs(3) === ((2L, 1L, 1L, false)))
    assert(docs(4) === ((0L, 0L, 0L, false)))
  }

  test("qualityGate top_count equals exploded max multiplicity") {
    val docs = (1L to 40L).map(i =>
      (i, (1L to (i % 17 + 3)).map(j => s"w${j % (i % 7 + 2)}")
        .mkString(" "))).toDF("doc_id", "t")
    val scan = docs.select(col("doc_id"),
        col("t"), T.qualityGate(col("t"), Seq("w0")).as("q"))
      .select(col("doc_id"), col("q.top_count"))
      .as[(Long, Long)].collect().toSet
    val exploded = docs.select(col("doc_id"),
        explode(T.tokens(col("t"))).as("tok"))
      .groupBy("doc_id", "tok").count()
      .groupBy("doc_id").agg(max("count").as("top"))
      .as[(Long, Long)].collect().toSet
    assert(scan === exploded)
  }

  test("wordNGrams produces sliding distinct n-grams; short text → empty") {
    val df = Seq("a b c d", "a b").toDF("t")
    val got = df.select(T.wordNGrams(col("t"), 3)).as[Seq[String]].collect()
    assert(got(0) === Seq("a b c", "b c d"))
    assert(got(1) === Seq.empty)
  }

  test("bag fingerprint is word-order invariant, norm fingerprint is not") {
    val df = Seq(("the cat sat", "sat the cat")).toDF("a", "b")
    val r = df.select(
      T.bagFingerprint(col("a")) === T.bagFingerprint(col("b")),
      T.normFingerprint(col("a")) === T.normFingerprint(col("b")))
      .as[(Boolean, Boolean)].collect()(0)
    assert(r === ((true, false)))
  }

  test("langId picks the stopword-dominant language, und when none") {
    val df = Seq("the cat and the dog of it", "le chat et la mer des gens",
      "xyzzy qwerty").toDF("t")
    val got = df.select(T.langId(col("t"))).as[String].collect().toSeq
    assert(got === Seq("en", "fr", "und"))
  }

  test("NFC normalization unifies composed and decomposed forms") {
    val composed = "caf\u00e9"      // é as one codepoint
    val decomposed = "cafe\u0301"   // e + combining acute
    val df = Seq((composed, decomposed)).toDF("a", "b")
    val (na, nb, rawEq) = df.select(
      T.normalizeUnicode(col("a")), T.normalizeUnicode(col("b")),
      col("a") === col("b")).as[(String, String, Boolean)].collect()(0)
    assert(!rawEq && na === nb)
    // and therefore fingerprints converge after normalization
    val fps = df.select(
      T.normFingerprint(T.normalizeUnicode(col("a"))) ===
        T.normFingerprint(T.normalizeUnicode(col("b"))))
      .as[Boolean].collect()(0)
    assert(fps)
  }

  test("stripAccents folds marks from any normalization form") {
    // composed, decomposed (e + U+0301), umlaut, mark-free
    val df = Seq(("caf\u00e9 d\u00e9j\u00e0", "cafe\u0301", "\u00dcber",
      "no marks 123")).toDF("a", "b", "c", "d")
    val got = df.select(T.stripAccents(col("a")), T.stripAccents(col("b")),
      T.stripAccents(col("c")), T.stripAccents(col("d")))
      .as[(String, String, String, String)].collect()(0)
    assert(got === (("cafe deja", "cafe", "Uber", "no marks 123")))
  }

  test("dedupeLines keeps first occurrence of each line in order") {
    val doc = "header\nbody one\nheader\nbody two\nbody one\nfooter"
    val got = Seq(doc).toDF("t").select(T.dedupeLines(col("t")))
      .as[String].collect()(0)
    assert(got === "header\nbody one\nbody two\nfooter")
  }

  test("dedupeLines preserves blank lines — paragraph structure is not boilerplate") {
    val doc = "para one\n\npara two\n\npara three"
    val got = Seq(doc).toDF("t").select(T.dedupeLines(col("t")))
      .as[String].collect()(0)
    assert(got === doc, "blank separators after the first were dropped")
  }

  test("non-Latin text keeps its identity: CJK fingerprints are distinct") {
    // an ASCII \W separator class collapsed every pure-CJK doc to
    // md5("") — mass silent dedup loss
    val df = Seq(("今天天气很好", "完全不同的文档")).toDF("a", "b")
    val got = df.select(T.normFingerprint(col("a")).as("fa"),
      T.normFingerprint(col("b")).as("fb"),
      size(T.tokens(col("a"))).as("na"))
      .as[(String, String, Int)].collect()(0)
    assert(got._1 !== got._2, "distinct CJK docs fingerprinted equal")
    assert(got._3 >= 1, "CJK text tokenized to nothing")
    // pure-ASCII behavior is unchanged by the Unicode class
    val ascii = Seq(Tuple1("Hello, World_1!")).toDF("t")
      .select(T.tokens(col("t"))).as[Seq[String]].collect()(0)
    assert(ascii === Seq("hello", "world_1"))
  }

  test("langId detects Chinese prose (no word boundaries to anchor on)") {
    val got = Seq(("这是我的书，我有不少书。", "the cat and the dog is in"))
      .toDF("zh", "en")
      .select(T.langId(col("zh")), T.langId(col("en")))
      .as[(String, String)].collect()(0)
    assert(got === (("zh", "en")))
  }

  test("phone redaction spares ISO dates and year ranges") {
    val df = Seq(
      "released on 2026-08-16 and 2020-2021 era",
      "call 555-123-4567 or +1-555-123-4567").toDF("t")
    val got = df.select(T.redactPii(col("t"))).as[String].collect()
    assert(got(0) === "released on 2026-08-16 and 2020-2021 era",
      s"dates were redacted: ${got(0)}")
    assert(got(1) === "call <PHONE> or <PHONE>")
  }

  test("stopword lists accept regex metacharacters as literals") {
    val df = Seq(Tuple1("use c++ here, not (a) or a")).toDF("t")
    val got = df.select(
      T.stopwordHits(col("t"), Seq("c++", "(a)"), boundaries = false))
      .as[Long].collect()(0)
    // "c++" once, "(a)" once — and bare "a" must NOT match the
    // parenthesized literal
    assert(got === 2L)
  }

  test("stripHtml consumes tags whose quoted attributes contain '>'") {
    val df = Seq(Tuple1("""pre <img alt="a>b" src='x>y'> post""")).toDF("t")
    val got = df.select(T.stripHtml(col("t"))).as[String].collect()(0)
    assert(got === "pre post", s"attribute fragments leaked: '$got'")
  }

  test("PII redaction scrubs emails, IPs, phones; leaves clean text alone") {
    val df = Seq(
      "mail me at jo.doe+x@corp.example.org now",
      "server 10.1.2.3 answered",
      "call +1-555-867-5309 today",
      "nothing sensitive here").toDF("t")
    val got = df.select(T.redactPii(col("t"))).as[String].collect().toSeq
    assert(got === Seq(
      "mail me at <EMAIL> now",
      "server <IP> answered",
      "call <PHONE> today",
      "nothing sensitive here"))
  }

  test("token counts: whitespace vs bpe-ish") {
    val df = Seq("Hi there, it's 42!").toDF("t")
    val (ws, bp) = df.select(T.wsTokenCount(col("t")),
      T.bpeishTokenCount(col("t"))).as[(Long, Long)].collect()(0)
    assert(ws === 4)
    // Hi | there | , | it | ' | s | 4 | 2 | !
    assert(bp === 9)
  }
}

class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{HashFunctions => H, TextFunctions => T}

  test("jaccard exact on known sets") {
    val df = Seq((Seq("a", "b", "c"), Seq("b", "c", "d"))).toDF("x", "y")
    val j = df.select(H.jaccard(col("x"), col("y"))).as[Double].collect()(0)
    assert(j === 0.5)
  }

  test("minhash signature has k entries and is deterministic") {
    val df = Seq("a b c d e f", "a b c d e f").toDF("t")
    val sigs = df.select(H.minhashSignature(T.tokenSet(col("t")), 16))
      .as[Seq[Long]].collect()
    assert(sigs(0).size === 16 && sigs(0) === sigs(1))
  }

  test("identical token sets share all bands; disjoint sets share none") {
    val df = Seq(("a b c d", "a b c d"), ("a b c d", "w x y z"))
      .toDF("s", "t")
    val bands = df.select(
      H.bandKeys(H.minhashSignature(T.tokenSet(col("s")), 16), 16, 4),
      H.bandKeys(H.minhashSignature(T.tokenSet(col("t")), 16), 16, 4))
      .as[(Seq[Long], Seq[Long])].collect()
    assert(bands(0)._1 === bands(0)._2)
    assert(bands(1)._1.intersect(bands(1)._2).isEmpty)
  }

  test("simhash: equal sets → distance 0; hamming64 counts differing bits") {
    val df = Seq(("a b c", "a b c")).toDF("s", "t")
    val d = df.select(H.hamming64(
      H.simhash64(H.tokenHashes(T.tokenSet(col("s")))),
      H.simhash64(H.tokenHashes(T.tokenSet(col("t"))))))
      .as[Long].collect()(0)
    assert(d === 0)
    val bits = Seq((5L, 6L)).toDF("a", "b")
      .select(H.hamming64(col("a"), col("b"))).as[Long].collect()(0)
    assert(bits === 2) // 101 vs 110
  }

  private def stripped(html: String): String =
    Seq(html).toDF("h").select(T.stripHtml(col("h"))).as[String]
      .collect()(0)

  test("stripHtml: tags become spaces, never weld words") {
    assert(stripped("<p>one</p><p>two</p>") === "one two")
  }

  test("stripHtml: script/style blocks removed with contents") {
    assert(stripped("a<script>var x = 1 < 2; \"</div>\"</script>b") === "a b")
    assert(stripped("a<STYLE>p { color: red }</STYLE>b") === "a b")
    assert(stripped("a<script src=\"x.js\"></script>b") === "a b")
  }

  test("stripHtml: comments removed, including fake tags inside") {
    assert(stripped("x<!-- <p>hidden</p> -->y") === "x y")
  }

  test("stripHtml: entities decode once, &amp; last") {
    assert(stripped("&lt;b&gt; &quot;q&quot; &#39;a&#39; &nbsp;z") ===
      "<b> \"q\" 'a' z")
    // double-escaped: &amp;lt; -> literal "&lt;", NOT "<"
    assert(stripped("&amp;lt;") === "&lt;")
    // unknown entities pass through
    assert(stripped("&copy; 2026") === "&copy; 2026")
  }

  test("stripHtml: whitespace collapses and trims") {
    assert(stripped("  <div>\n  a \t b  </div>\n ") === "a b")
  }
}

class VectorFunctionsSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.{VectorFunctions => V}

  test("dot, norm, cosine on known vectors") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f), Seq(2.0f, 0.0f)))
      .toDF("ex", "ey", "e2x")
    val (dxy, cxy, cxx) = df.select(
      V.dot(col("ex"), col("ey")),
      V.cosine(col("ex"), col("ey")),
      V.cosine(col("ex"), col("e2x"))).as[(Double, Double, Double)]
      .collect()(0)
    assert(dxy === 0.0 && cxy === 0.0 && cxx === 1.0)
  }

  test("zero vector cosine is 0, not NaN") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("z", "v")
    val c = df.select(V.cosine(col("z"), col("v"))).as[Double].collect()(0)
    assert(c === 0.0)
  }

  test("normalize yields unit vectors; zero passes through") {
    val df = Seq((Seq(3.0f, 4.0f), Seq(0.0f, 0.0f))).toDF("v", "z")
    val (n, z) = df.select(V.normalize(col("v")), V.normalize(col("z")))
      .as[(Seq[Double], Seq[Double])].collect()(0)
    assert(n === Seq(0.6, 0.8))
    assert(z === Seq(0.0, 0.0))
  }

  test("int8 quantization round-trips within SQ8 tolerance") {
    val df = Seq(Tuple1(Seq(0.5f, -1.0f, 0.25f, 0.0f))).toDF("v")
    val back = df.select(
      V.dequantizeInt8(V.quantizeInt8(col("v"))).as("r"),
      col("v"))
    val (r, v) = back.as[(Seq[Double], Seq[Float])].collect()(0)
    r.zip(v).foreach { case (got, want) =>
      assert(math.abs(got - want) <= 1.0 / 127.0 + 1e-9,
        s"$got vs $want")
    }
  }

  test("hyperplane bucket: deterministic, scale-invariant, nBits-bounded") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f, 4.0f), Seq(2.0f, 4.0f, 6.0f, 8.0f)))
      .toDF("v", "v2")
    val (b1, b2) = df.select(
      V.hyperplaneBucket(col("v"), 4, 8),
      V.hyperplaneBucket(col("v2"), 4, 8)).as[(Long, Long)].collect()(0)
    assert(b1 === b2) // same direction → same signs
    assert(b1 >= 0 && b1 < 256)
  }
}
