package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Direct semantics for the sketch dedup operators (previously covered
  * only via rows-only driver queries): near-dup pairs are found,
  * unrelated docs are not, and the verification metrics bound. */
class DedupOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again today"),
    (2L, "the quick brown fox jumps over the lazy dog again and again yesterday"),
    (3L, "entirely different content about spark catalyst optimizer internals"),
    (4L, "entirely different content about spark catalyst optimizer internals"),
    (5L, "completely unrelated short text"))
    .toDF("doc_id", "text")

  test("minhashLsh finds near-dup and exact-dup pairs, skips unrelated docs") {
    val pairs = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((3L, 4L)), "exact dup must always pair")
    assert(pairs.contains((1L, 2L)), "one-word-diff docs share most shingles")
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L),
      "unrelated doc must not pair")
    // verified jaccard of the exact pair is 1.0
    val j = Dedup.minhashLsh(docs, "doc_id", "text",
      shingleN = 3, k = 32, bands = 16, threshold = 0.2)
      .filter(col("doc_a") === 3L && col("doc_b") === 4L)
      .select("jaccard").as[Double].collect().head
    assert(j === 1.0)
  }

  test("keepBest survives the max-quality copy, min id on ties") {
    val corpus = Seq(
      (1L, "same text here", 5L),   // dup group A: quality 5
      (2L, "same text here", 9L),   //   winner (max quality)
      (3L, "same text here", 9L),   //   loses tie to id 2
      (4L, "unique content", 1L))   // singleton survives
      .toDF("doc_id", "text", "quality")
    val got = Dedup.keepBest(corpus, "doc_id", "text", "quality")
      .select("doc_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got === Set((2L, 3L), (4L, 1L)))
  }

  test("keepBest fingerprints normalize case and punctuation") {
    val corpus = Seq(
      (1L, "Hello,  World!", 1L),
      (2L, "hello world", 2L))
      .toDF("doc_id", "text", "quality")
    val got = Dedup.keepBest(corpus, "doc_id", "text", "quality")
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(2L), "normalized variants are one group")
  }

  test("firstOccurrenceSpans keeps only the global first occurrence of each span") {
    val corpus = Seq(
      (1L, "a b c d e f"),        // both spans original
      (2L, "a b c d e f"),        // full duplicate of doc 1 → nothing kept
      (3L, "x y z a b c"),        // second span duplicates doc 1's first
      (4L, "p q r s"),            // partial final span, all kept
      (5L, ""))                   // empty doc → no output row
      .toDF("doc_id", "text")
    val got = Dedup.firstOccurrenceSpans(corpus, "doc_id", "text",
        spanTokens = 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Option[String])].collect().toSeq
    assert(got === Seq(
      (1L, 2L, 2L, Some("a b c d e f")),
      (2L, 2L, 0L, None),
      (3L, 2L, 1L, Some("x y z")),
      (4L, 2L, 2L, Some("p q r s"))))
  }

  test("firstOccurrenceSpans: within-doc repeated span keeps only the earlier copy") {
    val corpus = Seq((7L, "m n o m n o tail end x")).toDF("doc_id", "text")
    val got = Dedup.firstOccurrenceSpans(corpus, "doc_id", "text",
        spanTokens = 3)
      .as[(Long, Long, Long, Option[String])].collect().head
    assert(got === ((7L, 3L, 2L, Some("m n o tail end x"))))
  }

  test("dropCommonLines strips corpus-frequent lines, keeps order, drops all-boilerplate docs") {
    val corpus = Seq(
      (1L, "unique one\nCOOKIE BANNER\nmore unique"),
      (2L, "COOKIE BANNER\nsecond doc body"),
      (3L, "COOKIE BANNER"),
      (4L, "third doc\nalso distinct\nCOOKIE BANNER"))
      .toDF("doc_id", "text")
    val got = Dedup.dropCommonLines(corpus, "doc_id", "text",
      maxDocFreq = 2)
      .as[(Long, String)].collect().toMap
    // the banner appears in 4 docs > cutoff 2 → stripped everywhere
    assert(got(1L) === "unique one\nmore unique")
    assert(got(2L) === "second doc body")
    assert(got(4L) === "third doc\nalso distinct")
    // doc 3 was ONLY boilerplate → removed from the corpus
    assert(!got.contains(3L))
    // below-cutoff repeats survive: same line in exactly 2 docs
    val mild = Seq((1L, "a\nshared"), (2L, "b\nshared")).toDF("doc_id", "text")
    val kept = Dedup.dropCommonLines(mild, "doc_id", "text", maxDocFreq = 2)
      .as[(Long, String)].collect().toMap
    assert(kept(1L) === "a\nshared" && kept(2L) === "b\nshared")
  }

  test("simhash pairs identical docs at hamming 0; unrelated docs exceed the cutoff") {
    val pairs = Dedup.simhash(docs, "doc_id", "text", maxHamming = 3)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .as[(Long, Long, Long)].collect()
    val exact = pairs.find(p => p._1 == 3L && p._2 == 4L)
    assert(exact.exists(_._3 === 0L))
    assert(!pairs.exists(p => p._1 == 5L || p._2 == 5L))
  }

  test("ngramJaccard hot gram: loud failure by default, reported drop when capped") {
    // "stop word stop word stop word…" puts ONE gram in every doc
    // (stop-word shape); the distinctive tails pair 10/11 and 12/13.
    val hotDocs = ((1L to 9L).map(i => (i, "common filler gram here plus " +
      s"unique$i tail$i content$i")) ++ Seq(
      (10L, "alpha beta gamma delta epsilon zeta"),
      (11L, "alpha beta gamma delta epsilon eta")))
      .toDF("doc_id", "text").withColumn("lang", lit("en"))
    // cap below the hot gram's df=9 → the exact operator must throw
    val e = intercept[IllegalStateException] {
      Dedup.ngramJaccard(hotDocs, "doc_id", "text", "lang",
        n = 3, threshold = 0.1, maxGramDf = 5).collect()
    }
    assert(e.getMessage.contains("maxGramDf=5"))
    // capped variant: the overflow frame names every dropped gram with
    // its frequency, and non-hot grams still produce pairs
    val (pairs, overflow) = Dedup.ngramJaccardCapped(hotDocs, "doc_id",
      "text", "lang", n = 3, threshold = 0.1, maxGramDf = 5)
    val hot = overflow.as[(String, Long, Long)].collect()
    assert(hot.nonEmpty && hot.forall(_._3 > 5L),
      s"overflow must report the hot grams, got ${hot.toSeq}")
    val got = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((10L, 11L)), "non-hot grams still pair")
    // a generous cap reproduces the exact operator
    val exact = Dedup.ngramJaccard(hotDocs, "doc_id", "text", "lang",
      n = 3, threshold = 0.1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val (uncapped, none) = Dedup.ngramJaccardCapped(hotDocs, "doc_id",
      "text", "lang", n = 3, threshold = 0.1)
    assert(none.count() === 0L)
    assert(uncapped.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet === exact)
  }

  test("embeddingCosine skewed bucket: loud failure by default, reported skip when capped") {
    val vecs = ((1L to 8L).map(i => (i, Seq(1.0f, 0.0f, i.toFloat / 100), 1)) ++
      Seq((20L, Seq(0.0f, 1.0f, 0.0f), 2), (21L, Seq(0.0f, 1.0f, 0.01f), 2)))
      .toDF("vec_id", "embedding", "label")
    val e = intercept[IllegalStateException] {
      Dedup.embeddingCosine(vecs, "vec_id", "embedding", "label",
        threshold = 0.9, maxBucket = 4).collect()
    }
    assert(e.getMessage.contains("maxBucket=4"))
    val (pairs, overflow) = Dedup.embeddingCosineCapped(vecs, "vec_id",
      "embedding", "label", threshold = 0.9, maxBucket = 4)
    val hot = overflow.as[(Int, Long)].collect()
    assert(hot.toSeq === Seq((1, 8L)), "bucket 1 (n=8) must be reported")
    val got = pairs.select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((20L, 21L)),
      "small bucket verified, oversized bucket skipped")
  }

  test("minhashLsh bucket cap: hot buckets reported, recall via other bands survives") {
    // 20 identical docs concentrate EVERY band bucket; two distinctive
    // near-dups pair independently of them
    val hotDocs = ((1L to 20L).map(i => (i, "same same same same same text")) ++
      Seq((30L, "alpha beta gamma delta epsilon zeta eta theta"),
        (31L, "alpha beta gamma delta epsilon zeta eta iota")))
      .toDF("doc_id", "text")
    val (pairs, overflow) = Dedup.minhashLshCapped(hotDocs, "doc_id",
      "text", threshold = 0.1, maxBucket = Some(10))
    val hot = overflow.as[(Int, Long, Long)].collect()
    assert(hot.nonEmpty && hot.forall(_._3 === 20L),
      s"every reported bucket holds the 20 clones: ${hot.toSeq}")
    val got = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((30L, 31L)), "non-hot buckets still pair")
    assert(!got.exists(p => p._1 <= 20L && p._2 <= 20L),
      "clone pairs only lived in capped buckets")
    // no cap -> overflow empty, clone pairs present, and the capped
    // pair set is a subset (pairs missed, never invented)
    val (all, none) = Dedup.minhashLshCapped(hotDocs, "doc_id", "text",
      threshold = 0.1, maxBucket = None)
    assert(none.count() === 0L)
    val allPairs = all.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet
    assert(allPairs.contains((1L, 2L)))
    assert(got.subsetOf(allPairs))
  }

  test("simhash bucket cap: hot chunk values reported, other chunks keep the pair") {
    // 20 clones own every chunk bucket of their fingerprint; a near-dup
    // pair with a different token set pairs through its own chunks
    val hotDocs = ((1L to 20L).map(i => (i, "filler words everywhere always")) ++
      Seq((30L, "alpha beta gamma delta epsilon zeta"),
        (31L, "alpha beta gamma delta epsilon zeta")))
      .toDF("doc_id", "text")
    val (pairs, overflow) = Dedup.simhashCapped(hotDocs, "doc_id", "text",
      maxBucket = Some(10))
    val hot = overflow.as[(Int, Long, Long)].collect()
    assert(hot.length === 4 && hot.forall(_._3 === 20L),
      s"all four clone chunks reported: ${hot.toSeq}")
    val got = pairs.select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got.contains((30L, 31L)), "pair survives via its own chunks")
    assert(!got.exists(p => p._1 <= 20L && p._2 <= 20L))
    val (all, none) = Dedup.simhashCapped(hotDocs, "doc_id", "text",
      maxBucket = None)
    assert(none.count() === 0L)
    assert(got.subsetOf(all.select("doc_a", "doc_b").as[(Long, Long)]
      .collect().toSet))
  }

  test("clusterSizeProfile histograms group sizes with drop accounting") {
    // groups: {1,2,3} size 3, {10,11} and {20,21} size 2, {30} size 1
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (20L, 20L), (21L, 20L), (30L, 30L)).toDF("doc_id", "group_id")
    val got = Dedup.clusterSizeProfile(labels, "group_id")
      .orderBy("group_size")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 1L, 1L, 0L), (2L, 2L, 4L, 2L),
      (3L, 1L, 3L, 2L)))
  }

  test("minhashLsh rejects a (k, bands) pair that doesn't tile the signature") {
    // bands > k would hash r=0 signature rows per band — every band
    // key a constant, one bucket per band (O(n²) cross join uncapped,
    // silent zero recall capped); k % bands != 0 silently drops the
    // trailing rows. Both must fail loudly at call time.
    val docs = Seq((1L, "a b c")).toDF("doc_id", "text")
    val e1 = intercept[IllegalArgumentException](
      Dedup.minhashLsh(docs, "doc_id", "text", k = 32, bands = 64))
    assert(e1.getMessage.contains("bands"))
    val e2 = intercept[IllegalArgumentException](
      Dedup.minhashLsh(docs, "doc_id", "text", k = 32, bands = 5))
    assert(e2.getMessage.contains("bands"))
    // a valid pair still constructs
    Dedup.minhashLsh(docs, "doc_id", "text", k = 32, bands = 8)
  }
}
