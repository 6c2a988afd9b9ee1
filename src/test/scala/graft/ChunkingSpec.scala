package graft

import org.apache.spark.sql.functions._

import graft.ext.Chunking

/** Specs for retrieval-style token-window chunking. */
class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(text: String, chunkSize: Int, overlap: Int) =
    Chunking.tokenWindows(Seq((1L, text)).toDF("doc_id", "text"),
        col("doc_id"), col("text"), chunkSize, overlap)
      .orderBy("chunk_idx")
      .select("chunk_idx", "start_tok", "chunk_tokens", "chunk_text")
      .as[(Long, Long, Long, String)].collect().toSeq

  test("short document yields exactly one full chunk") {
    assert(chunksOf("a b c", 5, 2) === Seq((0L, 0L, 3L, "a b c")))
  }

  test("sliding windows cover every token with the declared overlap") {
    // 10 tokens, chunkSize=4, overlap=1, step=3 → starts 0,3,6 and the
    // last window reaches token 9 exactly
    val toks = (0 until 10).map(i => s"t$i")
    val got = chunksOf(toks.mkString(" "), 4, 1)
    assert(got === Seq(
      (0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 3L, 4L, "t3 t4 t5 t6"),
      (2L, 6L, 4L, "t6 t7 t8 t9")))
  }

  test("trailing fragment appears only when needed to reach the end") {
    // 11 tokens, step=3: starts 0,3,6,9 — final chunk is the 2-token
    // fragment that covers token 10
    val got = chunksOf((0 until 11).map(i => s"t$i").mkString(" "), 4, 1)
    assert(got.map(_._2) === Seq(0L, 3L, 6L, 9L))
    assert(got.last === ((3L, 9L, 2L, "t9 t10")))
  }

  test("zero overlap partitions the token sequence") {
    val got = chunksOf((0 until 7).map(i => s"t$i").mkString(" "), 3, 0)
    assert(got.map(c => (c._2, c._4)) ===
      Seq((0L, "t0 t1 t2"), (3L, "t3 t4 t5"), (6L, "t6")))
  }

  test("empty and whitespace-only documents yield no chunks") {
    val df = Seq((1L, ""), (2L, "   "), (3L, "x")).toDF("doc_id", "text")
    val got = Chunking.tokenWindows(df, col("doc_id"), col("text"), 4, 1)
      .select("doc_id").as[Long].collect().toSeq
    assert(got === Seq(3L))
  }

  test("multi-space runs collapse to single token boundaries") {
    assert(chunksOf("a  b\t c", 2, 0) === Seq(
      (0L, 0L, 2L, "a b"), (1L, 2L, 1L, "c")))
  }

  test("invalid parameters are rejected") {
    val df = Seq((1L, "a")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      Chunking.tokenWindows(df, col("doc_id"), col("text"), 0, 0)
    }
    intercept[IllegalArgumentException] {
      Chunking.tokenWindows(df, col("doc_id"), col("text"), 4, 4)
    }
  }

  test("truncateTokens cuts at whole tokens and flags only real cuts") {
    val df = Seq(
      (1L, "a b c d e"),   // over budget
      (2L, "a b c"),       // exactly at budget
      (3L, "a b"),         // under
      (4L, ""))            // empty passes through
      .toDF("doc_id", "text")
    val got = Chunking.truncateTokens(df, col("doc_id"), col("text"), 3)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Boolean, String)].collect().toSeq
    assert(got === Seq(
      (1L, 5L, 3L, true, "a b c"),
      (2L, 3L, 3L, false, "a b c"),
      (3L, 2L, 2L, false, "a b"),
      (4L, 0L, 0L, false, "")))
  }

  test("truncateTokens plan is shuffle-free") {
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = Chunking.truncateTokens(df, col("doc_id"), col("text"), 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }

  test("plan is shuffle-free (pure scan-side explode)") {
    val df = Seq((1L, "a b c d e f")).toDF("doc_id", "text")
    val plan = Chunking.tokenWindows(df, col("doc_id"), col("text"), 3, 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle in:\n$plan")
  }
}
