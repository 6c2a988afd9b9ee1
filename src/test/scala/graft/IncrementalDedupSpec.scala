package graft

import org.apache.spark.sql.functions._

import graft.ext.Dedup

/** Specs for incremental (cross-corpus) exact dedup. */
class IncrementalDedupSpec extends SparkSpec {
  import spark.implicits._

  private val existing = Seq(
    (1L, "the quick brown fox"),
    (2L, "hello world")).toDF("doc_id", "text")

  test("batch rows whose content exists in the corpus are dropped") {
    val incoming = Seq(
      (10L, "hello world"),          // exact duplicate of doc 2
      (11L, "Hello, WORLD!"),        // normalized duplicate of doc 2
      (12L, "something new")).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(existing, incoming, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got === Seq(12L))
  }

  test("within-batch duplicates keep the lowest id") {
    val incoming = Seq(
      (22L, "fresh content"),
      (21L, "Fresh   CONTENT"),      // same normalized form, lower id
      (23L, "other content")).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(existing, incoming, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got === Seq(21L, 23L))
  }

  test("empty existing corpus keeps every first-in-batch row") {
    val incoming = Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("doc_id", "text")
    val got = Dedup.incrementalExact(
      existing.filter(lit(false)), incoming, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(got === Seq(1L, 2L))
  }

  test("empty incoming batch yields empty output") {
    val got = Dedup.incrementalExact(existing,
      existing.filter(lit(false)), "doc_id", "text")
    assert(got.count() === 0L)
  }

  test("incoming columns survive with the fingerprint attached") {
    val incoming = Seq((30L, "brand new", "extra")).toDF(
      "doc_id", "text", "tag")
    val got = Dedup.incrementalExact(existing, incoming, "doc_id", "text")
    assert(got.columns.toSet ===
      Set("doc_id", "text", "tag", "fingerprint"))
    assert(got.count() === 1L)
  }

  test("NULL-text rows pass through unchanged — never deduped, never collapsed") {
    // a null text has no content identity: all null-text rows survive
    // every batch (they are not duplicates of each other or of the
    // corpus), with a null fingerprint attached. The old behavior
    // collapsed a batch's null rows to one "winner" intra-batch while
    // the anti-join re-admitted it cross-batch — inconsistent both ways.
    val incoming = Seq((40L, Option("real text")), (41L, None), (42L, None))
      .toDF("doc_id", "text")
    val got = Dedup.incrementalExact(existing, incoming, "doc_id", "text")
    assert(got.select("doc_id").as[Long].collect().toSet ===
      Set(40L, 41L, 42L))
    assert(got.filter(col("fingerprint").isNull).count() === 2L)
  }

  test("plan: existing side is bloom-filtered at the scan") {
    val inc = spark.range(50).select(col("id").as("doc_id"),
      concat_ws(" ", lit("doc"), col("id")).as("text"))
    val ex = spark.range(1000).select(col("id").as("doc_id"),
      concat_ws(" ", lit("corpus"), col("id")).as("text"))
    val plan = Dedup.incrementalExact(ex, inc, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom prefilter in:\n$plan")
  }
}
