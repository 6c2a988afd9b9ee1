package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join without a shuffle exchange") {
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("k", "va")
    val b = (1L to 1000L).map(i => (i, s"b$i")).toDF("k", "vb")
    Scale.writeBucketed(a, "graft_bkt_a", Seq("k"), 4)
    Scale.writeBucketed(b, "graft_bkt_b", Seq("k"), 4)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the sort-merge path (tiny test tables would broadcast)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("graft_bkt_a")
        .join(spark.table("graft_bkt_b"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join should be shuffle-free:\n$plan")
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() === 1000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE graft_bkt_a")
      spark.sql("DROP TABLE graft_bkt_b")
    }
  }

  test("salted join returns exactly the plain join result") {
    val big = (1L to 500L).map(i => (if (i % 10 == 0) 1L else i, i))
      .toDF("k", "payload") // key 1 is hot
    val small = (1L to 500L).map(i => (i, s"dim$i")).toDF("k", "dim")
    val plain = big.join(small, "k").select("k", "payload", "dim")
      .collect().toSet
    val salted = Scale.saltedJoinDeterministic(big, small, "k",
      saltFrom = "payload", salts = 8).select("k", "payload", "dim")
      .collect().toSet
    assert(salted === plain)
    val randomSalted = Scale.saltedJoin(big, small, "k", salts = 8)
      .select("k", "payload", "dim").collect().toSet
    assert(randomSalted === plain)
  }

  test("joinProfile: exact output cardinality, hot-key bound, null keys dropped") {
    // left: key 1 ×3, key 2 ×2, key 9 ×1 (unmatched), null ×1 (dropped)
    // right: key 1 ×2, key 2 ×1, key 5 ×1 (unmatched)
    val left = Seq(Some(1), Some(1), Some(1), Some(2), Some(2), Some(9),
      None).toDF("k")
    val right = Seq(1, 1, 2, 5).toDF("k")
    val got = Scale.joinProfile(left, col("k"), right, col("k"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(got === ((6L, 4L, 3L, 3L, 2L, 3L, 2L, 8L, 6L)))
    // out_rows equals the ACTUAL join's cardinality
    val actual = left.filter(col("k").isNotNull)
      .join(right, Seq("k")).count()
    assert(actual === got._8)
  }

  test("joinProfile over empty/all-null inputs reports zeros, not nulls") {
    val empty = Seq.empty[Option[Int]].toDF("k")
    val allNull = Seq(None: Option[Int], None).toDF("k")
    val got = Scale.joinProfile(empty, col("k"), allNull, col("k"))
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().head
    assert(got === ((0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("saltedJoin rejects join types where small-side replication duplicates rows") {
    val big = Seq((1L, "x")).toDF("k", "payload")
    val small = Seq((1L, "d")).toDF("k", "dim")
    // an unmatched small row would surface `salts` times under
    // right/full outer — the API must refuse, not silently duplicate
    val e = intercept[IllegalArgumentException](
      Scale.saltedJoin(big, small, "k", salts = 4, joinType = "right_outer"))
    assert(e.getMessage.contains("replicated"))
    val e2 = intercept[IllegalArgumentException](
      Scale.saltedJoinDeterministic(big, small, "k", "payload", 4, "full"))
    assert(e2.getMessage.contains("replicated"))
    // left variants stay allowed (unmatched small rows never surface)
    assert(Scale.saltedJoin(big, small, "k", 4, "left_semi").count() === 1L)
  }

  test("z-order range guard: an un-normalized huge-range dimension fails loudly") {
    val df = Seq((0L, 1L), (Long.MaxValue - 2, 5L)).toDF("a", "b")
    val e = intercept[Exception](
      Scale.zOrderBuckets(df, "a", "b", bits = 16).collect())
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("z-order"),
      s"expected the range-overflow raise, got: ${chain(e)}")
    // a sane range still works
    val ok = Scale.zOrderBuckets(
      Seq((0L, 0L), (100L, 50L)).toDF("a", "b"), "a", "b", bits = 8)
    assert(ok.count() >= 1L)
  }
}

class WinnowSpec extends SparkSpec {
  import spark.implicits._
  import graft.functions.Expressions

  test("winnow fingerprints are deterministic and insertion-robust") {
    val df = Seq(
      ("the quick brown fox jumps over the lazy dog",
        "the quick brown fox jumps over the lazy dog"),
      ("the quick brown fox jumps over the lazy dog",
        "XX the quick brown fox jumps over the lazy dog"))
      .toDF("a", "b")
    val fps = df.select(
      Expressions.winnowFingerprint(col("a").cast("binary")).as("fa"),
      Expressions.winnowFingerprint(col("b").cast("binary")).as("fb"))
      .as[(Seq[Long], Seq[Long])].collect()
    // identical text → identical fingerprint set
    assert(fps(0)._1.toSet === fps(0)._2.toSet)
    // small prefix insertion → large fingerprint overlap (winnowing property)
    val (fa, fb) = (fps(1)._1.toSet, fps(1)._2.toSet)
    val overlap = fa.intersect(fb).size.toDouble / fa.size
    assert(overlap > 0.7, s"overlap $overlap")
  }

  test("short payloads yield empty or single fingerprint") {
    val got = Seq(("ab", "abcdefg")).toDF("tiny", "small")
      .select(
        Expressions.winnowFingerprint(col("tiny").cast("binary"), 5, 4),
        Expressions.winnowFingerprint(col("small").cast("binary"), 5, 4))
      .as[(Seq[Long], Seq[Long])].collect()(0)
    assert(got._1.isEmpty)
    assert(got._2.size === 1)
  }
}
