package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("binned window join equals the naive range join") {
    val probe = Seq((1L, 100L), (2L, 250L), (3L, 999L))
      .toDF("p_id", "p_ts")
    val build = (0L until 60L).map(i => (1000L + i, i * 20L))
      .toDF("b_id", "b_ts")
    val got = RangeJoin.timeWindow(probe, build,
      col("p_ts"), col("b_ts"), before = 50L, after = 30L)
      .select("p_id", "b_id").as[(Long, Long)].collect().toSet
    val naive = probe.crossJoin(build)
      .filter(col("b_ts") >= col("p_ts") - 50L &&
        col("b_ts") <= col("p_ts") + 30L)
      .select("p_id", "b_id").as[(Long, Long)].collect().toSet
    assert(got === naive && got.nonEmpty)
  }

  test("bin membership is exact for > 2^53 nanosecond epochs") {
    val ns = 1706745600L * 1000000000L // 2024-02-01 in ns, > 2^53
    val probe = Seq((1L, ns)).toDF("p_id", "p_ts")
    val build = Seq((10L, ns - 59L * 1000000000L),
      (11L, ns + 61L * 1000000000L)).toDF("b_id", "b_ts")
    val got = RangeJoin.timeWindow(probe, build, col("p_ts"), col("b_ts"),
      60L * 1000000000L, 60L * 1000000000L)
      .select("b_id").as[Long].collect().toSet
    assert(got === Set(10L)) // -59s in window, +61s out
  }

  test("interval overlap equals the naive join, exactly once per pair") {
    // intervals crafted so pairs share 0, 1, 2 and 3+ bins at width 10
    val a = Seq((1L, 0L, 35L), (2L, 5L, 7L), (3L, 90L, 95L))
      .toDF("a_id", "a_lo", "a_hi")
    val b = Seq((10L, 3L, 4L), (11L, 30L, 60L), (12L, 7L, 7L),
      (13L, 96L, 99L)).toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi",
        "b_lo", "b_hi", binWidth = 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    val naive = a.crossJoin(b)
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    // SEQUENCES compared: a pair emitted from two bins would show as a
    // duplicate here, not collapse into a set
    assert(got.sorted === naive.sorted && got.nonEmpty)
    assert(got.size === got.distinct.size, "pair emitted more than once")
  }

  test("interval overlap: multi-bin containment still emits once") {
    val a = Seq((1L, 0L, 100L)).toDF("a_id", "a_lo", "a_hi") // 11 bins
    val b = Seq((2L, 0L, 100L), (3L, 50L, 55L))
      .toDF("b_id", "b_lo", "b_hi")
    val got = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi",
        "b_lo", "b_hi", binWidth = 10L)
      .select("a_id", "b_id").as[(Long, Long)].collect().toSeq
    assert(got.sorted === Seq((1L, 2L), (1L, 3L)))
  }

  test("interval overlap fails loudly on inverted or runaway intervals") {
    val a = Seq((1L, 50L, 10L)).toDF("a_id", "a_lo", "a_hi")
    val b = Seq((2L, 0L, 5L)).toDF("b_id", "b_lo", "b_hi")
    val e = intercept[Exception] {
      RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        binWidth = 10L).collect()
    }
    assert(e.getMessage != null)
    val wide = Seq((1L, 0L, 1000000L)).toDF("a_id", "a_lo", "a_hi")
    intercept[Exception] {
      RangeJoin.intervalOverlap(wide, b, "a_lo", "a_hi", "b_lo", "b_hi",
        binWidth = 10L, maxBinsPerInterval = 100L).collect()
    }
    intercept[IllegalArgumentException] { // shared column names
      RangeJoin.intervalOverlap(a, a, "a_lo", "a_hi", "a_lo", "a_hi", 10L)
    }
  }
}

class PartitionPruningSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned writes prune partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val scan = q.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan)
    // only the purchase partition's rows are read
    assert(q.count() ===
      spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(col("event_type") === "purchase").count())
  }
}
