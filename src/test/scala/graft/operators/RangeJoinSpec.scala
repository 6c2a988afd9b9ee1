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
