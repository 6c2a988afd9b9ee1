package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The engine's skew story has two halves: `Scale.saltedJoinDeterministic`
  * (x105 — the manual rewrite for when downstream aggregation needs the
  * join key) and "let AQE split the skewed partition" for plain joins.
  * The second half was documented but never DEMONSTRATED — this runs a
  * hot-key join with the skew thresholds scaled down to test size and
  * asserts the final adaptive plan actually took the skew path
  * (`skew=true` on the sort-merge join), with results identical to the
  * un-tuned run. At 100 TB the same mechanism splits oversized shuffle
  * partitions with production thresholds (256 MB advisory size).
  */
class AqeSkewJoinSpec extends SparkSpec {
  import spark.implicits._

  private def withConfs[T](kvs: (String, String)*)(body: => T): T = {
    val prev = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits the hot partition: skew=true in the final plan") {
    // 80% of the fact lands on one key; pad rows so the hot shuffle
    // partition dwarfs the scaled-down thresholds
    val fact = spark.range(0, 20000).select(
      when(col("id") % 10 < 8, lit(1L)).otherwise(col("id") % 97).as("k"),
      concat(lit("v"), col("id").cast("string"),
        lit("x" * 64)).as("payload"))
    val dim = spark.range(0, 97).select(col("id").as("k"),
      concat(lit("d"), col("id").cast("string")).as("dk"))
    // keep the payload in the output so pruning can't shrink the
    // shuffled rows below the scaled thresholds
    def query = fact.join(dim, "k").groupBy(col("dk"))
      .agg(count(lit(1)).as("n"), sum(length(col("payload"))).as("bytes"))
    val expected = withConfs(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      query.as[(String, Long, Long)].collect().toSet
    }
    withConfs(
      // skew handling only applies to sort-merge joins
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "32KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32KB",
      // keep AQE from pre-coalescing the skew away below the factor
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false") {
      val ds = query.as[(String, Long, Long)]
      val got = ds.collect().toSet
      assert(got === expected, "skew split must not change results")
      // read the plan from the EXECUTED query execution — a fresh
      // Dataset would re-plan and report isFinalPlan=false
      val finalPlan = ds.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"expected the final adaptive plan to mark the SMJ skew=true:\n" +
          finalPlan.linesIterator.take(25).mkString("\n"))
    }
  }
}
