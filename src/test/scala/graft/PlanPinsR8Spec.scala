package graft

import org.apache.spark.sql.functions._

import graft.operators.{Pipeline, Profile, Scale}

/** Physical-plan pins for the round-8 operators: the scale-shape
  * claims each scaladoc makes, asserted against the executed plan so
  * a refactor can't silently regress them.
  */
class PlanPinsR8Spec extends SparkSpec {
  import spark.implicits._

  private def shuffles(plan: String): Int =
    "Exchange hashpartitioning".r.findAllIn(plan).length

  private def scans(plan: String): Int =
    "Scan ".r.findAllIn(plan).length

  test("functionalDependencies reads its input ONCE for any hypothesis count") {
    val path = java.nio.file.Files
      .createTempDirectory("graft-fd-pin").toString
    Seq((1L, "a", "x"), (2L, "b", "y")).toDF("id", "k", "v")
      .write.mode("overwrite").parquet(path)
    val df = spark.read.parquet(path)
    val plan = Profile.functionalDependencies(df, Seq(
      (Seq("id"), "k"), (Seq("k"), "v"), (Seq("id", "k"), "v")))
      .queryExecution.executedPlan.toString
    // one file scan feeds the exploded hypothesis frame — P groupBys
    // would show P scans
    assert("FileScan|Scan parquet".r.findAllIn(plan).size <= 1 &&
      plan.contains("parquet"), plan)
  }

  test("cmsPartials exchanges carry only sketch keys (partial agg map-side)") {
    val df = spark.range(10000).select((col("id") % 97).as("k"),
      lit("s").as("slice"))
    val plan = Profile.cmsPartials(df, col("slice"), col("k"))
      .queryExecution.executedPlan.toString
    // partial_count below the exchange: the corpus collapses to
    // ≤ slices×d×w rows before anything shuffles
    assert(plan.contains("partial_count") || plan.contains("partial"),
      plan)
    assert(shuffles(plan) === 1, plan)
  }

  test("zOrderBuckets never shuffles raw rows: stats broadcast + bucket agg") {
    val df = spark.range(5000).select((col("id") % 100).as("a"),
      (col("id") % 37).as("b"))
    val plan = Scale.zOrderBuckets(df, "a", "b", bits = 8, bucketBits = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan) // the stats row
    // the only hash exchange is the ≤2^bucketBits-key bucket agg
    assert(shuffles(plan) === 1, plan)
    assert(plan.contains("partial"), plan)
  }

  test("gateAttrition shuffles at most |stages|+1 keys") {
    val df = spark.range(5000).select(col("id"), (col("id") % 7).as("m"))
    val out = Pipeline.gateAttrition(df,
      Seq("s0" -> (col("m") > 0), "s1" -> (col("m") > 1)))
    val plan = out.queryExecution.executedPlan.toString
    // the first-fail aggregation is eagerly checkpointed to a
    // ≤|stages|+1-row frame and the cross-stage arithmetic runs
    // through the BOUNDED running-sum helper (round-16), so the
    // OUTPUT plan is a LocalTableScan of the driver-computed stage
    // rows — never a rescan or re-shuffle of the input
    assert(plan.contains("LocalTableScan") ||
      plan.contains("ExistingRDD") || plan.contains("LogicalRDD"),
      plan)
    // df's source (range 0..5000) must not reappear — the only Range
    // allowed is the 1-row stage-frame generator
    assert(!plan.contains("Range (0, 5000"),
      "funnel re-reads the input:\n" + plan)
  }

  test("psi collapses both sides map-side in one union scan") {
    val a = spark.range(4000).select((col("id") % 100).cast("double")
      .as("v"))
    val b = spark.range(4000).select((col("id") % 90).cast("double")
      .as("v"))
    val plan = Profile.psi(a, b, "v", 0.0, 100.0, 10)
      .queryExecution.executedPlan.toString
    // since round 16 the bin frame materializes ONCE via an eager
    // localCheckpoint (union + partial agg + the single bin-keyed
    // exchange run there), and the visible plan consumes it as a
    // checkpointed scan with the one-row totals broadcast — zero
    // further shuffles and, critically, NO re-scan of the corpus
    // inputs (a second Range scan here would mean the totals branch
    // re-evaluated the union)
    assert(plan.contains("Scan ExistingRDD"), plan)
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"), plan)
    assert(shuffles(plan) === 0, plan)
    assert(!plan.contains("Range ("), plan)
    assert(!plan.contains("Union"), plan)
  }

  test("groupTrend is one group aggregate over the observation frame") {
    val obs = spark.range(300).select((col("id") % 5).as("g"),
      (col("id") % 30).as("x"), (col("id") % 11).as("y"))
    val plan = Profile.groupTrend(obs, col("g"), col("x"), col("y"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastExchange"), plan) // the min-x row
    assert(shuffles(plan) === 1, plan)
  }

  test("prefixJaccardJoin candidates stay narrow until after the pair dedup") {
    val docs = (0 until 50).map { i =>
      (i.toLong, s"u${i}a u${i}b common${i % 3} word tok$i extra")
    }.toDF("doc_id", "text")
    val df = graft.ext.Dedup.prefixJaccardJoin(docs, "doc_id", "text",
      0.6, maxPrefixDf = 1000)
    val plan = df.queryExecution.optimizedPlan.toString
    // round-14 shape: the candidate frame is eagerly CHECKPOINTED
    // (its dedup executed inside the checkpoint), so the final plan
    // reads a narrow LogicalRDD of exactly (doc_a, doc_b, n_a, n_b) —
    // no token arrays ever cross the candidate exchange — and
    // verification re-tokenizes ONLY candidate docs above it, via a
    // broadcast of the candidate id list
    val rddIdx = plan.indexOf("LogicalRDD [doc_a")
    assert(rddIdx >= 0, plan)
    val rddLine = plan.substring(rddIdx, plan.indexOf("]", rddIdx))
    assert(!rddLine.contains("ta") && !rddLine.contains("toks"),
      "token arrays leaked into the checkpointed candidate frame:\n" + plan)
    assert(plan.contains("array_intersect"), plan) // verify stage above
    assert(plan.contains("strategy=broadcast"),
      "candidate-doc re-tokenization lost its broadcast:\n" + plan)
  }
}
