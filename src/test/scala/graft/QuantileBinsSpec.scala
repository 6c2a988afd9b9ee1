package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Mergeable binned-quantile partials + the padding-waste report. */
class QuantileBinsSpec extends SparkSpec {
  import spark.implicits._

  private val Lo = 0.0
  private val Hi = 100.0
  private val Bins = 20 // width 5

  test("merge of per-slice partials equals direct partials on the union") {
    val rnd = new scala.util.Random(11)
    val rows = (1 to 3000).map(i =>
      (s"s${rnd.nextInt(6)}", rnd.nextInt(120).toLong - 10)) // incl. out-of-domain
    val df = rows.toDF("src", "v")
    val partials = Profile.binnedQuantilePartials(df, col("src"), col("v"),
      Lo, Hi, Bins)
    val merged = Profile.binnedQuantileCombine(partials)
      .select(col("bin"), col("cnt")).as[(Long, Long)].collect().toMap
    val direct = Profile.binnedQuantilePartials(df, lit("__ALL__"), col("v"),
      Lo, Hi, Bins)
      .select(col("bin"), col("cnt")).as[(Long, Long)].collect().toMap
    assert(merged === direct)
    // and the finalized estimates agree too (same counts ⇒ same IEEE ops)
    def fin(p: org.apache.spark.sql.DataFrame) =
      Profile.binnedQuantileFinalize(p, Lo, Hi, Bins, Seq(0.5, 0.9))
        .select(col("p"), col("q_est")).as[(Double, Double)].collect().toMap
    assert(fin(Profile.binnedQuantileCombine(partials)) ===
      fin(Profile.binnedQuantilePartials(df, lit("__ALL__"), col("v"),
        Lo, Hi, Bins)))
  }

  test("estimates are within one bin width of the exact quantile") {
    val rnd = new scala.util.Random(13)
    val vals = (1 to 5000).map(_ => rnd.nextInt(100).toLong)
    val df = vals.map(("a", _)).toDF("src", "v")
    val partials = Profile.binnedQuantilePartials(df, col("src"), col("v"),
      Lo, Hi, Bins)
    val width = (Hi - Lo) / Bins
    val got = Profile.binnedQuantileFinalize(partials, Lo, Hi, Bins,
      Seq(0.5, 0.9, 0.99))
      .select(col("p"), col("q_est")).as[(Double, Double)].collect()
    val sorted = vals.sorted
    got.foreach { case (p, est) =>
      val exact = sorted(math.ceil(p * sorted.size).toInt - 1).toDouble
      assert(math.abs(est - exact) <= width,
        s"p=$p est=$est exact=$exact width=$width")
    }
  }

  test("finalize tolerates unmerged multi-run partials (duplicate slice,bin rows)") {
    val df = (1 to 2000).map(i => ("a", (i % 90).toLong)).toDF("src", "v")
    val partials = Profile.binnedQuantilePartials(df, col("src"), col("v"),
      Lo, Hi, Bins)
    // two runs' partials unioned WITHOUT pre-folding — the advertised
    // reuse path; finalize must fold internally, not skip/double ranks
    val doubled = Profile.binnedQuantileFinalize(
      partials.unionByName(partials), Lo, Hi, Bins, Seq(0.5, 0.9, 0.99))
      .select(col("p"), col("q_est"), col("n"))
      .as[(Double, Double, Long)].collect()
    assert(doubled.length === 3) // exactly one row per p — none lost, none doubled
    assert(doubled.forall(_._3 === 4000L)) // counts folded
    // doubling every count leaves the distribution identical: the
    // estimate stays within one bin width of the exact quantile
    val width = (Hi - Lo) / Bins
    val sorted = (1 to 2000).map(i => (i % 90).toLong).sorted
    doubled.foreach { case (p, est, _) =>
      val exact = sorted(math.ceil(p * sorted.size).toInt - 1).toDouble
      assert(math.abs(est - exact) <= width, s"p=$p est=$est exact=$exact")
    }
  }

  test("out-of-domain values clamp into the edge bins, nulls drop") {
    val df = Seq(("a", Some(-50L)), ("a", Some(999L)), ("a", None))
      .toDF("src", "v")
    val bins = Profile.binnedQuantilePartials(df, col("src"), col("v"),
      Lo, Hi, Bins)
      .select(col("bin"), col("cnt")).as[(Long, Long)].collect().toMap
    assert(bins === Map(0L -> 1L, (Bins - 1).toLong -> 1L))
  }

  test("finalize windows run over partials, never raw rows") {
    val df = spark.range(100000).select(
      (col("id") % 7).cast("string").as("src"), (col("id") % 97).as("v"))
    val partials = Profile.binnedQuantilePartials(df, col("src"), col("v"),
      Lo, Hi, Bins)
    val plan = Profile.binnedQuantileFinalize(partials, Lo, Hi, Bins,
      Seq(0.5)).queryExecution.executedPlan.toString
    // the aggregation reduces to ≤ slices×bins rows BEFORE any window:
    // the Window operators must sit above the partial aggregate, and
    // the raw-row side contributes only scan+partial-agg exchanges
    assert(plan.contains("Window"), plan)
    val aggBeforeWindow = plan.indexOf("HashAggregate") >= 0 &&
      plan.indexOf("Window") < plan.indexOf("Range")
    assert(aggBeforeWindow, plan)
  }

  test("partials maintain incrementally under Structured Streaming") {
    // the monoid's point: the same partials expression runs as a
    // streaming aggregation, so a live pipeline maintains the bin
    // counts (and therefore any quantile rollup) without batch rescans
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[(String, Long)]
    val agg = Profile.binnedQuantilePartials(
      input.toDF().toDF("src", "v"), col("src"), col("v"), Lo, Hi, Bins)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("qbins").start()
    try {
      input.addData(("a", 3L), ("a", 7L), ("b", 50L))
      q.processAllAvailable()
      input.addData(("a", 97L), ("a", 2L)) // second micro-batch updates
      q.processAllAvailable()
      val got = spark.table("qbins")
        .select(col("slice"), col("bin"), col("cnt"))
        .as[(String, Long, Long)].collect().toSet
      // width 5: 3,7,2 → bins 0,1,0 for a; 97 → bin 19; 50 → bin 10
      assert(got === Set(("a", 0L, 2L), ("a", 1L, 1L), ("a", 19L, 1L),
        ("b", 10L, 1L)))
      // finalize runs on the maintained partials as a plain batch read
      val p50 = Profile.binnedQuantileFinalize(
        spark.table("qbins").filter(col("slice") === "a"),
        Lo, Hi, Bins, Seq(0.5))
        .select(col("q_est")).as[Double].collect().head
      // rank ceil(0.5*4)=2 in bin 0 (cnt 2): 0 + 5*(2-0)/2 = 5.0
      assert(p50 === 5.0)
    } finally q.stop()
  }

  test("wilsonPassRates: evidence beats luck, bound clamps at zero") {
    val rows = (1 to 3).map(i => ("fluke", true)) ++
      (1 to 1000).map(i => ("solid", i <= 900)) ++
      (1 to 5).map(_ => ("allfail", false))
    val got = Profile.wilsonPassRates(rows.toDF("src", "ok"),
      col("src"), col("ok"))
      .select(col("group"), col("n"), col("k"), col("rate"),
        col("wilson_lb"))
      .as[(String, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    // raw rate ranks the 3/3 fluke first; the Wilson lower bound
    // ranks the 900/1000 evidence first — the whole point
    assert(got("fluke")._4 === 1.0)
    assert(got("fluke")._5 < got("solid")._5)
    // hand check (z=1.96): n=3,k=3 → lb = (1 + z²/6 − z·√(z²/36))/(1+z²/3)
    val z2 = 1.96 * 1.96
    val expected = (1.0 + z2 / 6.0 - 1.96 * math.sqrt(z2 / 36.0)) /
      (1.0 + z2 / 3.0)
    assert(math.abs(got("fluke")._5 - expected) < 1e-12)
    assert(got("allfail")._5 === 0.0) // clamped, never negative
  }

  test("tokenBudgetTake: crossing doc kept, deterministic order, per-group") {
    val df = Seq(
      ("a", 1L, 100L), ("a", 2L, 150L), ("a", 3L, 100L), ("a", 4L, 10L),
      ("b", 1L, 999L), // first doc alone crosses: still kept
      ("c", 1L, 10L), ("c", 2L, 10L))
      .toDF("src", "id", "toks")
    val got = graft.ext.Sampling.tokenBudgetTake(df, col("src"), col("id"),
      col("toks"), budget = 300L)
      .select(col("src"), col("id"), col("cum_tokens"))
      .as[(String, Long, Long)].collect().toSet
    // a: 100, 250, 350 (crosses at id 3 — kept), id 4 dropped
    // b: single over-budget doc kept (every group yields >= 1 doc)
    // c: both under budget
    assert(got === Set(("a", 1L, 100L), ("a", 2L, 250L), ("a", 3L, 350L),
      ("b", 1L, 999L), ("c", 1L, 10L), ("c", 2L, 20L)))
    intercept[IllegalArgumentException] {
      graft.ext.Sampling.tokenBudgetTake(df, col("src"), col("id"),
        col("toks"), budget = 0L)
    }
    // plan: group-partitioned running frame, no unpartitioned window
    val plan = graft.ext.Sampling.tokenBudgetTake(df, col("src"), col("id"),
      col("toks"), budget = 300L).queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("unboundedfollowing"), plan)
  }

  test("paddingWaste: bucket rule, truncation, waste fraction") {
    val df = Seq(10L, 16L, 17L, 40L, 90L, 0L).map(("d", _)).toDF("k", "len")
    val got = graft.ext.Packing.paddingWaste(df, col("len"),
      Seq(16L, 32L, 64L))
      .orderBy(col("boundary"))
      .select(col("boundary"), col("n_docs"), col("sum_tokens"),
        col("padded_tokens"), col("truncated_tokens"), col("waste_frac"))
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    // len 10,16 → 16; len 17 → 32; len 40,90 → 64 (90 truncates 26); 0 drops
    assert(got.map(r => (r._1, r._2, r._3, r._4, r._5)) ===
      Seq((16L, 2L, 26L, 32L, 0L), (32L, 1L, 17L, 32L, 0L),
        (64L, 2L, 130L, 128L, 26L)))
    // bucket 64: padded 128, used mass 104 → waste 24/128
    assert(math.abs(got(2)._6 - 24.0 / 128.0) < 1e-12)
    intercept[IllegalArgumentException] {
      graft.ext.Packing.paddingWaste(df, col("len"), Seq(32L, 16L))
    }
    intercept[IllegalArgumentException] {
      graft.ext.Packing.paddingWaste(df, col("len"), Seq.empty)
    }
  }
}
