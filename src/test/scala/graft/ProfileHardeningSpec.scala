package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Edge hardening for the profiling family (round-14 review pass):
  * NULL group keys survive every join, NaN values can't poison
  * reports, parameter mismatches fail loudly, and generated internal
  * names can't collide with dotted column names. */
class ProfileHardeningSpec extends SparkSpec {
  import spark.implicits._

  test("standardize preserves NULL-group rows (row-preserving contract)") {
    val df = Seq(
      (Some("a"), 1.0), (Some("a"), 3.0),
      (None: Option[String], 10.0), (None, 14.0))
      .toDF("grp", "v")
    val got = Profile.standardize(df, "v", "grp")
    assert(got.count() === 4L, "null-group rows were dropped by the join")
    val zs = got.filter(col("grp").isNull).select(col("z"))
      .as[Option[Double]].collect().flatten.sorted
    // null group: mean 12, sd = sqrt(8) -> z = ±0.7071...
    assert(zs.length === 2)
    assert(math.abs(zs(1) - math.sqrt(0.5)) < 1e-12)
  }

  test("snapshotDrift: a NULL key present in both snapshots is ONE common row") {
    val a = Seq((Some("k1"), 1.0), (None: Option[String], 2.0))
      .toDF("key", "v")
    val b = Seq((Some("k1"), 1.0), (None: Option[String], 3.0), (None, 4.0))
      .toDF("key", "v")
    val got = Profile.snapshotDrift(a, b, "key", "v")
    val nullRows = got.filter(col("key").isNull).collect()
    assert(nullRows.length === 1,
      s"expected one matched null-key row, got ${nullRows.length}")
    val r = nullRows.head
    assert(r.getAs[String]("status") === "common")
    assert(r.getAs[Long]("n_a") === 1L && r.getAs[Long]("n_b") === 2L)
    assert(r.getAs[Long]("delta_n") === 1L)
  }

  test("robustOutliers and winsorize report the NULL group") {
    val df = Seq(
      (Some("a"), 1L), (Some("a"), 2L), (Some("a"), 100L),
      (None: Option[String], 5L), (None, 6L), (None, 7L), (None, 500L))
      .toDF("grp", "v")
    val out = Profile.robustOutliers(df, "grp", "v", k = 3.0)
    assert(out.filter(col("grp").isNull).count() === 1L,
      "the null group must appear in the outlier report")
    val win = Profile.winsorize(df, "grp", "v", 0.25, 0.75)
    assert(win.filter(col("grp").isNull).count() === 1L,
      "the null group must appear in the winsorized stats")
  }

  test("histogram excludes NaN instead of collapsing into one NaN bucket") {
    val df = Seq(1.0, 2.0, 3.0, 4.0, Double.NaN).toDF("v")
    val got = Profile.histogram(df, "v", 2).orderBy(col("bucket")).collect()
    assert(got.length === 2, s"expected 2 buckets, got ${got.length}")
    assert(got.map(_.getAs[Long]("cnt")).sum === 4L)
    assert(!got.exists(r => r.getAs[Double]("lo").isNaN),
      "NaN leaked into the bucket edges")
  }

  test("wilsonPassRates excludes rows whose predicate is NULL") {
    val df = Seq(
      ("a", Some(true)), ("a", Some(true)), ("a", None: Option[Boolean]),
      ("b", Some(false))).toDF("src", "ok")
    val got = Profile.wilsonPassRates(df, col("src"), col("ok"))
      .orderBy(col("group"))
      .select(col("group"), col("n"), col("k"))
      .as[(String, Long, Long)].collect().toSeq
    // group a: the unevaluable row is excluded from n, not counted as
    // a failure
    assert(got === Seq(("a", 2L, 2L), ("b", 1L, 0L)))
  }

  test("benfordProfile audits magnitudes: refunds participate via abs") {
    // 60% positive, 40% negative of the same leading digits: with abs
    // the digit counts fold together; silently excluding negatives
    // would halve the counts
    val df = Seq(123.00, 187.5, -165.25, 291.0, -250.0).toDF("amt")
    val got = Profile.benfordProfile(df, "amt")
      .select(col("digit"), col("n")).as[(Int, Long)].collect().toMap
    assert(got === Map(1 -> 3L, 2 -> 2L))
  }

  test("binnedQuantileFinalize fails loudly on a domain/nBins mismatch") {
    val parts = Profile.binnedQuantilePartials(
      (1 to 100).map(_.toDouble).toDF("v"), lit("s"), col("v"),
      lo = 0.0, hi = 100.0, nBins = 50)
    // matching finalize works
    val ok = Profile.binnedQuantileFinalize(parts, 0.0, 100.0, 50, Seq(0.5))
    assert(ok.count() === 1L)
    // a smaller nBins than the build saw must raise, not silently
    // shift every quantile
    val e = intercept[Exception](
      Profile.binnedQuantileFinalize(parts, 0.0, 100.0, 10, Seq(0.5))
        .collect())
    def chain(t: Throwable): String =
      if (t == null) "" else t.getMessage + " | " + chain(t.getCause)
    assert(chain(e).contains("binnedQuantileFinalize"),
      s"expected the bin-range raise, got: ${chain(e)}")
    val e2 = intercept[IllegalArgumentException](
      Profile.binnedQuantileFinalize(parts, 100.0, 0.0, 50, Seq(0.5)))
    assert(e2.getMessage.contains("lo < hi"))
  }

  test("cms buckets are stable for full-range 64-bit keys (no overflow)") {
    // xxhash64-scale keys: the un-reduced multiply k*(2i+3) overflows
    // int64 (ANSI ArithmeticException); the reduced form must both
    // succeed and stay congruent with small-key arithmetic
    val big = Seq(Long.MaxValue - 7, Long.MinValue + 13, 12345L)
      .toDF("k")
    val sketch = Profile.cmsPartials(big, lit("s"), col("k"),
      depth = 4, width = 64)
    assert(sketch.count() > 0)
    val est = Profile.cmsEstimate(sketch, big, "k", depth = 4, width = 64)
      .select(col("est")).as[Long].collect()
    assert(est.forall(_ >= 1L), "every inserted key estimates >= 1")
    // congruence for small keys: same buckets as the declared formula
    val smallSketch = Profile.cmsPartials(Seq(7L).toDF("k"), lit("s"),
      col("k"), depth = 2, width = 64)
      .select(col("row_i"), col("bucket")).as[(Int, Long)].collect().toSet
    val want = (0 until 2).map(i =>
      (i, ((7L * (2 * i + 3) + 5 * i + 11) % 2147483647L) % 64)).toSet
    assert(smallSketch === want)
  }

  test("table profiles columns whose names contain dots") {
    val df = Seq((1, "x"), (2, "x"), (3, null))
      .toDF("user.id", "seg.name")
    val got = Profile.table(df, Seq("user.id", "seg.name"))
      .orderBy(col("col_name"))
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("seg.name", 3L, 1L, 1L), ("user.id", 3L, 0L, 3L)))
  }
}
