package graft

import org.apache.spark.sql.functions._

import graft.operators.Profile

/** Hand-computed fixtures for the round-8 profiling trio: FD /
  * candidate-key discovery, Benford first-digit audit, integer CUSUM
  * change-point.
  */
class ProfileR8Spec extends SparkSpec {
  import spark.implicits._

  // ---- functionalDependencies -----------------------------------------

  // id unique; city -> country holds; country -> city violated (us has
  // nyc+sf); (country, city) unique
  private val fdDf = Seq(
    (1L, "nyc", "us"),
    (2L, "nyc", "us"),
    (3L, "sf", "us"),
    (4L, "paris", "fr")
  ).toDF("id", "city", "country")

  test("functionalDependencies verdicts, counts, and key detection") {
    val out = Profile.functionalDependencies(fdDf, Seq(
      (Seq("id"), "city"),
      (Seq("city"), "country"),
      (Seq("country"), "city"),
      (Seq("country", "city"), "id")))
      .select("hypothesis", "n_groups", "n_rows", "violating_groups",
        "max_dep_per_det", "holds", "det_is_unique")
      .as[(String, Long, Long, Long, Long, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out("id->city") === ("id->city", 4L, 4L, 0L, 1L, true, true))
    assert(out("city->country") ===
      ("city->country", 3L, 4L, 0L, 1L, true, false))
    // us -> {nyc, sf}: 1 violating group, 2 distinct cities
    assert(out("country->city") ===
      ("country->city", 2L, 4L, 1L, 2L, false, false))
    // (us,nyc) holds ids {1,2} -> violated; 3 groups over 4 rows
    assert(out("country,city->id") ===
      ("country,city->id", 3L, 4L, 1L, 2L, false, false))
  }

  test("functionalDependencies multi-column determinant cannot collide") {
    // ("1","23") vs ("12","3") — same concatenation without the 
    // separator; a->b holds per-pair, so any violation would be a
    // collision artifact
    val df = Seq((1L, "1", "23", "x"), (2L, "12", "3", "y"))
      .toDF("id", "a", "b", "dep")
    val out = Profile.functionalDependencies(df,
      Seq((Seq("a", "b"), "dep")))
      .select("n_groups", "violating_groups")
      .as[(Long, Long)].head()
    assert(out === ((2L, 0L)))
  }

  test("functionalDependencies distinguishes NULL position in determinants") {
    // (NULL,"x") and ("x",NULL) are DIFFERENT determinant tuples; a
    // null-skipping concat collapsed them and fabricated a violation
    val df = Seq((1L, None, Some("x"), "d1"), (2L, Some("x"), None, "d2"))
      .toDF("id", "a", "b", "dep")
    val out = Profile.functionalDependencies(df, Seq((Seq("a", "b"), "dep")))
      .select("n_groups", "violating_groups", "holds")
      .as[(Long, Long, Boolean)].head()
    assert(out === ((2L, 0L, true)))
  }

  test("functionalDependencies survives separator-looking data") {
    // values embedding quotes/braces/control-ish chars must stay
    // injective through the JSON determinant encoding
    val df = Seq((1L, "a\"b", "c", "d1"), (2L, "a", "\"b,c", "d2"))
      .toDF("id", "x", "y", "dep")
    val out = Profile.functionalDependencies(df, Seq((Seq("x", "y"), "dep")))
      .select("n_groups", "violating_groups")
      .as[(Long, Long)].head()
    assert(out === ((2L, 0L)))
  }

  test("functionalDependencies ignores null dependents") {
    val df = Seq((1L, "a", Some("x")), (2L, "a", None), (3L, "b", None))
      .toDF("id", "k", "dep")
    val out = Profile.functionalDependencies(df, Seq((Seq("k"), "dep")))
      .select("n_groups", "violating_groups", "max_dep_per_det", "holds")
      .as[(Long, Long, Long, Boolean)].head()
    // group a: one distinct dep; group b: zero — neither violates
    assert(out === ((2L, 0L, 1L, true)))
  }

  // ---- benfordProfile -------------------------------------------------

  test("benfordProfile digits from exact cents, shares sum to one") {
    // values: 1.23 -> 123 cents -> digit 1; 0.04 -> 4; 9.5 -> 950 -> 9;
    // 12.00 -> 1200 -> 1; zero and null dropped
    val df = Seq(Some(1.23), Some(0.04), Some(9.5), Some(12.0),
      Some(0.0), None).flatMap(v => Seq(v)).toDF("v")
    val out = Profile.benfordProfile(df, "v")
      .select("digit", "n", "frac_r")
      .as[(Int, Long, Double)].collect().sortBy(_._1)
    assert(out.toSeq === Seq((1, 2L, 0.5), (4, 1L, 0.25), (9, 1L, 0.25)))
  }

  test("benfordProfile excludes sub-half-cent values instead of crashing") {
    // 0.004 rounds to 0 cents — digit "0" would index expected[0]
    // (a runtime error); the cents >= 1 gate drops it
    val df = Seq(0.004, 1.23).toDF("v")
    val out = Profile.benfordProfile(df, "v")
      .select("digit", "n").as[(Int, Long)].collect()
    assert(out.toSeq === Seq((1, 1L)))
  }

  test("benfordProfile expected shares are log10(1+1/d)") {
    val df = (1 to 9).map(d => d * 1.0).toDF("v")
    val out = Profile.benfordProfile(df, "v")
      .select("digit", "expected").as[(Int, Double)].collect().toMap
    (1 to 9).foreach { d =>
      assert(math.abs(out(d) - math.log10(1.0 + 1.0 / d)) < 1e-14,
        s"digit $d")
    }
  }

  // ---- groupTrend -----------------------------------------------------

  test("groupTrend recovers exact slopes, intercepts, and r2") {
    val obs = Seq(
      ("up", 0L, 1L), ("up", 1L, 3L), ("up", 2L, 5L),   // y = 2x + 1
      ("flat", 0L, 5L), ("flat", 1L, 5L),               // constant y
      ("point", 2L, 1L), ("point", 2L, 3L)              // single x
    ).toDF("g", "x", "y")
    val out = Profile.groupTrend(obs, col("g"), col("x"), col("y"))
      .select("group", "n", "slope_r", "intercept_r", "r2_r")
      .as[(String, Long, Option[Double], Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out("up") === (("up", 3L, Some(2.0), Some(1.0), Some(1.0))))
    // constant y: slope 0, r2 undefined (denY = 0)
    assert(out("flat") === (("flat", 2L, Some(0.0), Some(5.0), None)))
    // degenerate x: no regression exists
    assert(out("point") === (("point", 2L, None, None, None)))
  }

  test("groupTrend excludes NULL observations entirely") {
    // a NULL y row must not count into n while the sums skip it —
    // that would silently corrupt the regression (review finding)
    val obs = Seq(("g", Some(0L), Some(10L)), ("g", Some(1L), None),
      ("g", Some(2L), Some(10L)), ("g", None, Some(7L)))
      .toDF("g", "x", "y")
    val out = Profile.groupTrend(obs, col("g"), col("x"), col("y"))
      .select("n", "slope_r", "intercept_r")
      .as[(Long, Option[Double], Option[Double])].head()
    assert(out === ((2L, Some(0.0), Some(10.0))))
  }

  test("groupTrend intercept is reported at the frame's min x") {
    // same line y = 2x + 1 sampled at x = 10..12: after the min-x
    // shift the intercept is y(10) = 21, slope unchanged
    val obs = Seq(("g", 10L, 21L), ("g", 11L, 23L), ("g", 12L, 25L))
      .toDF("g", "x", "y")
    val r = Profile.groupTrend(obs, col("g"), col("x"), col("y"))
      .select("slope_r", "intercept_r").as[(Double, Double)].head()
    assert(r === ((2.0, 21.0)))
  }

  // ---- psi ------------------------------------------------------------

  test("psi terms, shares, and clamping are exact") {
    val a = (Seq.fill(5)(10.0) ++ Seq.fill(5)(60.0)).toDF("v")
    // 999.0 is far above hi=100: clamps into the last bin
    val b = (Seq.fill(2)(10.0) ++ Seq.fill(7)(60.0) ++ Seq(999.0))
      .toDF("v")
    val out = Profile.psi(a, b, "v", lo = 0.0, hi = 100.0, nBins = 2)
      .select("bin", "n_a", "n_b", "psi_term_r")
      .as[(Long, Long, Long, Option[Double])].collect().sortBy(_._1)
    assert(out.map(t => (t._1, t._2, t._3)).toSeq ===
      Seq((0L, 5L, 2L), (1L, 5L, 8L)))
    val t0 = (0.5 - 0.2) * math.log(0.5 / 0.2)
    val t1 = (0.5 - 0.8) * math.log(0.5 / 0.8)
    assert(out(0)._4.get === math.rint(t0 * 1e4) / 1e4)
    assert(out(1)._4.get === math.rint(t1 * 1e4) / 1e4)
  }

  test("psi emits null shares (not NaN) when a snapshot is empty") {
    val a = Seq(10.0, 60.0).toDF("v")
    val b = a.filter(col("v") < 0) // empty snapshot
    val out = Profile.psi(a, b, "v", 0.0, 100.0, 2)
      .select("bin", "p_b_r", "psi_term_r")
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(out.nonEmpty)
    assert(out.forall(r => r._2.isEmpty && r._3.isEmpty),
      out.mkString(","))
  }

  test("psi emits null terms for one-sided bins") {
    val a = Seq(10.0, 90.0).toDF("v")
    val b = Seq(10.0).toDF("v") // nothing from b in the upper bin
    val out = Profile.psi(a, b, "v", 0.0, 100.0, 2)
      .select("bin", "psi_term_r").as[(Long, Option[Double])]
      .collect().toMap
    assert(out(1L) === None)
    assert(out(0L).isDefined)
  }

  // ---- giniIndex ------------------------------------------------------

  test("giniIndex hand values: equality, concentration, ties") {
    val df = Seq(
      ("mix", 1L), ("mix", 1L), ("mix", 2L),   // G = 2*9/(3*4) - 4/3
      ("equal", 5L), ("equal", 5L),            // G = 0
      ("conc", 0L), ("conc", 0L), ("conc", 10L) // G = 2/3 (max for n=3)
    ).toDF("g", "v")
    val out = Profile.giniIndex(df, "g", "v")
      .select("group", "n", "total", "gini_r")
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out("mix") === (("mix", 3L, 4L,
      Some(math.rint((18.0 / 12.0 - 4.0 / 3.0) * 1e9) / 1e9))))
    assert(out("equal") === (("equal", 2L, 10L, Some(0.0))))
    assert(out("conc")._4.get === math.rint(2.0 / 3.0 * 1e9) / 1e9)
  }

  test("giniIndex equals the brute-force rank formula on random data") {
    val rnd = new scala.util.Random(88)
    val rows = Seq.tabulate(300)(i =>
      (s"g${i % 4}", rnd.nextInt(50).toLong))
    val got = Profile.giniIndex(rows.toDF("g", "v"), "g", "v")
      .select("group", "gini_r").as[(String, Double)].collect().toMap
    rows.groupBy(_._1).foreach { case (g, rs) =>
      val xs = rs.map(_._2).sorted
      val n = xs.size.toLong
      val tot = xs.sum
      val num = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val want = 2.0 * num / (n * tot).toDouble -
        (n + 1).toDouble / n.toDouble
      assert(math.abs(got(g) - want) < 1e-9, g)
    }
  }

  // ---- cusumChangePoint -----------------------------------------------

  test("cusumChangePoint flags the shift bucket on a step series") {
    // counts per bucket: 2,2,2,8,8 (T=22, D=5)
    // D*cum - i*T: 5*2-22=-12, 5*4-44=-24, 5*6-66=-36, 5*14-88=-18,
    // 5*22-110=0 — peak at bucket 3 (|−36|)
    val rows = Seq.tabulate(5) { b =>
      val n = if (b < 3) 2 else 8
      Seq.fill(n)(b.toLong)
    }.flatten.toDF("bucket_src")
    val out = Profile.cusumChangePoint(rows, col("bucket_src"))
      .select("bucket", "n", "cusum_scaled", "is_peak")
      .as[(Long, Long, Long, Boolean)].collect().sortBy(_._1)
    assert(out.toSeq === Seq(
      (0L, 2L, -12L, false), (1L, 2L, -24L, false),
      (2L, 2L, -36L, true), (3L, 8L, -18L, false),
      (4L, 8L, 0L, false)))
  }

  test("cusumChangePoint is flat-zero on a constant series, no peaks") {
    val rows = Seq.tabulate(4)(b => Seq.fill(3)(b.toLong)).flatten
      .toDF("b")
    val out = Profile.cusumChangePoint(rows, col("b"))
      .select("cusum_scaled", "is_peak").as[(Long, Boolean)].collect()
    assert(out.forall(_._1 === 0L))
    // a flat series has NO change-point — nothing may be flagged
    assert(out.forall(!_._2))
  }

  // ---- cohenKappa -----------------------------------------------------

  test("cohenKappa matches the textbook example") {
    import graft.operators.Calibrate
    val rows =
      Seq.fill(20)(("y", "y")) ++ Seq.fill(5)(("y", "n")) ++
      Seq.fill(10)(("n", "y")) ++ Seq.fill(15)(("n", "n"))
    val out = Calibrate.cohenKappa(rows.toDF("a", "b"),
      col("a"), col("b"))
      .select("n", "n_agree", "po_r", "pe_r", "kappa_r")
      .as[(Long, Long, Double, Double, Double)].head()
    assert(out === ((50L, 35L, 0.7, 0.5, 0.4)))
  }

  test("cohenKappa is null when agreement is vacuous (pe = 1)") {
    import graft.operators.Calibrate
    val out = Calibrate.cohenKappa(
      Seq.fill(5)(("x", "x")).toDF("a", "b"), col("a"), col("b"))
      .select("po_r", "kappa_r").as[(Double, Option[Double])].head()
    assert(out === ((1.0, None)))
  }
}
