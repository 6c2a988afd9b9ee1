package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the bench contract line out of the LAST ~4 KB of
  * stdout (round-3 lost a whole round's perf numbers to an oversized
  * line). These pin the line's byte budget and the stats helpers —
  * no SparkSession needed.
  */
class BenchContractSpec extends AnyFunSuite {

  private val calPair = Bench.RunSample(0.0843, 2.1412, 0.0123)

  // Stand-in for the driver's ~4 KB (4096 B) tail window. The line is
  // the LAST thing Bench prints; only sbt's epilogue ("[success] Total
  // time: ..." ≈ 60-80 B) follows it in stdout. 3800 keeps ~300 B for
  // that epilogue plus flush slack. (Was 3712 when the surface was 118
  // queries; the name-keyed queries map is the irreducible cost and
  // every other field is already at its floor — error budget 1×44,
  // cal as a bare array pair.)
  private val Window = 3800

  private def line(results: Seq[(String, Double)],
      errors: Map[String, String],
      contended: Seq[String] = Nil): String =
    Bench.contractLine(results.map(_._2).filter(_ >= 0).sum, results,
      errors, calPair, calPair, "/root/testdata/sf0.1", contended)

  test("secStr: adaptive precision, trimmed, valid JSON numbers") {
    assert(Bench.secStr(0.36) === "0.36")
    assert(Bench.secStr(0.105) === "0.11") // baselines are 2-dec anyway
    assert(Bench.secStr(1.2345) === "1.23")
    assert(Bench.secStr(67.0) === "67")
    assert(Bench.secStr(123.456) === "123.5")
    assert(Bench.secStr(-1.0) === "-1") // failed-query sentinel
    assert(Bench.secStr(0.0) === "0")
  }

  test("real surface keeps >=20 queries of growth headroom (round-6 mandate)") {
    val real = SparkEntry.queries.toSeq.map(_._1 -> 1.2345)
    val realLen = line(real, Map.empty).length
    // STRUCTURAL pin, not an absolute that chases every added query:
    // whatever the live surface is, 20 MORE queries at realistic name
    // length (16 chars — the live average is ~14, longest 22) must
    // still clear the window stand-in. The absolute bound below only
    // trips if the surface grows far past the planned envelope.
    val grown = real ++ (1 to 20).map(i => f"x2$i%02d_operator_nm" -> 1.2345)
    val grownLen = line(grown, Map.empty).length
    assert(grownLen < Window,
      s"real=$realLen grown(+20)=$grownLen vs window $Window")
    assert(realLen < 3300, s"real surface line is $realLen bytes — " +
      "the next growth step needs a real encoding shrink, not a pin bump")
    assert(!line(real, Map.empty).contains("\"errors\""),
      "empty errors map must be omitted entirely")
    assert(line(real, Map.empty).startsWith("{\"metric\":\"total\""))
  }

  test("errors map appears (escaped) only when a query failed") {
    val got = line(Seq("q1" -> -1.0),
      Map("q1" -> "boom\nline2\t\"quoted\""))
    assert(got.contains("\"errors\""))
    assert(got.contains("boom\\nline2\\t\\\"quoted\\\""))
    // still one physical line
    assert(!got.contains('\n'))
  }

  test("error sample set is deterministic: sorted by query name") {
    val errs = (1 to 12).map(i => f"x$i%02d_q" -> s"err$i").toMap
    val got = line(Seq("q1" -> 1.0), errs)
    val shown = "\"(x\\d+_q)\":".r.findAllMatchIn(got).map(_.group(1)).toSeq
    assert(shown === Seq("x01_q"), got)
    assert(got.contains("\"more_errors\":11"), got)
  }

  test("error messages drop the exception package prefix, not the content") {
    val got = line(Seq("q1" -> -1.0), Map("q1" ->
      "org.apache.spark.sql.AnalysisException: cannot resolve 'zzz'"))
    assert(got.contains("\"q1\":\"AnalysisException: cannot resolve 'zzz'\""),
      got)
  }

  test("mass failure cannot blow the tail window (round-5 regression)") {
    // round 5's driver artifact recorded parsed:null — 22 × 200-char
    // analysis exceptions pushed the line past the ~4 KB tail window.
    // The line inlines ONE error at 44 chars, plus a count. Worst
    // realistic case: the GROWN surface (live names + 20 more) with
    // 30 of them failing on long analysis exceptions.
    val grown = SparkEntry.queries.toSeq.map(_._1 -> 1.2345) ++
      (1 to 20).map(i => f"x2$i%02d_operator_nm" -> 1.2345)
    val errs = grown.take(30)
      .map(t => t._1 -> ("org.apache.spark.sql.AnalysisException: " +
        "x" * 180)).toMap
    val got = line(grown, errs)
    assert(got.length < Window, s"line is ${got.length} bytes")
    assert(got.contains("\"more_errors\":29"), got.takeRight(200))
  }

  test("contended flag is capped and omitted when clean") {
    assert(!line(Seq("q1" -> 1.0), Map.empty).contains("contended"))
    val flagged = (1 to 10).map(i => f"x$i%02d_operator_name")
    val got = line(flagged.map(_ -> 9.9), Map.empty, flagged)
    assert(got.contains("\"contended\":[\"x01_operator_name\""))
    assert(got.contains("\"more_contended\":2"), got)
  }

  test("median: odd, even, empty") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) === 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) === 2.5)
    assert(Bench.median(Nil) === -1.0)
  }

  test("recorded baseline covers the query surface it predates") {
    // every baseline key must still be a live query (a renamed query
    // would silently lose adjudication), and the values are sane
    val live = SparkEntry.queries.map(_._1).toSet
    val stale = Bench.recordedBaseline.keySet.diff(live)
    assert(stale.isEmpty, s"baseline entries for dead queries: $stale")
    assert(Bench.recordedBaseline.values.forall(v => v > 0 && v < 60))
  }
}
