package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses the bench contract line out of the LAST ~4 KB of
  * stdout (round-3 lost a whole round's perf numbers to an oversized
  * line). These pin the line's byte budget and the stats helpers —
  * no SparkSession needed.
  */
class BenchContractSpec extends AnyFunSuite {

  private val calPair = Bench.RunSample(0.0843, 2.1412, 0.0123)

  private def line(results: Seq[(String, Double)],
      errors: Map[String, String]): String =
    Bench.contractLine(results.map(_._2).filter(_ >= 0).sum, results,
      errors, calPair, calPair, "/root/testdata/sf0.1")

  test("contract line stays under 3.7 KB at 130 queries with no errors") {
    // synthetic names at the REAL surface's average length (the live
    // names average ~14 chars; the longest is 22)
    // 18-char synthetic names run LONGER than the real average — a
    // conservative bound: 130 such queries still leave ~0.4 KB of the
    // driver's ~4 KB tail window. The NEXT growth step past ~130
    // queries needs an actual shrink (shorter names or a split line),
    // not another pin bump.
    val names = (1 to 130).map(i => f"x${i}%03d_operator_name")
    val results = names.map(_ -> 1.2345)
    val got = line(results, Map.empty)
    assert(got.length < 3712, s"line is ${got.length} bytes")
    assert(!got.contains("\"errors\""),
      "empty errors map must be omitted entirely")
    assert(got.startsWith("{\"metric\":\"total\""))
    // and the REAL surface today (118 queries ≈ 2.9 KB), at full name
    // length, keeps ~8 queries of headroom under this pin and ~1 KB
    // inside the driver's ~4 KB tail window
    val real = SparkEntry.queries.toSeq.map(_._1 -> 1.2345)
    assert(line(real, Map.empty).length < 3072,
      s"real surface line is ${line(real, Map.empty).length} bytes")
  }

  test("errors map appears (escaped) only when a query failed") {
    val got = line(Seq("q1" -> -1.0),
      Map("q1" -> "boom\nline2\t\"quoted\""))
    assert(got.contains("\"errors\""))
    assert(got.contains("boom\\nline2\\t\\\"quoted\\\""))
    // still one physical line
    assert(!got.contains('\n'))
  }

  test("mass failure cannot blow the tail window (round-5 regression)") {
    // round 5's driver artifact recorded parsed:null — 22 × 200-char
    // analysis exceptions pushed the line past the ~4 KB tail window.
    // The line inlines at most 8 errors at 80 chars, plus a count.
    val names = (1 to 30).map(i => f"x${i}%03d_operator_name")
    val errs = names.map(_ -> ("org.apache.spark.sql.AnalysisException: " +
      "x" * 180)).toMap
    val ok = names.map(_ -> 1.2345) ++ (1 to 84).map(i => f"q$i%03d_ok" -> 0.5)
    val got = line(ok, errs)
    assert(got.length < 3584, s"line is ${got.length} bytes")
    assert(got.contains("\"more_errors\":22"), got.takeRight(200))
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
