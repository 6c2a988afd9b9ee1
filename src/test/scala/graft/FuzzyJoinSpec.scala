package graft

import org.apache.spark.sql.functions._

import graft.ext.FuzzyJoin

/** Specs for blocked fuzzy vocabulary lookup. */
class FuzzyJoinSpec extends SparkSpec {
  import spark.implicits._

  private def vocab = Seq("widget", "gadget", "gizmo", "bracket")
    .toDF("name")

  test("exact, substituted and deleted probes resolve to the source") {
    val probes = Seq(
      ("p1", "widget"),   // dist 0
      ("p2", "wizget"),   // substitution, dist 1
      ("p3", "wiget"),    // deletion, dist 1 — same len band (6->5 in band 1)
      ("p4", "walrus"))   // dist > 2 from everything
      .toDF("pid", "s")
    val byPid = FuzzyJoin.lookup(probes, "pid", "s", vocab, "name",
      maxDist = 2, k = 1, prefixLen = 2, lenBand = 4)
      .select("pid", "matched", "dist")
      .as[(String, String, Int)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(byPid("p1") === (("widget", 0)))
    assert(byPid("p2") === (("widget", 1)))
    assert(byPid("p3") === (("widget", 1)))
    assert(!byPid.contains("p4"))
    assert(byPid.size === 3)
  }

  test("prefix blocking misses edits in the prefix (recall contract)") {
    val probes = Seq(("p1", "zidget")).toDF("pid", "s") // dist 1 to widget
    val got = FuzzyJoin.lookup(probes, "pid", "s", vocab, "name",
      maxDist = 2, k = 1, prefixLen = 2, lenBand = 4)
    assert(got.count() === 0L)
    // prefixLen = 0 disables prefix blocking and recovers the match
    val loose = FuzzyJoin.lookup(probes, "pid", "s", vocab, "name",
      maxDist = 2, k = 1, prefixLen = 0, lenBand = 4)
      .select("matched").as[String].collect().toSeq
    assert(loose === Seq("widget"))
  }

  test("k > 1 ranks by (dist, matched)") {
    val v = Seq("cat", "car", "cap", "dog").toDF("name")
    val probes = Seq(("p", "caq")).toDF("pid", "s")
    val got = FuzzyJoin.lookup(probes, "pid", "s", v, "name",
      maxDist = 1, k = 3, prefixLen = 1, lenBand = 4)
      .orderBy("rank").select("matched", "dist", "rank")
      .as[(String, Int, Long)].collect().toSeq
    assert(got === Seq(("cap", 1, 1L), ("car", 1, 2L), ("cat", 1, 3L)))
  }

  test("deterministic across partition layouts") {
    val probes = (0 until 50).map(i => (s"p$i", s"gadge$i"))
      .toDF("pid", "s")
    def run(d: org.apache.spark.sql.DataFrame) =
      FuzzyJoin.lookup(d, "pid", "s", vocab, "name", maxDist = 2, k = 2,
        prefixLen = 2, lenBand = 4)
        .select("pid", "matched", "rank")
        .as[(String, String, Long)].collect().toSet
    assert(run(probes) === run(probes.repartition(7)))
  }

  test("vocab side is broadcast; probe side never shuffles before the join") {
    val probes = spark.range(1000).select(
      concat(lit("p"), col("id")).as("pid"),
      concat(lit("widge"), col("id") % 10).as("s"))
    val plan = FuzzyJoin.lookup(probes, "pid", "s", vocab, "name")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("invalid args rejected") {
    val p = Seq(("p", "x")).toDF("pid", "s")
    intercept[IllegalArgumentException] {
      FuzzyJoin.lookup(p, "pid", "s", vocab, "name", maxDist = -1) }
    intercept[IllegalArgumentException] {
      FuzzyJoin.lookup(p, "pid", "s", vocab, "name", k = 0) }
    intercept[IllegalArgumentException] {
      FuzzyJoin.lookup(p, "pid", "s", vocab, "name", lenBand = 0) }
  }

  test("mutual-best: contested rights go to the side they prefer, one-to-one") {
    // rights: widget, gadget. lefts: two candidates for widget (dists
    // 1 and 1, tie broken by value then id), one for gadget, one junk.
    val l = Seq(
      (1L, "widgut"),   // dist 1 to widget
      (2L, "widgek"),   // dist 1 to widget — loses: "widgek" < "widgut"? yes -> wins instead
      (3L, "gadgex"),   // dist 1 to gadget
      (4L, "zzzzzz"))   // no candidate
      .toDF("lid", "lval")
    val r = Seq((10L, "widget"), (20L, "gadget")).toDF("rid", "rval")
    val got = FuzzyJoin.mutualBestMatch(l, "lid", "lval", r, "rid", "rval",
      maxDist = 2).as[(Long, String, Long, String, Long)].collect().toSet
    // widget prefers min (dist, left_val): "widgek" (2) over "widgut" (1)
    assert(got === Set(
      (2L, "widgek", 10L, "widget", 1L),
      (3L, "gadgex", 20L, "gadget", 1L)))
    // one-to-one: no left or right appears twice
    assert(got.map(_._1).size === got.size && got.map(_._3).size === got.size)
  }

  test("mutual-best: a pair is dropped when either side prefers elsewhere") {
    // left 1 is closer to right B, but right B prefers left 2; left 1's
    // own best (B) is taken, and B's best (2) is mutual -> only (2, B)
    val l = Seq((1L, "abcx"), (2L, "abcd")).toDF("lid", "lval")
    val r = Seq((5L, "abcd")).toDF("rid", "rval")
    val got = FuzzyJoin.mutualBestMatch(l, "lid", "lval", r, "rid", "rval",
      maxDist = 2).as[(Long, String, Long, String, Long)].collect().toSet
    assert(got === Set((2L, "abcd", 5L, "abcd", 0L)))
  }
}
