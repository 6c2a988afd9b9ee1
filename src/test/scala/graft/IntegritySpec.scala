package graft

import graft.operators.Integrity

/** FK-audit semantics: NULL keys are counted but never violations,
  * orphan accounting is key- and row-level, coverage is the matched
  * share of the non-null population. */
class IntegritySpec extends SparkSpec {
  import spark.implicits._

  test("fkReport counts nulls, orphans, and coverage on a crafted relation") {
    // child: key 1 ×2 (matched), 2 ×1 (orphan), 3 ×3 (orphan), null ×2
    val child = Seq(Some(1L), Some(1L), Some(2L), Some(3L), Some(3L),
      Some(3L), None, None).toDF("k")
    val parent = Seq(1L, 9L).toDF("pk")
    val r = Integrity.fkReport("rel", child, "k", parent, "pk")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().head
    assert(r === (("rel", 8L, 2L, 3L, 2L, 4L, Some(2.0 / 6.0))))
  }

  test("fkReport: intact relation has zero orphans and coverage 1.0") {
    val child = Seq(1L, 1L, 2L).toDF("k")
    val parent = Seq(1L, 2L, 3L).toDF("pk")
    val r = Integrity.fkReport("ok", child, "k", parent, "pk")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().head
    assert(r === (("ok", 3L, 0L, 2L, 0L, 0L, Some(1.0))))
  }

  test("fkReport: all-null child yields null coverage") {
    val child = Seq[Option[Long]](None, None).toDF("k")
    val parent = Seq(1L).toDF("pk")
    val r = Integrity.fkReport("nul", child, "k", parent, "pk")
      .as[(String, Long, Long, Long, Long, Long, Option[Double])]
      .collect().head
    assert(r === (("nul", 2L, 2L, 0L, 0L, 0L, None)))
  }

  test("fkReports unions one row per relation") {
    val child = Seq(1L).toDF("k")
    val parent = Seq(1L).toDF("pk")
    val got = Integrity.fkReports(Seq(
      ("a", child, "k", parent, "pk"),
      ("b", child, "k", parent, "pk")))
      .select("relation").as[String].collect().toSet
    assert(got === Set("a", "b"))
  }
}
