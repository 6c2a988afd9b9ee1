package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  test("lastPrior picks the latest right row at-or-before each left ts") {
    val left = Seq((1L, "A", 10L), (2L, "A", 25L), (3L, "A", 5L),
      (4L, "B", 50L)).toDF("id", "k", "ts")
    val right = Seq((100L, "A", 10L, "r@10"), (101L, "A", 20L, "r@20"),
      (102L, "B", 60L, "r@60")).toDF("rid", "k", "ts", "rv")
    val got = AsOfJoin.lastPrior(left, right, Seq("k"),
      col("ts"), col("ts"),
      rightCols = Seq(col("rid").as("match_id"), col("rv").as("match_v")),
      rightTieBreak = Seq(col("rid")))
      .select("id", "match_id", "match_v")
      .as[(Long, Option[Long], Option[String])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((Some(100L), Some("r@10")))) // inclusive <=
    assert(got(2L) === ((Some(101L), Some("r@20"))))
    assert(got(3L) === ((None, None))) // nothing at or before ts=5
    assert(got(4L) === ((None, None))) // B's only right row is after
  }

  test("property: lastPrior equals the naive window-max formulation") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val left = (1 to 60).map(i =>
        (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong))
        .toDF("id", "k", "ts")
      val right = (1 to 40).map(i =>
        (1000L + i, s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong))
        .toDF("rid", "k", "ts")
      val got = AsOfJoin.lastPrior(left, right, Seq("k"), col("ts"), col("ts"),
        Seq(col("rid").as("mid")), Seq(col("rid")))
        .select("id", "mid").as[(Long, Option[Long])].collect().toMap
      // naive: max-(ts,rid) right row with ts <= left.ts per left row
      val naive = left.alias("l")
        .join(right.alias("r"),
          col("l.k") === col("r.k") && col("r.ts") <= col("l.ts"), "left")
        .groupBy(col("l.id").as("id"))
        .agg(max_by(col("r.rid"), struct(col("r.ts"), col("r.rid"))).as("mid"))
        .as[(Long, Option[Long])].collect().toMap
      assert(got === naive)
    }
  }

  test("right payload columns always come from the same matched row") {
    val left = Seq((1L, "A", 30L)).toDF("id", "k", "ts")
    // newer right row has a null field — a per-column last(ignoreNulls)
    // would wrongly mix old non-null value with new row
    val right = Seq((100L, "A", 10L, Some("old")), (101L, "A", 20L, None))
      .toDF("rid", "k", "ts", "rv")
    val got = AsOfJoin.lastPrior(left, right, Seq("k"), col("ts"), col("ts"),
      Seq(col("rid").as("mid"), col("rv").as("mv")), Seq(col("rid")))
      .select("mid", "mv").as[(Long, Option[String])].collect()(0)
    assert(got === ((101L, None)))
  }
}

class AsOfDirectionToleranceSpec extends SparkSpec {
  import spark.implicits._

  private val left = Seq((1L, "A", 10L), (2L, "A", 25L), (3L, "A", 5L),
    (4L, "B", 50L)).toDF("id", "k", "ts")
  private val right = Seq((100L, "A", 10L, "r@10"), (101L, "A", 20L, "r@20"),
    (102L, "B", 60L, "r@60")).toDF("rid", "k", "ts", "rv")

  private def run(df: org.apache.spark.sql.DataFrame) =
    df.select("id", "match_id")
      .as[(Long, Option[Long])].collect().toMap

  test("firstAfter picks the earliest right row at-or-after each left ts") {
    val got = run(AsOfJoin.firstAfter(left, right, Seq("k"),
      col("ts"), col("ts"),
      rightCols = Seq(col("rid").as("match_id")),
      rightTieBreak = Seq(col("rid"))))
    // id 1 (ts 10): r@10 qualifies (>=); id 2 (ts 25): none after;
    // id 3 (ts 5): r@10; id 4 (ts 50): r@60
    assert(got === Map(1L -> Some(100L), 2L -> None, 3L -> Some(100L),
      4L -> Some(102L)))
  }

  test("backward tolerance nulls matches that are too old") {
    val got = run(AsOfJoin.lastPrior(left, right, Seq("k"),
      col("ts"), col("ts"),
      rightCols = Seq(col("rid").as("match_id")),
      tolerance = Some(lit(4L))))
    // id 1 (ts 10): r@10 gap 0 ok; id 2 (ts 25): r@20 gap 5 > 4 -> null;
    // id 3 (ts 5): no prior; id 4 (ts 50): no prior for B
    assert(got === Map(1L -> Some(100L), 2L -> None, 3L -> None,
      4L -> None))
  }

  test("forward tolerance nulls matches that are too far ahead") {
    val got = run(AsOfJoin.firstAfter(left, right, Seq("k"),
      col("ts"), col("ts"),
      rightCols = Seq(col("rid").as("match_id")),
      tolerance = Some(lit(5L))))
    // id 3 (ts 5): r@10 gap 5 ok; id 4 (ts 50): r@60 gap 10 > 5 -> null
    assert(got === Map(1L -> Some(100L), 2L -> None, 3L -> Some(100L),
      4L -> None))
  }

  test("forward ties at equal ts take the first by tie-break") {
    val l = Seq((1L, "A", 10L)).toDF("id", "k", "ts")
    val r = Seq((7L, "A", 10L), (3L, "A", 10L)).toDF("rid", "k", "ts")
    val got = run(AsOfJoin.firstAfter(l, r, Seq("k"), col("ts"), col("ts"),
      rightCols = Seq(col("rid").as("match_id")),
      rightTieBreak = Seq(col("rid"))))
    assert(got === Map(1L -> Some(3L)))
  }

  test("property: firstAfter equals the naive formulation") {
    val rnd = new scala.util.Random(7)
    val l = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong))
      .toDF("id", "k", "ts")
    val r = (1 to 200).map(i =>
      (i.toLong + 1000, s"k${rnd.nextInt(5)}", rnd.nextInt(100).toLong))
      .toDF("rid", "k", "ts")
    val got = AsOfJoin.firstAfter(l, r, Seq("k"), col("ts"), col("ts"),
      rightCols = Seq(col("rid").as("match_id")),
      rightTieBreak = Seq(col("rid")))
      .select("id", "match_id").as[(Long, Option[Long])].collect().toMap
    val naive = l.as("l").join(r.as("r"),
        col("l.k") === col("r.k") && col("r.ts") >= col("l.ts"), "left")
      .groupBy(col("id"))
      .agg(min(struct(col("r.ts"), col("rid"))).as("m"))
      .select(col("id"), col("m.rid").as("match_id"))
      .as[(Long, Option[Long])].collect().toMap
    assert(got === naive)
  }

  // SCD2 history for key A: v1 [10, 20) "a", v2 [20, 20) "b" (zero
  // width: two changes in the same tick), v3 [20, 40) "c", v4 [40, ∞)
  // "d"; key B: v1 [5, 8) "x" CLOSED with no successor (a gap).
  private val pitDim = Seq(
    ("A", 1L, "a", 10L, Option(20L)), ("A", 2L, "b", 20L, Option(20L)),
    ("A", 3L, "c", 20L, Option(40L)), ("A", 4L, "d", 40L, None),
    ("B", 1L, "x", 5L, Option(8L)))

  private def pit(facts: Seq[(Long, String, Long)]) = {
    val f = facts.toDF("id", "k", "ts")
    val d = pitDim.toDF("k", "version", "state", "eff_from", "eff_to")
    AsOfJoin.pointInTime(f, d, Seq("k"), col("ts"),
      col("eff_from"), col("eff_to"),
      dimCols = Seq(col("state"), col("version")),
      dimTieBreak = Seq(col("version")))
      .select("id", "state", "version")
      .as[(Long, Option[String], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("pointInTime picks the interval containing the fact") {
    val got = pit(Seq((1L, "A", 15L), (2L, "A", 39L), (3L, "A", 40L),
      (4L, "A", 1000L)))
    assert(got(1L) === ((Some("a"), Some(1L))))
    assert(got(2L) === ((Some("c"), Some(3L))))
    assert(got(3L) === ((Some("d"), Some(4L)))) // eff_from inclusive
    assert(got(4L) === ((Some("d"), Some(4L)))) // open interval
  }

  test("pointInTime boundaries are half-open and zero-width is skipped") {
    val got = pit(Seq((1L, "A", 20L), (2L, "A", 19L)))
    // at ts=20 v1 has expired (eff_to exclusive) and v2 is zero-width:
    // the containing interval is v3
    assert(got(1L) === ((Some("c"), Some(3L))))
    assert(got(2L) === ((Some("a"), Some(1L))))
  }

  test("pointInTime nulls facts before the history and in gaps") {
    val got = pit(Seq((1L, "A", 9L), (2L, "B", 9L), (3L, "B", 6L),
      (4L, "C", 50L)))
    assert(got(1L) === ((None, None))) // before first interval
    assert(got(2L) === ((None, None))) // gap after B's closed interval
    assert(got(3L) === ((Some("x"), Some(1L))))
    assert(got(4L) === ((None, None))) // key with no history at all
  }

  test("nearest picks the closer side, backward on distance ties") {
    val left = Seq((1L, "A", 10L), (2L, "A", 16L), (3L, "A", 30L),
      (4L, "B", 5L)).toDF("id", "k", "ts")
    val right = Seq((100L, "A", 8L), (101L, "A", 20L), (102L, "A", 40L))
      .toDF("rid", "k", "rts")
    val got = AsOfJoin.nearest(left, right, Seq("k"),
      col("ts"), col("rts"), Seq(col("rid") -> "match_id"),
      rightTieBreak = Seq(col("rid")))
      .select("id", "match_id", "nearest_ts")
      .as[(Long, Option[Long], Option[Long])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((Some(100L), Some(8L))))   // 2 back vs 10 fwd
    assert(got(2L) === ((Some(101L), Some(20L))))  // 8 back vs 4 fwd
    assert(got(3L) === ((Some(101L), Some(20L)))) // tie 10/10 → backward
    assert(got(4L) === ((None, None)))            // no B rows at all
  }

  test("nearest tolerance bounds both directions independently") {
    val left = Seq((1L, "A", 100L)).toDF("id", "k", "ts")
    val right = Seq((9L, "A", 80L), (10L, "A", 150L))
      .toDF("rid", "k", "rts")
    def run(tol: Long) = AsOfJoin.nearest(left, right, Seq("k"),
      col("ts"), col("rts"), Seq(col("rid") -> "m"),
      tolerance = Some(lit(tol)))
      .select("m").as[Option[Long]].head()
    assert(run(100L) === Some(9L))  // both in range: 20 back beats 50 fwd
    assert(run(30L) === Some(9L))   // forward out of range
    assert(run(10L) === None)       // both out
    // backward out, forward in
    val left2 = Seq((1L, "A", 145L)).toDF("id", "k", "ts")
    val got2 = AsOfJoin.nearest(left2, right, Seq("k"),
      col("ts"), col("rts"), Seq(col("rid") -> "m"),
      tolerance = Some(lit(20L)))
      .select("m").as[Option[Long]].head()
    assert(got2 === Some(10L))
  }

  test("nearest: a null left timestamp is unmatchable in any direction") {
    val left = Seq((1L, "A", Some(10L)), (2L, "A", None))
      .toDF("id", "k", "ts")
    val right = Seq((9L, "A", 8L)).toDF("rid", "k", "rts")
    val got = AsOfJoin.nearest(left, right, Seq("k"),
      col("ts"), col("rts"), Seq(col("rid") -> "m"))
      .select("id", "m").as[(Long, Option[Long])].collect().toMap
    assert(got(1L) === Some(9L))
    assert(got(2L) === None, "null left ts must never match")
  }

  test("nearest rejects reserved output names") {
    val df = Seq((1L, "A", 1L)).toDF("id", "k", "ts")
    intercept[IllegalArgumentException] {
      AsOfJoin.nearest(df, df, Seq("k"), col("ts"), col("ts"),
        Seq(col("id") -> "ts"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.nearest(df, df, Seq("k"), col("ts"), col("ts"),
        Seq(col("id") -> "__x"))
    }
    intercept[IllegalArgumentException] {
      AsOfJoin.nearest(df, df, Seq("k"), col("ts"), col("ts"),
        Seq(col("id") -> "nearest_ts"))
    }
  }

  test("null-ts left rows are unmatchable in BOTH directions (direct calls, not just nearest)") {
    // The forward carry sorts DESCENDING (nulls last): a null-ts left
    // row parks after every right row and — before the round-15 __ts
    // guard — got handed the earliest right match by last(ignoreNulls)
    val lefts = Seq((1L, "k", Some(50L)), (2L, "k", None))
      .toDF("id", "k", "ts")
    val rights = Seq((100L, "k", 10L), (200L, "k", 90L))
      .toDF("rid", "k", "rts")
    val fwd = AsOfJoin.firstAfter(lefts, rights, Seq("k"),
      col("ts"), col("rts"), Seq(col("rid").as("m")))
      .select("id", "m").as[(Long, Option[Long])].collect().toMap
    assert(fwd(1L) === Some(200L))
    assert(fwd(2L) === None, "null-ts left row must not match forward")
    val bwd = AsOfJoin.lastPrior(lefts, rights, Seq("k"),
      col("ts"), col("rts"), Seq(col("rid").as("m")))
      .select("id", "m").as[(Long, Option[Long])].collect().toMap
    assert(bwd(1L) === Some(100L))
    assert(bwd(2L) === None, "null-ts left row must not match backward")
  }

  test("null-ts right rows never match (their carried struct is non-null)") {
    val lefts = Seq((1L, "k", 50L)).toDF("id", "k", "ts")
    val rights = Seq((100L, "k", Option.empty[Long]))
      .toDF("rid", "k", "rts")
    val bwd = AsOfJoin.lastPrior(lefts, rights, Seq("k"),
      col("ts"), col("rts"), Seq(col("rid").as("m")))
      .select("id", "m").as[(Long, Option[Long])].collect().toMap
    assert(bwd(1L) === None,
      "a right row with a null timestamp is not an as-of candidate")
    val fwd = AsOfJoin.firstAfter(lefts, rights, Seq("k"),
      col("ts"), col("rts"), Seq(col("rid").as("m")))
      .select("id", "m").as[(Long, Option[Long])].collect().toMap
    assert(fwd(1L) === None)
  }

  test("property: nearest equals ranking every candidate") {
    val rnd = new scala.util.Random(7)
    (1 to 6).foreach { _ =>
      val lefts = (1 to 40).map(i =>
        (i.toLong, s"k${rnd.nextInt(4)}", rnd.nextInt(200).toLong))
      val rights = (1 to 30).map(i =>
        (1000L + i, s"k${rnd.nextInt(4)}", rnd.nextInt(200).toLong))
      val tol = 25L
      val got = AsOfJoin.nearest(lefts.toDF("id", "k", "ts"),
        rights.toDF("rid", "k", "rts"), Seq("k"),
        col("ts"), col("rts"), Seq(col("rid") -> "m"),
        rightTieBreak = Seq(col("rid")), tolerance = Some(lit(tol)))
        .select("id", "m").as[(Long, Option[Long])].collect().toMap
      lefts.foreach { case (id, k, ts) =>
        val cands = rights.filter(r => r._2 == k &&
          math.abs(r._3 - ts) <= tol)
        val want =
          if (cands.isEmpty) None
          else Some(cands.minBy { case (rid, _, rts) =>
            val fwd = if (rts <= ts) 0 else 1
            (math.abs(rts - ts), fwd,
              if (fwd == 0) -rid else rid)
          }._1)
        assert(got(id) === want, s"left $id at $ts key $k")
      }
    }
  }
}
