package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries candidate pass + exact re-count: the result must equal
  * the brute-force groupBy-HAVING for EVERY merge order Spark happens
  * to pick, because the MG summary is a guaranteed superset of the
  * true heavy hitters and the second pass is exact. */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def brute(items: Seq[String], capacity: Int): Map[String, Long] = {
    val n = items.size.toLong
    items.groupBy(identity).view.mapValues(_.size.toLong)
      .filter { case (_, c) => c * (capacity + 1) > n }.toMap
  }

  test("matches brute force on skewed data across many partitions") {
    val rnd = new scala.util.Random(42)
    // zipf-ish: item k with weight ~ 1/k over 200 distinct items
    val items = (1 to 20000).map { _ =>
      val k = math.min(199, (1.0 / (rnd.nextDouble() + 0.005)).toInt)
      s"item_$k"
    }
    for (capacity <- Seq(5, 16, 64)) {
      val df = items.toDF("it").repartition(13)
      val got = Scale.heavyHittersExact(df, "it", capacity)
        .select("it", "n_occurrences")
        .as[(String, Long)].collect().toMap
      assert(got === brute(items, capacity),
        s"capacity=$capacity diverged from brute force")
    }
  }

  test("uniform data above the capacity yields no heavy hitters") {
    val items = (1 to 5000).map(i => s"t${i % 100}")
    val got = Scale.heavyHittersExact(items.toDF("it").repartition(7),
      "it", capacity = 30).count()
    assert(got === 0L) // every item has share 1/100 < 1/31
  }

  test("share and totals are integer-exact") {
    val items = Seq.fill(60)("hot") ++ (1 to 40).map(i => s"cold$i")
    val got = Scale.heavyHittersExact(items.toDF("it").repartition(5),
      "it", capacity = 2)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === Seq(("hot", 60L, 100L, 600000L)))
  }

  test("nulls are ignored, not counted or emitted") {
    val items = (Seq.fill(9)(Some("a")) ++ Seq.fill(5)(Option.empty[String]))
      .toDF("it")
    val got = Scale.heavyHittersExact(items.repartition(3), "it", 4)
      .as[(String, Long, Long, Long)].collect().toSeq
    // total counts non-null items only: 9 of 9, share 1000000 ppm
    assert(got === Seq(("a", 9L, 9L, 1000000L)))
  }

  test("empty input returns an empty frame with the contract schema") {
    val empty = Seq.empty[String].toDF("it")
    val got = Scale.heavyHittersExact(empty, "it", 8)
    assert(got.columns.toSeq ===
      Seq("it", "n_occurrences", "n_total", "share_ppm"))
    assert(got.count() === 0L)
  }

  test("capacity below the heavy count still keeps the guarantee tight") {
    // exactly 3 items each hold >1/4 of the corpus; capacity 3 is the
    // minimum that can represent them
    val items = Seq.fill(30)("x") ++ Seq.fill(29)("y") ++ Seq.fill(28)("z") ++
      (1 to 13).map(i => s"noise$i")
    val got = Scale.heavyHittersExact(items.toDF("it").repartition(4),
      "it", capacity = 3)
      .select("it").as[String].collect().toSet
    assert(got === brute(items, 3).keySet)
  }
}
