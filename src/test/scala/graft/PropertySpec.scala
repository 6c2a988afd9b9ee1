package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{Compaction, Materialize}

/** Property tests for the invariants the reference asserts by example:
  * compaction idempotence, slice-order preservation, replay equivalence
  * (SURVEY.md §5 engine test plan). Raw ScalaCheck generators sampled
  * with fixed seeds (scalatestplus bridge is not in the offline cache).
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val batchGen: Gen[List[(Long, String, Option[String])]] = for {
    n <- Gen.choose(0, 40)
    rows <- Gen.listOfN(n, for {
      key <- Gen.oneOf("A", "B", "C", "D")
      v <- Gen.option(Gen.alphaStr.map(_.take(4)))
    } yield (key, v))
  } yield rows.zipWithIndex.map { case ((k, v), i) => (i.toLong, k, v) }

  private def samples(n: Int): Seq[List[(Long, String, Option[String])]] =
    (1 to n).flatMap(i =>
      batchGen.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("compaction is idempotent") {
    samples(15).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "key", "v")
      val once = Compaction.lastWins(df, Seq("key"), col("id"))
      val twice = Compaction.lastWins(once, Seq("key"), col("id"))
      assert(once.collect().toSet === twice.collect().toSet)
    }
  }

  test("applyEvents equals sequential replay for arbitrary batches") {
    samples(15).foreach { rows =>
      val df = rows.toDF("id", "key", "v")
      val got = Materialize.applyEvents(df, Seq("key"), col("id"),
        col("v").isNull)
        .select("key", "v").as[(String, Option[String])].collect()
        .map { case (k, v) => k -> v.orNull }.toMap
      val want = rows.sortBy(_._1).foldLeft(Map.empty[String, String]) {
        case (st, (_, k, None)) => st - k
        case (st, (_, k, Some(v))) => st + (k -> v)
      }
      assert(got === want)
    }
  }

  test("waves partition the batch; each wave is key-disjoint") {
    samples(15).filter(_.nonEmpty).foreach { rows =>
      val df = rows.toDF("id", "key", "v")
      val waved = Compaction.withWave(df, Seq("key"), col("id")).collect()
      assert(waved.length === rows.length)
      val byWave = waved.groupBy(_.getAs[Long]("wave"))
      byWave.values.foreach { ws =>
        val keys = ws.map(_.getAs[String]("key"))
        assert(keys.distinct.length === keys.length)
      }
    }
  }
}
