package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.ext.Dedup
import graft.operators.Scale

/** Round-8 batch 2: exact prefix-filtered Jaccard join and Z-order
  * layout. The join is differentially proven against in-memory
  * brute force; the Morton encode against a bit-twiddling reference.
  */
class PrefixJoinZOrderSpec extends SparkSpec {
  import spark.implicits._

  // ---- prefixJaccardJoin ----------------------------------------------

  test("prefixJaccardJoin finds exactly the qualifying pairs") {
    // sets: d1={a,b,c,d}, d2={a,b,c,e} (J=3/5), d3={a,b,c,d} (J=1 with
    // d1), d4={x,y} (J=0 with all)
    val docs = Seq(
      (1L, "a b c d"), (2L, "a b c e"), (3L, "d c b a"), (4L, "x y"))
      .toDF("doc_id", "text")
    val out = Dedup.prefixJaccardJoin(docs, "doc_id", "text", 0.6)
      .select("doc_a", "doc_b", "overlap", "jaccard_r")
      .as[(Long, Long, Long, Double)].collect().sortBy(r => (r._1, r._2))
    assert(out.toSeq === Seq(
      (1L, 2L, 3L, 0.6), (1L, 3L, 4L, 1.0), (2L, 3L, 3L, 0.6)))
  }

  test("prefixJaccardJoin equals brute force on random corpora") {
    val rnd = new Random(8)
    // 40 docs over a 30-token vocab with a rare-token tail, sizes 3-12
    val vocab = (0 until 30).map(i => s"w$i")
    val docs = (0 until 40).map { i =>
      val n = 3 + rnd.nextInt(10)
      val toks = Seq.fill(n)(vocab(
        math.min(29, (math.abs(rnd.nextGaussian()) * 8).toInt)))
      (i.toLong, toks.mkString(" "))
    }
    val df = docs.toDF("doc_id", "text")
    for (tau <- Seq(0.35, 0.5, 0.8)) {
      val got = Dedup
        .prefixJaccardJoin(df, "doc_id", "text", tau, maxPrefixDf = 1000)
        .select("doc_a", "doc_b", "overlap")
        .as[(Long, Long, Long)].collect().toSet
      val sets = docs.map { case (id, t) =>
        id -> t.split("\\s+").filter(_.nonEmpty).toSet }.toMap
      val want = (for {
        a <- sets.keys; b <- sets.keys if a < b
        o = (sets(a) & sets(b)).size
        if sets(a).nonEmpty && sets(b).nonEmpty &&
          o.toDouble / (sets(a).size + sets(b).size - o) >= tau
      } yield (a, b, o.toLong)).toSet
      assert(got === want, s"tau=$tau")
    }
  }

  test("prefixJaccardJoin boundary threshold: IEEE ceil rounding can't drop the pair") {
    // |X| = 100, Y ⊂ X with |Y| = 7, τ = 0.07: exact J = 7/100 = τ.
    // 100 × 0.07 rounds to 7.0000000000000009 in doubles, so an
    // unslacked ceil(τ·sz) = 8 shortens X's prefix below the lossless
    // bound AND the unslacked length band 100·τ <= 7 rejects the pair.
    // The 1e-6 slack must keep both bounds conservative.
    val xToks = (0 until 100).map(i => f"t$i%03d")
    val yToks = xToks.take(7)
    val docs = Seq((1L, xToks.mkString(" ")), (2L, yToks.mkString(" ")))
      .toDF("doc_id", "text")
    val got = Dedup
      .prefixJaccardJoin(docs, "doc_id", "text", 0.07, maxPrefixDf = 1000)
      .select("doc_a", "doc_b", "overlap")
      .as[(Long, Long, Long)].collect().toSeq
    assert(got === Seq((1L, 2L, 7L)),
      "the J-exactly-at-threshold pair must be found")
  }

  test("prefixJaccardJoin fails loudly on a hot prefix token") {
    // every doc is the same single token: it is every doc's entire
    // prefix, with df = 60 > cap
    val docs = (0 until 60).map(i => (i.toLong, "same")).toDF("d", "t")
    val e = intercept[IllegalStateException] {
      Dedup.prefixJaccardJoin(docs, "d", "t", 0.9, maxPrefixDf = 10)
    }
    assert(e.getMessage.contains("maxPrefixDf"))
  }

  // ---- Z-order --------------------------------------------------------

  test("mortonInterleave matches the bit-twiddling reference") {
    def ref(a: Long, b: Long): Long = {
      def spread(x0: Long): Long = {
        var x = x0 & 0xFFFFL
        x = (x | (x << 8)) & 0x00FF00FFL
        x = (x | (x << 4)) & 0x0F0F0F0FL
        x = (x | (x << 2)) & 0x33333333L
        (x | (x << 1)) & 0x55555555L
      }
      spread(a) | (spread(b) << 1)
    }
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 2L),
      (65535L, 0L), (0L, 65535L), (65535L, 65535L), (12345L, 54321L))
    val got = cases.toDF("a", "b")
      .select(Scale.mortonInterleave(col("a"), col("b")).as("z"))
      .as[Long].collect()
    assert(got.toSeq === cases.map { case (a, b) => ref(a, b) })
  }

  test("zOrderBuckets bounds both dimensions per bucket on a grid") {
    // 64x64 grid; 16 buckets (top 4 z bits) => each bucket must be one
    // 16x16 quadrant-of-quadrant: spans exactly 16 in BOTH dims
    val grid = (for (x <- 0 until 64; y <- 0 until 64)
      yield (x.toLong, y.toLong)).toDF("x", "y")
    val out = Scale.zOrderBuckets(grid, "x", "y", bits = 6, bucketBits = 4)
      .select("bucket", "n", "span_a", "span_b")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(out.length === 16)
    assert(out.map(_._1).toSeq === (0L until 16L))
    assert(out.forall(r => r._2 === 256L && r._3 === 16L && r._4 === 16L))
  }

  test("zOrderLayout partitions are disjoint, sorted z-ranges") {
    val rnd = new Random(42)
    val pts = Seq.fill(4000)((rnd.nextInt(1000).toLong,
      rnd.nextInt(1000).toLong)).toDF("x", "y")
    val laid = Scale.zOrderLayout(pts, "x", "y", numPartitions = 8)
    assert(laid.columns.toSeq === Seq("x", "y")) // helpers dropped
    // recompute z per row (same normalization the layout used) and
    // check the range partitioner separated the partitions
    val st = pts.agg(min($"x"), max($"x"), min($"y"), max($"y")).head()
    val (amn, amx, bmn, bmx) =
      (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val ranges = laid
      .withColumn("pid", spark_partition_id())
      .withColumn("z", Scale.mortonInterleave(
        expr(s"(x - $amn) * 65536 div ($amx - $amn + 1)"),
        expr(s"(y - $bmn) * 65536 div ($bmx - $bmn + 1)")))
      .groupBy("pid").agg(min($"z").as("lo"), max($"z").as("hi"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    assert(ranges.length > 1)
    ranges.sliding(2).foreach { case Array(p, q) =>
      assert(p._3 <= q._2, s"overlap between partitions $p and $q")
    }
  }
}
