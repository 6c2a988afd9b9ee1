package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ext.Similarity
import graft.functions.{VectorFunctions => V}

/** ANN search specs: multi-probe LSH probe construction and the recall
  * guarantee it exists for (multi-probe recall ≥ single-probe at the
  * same nBits, strictly more candidates examined). */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val dim = 16

  /** Deterministic pseudo-random corpus: 200 vectors, values in
    * [-1, 1), plus near-duplicates of the first 10 so every query has
    * true close neighbors that can straddle a bucket boundary. */
  private def corpus: DataFrame = {
    def vec(i: Int): Seq[Float] =
      (0 until dim).map(d => (((i * 31 + d * 17) % 97) - 48) / 48.0f)
    val base = (0 until 200).map(i => (i.toLong, vec(i)))
    val nearDups = (0 until 10).map { i =>
      val v = vec(i).zipWithIndex.map { case (x, d) =>
        x + (if (d == i % dim) 0.05f else 0.0f) // tiny perturbation
      }
      (1000L + i, v.toSeq)
    }
    (base ++ nearDups).toDF("vec_id", "embedding")
  }

  test("hyperplaneProbes: primary bucket first, nProbe distinct buckets") {
    val df = corpus.limit(20).select(col("vec_id"),
      V.hyperplaneBucket(col("embedding"), dim, 8).as("primary"),
      V.hyperplaneProbes(col("embedding"), dim, 8, nProbe = 4).as("probes"))
    df.collect().foreach { r =>
      val primary = r.getAs[Long]("primary")
      val probes = r.getSeq[Long](r.fieldIndex("probes"))
      assert(probes.size === 4)
      assert(probes.head === primary, "primary bucket must come first")
      assert(probes.distinct.size === 4, "probe buckets must be distinct")
      // each expansion flips exactly one bit of the primary
      probes.tail.foreach { p =>
        assert(java.lang.Long.bitCount(p ^ primary) === 1)
      }
    }
  }

  test("distributed Lloyd matches the driver path; only k×dim crosses the driver") {
    val k = 4
    val driver = Similarity.trainCentroids(corpus, "embedding", k,
      "vec_id", iters = 5, sampleN = 128)
    val dist = Similarity.trainCentroidsDistributed(corpus, "embedding", k,
      "vec_id", iters = 5, sampleN = 128)
    assert(dist.length === k && dist.forall(_.length === dim))
    // same seeds, same sample, same iteration count: centroids agree to
    // fp reduction-order noise (the tree combines partials in a
    // different order than the driver's sequential fold)
    for (c <- 0 until k; d <- 0 until dim)
      assert(math.abs(dist(c)(d) - driver(c)(d)) < 1e-9,
        s"centroid $c dim $d: ${dist(c)(d)} vs ${driver(c)(d)}")
    // the distributed result must drive ivfTopK identically
    val qs = corpus.filter(col("vec_id") < 5)
    val a = Similarity.ivfTopK(corpus, qs, "vec_id", "embedding", driver,
      nProbe = 2, k = 3).as[(Long, Long, Long, Double)].collect().toSet
    val b = Similarity.ivfTopK(corpus, qs, "vec_id", "embedding", dist,
      nProbe = 2, k = 3).as[(Long, Long, Long, Double)].collect().toSet
    assert(a === b)
    // empty-cluster rule matches the driver path: k > distinct points
    // leaves the never-assigned seeds untouched on BOTH paths
    val tiny = corpus.filter(col("vec_id") < 3)
    val d2 = Similarity.trainCentroids(tiny, "embedding", 3, "vec_id",
      iters = 3, sampleN = 3)
    val t2 = Similarity.trainCentroidsDistributed(tiny, "embedding", 3,
      "vec_id", iters = 3, sampleN = 3)
    for (c <- 0 until 3; d <- 0 until dim)
      assert(math.abs(d2(c)(d) - t2(c)(d)) < 1e-9)
  }

  test("nearestCentroids: ascending L2 order, lowest index wins ties, reference-object codegen") {
    import graft.functions.{Expressions => E}
    val cents = Array(
      Array(0.0, 0.0), Array(1.0, 0.0), Array(0.0, 1.0), Array(1.0, 0.0))
    // (0.9, 0) → nearest c1 (d=.01); tie between c1 and c3 resolves to 1
    val df = Seq(
      (1L, Seq(0.9f, 0.0f)), (2L, Seq(0.1f, 0.1f)), (3L, Seq(0.0f, 0.8f)))
      .toDF("id", "v")
    val got = df.select(col("id"),
      E.nearestCentroids(col("v"), cents, nProbe = 3).as("near"))
      .collect().map(r => r.getAs[Long]("id") ->
        r.getSeq[Int](r.fieldIndex("near"))).toMap
    // c1 and c3 are identical (d=.01): c1 wins the tie by index, c3
    // follows, then c0 (d=.81) — ascending distance throughout
    assert(got(1L) === Seq(1, 3, 0))
    assert(got(2L) === Seq(0, 1, 2))
    assert(got(3L) === Seq(2, 0, 1))
    // double vectors take the non-float path
    val d2 = Seq((9L, Seq(1.0, 0.0))).toDF("id", "v")
      .select(E.nearestCentroids(col("v"), cents, 1).as("n"))
      .collect().head.getSeq[Int](0)
    assert(d2 === Seq(1))
  }

  test("nProbe=1 equals the plain single-bucket search") {
    val qs = corpus.filter(col("vec_id") < 10)
    val single = Similarity.lshTopK(corpus, qs, "vec_id", "embedding",
      dim = dim, nBits = 8, k = 5)
    val explicit = Similarity.lshTopK(corpus, qs, "vec_id", "embedding",
      dim = dim, nBits = 8, k = 5, nProbe = 1)
    assert(explicit.collect().toSet === single.collect().toSet)
  }

  test("multi-probe recall >= single-probe recall at fixed nBits; more candidates seen") {
    val qs = corpus.filter(col("vec_id") < 10)
    val truth = Similarity.bruteForceTopK(corpus, qs, "vec_id", "embedding",
      k = 5).select(col("query_id"), col("neighbor_id"))
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def hits(nProbe: Int, k: Int): Map[Long, Set[Long]] =
      Similarity.lshTopK(corpus, qs, "vec_id", "embedding",
        dim = dim, nBits = 6, k = k, nProbe = nProbe)
        .select(col("query_id"), col("neighbor_id"))
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
    val sp = hits(1, k = 5)
    val mp = hits(4, k = 5)
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val per = truth.map { case (q, t) =>
        approx.getOrElse(q, Set.empty).intersect(t).size.toDouble / t.size
      }
      per.sum / per.size
    }
    val (rsp, rmp) = (recall(sp), recall(mp))
    assert(rmp >= rsp, s"multi-probe recall $rmp < single-probe $rsp")
    // with the k cap lifted, probe expansion must surface strictly
    // more candidates overall (flip buckets are non-empty at nBits=6
    // over 210 vectors — ~3 per bucket)
    val spCand = hits(1, k = 100000).values.map(_.size).sum
    val mpCand = hits(4, k = 100000).values.map(_.size).sum
    assert(mpCand > spCand,
      s"multi-probe examined $mpCand candidates vs $spCand — expansion inert")
  }

  private def pqData(n: Int, dim: Int, seed: Int): Seq[(Long, Array[Float])] = {
    val rnd = new scala.util.Random(seed)
    // clustered data (what PQ is built for): 10 anchors + small noise
    val anchors = Array.fill(10)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    (0 until n).map { i =>
      val a = anchors(i % 10)
      (i.toLong, a.map(x => (x + (rnd.nextFloat() - 0.5f) * 0.2f).toFloat))
    }
  }

  test("trainPq validates subspace split and sample size") {
    import spark.implicits._
    val df = pqData(40, 8, 3).toDF("vec_id", "embedding")
    intercept[IllegalArgumentException] {
      Similarity.trainPq(df, "embedding", "vec_id", m = 3) // 3 ∤ 8
    }
    intercept[IllegalArgumentException] {
      Similarity.trainPq(df, "embedding", "vec_id", m = 2, ksub = 64)
    }
  }

  test("pq codes are m bytes and centroid vectors round-trip exactly") {
    import spark.implicits._
    val df = pqData(60, 8, 5).toDF("vec_id", "embedding")
    val cb = Similarity.trainPq(df, "embedding", "vec_id", m = 2, ksub = 4)
    // vectors placed EXACTLY on codebook centroids quantize losslessly:
    // ADC distance to themselves is 0
    val cents = (0 until 4).map(c =>
      (100L + c, (cb(0)(c) ++ cb(1)(c)).map(_.toFloat)))
    val cdf = cents.toDF("vec_id", "embedding")
    val got = Similarity.pqTopK(cdf, cdf, "vec_id", "embedding", cb, k = 1)
      .select("query_id", "approx_d2").as[(Long, Double)].collect()
    // each centroid-vector's nearest OTHER point has the exact
    // centroid-to-centroid squared distance; its own would be 0 —
    // check the self-exclusion held and distances are nonnegative
    assert(got.length === 4 && got.forall(_._2 >= 0.0))
    val codes = cdf.select(graft.functions.Expressions.pqEncode(
      org.apache.spark.sql.functions.col("embedding"), cb).as("c"))
      .as[Array[Byte]].collect()
    assert(codes.forall(_.length === 2))
    assert(codes.map(_.toSeq).distinct.length === 4) // 4 distinct codes
  }

  test("pq ADC equals exact distance at zero quantization error") {
    import spark.implicits._
    val df = pqData(60, 8, 7).toDF("vec_id", "embedding")
    val cb = Similarity.trainPq(df, "embedding", "vec_id", m = 2, ksub = 4)
    val cents = (0 until 4).map(c =>
      (200L + c, (cb(0)(c) ++ cb(1)(c)).map(_.toFloat)))
    val exact = for ((ia, va) <- cents; (ib, vb) <- cents if ia != ib)
      yield ((ia, ib),
        va.zip(vb).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
    val adc = Similarity.pqTopK(cents.toDF("vec_id", "embedding"),
      cents.toDF("vec_id", "embedding"), "vec_id", "embedding", cb, k = 3)
      .select("query_id", "neighbor_id", "approx_d2")
      .as[(Long, Long, Double)].collect()
    val exactMap = exact.toMap
    adc.foreach { case (q, nbr, d) =>
      assert(math.abs(d - exactMap((q, nbr))) < 1e-3,
        s"ADC $d vs exact ${exactMap((q, nbr))} for ($q,$nbr)")
    }
  }

  test("pq recall@5 on clustered data beats the random-guess floor") {
    import spark.implicits._
    val data = pqData(500, 64, 11)
    val df = data.toDF("vec_id", "embedding")
    val queries = df.filter(org.apache.spark.sql.functions.col("vec_id") < 10)
    val cb = Similarity.trainPq(df, "embedding", "vec_id", m = 8, ksub = 16)
    val got = Similarity.pqTopK(df, queries, "vec_id", "embedding", cb, k = 5)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // exact top-5 by squared L2, computed locally
    val vecs = data.toMap
    val exact = (0L until 10L).map { q =>
      val qv = vecs(q)
      q -> vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          (id, v.zip(qv).map { case (x, y) => (x - y).toDouble * (x - y) }.sum)
        }
        .sortBy { case (id, d) => (d, id) }.take(5).map(_._1).toSet
    }.toMap
    val recall = (0L until 10L).map(q =>
      (got(q) intersect exact(q)).size / 5.0).sum / 10.0
    // PQ's guarantee is coarse: quantization error ~ the intra-cluster
    // noise scale, so fine ranking WITHIN a cluster is approximate
    // (measured recall@5 0.2 vs random-guess 0.01) — but the cluster
    // itself is never missed: inter-anchor distances (~85) dwarf the
    // quantization error (<1), so every returned neighbor must share
    // the query's anchor. Both properties pinned.
    assert(recall >= 0.1, s"recall@5 = $recall below the 0.1 floor")
    got.foreach { case (q, nbrs) =>
      assert(nbrs.forall(n => n % 10 == q % 10),
        s"query $q got cross-cluster neighbors ${nbrs.filter(_ % 10 != q % 10)}")
    }
  }

  test("corrupt embeddings (null vector, NaN component) never reach rank 1") {
    // NULL scores sort first ascending and NaN sorts above every
    // double descending — unguarded windows would put a corrupt corpus
    // row at rank 1 of EVERY query. All four paths must drop them.
    val queries = corpus.filter(col("vec_id") < 3)
    val poisoned = corpus
      .unionByName(Seq((9000L, None: Option[Seq[Float]]))
        .toDF("vec_id", "embedding"))
      .unionByName(Seq((9001L, Some(Seq.fill(dim)(Float.NaN))))
        .toDF("vec_id", "embedding"))
    val brute = Similarity.bruteForceTopK(poisoned, queries,
      "vec_id", "embedding", k = 3)
    assert(brute.filter(col("neighbor_id") >= 9000L).count() === 0,
      "brute force ranked a corrupt embedding")
    val lsh = Similarity.lshTopK(poisoned, queries, "vec_id", "embedding",
      dim, nBits = 4, k = 3)
    assert(lsh.filter(col("neighbor_id") >= 9000L).count() === 0,
      "LSH ranked a corrupt embedding")
    val cents = Similarity.trainCentroids(corpus, "embedding", 4, "vec_id",
      sampleN = 128)
    // ivfTopK must not CRASH on the NaN row (NearestCentroidsExpr's
    // best==-1 guard) and must not rank it
    val ivf = Similarity.ivfTopK(poisoned, queries, "vec_id", "embedding",
      cents, nProbe = 2, k = 3)
    assert(ivf.filter(col("neighbor_id") >= 9000L).count() === 0,
      "IVF ranked a corrupt embedding")
    val cb = Similarity.trainPq(corpus, "embedding", "vec_id", m = 4,
      ksub = 8, sampleN = 128)
    val pq = Similarity.pqTopK(poisoned, queries, "vec_id", "embedding",
      cb, k = 3)
    assert(pq.count() > 0)
    assert(pq.filter(col("neighbor_id") >= 9000L).count() === 0,
      "PQ ranked a corrupt embedding (null approx_d2 sorts first asc)")
  }

  test("trainers accept array<double> embeddings like the search side does") {
    val dCorpus = corpus.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding"))
    val cents = Similarity.trainCentroids(dCorpus, "embedding", 3, "vec_id",
      sampleN = 64)
    assert(cents.length === 3 && cents(0).length === dim)
    val distCents = Similarity.trainCentroidsDistributed(dCorpus,
      "embedding", 3, "vec_id", sampleN = 64)
    assert(distCents.length === 3)
    val e = intercept[IllegalArgumentException](
      Similarity.trainCentroids(dCorpus, "embedding", 0, "vec_id"))
    assert(e.getMessage.contains("k"))
  }
}
