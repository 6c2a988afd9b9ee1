package graft

import org.apache.spark.sql.functions._

import graft.ext.ImportanceSampling

class ImportanceSamplingSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  // independent reference: JDK MD5, explicit smoothing arithmetic
  private def bucket(g: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16) % B
  }
  private def feats(text: String): Seq[String] = {
    val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    t ++ t.sliding(2).withFilter(_.size == 2).map(_.mkString(" "))
  }
  private def refWeights(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Double)] = {
    val all = docs.flatMap { case (_, txt, t) => feats(txt).map(g => (bucket(g), t)) }
    val sc = all.groupBy(_._1).map { case (b, xs) => b -> xs.size.toLong }
    val tc = all.filter(_._2).groupBy(_._1).map { case (b, xs) => b -> xs.size.toLong }
    val st = all.size.toLong
    val tt = all.count(_._2).toLong
    def logr(b: Long): Double =
      math.log((tc.getOrElse(b, 0L) + 1).toDouble / (tt + B)) -
        math.log((sc(b) + 1).toDouble / (st + B))
    docs.flatMap { case (id, txt, _) =>
      val fs = feats(txt)
      if (fs.isEmpty) None
      else Some(id -> ((fs.size.toLong, fs.map(g => logr(bucket(g))).sum)))
    }.toMap
  }

  test("matches the independent reference, bigrams and smoothing included") {
    val docs = Seq(
      (1L, "alpha beta gamma alpha", true),
      (2L, "beta delta", true),
      (3L, "omega psi chi omega psi", false),
      (4L, "alpha omega", false),
      (5L, "chi chi chi", false))
    val got = ImportanceSampling.dsirLogWeights(
      docs.toDF("id", "text", "t"), "id", "text", col("t"), buckets = B)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val want = refWeights(docs)
    assert(got.keySet === want.keySet)
    got.foreach { case (id, (n, w)) =>
      assert(n === want(id)._1, s"doc $id n_feats")
      assert(math.abs(w - want(id)._2) < 1e-12, s"doc $id: $w vs ${want(id)._2}")
    }
  }

  test("target-like documents score higher than off-target ones") {
    // target vocab {aa bb cc}, source-only vocab {xx yy zz}
    val docs = (1L to 20L).map(i =>
      (i, if (i <= 10) "aa bb cc aa bb" else "xx yy zz xx yy", i <= 10))
    val got = ImportanceSampling.dsirLogWeights(
      docs.toDF("id", "text", "t"), "id", "text", col("t"), buckets = B)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    val tAvg = (1L to 10L).map(got).sum / 10
    val sAvg = (11L to 20L).map(got).sum / 10
    assert(tAvg > sAvg + 1.0, s"target avg $tAvg vs source avg $sAvg")
  }

  test("zero-token docs emit no row; invalid buckets rejected") {
    val docs = Seq((1L, "a b", true), (2L, "   ", false))
    val got = ImportanceSampling.dsirLogWeights(
      docs.toDF("id", "text", "t"), "id", "text", col("t"), buckets = B)
      .select("id").as[Long].collect().toSeq
    assert(got === Seq(1L))
    intercept[IllegalArgumentException] {
      ImportanceSampling.dsirLogWeights(
        docs.toDF("id", "text", "t"), "id", "text", col("t"), buckets = 1) }
  }
}
