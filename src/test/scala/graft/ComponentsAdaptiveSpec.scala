package graft

import graft.ext.Dedup

class ComponentsAdaptiveSpec extends SparkSpec {
  import spark.implicits._

  private val pairs = Seq((1L, 2L), (2L, 3L), (8L, 9L), (4L, 9L))
    .toDF("doc_a", "doc_b")
  private val want = Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
    4L -> 4L, 8L -> 4L, 9L -> 4L)

  test("driver-side union-find path matches distributed propagation") {
    val fast = Dedup.components(pairs).as[(Long, Long)].collect().toMap
    val dist = Dedup.components(pairs, driverThreshold = 0L)
      .as[(Long, Long)].collect().toMap
    assert(fast === want)
    assert(dist === want)
  }

  test("10k-node path graph converges in O(log n) rounds, not O(diameter)") {
    // A chain 0-1-2-…-9999: diameter 9999. Per-hop min-label
    // propagation would need ~10k rounds; the alternating large-star /
    // small-star rounds hook toward the minimum multi-hop, so the
    // default maxIters=25 bound must hold with room to spare.
    val n = 10000L
    val chain = spark.range(0L, n - 1, 1L, 8)
      .selectExpr("id AS doc_a", "id + 1 AS doc_b")
    val got = Dedup.components(chain, driverThreshold = 0L)
    assert(got.count() === n)
    // every node labeled with the chain's minimum
    assert(got.filter(org.apache.spark.sql.functions.col("group_id") =!= 0L)
      .count() === 0L)
  }

  test("random multi-component graphs: distributed ≡ driver union-find") {
    val rnd = new scala.util.Random(7)
    // 3 shapes per trial: chains, stars, and random pair soup
    for (trial <- 1 to 3) {
      val edges = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var base = 0L
      for (_ <- 0 until 5) {
        val size = 2 + rnd.nextInt(40)
        val nodes = (0 until size).map(_ + base)
        rnd.nextInt(3) match {
          case 0 => // chain
            nodes.sliding(2).foreach(p => edges += ((p(0), p(1))))
          case 1 => // star
            nodes.tail.foreach(v => edges += ((nodes.head, v)))
          case _ => // soup: random spanning edges + extras
            nodes.tail.foreach(v =>
              edges += ((nodes(rnd.nextInt(nodes.indexOf(v))), v)))
            (0 until size / 2).foreach { _ =>
              edges += ((nodes(rnd.nextInt(size)), nodes(rnd.nextInt(size))))
            }
        }
        base += size + rnd.nextInt(5)
      }
      val df = edges.filter(e => e._1 != e._2).toSeq.toDF("doc_a", "doc_b")
      val fast = Dedup.components(df).as[(Long, Long)].collect().toMap
      val dist = Dedup.components(df, driverThreshold = 0L)
        .as[(Long, Long)].collect().toMap
      assert(dist === fast, s"trial $trial")
    }
  }

  test("driver path is id-type generic: string and int ids, schema preserved") {
    // content-addressed (string) id regimes are documented callers —
    // the driver union-find must not assume bigint, and both adaptive
    // paths must emit the SAME id type
    val sPairs = Seq(("sha-b", "sha-c"), ("sha-a", "sha-b"), ("sha-x", "sha-y"))
      .toDF("doc_a", "doc_b")
    val wantS = Map("sha-a" -> "sha-a", "sha-b" -> "sha-a",
      "sha-c" -> "sha-a", "sha-x" -> "sha-x", "sha-y" -> "sha-x")
    val fastS = Dedup.components(sPairs).as[(String, String)].collect().toMap
    val distS = Dedup.components(sPairs, driverThreshold = 0L)
      .as[(String, String)].collect().toMap
    assert(fastS === wantS)
    assert(distS === wantS)
    assert(Dedup.components(sPairs).schema("doc_id").dataType ===
      org.apache.spark.sql.types.StringType)

    val iPairs = Seq((2, 3), (1, 2), (8, 9)).toDF("doc_a", "doc_b")
    val wantI = Map(1 -> 1, 2 -> 1, 3 -> 1, 8 -> 8, 9 -> 8)
    val fastI = Dedup.components(iPairs).as[(Int, Int)].collect().toMap
    assert(fastI === wantI)
    assert(Dedup.components(iPairs).schema("doc_id").dataType ===
      org.apache.spark.sql.types.IntegerType)
  }

  test("supplementary-plane string ids: driver path agrees with Spark's binary order") {
    // "�" (U+FFFD, 3-byte UTF-8) vs "😀" (U+1F600,
    // 4-byte UTF-8): Java's UTF-16 compareTo puts the surrogate pair
    // FIRST (0xD83D < 0xFFFD) while Spark's min()/least() compare
    // UTF-8 bytes and put U+FFFD first (0xEF < 0xF0). The group label
    // must follow Spark's order on BOTH adaptive paths (round-15
    // ADVICE: diverging labels between paths is silent corruption).
    val hi = "😀-id" // U+1F600
    val lo = "�-id"       // U+FFFD — the UTF-8 minimum of the two
    assert(hi.compareTo(lo) < 0, "precondition: UTF-16 order differs")
    val pairs = Seq((hi, lo)).toDF("doc_a", "doc_b")
    val fast = Dedup.components(pairs).as[(String, String)].collect().toMap
    val dist = Dedup.components(pairs, driverThreshold = 0L)
      .as[(String, String)].collect().toMap
    assert(fast === Map(hi -> lo, lo -> lo), "driver path must label " +
      "groups by UTF-8 byte order, not UTF-16 compareTo")
    assert(dist === fast)
  }

  test("unsupported id types fail loudly on the driver path") {
    val bPairs = Seq((Array[Byte](1, 2), Array[Byte](3, 4)))
      .toDF("doc_a", "doc_b")
    val e = intercept[Exception](Dedup.components(bPairs).collect())
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("unsupported id type")), e.toString)
  }
}
