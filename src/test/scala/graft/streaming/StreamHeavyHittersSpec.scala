package graft.streaming

import graft.SparkSpec

class StreamHeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  private def runBatches(capacity: Int,
      batches: Seq[(String, String)]*): Map[(String, String), (Long, Long)] = {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val out = StreamHeavyHitters.misraGries(
      input.toDS().groupByKey(_._1), capacity)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("mg_out")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-mg").toString)
      .start()
    try {
      batches.foreach { b => input.addData(b: _*); q.processAllAvailable() }
      // update-mode upsert on (group, item): latest emission wins
      spark.table("mg_out")
        .withColumn("seq", org.apache.spark.sql.functions
          .monotonically_increasing_id())
        .as[(String, String, Long, Long, Long)].collect()
        .groupBy(r => (r._1, r._2))
        .map { case (k, rs) =>
          val last = rs.maxBy(_._5); k -> ((last._3, last._4)) }
    } finally q.stop()
  }

  test("every true heavy hitter survives, counters within the MG bound") {
    // stream of 30 items for group g: 'a' x 12, 'b' x 9, 10 singletons
    val items = Seq.fill(12)("a") ++ Seq.fill(9)("b") ++
      (1 to 9).map(i => s"u$i")
    val (b1, b2) = items.splitAt(17)
    val got = runBatches(3,
      b1.map("g" -> _), b2.map("g" -> _))
    val n = 30L
    val bound = n / (3 + 1) // 7
    val trueCounts = Map("a" -> 12L, "b" -> 9L)
    // guarantee: freq > n/(cap+1) => present
    trueCounts.foreach { case (it, f) =>
      assert(f > bound)
      assert(got.contains(("g", it)), s"$it missing from summary")
      val (clb, nt) = got(("g", it))
      assert(nt === n)
      assert(clb <= f && clb >= f - bound,
        s"$it counter $clb outside [${f - bound}, $f]")
    }
    // summary never exceeds capacity
    assert(got.keys.count(_._1 == "g") <= 3)
  }

  test("groups keep independent summaries and exact stream lengths") {
    val got = runBatches(2,
      Seq("g1" -> "x", "g1" -> "x", "g2" -> "y"),
      Seq("g1" -> "x", "g2" -> "y", "g2" -> "z"))
    assert(got(("g1", "x")) === ((3L, 3L)))
    assert(got(("g2", "y"))._1 === 2L)
    assert(got(("g2", "y"))._2 === 3L)
  }

  test("batch-split invariance of the guarantee (not of the residue)") {
    // same stream cut at different points: heavy item present in both
    val items = Seq.fill(8)("hot") ++ (1 to 8).map(i => s"cold$i")
    val cutA = runBatches(2, items.map("g" -> _))
    val cutB = runBatches(2, items.take(5).map("g" -> _),
      items.drop(5).map("g" -> _))
    assert(cutA.contains(("g", "hot")) && cutB.contains(("g", "hot")))
  }

  test("invalid capacity rejected") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    intercept[IllegalArgumentException] {
      StreamHeavyHitters.misraGries(input.toDS().groupByKey(_._1), 0)
    }
  }
}
