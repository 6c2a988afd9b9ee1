package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Sampling

/** The streaming k-per-group sampler must CONVERGE to the batch
  * sampler's membership over the same keys — arrival order, batching
  * and duplicate redelivery must all be invisible, because both sides
  * share one pure membership rule (k smallest key hashes).
  */
class StreamSampleSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  test("streaming sample converges to the batch sample") {
    val salt = "s7"
    val k = 3
    val keys = (1 to 40).map(i => (s"g${i % 3}", s"key$i"))
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val out = StreamSample.kPerGroupStream(
      input.toDS().groupByKey(_._1), k, salt)
    val q = out.writeStream.outputMode("update")
      .format("memory").queryName("ksample")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft-ksample").toString)
      .start()
    try {
      // shuffled thirds, with batch 2 redelivering batch 1 entirely
      val shuffled = new scala.util.Random(11).shuffle(keys)
      val (b1, rest) = shuffled.splitAt(13)
      val (b2, b3) = rest.splitAt(13)
      input.addData(b1: _*); q.processAllAvailable()
      input.addData((b2 ++ b1): _*); q.processAllAvailable()
      input.addData(b3: _*); q.processAllAvailable()
      // LAST emitted row per group is the sample
      val streamed = spark.table("ksample")
        .groupBy("group").agg(last("members").as("members"))
        .as[(String, Seq[String])].collect().toMap
      val batch = Sampling.kPerGroup(keys.toDF("grp", "key"),
          col("key"), col("grp"), k, salt)
        .select("grp", "key").as[(String, String)].collect()
        .groupBy(_._1).map { case (g, rows) =>
          g -> rows.map(_._2).toSeq.sortBy(kk => md5hex(salt + kk))
        }
      assert(streamed === batch)
    } finally q.stop()
  }

  test("membership is monotone under k growth and duplicate-proof") {
    val keys = (1 to 20).map(i => ("g", s"k$i"))
    def sample(k: Int): Seq[String] = {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(String, String)]
      val q = StreamSample.kPerGroupStream(
        input.toDS().groupByKey(_._1), k)
        .writeStream.outputMode("update")
        .format("memory").queryName(s"ks$k")
        .option("checkpointLocation", java.nio.file.Files
          .createTempDirectory(s"graft-ks$k").toString)
        .start()
      try {
        input.addData(keys: _*); q.processAllAvailable()
        input.addData(keys: _*); q.processAllAvailable() // full replay
        spark.table(s"ks$k").orderBy(col("group"))
          .as[(String, Seq[String])].collect().last._2
      } finally q.stop()
    }
    val s2 = sample(2)
    val s5 = sample(5)
    assert(s2.size === 2 && s5.size === 5)
    assert(s2.toSet.subsetOf(s5.toSet), "k=2 sample ⊆ k=5 sample")
    intercept[IllegalArgumentException] {
      StreamSample.kPerGroupStream(null, 0)
    }
  }
}
