package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.Sampling

/** The streaming k-per-group sampler must CONVERGE to the batch
  * sampler's membership over the same (distinct) keys — arrival
  * order, batching and duplicate redelivery must all be invisible,
  * because both sides share one pure membership rule (k smallest key
  * hashes). Selection of the final emission per group keys on the
  * emitted monotone `version`, never on sink row order.
  */
class StreamSampleSpec extends SparkSpec {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xff}%02x").mkString

  private def latest(table: String): Map[String, Seq[String]] =
    spark.table(table)
      .groupBy("group")
      .agg(max_by(col("members"), col("version")).as("members"))
      .as[(String, Seq[String])].collect().toMap

  test("streaming sample converges to the batch sample") {
    val salt = "s7"
    val k = 3
    val keys = (1 to 40).map(i => (s"g${i % 3}", s"key$i"))
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val q = StreamSample.kPerGroupStream(
        input.toDS().groupByKey(_._1), k, salt)
      .writeStream.outputMode("update")
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
      val batch = Sampling.kPerGroup(keys.toDF("grp", "key"),
          col("key"), col("grp"), k, salt)
        .select("grp", "key").as[(String, String)].collect()
        .groupBy(_._1).map { case (g, rows) =>
          g -> rows.map(_._2).toSeq.sortBy(kk => md5hex(salt + kk))
        }
      assert(latest("ksample") === batch)
    } finally q.stop()
  }

  test("duplicate keys are set-semantics no-ops in the stream") {
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val q = StreamSample.kPerGroupStream(
        input.toDS().groupByKey(_._1), k = 2)
      .writeStream.outputMode("update")
      .format("memory").queryName("kdup")
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft-kdup").toString)
      .start()
    try {
      input.addData(("g", "a"), ("g", "a"), ("g", "b"), ("g", "a"))
      q.processAllAvailable()
      val got = latest("kdup")("g")
      // the documented divergence from the ROW-sampling batch sibling:
      // membership is over the key set {a, b}
      assert(got.toSet === Set("a", "b"))
    } finally q.stop()
  }

  test("restored state trims when k shrinks across a restart") {
    // a MemoryStream query cannot recover a checkpoint, so the
    // restart path is exercised through the extracted pure fold
    val keys = (1 to 12).map(i => s"k$i")
    val wide = StreamSample.foldMembers(Map.empty, keys.iterator, 6, "")
    assert(wide.size === 6)
    // restart with k=2 restores 6 members and a quiet batch: trimmed
    val narrow = StreamSample.foldMembers(wide, Iterator("k1"), 2, "")
    assert(narrow.size === 2, s"restored state not trimmed: $narrow")
    assert(narrow.keySet.subsetOf(wide.keySet))
    // the survivors are exactly the 2 smallest hashes of the wide set
    assert(narrow.keySet === wide.keySet.toSeq.sorted.take(2).toSet)
    // duplicate-only traffic also trims (no insert needed to shrink)
    val dupOnly = StreamSample.foldMembers(wide,
      Iterator(wide.values.head), 3, "")
    assert(dupOnly.size === 3)
  }

  test("membership is monotone under k growth") {
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
        latest(s"ks$k")("g")
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
