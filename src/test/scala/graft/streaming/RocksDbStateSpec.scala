package graft.streaming

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The streaming scaladocs claim "at scale the state store is per-key
  * RocksDB-backed" — this suite makes that claim REAL: the same
  * stateful operators run under
  * `RocksDBStateStoreProvider` (the spill-to-disk store a 100 TB
  * dedup-state cardinality actually needs — the default HDFS-backed
  * provider keeps every version of every key's state on the executor
  * HEAP) and the query progress proves the provider was engaged via
  * its rocksdb custom metrics. Results must be byte-identical to the
  * default provider's — state backend is an executor-local detail,
  * never semantics.
  */
class RocksDbStateSpec extends SparkSpec {
  import spark.implicits._

  private val ProviderKey = "spark.sql.streaming.stateStore.providerClass"
  private val RocksDb =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  private def withRocksDb[T](body: => T): T = {
    val prev = spark.conf.getOption(ProviderKey)
    spark.conf.set(ProviderKey, RocksDb)
    try body
    finally prev match {
      case Some(v) => spark.conf.set(ProviderKey, v)
      case None => spark.conf.unset(ProviderKey)
    }
  }

  private def rocksMetrics(
      q: org.apache.spark.sql.streaming.StreamingQuery): Set[String] =
    Option(q.lastProgress).toSeq
      .flatMap(_.stateOperators.toSeq)
      .flatMap(_.customMetrics.keySet().toArray.map(_.toString))
      .filter(_.toLowerCase.contains("rocksdb")).toSet

  test("firstSeenTtl dedup semantics hold on the RocksDB store") {
    withRocksDb {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long, String)]
      val withTs = input.toDS()
        .withColumn("ets", timestamp_millis(col("_2")))
        .withWatermark("ets", "0 milliseconds")
        .as[(Long, Long, String, java.sql.Timestamp)]
      val out = StreamDedup
        .firstSeenTtl[Long, (Long, Long, String, java.sql.Timestamp)](
          withTs.groupByKey(_._1), _._2, idleTimeoutMs = 100L)
        .map(r => (r._1, r._2, r._3))
      val q = out.writeStream.outputMode("update")
        .format("memory").queryName("dedup_rocks")
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory("graft-rocks-dd").toString)
        .start()
      try {
        input.addData((1L, 900L, "first"), (2L, 1000L, "k2"))
        q.processAllAvailable()
        input.addData((1L, 1050L, "dup"), (3L, 5000L, "k3"))
        q.processAllAvailable()
        input.addData((1L, 6000L, "revived")) // evicted past deadline
        q.processAllAvailable()
        val got = spark.table("dedup_rocks")
          .as[(Long, Long, String)].collect().toSet
        assert(got === Set((1L, 900L, "first"), (2L, 1000L, "k2"),
          (3L, 5000L, "k3"), (1L, 6000L, "revived")))
        val metrics = rocksMetrics(q)
        assert(metrics.nonEmpty,
          "query progress exposes no rocksdb custom metrics — the " +
            "provider conf did not take effect")
      } finally q.stop()
    }
  }

  test("windowed counts on RocksDB equal the default-provider run") {
    def run(name: String): Set[(Long, Long)] = {
      implicit val sqlCtx = spark.sqlContext
      val input = org.apache.spark.sql.execution.streaming.runtime
        .MemoryStream[(Long, Long)] // (user, ts_ms)
      val agg = input.toDS()
        .withColumn("ets", timestamp_millis(col("_2")))
        .withWatermark("ets", "0 milliseconds")
        .groupBy(window(col("ets"), "1 second"), col("_1").as("user"))
        .agg(count(lit(1)).as("n"))
        .select(col("user"), col("n"))
      val q = agg.writeStream.outputMode("update")
        .format("memory").queryName(name)
        .option("checkpointLocation",
          java.nio.file.Files.createTempDirectory(s"graft-$name").toString)
        .start()
      try {
        input.addData((1L, 100L), (1L, 200L), (2L, 300L))
        q.processAllAvailable()
        input.addData((1L, 400L), (2L, 1500L))
        q.processAllAvailable()
        spark.table(name).as[(Long, Long)].collect()
          .groupBy(_._1).map { case (u, rows) =>
            (u, rows.map(_._2).max) }.toSet
      } finally q.stop()
    }
    val onRocks = withRocksDb(run("win_rocks"))
    val onDefault = run("win_default")
    assert(onRocks === onDefault)
    assert(onRocks === Set((1L, 3L), (2L, 1L)))
  }
}
