package graft

import org.apache.spark.sql.SparkSession

/** Phase profiler for one registered query — the round-16 tool for
  * chasing fixed per-query costs in the sub-second bench tail: runs
  * `SparkEntry.queries(name)` N times against a SF dir under the
  * exact Bench session config, splitting each run into BUILD (the
  * query function call: extension registration, view setup, parse +
  * analyze) and EXEC (the noop write) so a constant shows up in the
  * right phase instead of hiding inside one wall number.
  *
  * Usage: runMain graft.ProfileOne <sfDir> <queryName> [runs=8]
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 8
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (name == "__micro") {
      // decompose the shared per-query constants: parquet read
      // (footer + listing), extension registration, tempview, parse
      var i = 0
      while (i < runs) {
        val t0 = System.nanoTime()
        val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
        val t1 = System.nanoTime()
        GraftExtensions.register(spark)
        val t2 = System.nanoTime()
        df.createOrReplaceTempView("graft_prof_emb")
        val t3 = System.nanoTime()
        val q = spark.sql(
          "SELECT vec_id FROM graft_prof_emb WHERE vec_id > 5")
        q.queryExecution.executedPlan // force analysis+planning
        val t4 = System.nanoTime()
        println(f"[profile] __micro run$i read=${(t1 - t0) / 1e6}%.1fms " +
          f"register=${(t2 - t1) / 1e6}%.1fms view=${(t3 - t2) / 1e6}%.1fms " +
          f"plan=${(t4 - t3) / 1e6}%.1fms")
        i += 1
      }
    } else {
      val fn = SparkEntry.queries(name)
      var i = 0
      while (i < runs) {
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val t1 = System.nanoTime()
        df.write.mode("overwrite").format("noop").save()
        val t2 = System.nanoTime()
        println(f"[profile] $name run$i build=${(t1 - t0) / 1e6}%.1fms " +
          f"exec=${(t2 - t1) / 1e6}%.1fms total=${(t2 - t0) / 1e6}%.1fms")
        i += 1
      }
    }
    spark.stop()
  }
}
