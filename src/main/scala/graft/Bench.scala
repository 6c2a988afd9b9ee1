package graft

import org.apache.spark.sql.SparkSession

/** Driver contract: run headline queries on SPARK_GRAFT_SF_DIR, print
  * ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Each query is forced through the noop sink (full materialization —
  * count() would let Catalyst prune the computed columns).
  *
  * Hardened against cold/contended environments (round-1 driver run
  * recorded 3.4× while the identical command reproduced at 0.9×):
  *  - an UNTIMED warmup pass at the TARGET sf dir, so the timed runs
  *    never pay first-touch parquet page-cache + JIT/codegen cost;
  *  - median-of-3 timing per query (min is too optimistic under GC
  *    pauses, mean too pessimistic under one-off co-tenancy spikes);
  *  - per-run timings echoed to stderr for post-mortems;
  *  - a failed query records value -1 and lands in an "errors" map —
  *    never a silent normal-looking timing.
  * Driver heap is pinned by build.sbt (`run / fork` + -Xmx).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        dir: String): Unit =
      fn(spark, dir).write.mode("overwrite").format("noop").save()

    // Untimed warmup AT THE TARGET DIR: first touch of each parquet
    // file (page cache) and each query's codegen happen here, not in
    // the timed loop. Warmup failures are ignored — the timed loop
    // records them properly.
    System.err.println(s"[bench] warmup pass on $sfDir")
    SparkEntry.queries.foreach { case (name, fn) =>
      try run(fn, sfDir) catch {
        case e: Throwable =>
          System.err.println(s"[bench] warmup $name FAILED: ${e.getClass.getName}")
      }
    }

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 3).flatMap { i =>
        val t0 = System.nanoTime()
        val ok =
          try { run(fn, sfDir); true }
          catch {
            case e: Throwable =>
              errors.getOrElseUpdate(name,
                s"${e.getClass.getName}: ${Option(e.getMessage).getOrElse("").take(200)}")
              false
          }
        val dt = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name run$i%d ${if (ok) f"$dt%.3f" else "FAIL"}s")
        if (ok) Some(dt) else None
      }
      // median of successful runs; -1 marks a query with no clean run
      val v =
        if (times.isEmpty) -1.0
        else times.sorted.apply(times.size / 2)
      name -> v
    }
    def jnum(v: Double): String = f"$v%.4f"
    // full JSON string escaping: Spark exception messages embed
    // newlines/plan fragments — an unescaped control char would break
    // the one-line output contract exactly when a query errored
    def jstr(s: String): String = s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + jnum(v) }
      .mkString("{", ",", "}")
    val errJson = errors.map { case (k, m) =>
      "\"" + k + "\":\"" + jstr(m) + "\""
    }.mkString("{", ",", "}")
    val good = results.values.filter(_ >= 0)
    val total = if (good.nonEmpty) good.sum else 0.0
    println(s"""{"metric":"total","value":${jnum(total)},"unit":"sec","queries":$qs,"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
