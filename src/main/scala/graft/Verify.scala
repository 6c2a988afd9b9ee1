package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (unset for the driver's full gate).
    // Comma-separated regexes, ANY-match — accepts both Bench's
    // documented comma-list of exact names and anchored regexes
    // ('^x8' would otherwise silently select nothing as one pattern
    // with a comma in it, or '^x8[0-4]' vs 'x8' substring-match x80+).
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).map(_.r).toSeq)
    val selected = SparkEntry.queries.filter { case (name, _) =>
      only.forall(_.exists(_.findFirstIn(name).isDefined))
    }
    // SPARK_GRAFT_EXPLAIN=1: dump each selected query's formatted
    // physical plan to stderr (plan-audit hook) instead of writing
    // results — compile-the-plan-only, no execution beyond what plan
    // building itself triggers (eager localCheckpoints still run).
    val explainOnly = sys.env.get("SPARK_GRAFT_EXPLAIN").contains("1")
    selected.foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        if (explainOnly) {
          System.err.println(s"==== $name ====")
          System.err.println(df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode))
        } else df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
