ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "deimosspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// The driver parses the bench headline from the LAST ~2000 stdout
// chars. Two sbt behaviors break that: the logger's "[info] " line
// prefix, and the "[success] Total time..." epilogue printed AFTER
// the program's final JSON line (observed verbatim in the BENCH_r08
// tail — the summary object was whole but not last, parsed:null).
// StdoutOutput passes the forked JVM's stdout through raw, and
// showSuccess drops the epilogue, so graft.Bench's summary line is
// the true last line of the process output.
run / outputStrategy := Some(StdoutOutput)
Global / showSuccess := false
// showSuccess is read by sbt's command loop, not by another task —
// lintUnused can't see that
Global / excludeLintKeys += showSuccess
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // 46+ benchmark queries × whole-stage-codegen classes overflow the
  // default 240 MB JIT code cache mid-sweep; once full, HotSpot stops
  // compiling and generated code runs interpreted — the observed
  // pattern of a 10-20× CPU-heavy run that later recovers (cache
  // flushing evicts, recompiles). Size it so the sweep never hits the
  // cliff.
  "-XX:ReservedCodeCacheSize=512m",
)
