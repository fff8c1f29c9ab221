ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "ambientsoundanalysisapispark"
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
// The bench/verify harness parses machine-readable JSON lines from this
// build's stdout. sbt's default LoggedOutput strategy prefixes every forked
// line with "[info] ", which breaks line-oriented JSON parsing; StdoutOutput
// passes the child's stdout through verbatim. showSuccess drops the trailing
// "[success] Total time" line so the bench contract line stays last.
outputStrategy := Some(StdoutOutput)
showSuccess := false
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
  // 16g default: at local[32] the dedup pipelines (text kernels +
  // checkpoint blocks + persisted corpus) GC-thrash an 8g heap — measured
  // ~30% on q_corpus_clean cold; the box has 128 GiB. Cluster deployments
  // size executor memory separately; this only affects forked local runs.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // GC visibility for the bench: round 9/10 both saw CPU-backed warm-pass
  // stalls on a contiguous block of queries — the GC log is how a stall
  // gets attributed (heap pressure vs plan regression) without rerunning.
  // %p = pid: one log per forked JVM — a shared fixed path truncates on
  // every fork, so the next `sbt test` would destroy the bench run's log
  "-Xlog:gc:file=target/gc-%p.log:time,uptime",
)
