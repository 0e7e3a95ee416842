ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "meosrsspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
// suites share one local SparkSession (and ExtensionsSpec swaps the active
// session); run them sequentially for determinism
Test / parallelExecution := false
run / fork := true
// The forked JVM inherits sbt's raw stdout/stderr instead of going
// through sbt's logger: every BENCH_r* tail shows the bench JSON line
// prefixed with "[info] ", and the driver's line-oriented JSON parse has
// recorded parsed:null in all nine rounds. Raw inheritance makes the
// println line start with "{" as a parser expects.
run / outputStrategy := Some(StdoutOutput)
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
  // 8g, not bigger: Spark's ContextCleaner only reclaims finished
  // queries' shuffle files/broadcasts when the JVM actually runs GC —
  // under a 24g heap the 123-query bench suite barely GCs, cleanup
  // backlogs, and per-query times inflate 2-8× late in the run (round-7
  // bench vs the same queries isolated). A modest heap keeps collections
  // frequent enough that each query starts from a clean block manager.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // a 112-query suite generates thousands of whole-stage-codegen classes;
  // the JVM default 240m code cache thrashes late in the run (flushed
  // compiled methods re-interpret, inflating the suite tail — the
  // DRIFT_r07.md session-weight effect). Size it so compiled code stays
  // compiled for the whole suite.
  "-XX:ReservedCodeCacheSize=1g",
)
