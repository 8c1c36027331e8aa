ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "whisperpandasspark"
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
// Forked run output goes straight to this process's stdout, WITHOUT sbt's
// "[info] " line prefixes — graft.Bench's contract is ONE parseable JSON
// line on stdout, and the logger prefix breaks any strict JSON consumer.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // A 100-query suite x 4 runs each generates far more whole-stage-codegen
  // classes than the JVM's 240 MB default code cache holds; once it fills,
  // silent cold-method flushing (and eventually JIT shutdown) inflates every
  // later query 1.4-2x — the within-pass drift measured in BENCH_NOTES
  // round 5. Spark's generated-class cache (default 100 entries) thrashes
  // the same way at this query count.
  "-XX:ReservedCodeCacheSize=1g",
  "-Dspark.sql.codegen.cache.maxEntries=2000",
)
// ANSI gate (VERDICT r5 item 2): SPARK_GRAFT_ANSI=true runs every forked
// JVM — tests, Verify, Bench — with spark.sql.ansi.enabled=true (the
// system property seeds SparkConf, which seeds every session's SQLConf).
// The suite must be green under BOTH modes: ANSI on proves no query relies
// on silent overflow/implicit casts/soft array indexing; default off stays
// the bench configuration.
javaOptions ++= (
  if (sys.env.get("SPARK_GRAFT_ANSI").contains("true"))
    Seq("-Dspark.sql.ansi.enabled=true")
  else Seq.empty)
