ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "fxaamplitudesendspark"
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
// Forked run output must pass through RAW: sbt's default logger prefixes
// every line with "[info] ", which breaks the driver's parse of Bench's
// single JSON metric line (round-1 BENCH had "parsed": null).
outputStrategy := Some(StdoutOutput)
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
  // local[32] runs driver + 32 executor threads in ONE JVM; 8g thrashes GC
  // on the array-heavy LLM operators (measured: 10x run-to-run variance).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // A 34-query suite JIT-churns far past the default 240m reserved code
  // cache (Janino classes per stage + Jackson + Spark); when it fills, the
  // JVM silently stops compiling and random queries run interpreted at
  // ~100x (measured: 2.9s -> 121s on an identical plan mid-suite).
  "-XX:ReservedCodeCacheSize=512m",
  // The same suite floods the C2 queue with large Janino methods; while it
  // is backed up, fresh per-query generated stages run interpreted (minutes
  // for a Jackson-heavy 100k-row stage). Extra compiler threads drain it.
  "-XX:CICompilerCount=12",
)
