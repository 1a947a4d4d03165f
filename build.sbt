ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "heliumarangoetlspark"
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
// Emit the forked app's stdout verbatim (no "[info] " logger prefix):
// the bench driver tail-parses stdout for the one canonical JSON line,
// and a prefixed line is not valid JSON (BENCH_r09 recorded parsed:null).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// Suppress sbt's "[success] Total time: …" epilogue: every BENCH_r{1..9}
// tail ends with that line AFTER the canonical JSON, and the driver's
// last-line parse recorded parsed:null all nine rounds. With it off, the
// bench's compact JSON line is the final line on stdout.
Global / showSuccess := false
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
  // local[32] runs 32 concurrent tasks in this one JVM; an undersized
  // heap turns benchmark timings into GC noise (measured 21-31s swings
  // at 8g). The host has 128 GiB.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
