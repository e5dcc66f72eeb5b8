ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "image_matadatabatchprocessing_awsspark"
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
// Forked-run stdout must pass through unprefixed: the driver parses the one
// JSON line Bench prints, and sbt's default LoggedOutput would prepend
// "[info] " to it.
outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Headroom for the growing bench suite: a measured 162-query run
  // (round 12, -XX:+PrintCodeCache) used ~150 MB of JDK 17's 240 MB
  // default with full_count=0 — NOT yet the bottleneck, but the
  // profiled-nmethods heap was at 81/118 MB and the suite keeps growing;
  // reserving (not committing) 512 MB is free insurance against the JIT
  // flush-churn failure mode. See BASELINE.md round-12 inflation note.
  "-XX:ReservedCodeCacheSize=512m",
) ++
  // Extra forked-JVM flags for one-off diagnostics (e.g. -XX:+PrintCodeCache)
  sys.env.get("SPARK_GRAFT_JAVA_OPTS").toSeq
    .flatMap(_.split("\\s+").filter(_.nonEmpty))
