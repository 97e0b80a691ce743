ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "prestocopyspark"
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
// The driver tail-parses the LAST stdout line of `sbt runMain graft.Bench`
// for the compact JSON summary. Two sbt behaviors broke that in r6:
// forked-run output was relogged with an "[info] " prefix, and sbt printed
// a "[success] Total time: …" epilogue AFTER the JSON line. Inherit the
// forked JVM's stdout directly and drop the epilogue so the summary line
// is genuinely last and prefix-free.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Global / showSuccess := false
// the key IS used (runMain delegates to it) — sbt's lint just can't see it
Global / excludeLintKeys += run / outputStrategy
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
  // 151 queries × whole-stage-codegen classes in one JVM: the 240 MB
  // default code cache forces sweeping/deopt churn late in a full run
  // (isolated reruns are fast, late-in-run queries sporadically 3-30x
  // slower — the r3 driver-bench signature); give C2 room instead
  "-XX:ReservedCodeCacheSize=1g", "-XX:+UseCodeCacheFlushing",
)
