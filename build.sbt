ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "vectorgraphragspark"
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
// The driver parses the LAST raw stdout line of `sbt runMain graft.Bench`
// as the bench metric JSON. Two pieces of sbt framing broke that for six
// rounds (BENCH_r11..r15 `parsed: null`) even after Bench.scala emitted a
// perfect final compact line: (a) forked-run output is logged through sbt,
// arriving prefixed `[info] `; (b) sbt appends its own `[success] Total
// time: …` as the true last line. StdoutOutput passes the forked JVM's
// stdout through verbatim, and showSuccess kills the trailer — making the
// compact metric line the literal last raw stdout line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
ThisBuild / showSuccess := false
// showSuccess is consumed by sbt's command engine, not by settings — exclude
// it from the unused-key lint so every batch invocation stays warning-free.
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
  // The 184-query bench suite JIT-compiles thousands of whole-stage-codegen
  // units; the JVM's default 240 MB reserved code cache fills mid-suite,
  // the compiler shuts off ("CodeCache is full"), and every later query runs
  // deoptimized (r11: rag_pipeline 17.5 s in-suite vs 5.7 s isolated in an
  // identical warm JVM). 1 GiB keeps the whole suite compiled.
  "-XX:ReservedCodeCacheSize=1g",
)
