ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "syscolspark"
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
// The driver invokes `sbt "runMain graft.Bench"` and parses the bench's
// one-line JSON from stdout. sbt's own `[success] Total time: ...` epilogue
// landed AFTER that line in every round r09-r14 and the driver's parse came
// back null each time (BENCH_r*.json: parsed=null) — the JSON must be the
// LAST stdout line. Suppressing the epilogue is cosmetic for humans
// (failures still report via exit code and [error] lines) and restores the
// machine contract.
Global / showSuccess := false
// (showSuccess is read by sbt's command engine, not a task — exclude it
// from the unused-setting lint so the warning doesn't pollute stdout.)
Global / excludeLintKeys += showSuccess
// Forked `run` output normally passes through sbt's logger, which prefixes
// every stdout line with `[info] ` — that prefix (not just the [success]
// epilogue) breaks any `json.loads(<last stdout line>)` consumer. Route the
// forked JVM's stdout/stderr straight through instead.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
