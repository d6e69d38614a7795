ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "dbsubspark"
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
val sparkRunBase = jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  "-XX:+UseG1GC",
)
// Tests run local[32] in one JVM doing all executor work: size the heap
// for the machine, not the 8g driver-only default — undersizing turns
// every wide stage into a GC stall and kills core scaling. AlwaysPreTouch:
// first-touch page faults on a growing heap showed up as 60-80% kernel
// time under local[32]; pre-touching at JVM start moves that cost out of
// the measured stages.
Test / javaOptions := sparkRunBase ++ Seq(
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:+AlwaysPreTouch",
)
// `run` (Bench/Verify/cli mains) gets a MODEST lazy heap and never -Xms /
// AlwaysPreTouch: graft.Bench is a Spark-free orchestrator that spawns its
// own memory-budgeted child JVMs, and round 2's bench died to the kernel
// OOM-killer precisely because the forked runner inherited a
// SPARK_DRIVER_MEM-sized pre-touched heap on a box whose bench data lives
// in /dev/shm (tmpfs = the same RAM). 16g covers Verify at sf0.01 and the
// cli with headroom; heavy work belongs in children.
run / javaOptions := sparkRunBase :+ "-Xmx16g"
// Forked `run` output goes STRAIGHT to stdout — no sbt `[info]` log
// prefix. The bench's one-line JSON artifact must be machine-parseable
// from the process output; three rounds of the driver reporting
// `parsed: null` ended with round 3's root cause being exactly this
// prefix. (The summary is ALSO written to BENCH_SUMMARY.json.)
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
// ...and sbt's own `[success] Total time ...` trailer is suppressed so the
// bench process's LAST stdout line is the bare summary JSON (BENCH_r03's
// tail shows `[info] {json}` followed by `[success] ...` defeating a
// last-line parser). Failures still print.
Global / showSuccess := false
