ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pysparkmllibtwitterspark"
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
// The driver parses benchmark JSON from the tail of `sbt "runMain
// graft.Bench"` stdout. Two sbt default behaviors break that parse:
// every forked-process line is re-logged with an "[info] " prefix, and
// a "[success] Total time: ..." line is appended after the run. Route
// the forked JVM's stdout straight through unprefixed and drop the
// success banner so the bench's final JSON line is the final raw line.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // 24g default: local[32] runs 32 concurrent tasks in ONE JVM, so this
  // heap is effectively 32 executor slots' worth of unified memory; 8g
  // left the bench suite GC-bound in some rounds, and at 16g individual
  // queries still hit multi-second stop-the-world pauses that made
  // per-round timings bimodal (the machine has 128g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
)
