ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "tuktuspark"
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
// r16: the driver's bench parser has read `parsed: null` since r08 because
// the forked app's stdout went through sbt's logger (LoggedOutput): every
// line — including graft.Bench's machine-readable one-line JSON — arrived
// prefixed with "[info] ", and sbt's "[success] Total time" trailer landed
// AFTER it, so neither a last-line parse nor a line.startswith("{") scan
// could recover the JSON from the bounded stdout tail. StdoutOutput passes
// the forked JVM's stdout through verbatim, and showSuccess drops the
// trailer, so the compact JSON is the final raw line on stdout
// (verified by tools/tail_parse.py, which replays both parser models on a
// captured tail).
run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Commit and fault the whole heap at JVM start (the standard production
  // executor setting): this box virtualizes page faults expensively, and
  // letting the heap grow lazily put ~90% of a 22M-group aggregation's
  // wall-clock into kernel time (measured 29s -> 9s with pretouch).
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
)
