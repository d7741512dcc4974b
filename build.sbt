ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "recursivepdfextractionandragspark"
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
// Forward the forked run's stdout RAW (no "[info] " logger prefix): the
// bench driver parses the JSON line graft.Bench prints to stdout.
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
  // local mode: executor == driver, so the executor->driver heartbeat is
  // in-process bookkeeping with NO liveness value — but under this host's
  // multi-minute memory-collapse phases the RPC can time out 60 times in a
  // row, and the executor then kills the WHOLE JVM with exit 56
  // (HEARTBEAT_FAILURE; observed killing a green 35-min test run at the
  // 26th suite). Make it effectively unkillable in-process:
  "-Dspark.executor.heartbeat.maxFailures=100000",
  "-Dspark.executor.heartbeatInterval=60s",
  "-Dspark.network.timeout=600s",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // pre-size the heap: growing from the default tiny Xms during a measured
  // pass costs repeated young GCs exactly while the 32-thread stage runs
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // throughput-batch GC: scales better than G1 for the allocation-heavy
  // extraction stages at local[32]
  "-XX:+UseParallelGC",
  // half the heap young: stage-profiled at local[32] (tools/StageProf) the
  // default 1/3 young gen promoted medium-lived task/shuffle objects and GC
  // consumed 28-46% of task time; NewRatio=1 (+ off-heap execution memory,
  // set in Bench's session conf) cut reduce-stage GC 327s -> 14s
  "-XX:NewRatio=1",
  "-XX:ReservedCodeCacheSize=512m",
)
