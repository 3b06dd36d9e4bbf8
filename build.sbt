ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hangarbayspark"
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
// Pass the forked process's stdout straight through (no sbt "[info] "
// log decoration): the bench harness parses the LAST bare JSON line of
// stdout, and six rounds of BENCH_rN carried an `[info] `-prefixed line
// the parser rejected.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Pre-size the heap when asked: a 96g heap growing up from the
  // ~2g default -Xms under a cache-heavy first query pays the
  // expansion in GC churn ON that query (measured: p18's first
  // sf1.0 run 3960 task-CPU-s vs 200 steady) — benchmarks pass
  // SPARK_DRIVER_XMS to take heap sizing out of the measurement.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_XMS", "1g")}",
  // The default 240 MB code cache overflows across the bench's ~266
  // warm+measure codegen compilations (133 queries × 2 runs), and the
  // JIT starts flushing compiled code mid-sweep: the d-family measured
  // ~2x its isolated-rerun cost until this was raised (full sweep
  // 91.9 -> 84.8 s from the code cache alone, -> 77.0 s with the
  // heap headroom above).
  "-XX:ReservedCodeCacheSize=512m",
)
