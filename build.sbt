ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pgsinkspark"
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
// Forked-run output goes straight to stdout: sbt's default logger
// prefixes every line with "[info] ", which breaks tail parsers that
// expect the bench/verify JSON summary line verbatim (BENCH_r04
// recorded parsed:null for exactly this reason).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
  // Default sized for the 128 GiB bench machine: local[32] runs 32
  // concurrent tasks whose shuffle/sort buffers GC-thrash 10-30x when
  // squeezed into a small heap (measured: q55 0.6s->20s at 8g).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "64g")}",
  // The 143-query sweep generates thousands of janino/whole-stage
  // classes; at the JVM's 240m default the code cache fills mid-sweep
  // and the JIT silently stops compiling, inflating CPU-bound
  // operators 2-4x late in the run (the scheduling-bound floor query
  // stays flat — the fingerprint that separates this from GC noise).
  "-XX:ReservedCodeCacheSize=1g",
  // Parallel (throughput) collector: G1's concurrent cycles +
  // region management charge 0.7-1.0s of attributed pause time to
  // every 32-task stage that churns Tungsten pages (measured on the
  // q01 final agg: gc 1.0s -> 0, stage wall 0.34s -> 0.06s). The
  // bench workload is short-lived allocation bursts on a large heap —
  // exactly the profile the parallel collector is built for.
  "-XX:+UseParallelGC",
) ++ sys.env.get("SPARK_GRAFT_JVM").toSeq.flatMap(_.split(" ").filter(_.nonEmpty))
