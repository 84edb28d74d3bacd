ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gscapspark"
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
// Raw stdout from forked runMain (no "[info] " logger prefix): the driver
// parses Bench's one-line JSON from the stdout tail, and a logger prefix
// on that line would break a parser expecting it to start with '{'.
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
  // JVM default TZ pinned to match the session TZ: time-part extraction is
  // explicit-UTC in code, but any driver-side java.time use must agree on
  // non-UTC hosts too (document the same flag for cluster spark-submit)
  "-Duser.timezone=UTC",
  // Default heap raised 8g→48g: the 32-thread string-heavy pipelines are
  // GC-bound below ~48g (716k → 1.07M pages/s, see BENCH/BASELINE.md), and
  // the round-2 driver-recorded bench regression traced to running under
  // the small default. On a real cluster this is spark.executor.memory
  // sizing, not driver tuning.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // -Xms pinned to -Xmx: with a small initial heap the FIRST full-scale job
  // in a session pays repeated heap-expansion full GCs (~2× wall-clock on
  // the 10M-page run; TmpAB A/B evidence, round 3) — steady-state sizing
  // from the start is the executor-memory posture a real cluster uses
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // Every Catalyst query codegen's fresh classes; a long session (60-query
  // bench × 3 reps) fills the default 240 MB JIT code cache, after which
  // compilation stops and identical jobs run interpreted (measured 4-10×:
  // the same 5 s pipeline degraded to 65 s late in a session). Size it so
  // steady-state stays compiled — on a real cluster this is an executor
  // JVM flag (spark.executor.extraJavaOptions).
  "-XX:ReservedCodeCacheSize=1g",
)
