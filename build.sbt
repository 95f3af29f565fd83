ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlpipelineprojectspark"
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
// The bench/verify mains emit a machine-parsed JSON line as their final
// stdout output. Route the forked JVM's stdout straight through (no
// "[info] " logger prefix) and drop the "[success] Total time" banner so
// that line stays the last line under a plain `sbt runMain` invocation.
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
Compile / run / outputStrategy := Some(OutputStrategy.StdoutOutput)
showSuccess := false
// Both keys above ARE consumed (verified: forked runMain stdout is raw
// and no "[success]" banner prints) — sbt's unused-key lint just can't
// see through command-level consumption.
Global / excludeLintKeys ++= Set(run / outputStrategy, showSuccess)
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
  // Shuffle files are reclaimed by the ContextCleaner only when the
  // owning RDDs are GC'd; a big heap GCs so rarely that a multi-query
  // run (Bench at a scale leg) accumulates every finished query's
  // shuffle on disk. Spark's own periodicGC conf is the lever —
  // default stays Spark's 30min; scale legs set SPARK_CLEANER_GC=2min.
  s"-Dspark.cleaner.periodicGC.interval=${
    sys.env.getOrElse("SPARK_CLEANER_GC", "30min")}",
)
