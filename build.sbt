ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "etlairflowspotifyspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // FIXED, PRE-TOUCHED heap (round 20, guide §5): this sandbox serves
  // first-touch page faults at ~0.2-0.5 GB/s (measured: a 20 GB
  // stride-4K first-touch ran 119 s while re-use of touched memory
  // streams at >60 GB/s), and a growable heap re-pays that fault cost
  // every time G1 uncommits after the bench's per-query System.gc()
  // and regrows — allocation-heavy stages (BytesToBytesMap growth in
  // large hash aggregates, sort buffers) measured 6x slow (q233
  // 124-205 s vs its 19-27 s historical band). -Xms=-Xmx stops the
  // uncommit/refault cycle and AlwaysPreTouch pays the fault cost
  // once at JVM start (untimed): q233 back to 20.2-28.1 s min-of-3.
  // Cluster executors are unaffected — sizing stays env-driven.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  "-XX:+AlwaysPreTouch",
  // Whole-stage codegen emits one or more compiled classes per query
  // stage; a 59-query bench (warm-up pass + timed pass) overflows the
  // default 240 MB code cache, and the resulting JIT eviction re-compiles
  // hot loops DURING timed runs (observed: late-alphabet queries timing
  // 2x their steady state while a focused re-run converges back).
  "-XX:ReservedCodeCacheSize=1g",
)
