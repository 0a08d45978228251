ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hpatjlspark"
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
// Pass forked-run output straight through (no "[info] " prefix) so the
// one-line JSON emitted by graft.Bench is machine-parseable from stdout.
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  // Fixed-size, pre-touched heap — the layout a production executor
  // runs with. With only -Xmx, G1 starts small, UNCOMMITS after every
  // full GC (the bench issues System.gc() per query), and re-expands
  // under load; the expansion pages are faulted+zeroed INSIDE running
  // tasks and GC pauses. GC-log-instrumented probe laps (r8, x100
  // fixture, 64 GiB heap) attributed the episodic 3-10x in-task CPU
  // inflation r7's StallDiag found to exactly this: young pauses of up
  // to 5 s while the committed heap grew 7.5G->65G, task CPU 1877 s vs
  // 181 s for identical work. With -Xms=-Xmx + AlwaysPreTouch the same
  // laps: worst pause 0.37 s, task CPU <= 412 s, no stalls. Startup
  // pays one untimed pre-touch pass.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
  "-XX:+AlwaysPreTouch",
) ++
  // Extra JVM flags for GC/diagnostic experiments (e.g.
  // SPARK_GRAFT_JAVA_OPTS="-XX:+UseG1GC -Xlog:gc"); empty by default.
  sys.env.get("SPARK_GRAFT_JAVA_OPTS")
    .map(_.split("\\s+").toSeq.filter(_.nonEmpty)).getOrElse(Seq.empty)
