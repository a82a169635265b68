ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "opencepspark"
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
// Forked run output goes straight to stdout/stderr (no "[info] " log prefix) so the
// driver's bench parser can read graft.Bench's single JSON metric line.
Compile / run / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Pin the heap and back it with THP: this sandbox VM intermittently services
  // anonymous memory ops at ~40 us of kernel time each (host-side pathology — observed
  // as stime 3x utime turning a 6 s engine micro into 12+ min). Xms=Xmx stops G1
  // uncommit/recommit churn (pages fault in ONCE) and 2 MB pages cut the fault count
  // 512x. AlwaysPreTouch was tried and rejected: on the sick host the eager pre-touch
  // itself ran at ~500 MB/s of pure kernel time — a multi-minute tax on every fork.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  "-XX:+UseTransparentHugePages",
)
