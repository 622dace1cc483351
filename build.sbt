ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rustruuvitagetlspark"
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
// The driver parses Bench's single JSON stdout line. sbt's default
// LoggedOutput strategy prefixes every forked-process line with
// "[info] ", which breaks that parse (BENCH_r02 recorded parsed:null).
// StdoutOutput passes the child's stdout/stderr through verbatim.
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
// SF-aware default heap: local[32] hosts every executor's shuffle/agg
// state in the one driver JVM, and the sf10 decade-step estate OOM'd
// the flat 8g default (round 13, d13) — a harness ceiling, not an
// operator defect. Scale the DEFAULT with the estate being benched so
// decade steps don't false-fail; an explicit SPARK_DRIVER_MEM always
// wins. (Floors measured round 13: sf≤0.1 fine at 8g, sf1 at 24g,
// sf10 needs 64g.)
val sfDefaultMem = sys.env.get("SPARK_GRAFT_SF_DIR") match {
  case Some(d) if d.replaceAll("/+$", "").endsWith("sf100") => "96g"
  case Some(d) if d.replaceAll("/+$", "").endsWith("sf10")  => "64g"
  case Some(d) if d.replaceAll("/+$", "").endsWith("sf1")   => "24g"
  case _                                                    => "8g"
}
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", sfDefaultMem)}",
)
