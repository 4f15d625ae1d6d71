ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "gcp_dataengineeringspark"
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
// Forked mains write straight to stdout, no sbt "[info] " prefix — so the
// driver's bench harness can parse graft.Bench's one-line JSON directly.
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
  // local[32] means 32 executor threads share this one heap: unified
  // memory (execution + MEMORY_AND_DISK storage) is 0.6·(Xmx−300M), so at
  // 8g the 32 tasks get ~140 MB each and the exploded-index operators
  // (q21/q72/q75) spill + GC-thrash. 48g on the 128 GiB box gives each
  // task the ~900 MB a real executor core would have.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++ sys.env.get("SPARK_GRAFT_JVM_EXTRA").toSeq.flatMap(_.split(" "))
