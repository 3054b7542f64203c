ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "usflightbigdatadashboardspark"
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
// The bench/verify contract is "print ONE JSON line to stdout". sbt's
// default LoggedOutput strategy prefixes every forked-process line with
// "[info] ", which breaks any line-oriented JSON parser downstream —
// pass the child's stdio through untouched instead.
outputStrategy := Some(StdoutOutput)
run / outputStrategy := Some(StdoutOutput)
Test / outputStrategy := Some(StdoutOutput)
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Spark's generated code for wide aggregations/joins can exceed the
  // JVM's 8 KB per-method JIT limit; by default such methods silently run
  // in the bytecode interpreter (measured 20-30x slowdowns, and Spark
  // logs "Generated method too long to be JIT compiled"). Lift the limit
  // and give the JIT room — on a cluster the same flags belong in
  // spark.executor.extraJavaOptions.
  "-XX:-DontCompileHugeMethods",
  "-XX:ReservedCodeCacheSize=512m",
  // A 36-query suite generates hundreds of codegen classes; with the
  // default 2-3 C2 compiler threads the compile queue saturates and hot
  // loops run at interpreter/C1 speed for most of a stage. Scale the
  // JIT with the core count.
  "-XX:CICompilerCount=12",
)
