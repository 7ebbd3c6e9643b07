ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "goetlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Deps resolve from the pre-warmed coursier cache; anything else is
// intentionally not resolvable (COURSIER_MODE=offline). duckdb_jdbc is
// the embedded database the upsert gate executes its ON CONFLICT SQL
// against (Derby cannot parse it; DuckDB speaks the Postgres dialect).
libraryDependencies ++= Seq(
  "org.duckdb" % "duckdb_jdbc" % "1.0.0",
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Forked run output goes RAW to stdout (no "[info] " prefix): the
// driver's bench/verify parsers read stdout lines, and the default
// LoggedOutput prefix has made every BENCH artifact unparseable
// (parsed:None in all of r01–r11).
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
  // Deliberately NO -XX:ReservedCodeCacheSize override: the round-15
  // A/B experiment (PLANS.md) measured peak CodeHeap occupancy at
  // 156-164 MB across the full 323-query bench — comfortably inside
  // the JDK-17 default 240 MB, zero sweeping pressure — and a 512m
  // run was flat-to-slightly-slower. The mid-suite cold-query cost is
  // per-query JIT compile time of freshly generated codegen classes
  // (visible in the bench's jit_ms telemetry), which best-of-3
  // absorbs; a bigger cache cannot.
) ++
  // escape hatch for A/B runs (e.g. SPARK_GRAFT_EXTRA_JAVA_OPTS=
  // "-XX:ReservedCodeCacheSize=240m" to reproduce the default)
  sys.env.get("SPARK_GRAFT_EXTRA_JAVA_OPTS").toSeq
    .flatMap(_.trim.split("\\s+").toSeq.filter(_.nonEmpty))
