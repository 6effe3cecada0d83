ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "lucenesolrspark"
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
// The driver parses graft.Bench's single JSON stdout line; sbt's default
// LoggedOutput wraps forked stdout in "[info] " (and stderr in "[error] "),
// which broke the parse in every prior round (BENCH_r*.json "parsed": null).
// StdoutOutput forwards the child's streams verbatim.
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
  // This sandbox VM faults anonymous pages ~500x slower than normal
  // (measured: 2 min wall / 43 min sys to first-touch 8 GB), so every fresh
  // heap page costs. Mitigations: (a) THP madvise -> 512x fewer faults,
  // (b) a FIXED heap (Xms == Xmx) so G1 recycles already-faulted pages,
  // (c) AlwaysPreTouch: fault the WHOLE heap once at JVM startup instead of
  //     lazily mid-workload. Round-3 isolation runs proved lazy heap
  //     faulting was the dominant "burst" mechanism: the 1.6M-doc build at
  //     local[32]@48g ran 219-278s lazily vs 59.7s pre-touched (3.7x), with
  //     the encode stage collapsing 137.6s -> 10.9s (BASELINE.md round-3
  //     postmortem). With THP the pre-touch itself uses 2 MB pages and
  //     completes in seconds-to-a-minute; an earlier 14-min pre-touch
  //     reading was taken in a degraded window and is the exception, not
  //     the rule — and the faults are paid either way, so eager is strictly
  //     better for anything measured.
  // 48g default (was 16g): at local[32] a 16 GB heap is GC-bound — the
  // 400k-doc build measured 96.5s @16g vs 29.6s @48g (BASELINE.md round 3).
  // Executor memory must scale with executor cores; Xms==Xmx still avoids
  // lazy heap growth, and G1 only faults pages actually used, so small
  // test runs don't pay for the larger reservation.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  "-XX:+UseTransparentHugePages",
  "-XX:+AlwaysPreTouch",
)
