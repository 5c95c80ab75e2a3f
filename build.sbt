ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hadithvectorsearchspark"
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
// The round driver keeps only a 2000-char stdout tail of `runMain
// graft.Bench` and parses the LAST complete JSON line in it. sbt's
// trailing "[success] Total time: …" line (~75 chars) would otherwise
// land after Bench's final compact artifact line and eat its budget.
Global / showSuccess := false
Global / excludeLintKeys += showSuccess
// Forward the forked run JVM's streams raw instead of through sbt's
// log decoration ("[info] " on stdout, "[error] " on stderr): Bench's
// final artifact line must fit the driver's 2000-char STDOUT tail
// whole, and 7 chars/line of decoration is budget. NOTE this strategy
// forwards BOTH streams undecorated — Spark logs arrive on stderr as
// bare INFO/WARN lines (they stay on the stderr fd, so they cannot
// land in a stdout-only tail capture).
run / outputStrategy := Some(StdoutOutput)
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
  // this host sees multi-minute CPU-starvation bursts (shared box): with
  // the default 10s heartbeat × 60 failures, a ~10-min burst kills the
  // in-JVM executor and the SparkContext with it, failing every later
  // test in that fork. 60s × 60 tolerates an hour of bursts.
  "-Dspark.executor.heartbeatInterval=60s",
  "-Dspark.network.timeout=1200s",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// ── parallel test groups ──────────────────────────────────────────────
// The three heaviest suites (streaming trigger waits, engine e2e,
// iterative CC) plus the golden-query suite each get their OWN forked
// JVM — and therefore their own SparkSession, so DedupSpec's global
// unpersist sweep and any session-conf writes stay isolated — running
// CONCURRENTLY with the rest. Cuts suite wall time to ~max(heavy suite)
// instead of the sum; sbt's default ForkedTestGroup limit of 1 must be
// raised for the groups to actually overlap.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val opts = (Test / javaOptions).value.toVector
  val heavy = Seq("graft.StreamsSpec", "graft.GraftEngineSpec",
    "graft.DedupSpec", "graft.GoldenQueriesSpec", "graft.ResidentSearchSpec")
  def group(name: String, sel: sbt.TestDefinition => Boolean) =
    Tests.Group(name, tests.filter(sel),
      Tests.SubProcess(ForkOptions().withRunJVMOptions(opts)))
  heavy.map(h => group(h, _.name == h)) :+
    group("rest", t => !heavy.contains(t.name))
}
// 3 concurrent forked groups, not 5: each is a local[4] Spark JVM, and
// on this contended box five of them starve each other's heartbeats
// (observed: executor self-exit after 10 min without a heartbeat ack)
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 3), Tags.limitAll(6))
