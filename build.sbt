ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "financialtransactionmonitoringsystemspark"
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
// Forked run output goes straight to stdout (no "[info] " decoration)
// so harnesses that parse Bench/Verify's single JSON line get bare JSON.
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
)
// ---- Test-suite wall-clock (round 12): run suites in PARALLEL forked
// JVMs instead of one sequential fork. The suites share a JVM-wide
// SparkSession and several set/restore session confs (replay partition
// pins, RocksDB provider pins, ScaleSpec conf sweeps), so in-JVM suite
// parallelism would race those; separate JVMs make each group's session
// private. Grouping: each of the four slow suites (ScaleSpec 642 s,
// PropertiesSpec 303 s, StreamingSpec 271 s, OperatorsSpec 250 s,
// measured sequentially at HEAD~) gets its own JVM; the five fast ones
// (≤ 58 s each) share a fifth. Sequential wall ~26 min → max-group
// ~11 min. Memory: 5 forks × 8g heap ≪ the 128 GiB host; each fork is
// local[4], so 5 groups ≈ 20 cores.
Test / testGrouping := {
  val tests = (Test / definedTests).value
  val forkOpts = ForkOptions()
    .withRunJVMOptions((Test / javaOptions).value.toVector)
    .withWorkingDirectory(Option((Test / baseDirectory).value))
    .withEnvVars(sys.env.toMap)
  val solo = Set("graft.ScaleSpec", "graft.PropertiesSpec",
    "graft.StreamingSpec", "graft.OperatorsSpec")
  val (big, rest) = tests.partition(t => solo.contains(t.name))
  big.map(t => Tests.Group(t.name, Seq(t), Tests.SubProcess(forkOpts))) :+
    Tests.Group("fast", rest, Tests.SubProcess(forkOpts))
}
// sbt's default limit is 1 concurrent forked test group; allow all 5.
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, 5),
  Tags.limitAll(java.lang.Runtime.getRuntime.availableProcessors()),
)
