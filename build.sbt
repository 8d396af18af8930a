ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hivespark"
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// Driver bench contract (r17 verdict item 2): the bench's one-line JSON must
// reach stdout BARE — sbt's default LoggedOutput echoes forked-process stdout
// through its logger as "[info] <line>", which the driver's JSON parser never
// consumed (BENCH_r12–r17 all have parsed:null). StdoutOutput passes the
// forked JVM's stdout/stderr through unchanged, so the contract line is the
// last unprefixed stdout line.
outputStrategy := Some(StdoutOutput)
// r18 (verdict item 4): the driver's `sbt test` gate died with the shared
// SparkContext stopped by a shutdown hook mid-suite — the test JVM was being
// torn down at ~33 min wall, right at a typical runner timeout. Split the
// 130 suites across forked JVMs run in parallel (each gets its own
// SparkSpec session, local[8], and its own temp warehouse dir — no shared
// mutable state crosses suites beyond the read-only testdata). Wall time
// drops ~linearly with the group count; suites inside a group stay
// sequential, so per-suite determinism is unchanged.
val testJvmCount = sys.env.getOrElse("SPARK_GRAFT_TEST_JVMS", "4").toInt
// Known long-pole suites get a JVM to themselves — round-robin striping
// alone leaves the group containing them as the wall-clock floor.
val heavySuites = Set("graft.plans.DsPlanSpec")
Test / testGrouping := {
  val tests = (Test / definedTests).value.sortBy(_.name)
  val opts = (Test / javaOptions).value.toVector
  def sub = Tests.SubProcess(ForkOptions().withRunJVMOptions(opts))
  val (heavy, rest) = tests.partition(t => heavySuites.contains(t.name))
  heavy.map(t => Tests.Group(t.name, Seq(t), sub)) ++
    rest.zipWithIndex.groupBy(_._2 % testJvmCount).toSeq.sortBy(_._1).map {
      case (i, group) => Tests.Group(s"jvm-$i", group.map(_._1), sub)
    }
}
Global / concurrentRestrictions := Seq(
  Tags.limit(Tags.ForkedTestGroup, testJvmCount),
  Tags.limitAll(math.max(8, testJvmCount)))
