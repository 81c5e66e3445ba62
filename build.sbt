ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "airflowjiraetlspark"
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
// forward the forked run's stdout verbatim (no "[info] " decoration) so the
// driver's JSON-line parser sees Bench's bare {"metric":...} line
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)

// r22: shard the 69 Spark-bound suites into duration-balanced forked JVM
// groups so the ~20-minute serial tail fits the driver's test budget
// (VERIFY_r21 tests_ok:false was a budget kill, not a red test). Weights =
// measured wall seconds from the r22 profiling run (/tmp/test_r22_profile);
// unlisted suites default small. Suites within a group still run serially
// in ONE JVM (testForkedParallel stays false), so specs that mutate
// session conf remain correct; cross-JVM isolation comes from per-group
// tmp, warehouse and derby dirs.
val testGroupCount = 6
val testSuiteSecs: Map[String, Int] = Map(
  "graft.GraphIterSpec" -> 168,
  "graft.ComponentsSpec" -> 157,
  "graft.OracleContractSpec" -> 109,
  "graft.PlanGuardSpec" -> 86,
  "graft.BpeSpec" -> 60,
  "graft.StreamingSpec" -> 58,
  "graft.StatPropertySpec" -> 58,
  "graft.PqSpec" -> 57,
  "graft.DedupSpec" -> 43,
  "graft.StatOpsSpec" -> 41,
  "graft.SimilaritySpec" -> 37,
  "graft.GoldenHashSpec" -> 23,
  "graft.HostileDataSpec" -> 22,
  "graft.TextFnsSpec" -> 20,
  "graft.EmptyInputSpec" -> 20,
  "graft.ItemsetsSpec" -> 17,
  "graft.SamplingSpec" -> 16,
  "graft.LshIndexSpec" -> 16,
  "graft.DriftStateSpec" -> 16,
  "graft.RankPropertySpec" -> 15,
  "graft.FilteredAnnSpec" -> 14,
  "graft.CheckpointModeSpec" -> 14,
  "graft.PackingSpec" -> 12,
)
Test / testGrouping := {
  val opts = (Test / javaOptions).value.toVector
  val binTests = Array.fill(testGroupCount)(Vector.empty[TestDefinition])
  val binSecs = Array.fill(testGroupCount)(0)
  (Test / definedTests).value
    .sortBy(t => -testSuiteSecs.getOrElse(t.name, 5))
    .foreach { t =>
      val i = binSecs.indices.minBy(binSecs)
      binTests(i) :+= t
      binSecs(i) += testSuiteSecs.getOrElse(t.name, 5)
    }
  binTests.toSeq.zipWithIndex.filter(_._1.nonEmpty).map { case (ts, i) =>
    val root = file(s"/tmp/graft-test-g$i")
    IO.createDirectories(Seq(root / "tmp", root / "derby"))
    Tests.Group(s"g$i", ts, Tests.SubProcess(ForkOptions()
      .withRunJVMOptions(opts ++ Vector(
        s"-Dgraft.test.warehouse=${(root / "wh").getAbsolutePath}",
        s"-Dderby.system.home=${(root / "derby").getAbsolutePath}",
        s"-Djava.io.tmpdir=${(root / "tmp").getAbsolutePath}"))))
  }
}
Global / concurrentRestrictions := Seq(
  Tags.limitAll(math.max(testGroupCount,
    java.lang.Runtime.getRuntime.availableProcessors)),
  Tags.limit(Tags.ForkedTestGroup, testGroupCount))
