package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for specs (small parallelism — unit tests are
  * about semantics, not throughput).
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // sharded test groups (build.sbt) each fork their own JVM; give each
    // its own warehouse so saveAsTable suites cannot collide across JVMs
    .config("spark.sql.warehouse.dir",
      sys.props.getOrElse("graft.test.warehouse", "spark-warehouse"))
    .getOrCreate()

  override def afterAll(): Unit = {
    // keep the session for sibling suites (same JVM, forked once)
    super.afterAll()
  }

  def fixture(name: String): String =
    getClass.getResource(s"/fixtures/$name").toString
}
