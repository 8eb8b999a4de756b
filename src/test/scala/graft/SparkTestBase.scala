package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One shared local session per suite (lazy, reused across suites within the
  * forked test JVM via getOrCreate).
  */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-test")
      // the ENGINE's extensions (nanos pushdown rule + graft_* functions):
      // specs must exercise the planner users get from GraftSession, or
      // plan-shape assertions drift from production (the sweep suites found
      // exactly that — filters unpushed only under the bare test session)
      .withExtensions(graft.plans.GraftExtensions.inject)
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}
