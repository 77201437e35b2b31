package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local session for all suites (one JVM-wide session — Spark startup
  * dominates test wall-clock otherwise). */
object SparkSpec {
  lazy val spark: SparkSession = Engine.session(
    master = "local[4]", shufflePartitions = 4, appName = "graft-test")
}

trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.spark
  lazy val sf001 = "/root/testdata/sf0.001"
  lazy val sf01 = "/root/testdata/sf0.01"
}
