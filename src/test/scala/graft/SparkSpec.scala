package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session, ScalaTest
  * reuses it across suites via getOrCreate). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = graft.core.Sessions.local(cores = 4)
  val sfDir = "/root/testdata/sf0.001"
}
