package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterEach
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM-wide session, ScalaTest
  * reuses it across suites via getOrCreate). Each test drains the
  * CacheScope afterwards — the session-owner side of the operator cache
  * contract, and what keeps suites from pinning each other's blocks. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterEach {
  lazy val spark: SparkSession = graft.core.Sessions.local(cores = 4)
  val sfDir = "/root/testdata/sf0.001"

  override protected def afterEach(): Unit = {
    graft.core.CacheScope.drain()
    super.afterEach()
  }
}
