package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs. One session per suite (lazy). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.local(threads = 8, appName = suiteName)
  val sf: String = "/root/testdata/sf0.001"
}
