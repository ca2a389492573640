package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base: one shared local SparkSession across all suites (cheap tests). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local(4)
  val sf: String = "/root/testdata/sf0.001"
}
