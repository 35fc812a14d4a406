package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Base: one shared local session per suite (see build.sbt Test/fork). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.get("graft-test", "4")
}
