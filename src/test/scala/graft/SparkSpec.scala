package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared test base: one lazy SparkSession per suite, deterministic config. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = Sessions.local("graft-test", cores = 4)
  def sf(dir: String): String = s"/root/testdata/$dir"
}
