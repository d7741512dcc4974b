package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for suites (one per JVM; Test/fork gives the
  * JDK17 add-opens). */
trait SparkSuiteBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSuiteBase.session
  override def afterAll(): Unit = {} // shared session; never stop per-suite
}

object SparkSuiteBase {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
