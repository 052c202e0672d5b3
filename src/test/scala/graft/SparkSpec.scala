package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for suites. */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session

  override def afterAll(): Unit = () // session is JVM-shared, not stopped per suite
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = graft.Sessions.builder("local[4]", 7)
      .appName("graft-test")
      .getOrCreate()
    graft.expr.GraftFunctions.register(s)
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
