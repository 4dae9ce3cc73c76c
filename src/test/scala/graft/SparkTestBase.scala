package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for specs. */
object SparkTestBase {
  lazy val spark: SparkSession = {
    val b = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
    Tables.sessionConfigs.foreach { case (k, v) => b.config(k, v) }
    b.getOrCreate()
  }
}

abstract class SparkTestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkTestBase.spark

  def sfDir: String = "/root/testdata/sf0.001"

  def table(name: String): org.apache.spark.sql.DataFrame =
    Tables.read(spark, sfDir, name)

  /** Run a Graft query against the testdata tables, evaluating embedded tests. */
  def wv(text: String): org.apache.spark.sql.DataFrame =
    Graft.run(spark, text, name => table(name))

  override def afterAll(): Unit = { /* keep session for other suites */ }
}
