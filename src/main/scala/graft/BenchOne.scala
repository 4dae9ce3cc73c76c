package graft

import org.apache.spark.sql.SparkSession

/** Time a single catalog query (dev utility): BenchOne <name> [sfDir]. */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val (waited, gaveUp) = BenchGuard.waitUntilQuiet()
    if (waited > 0)
      println(s"[benchone] waited ${waited}s for quiet machine (gave_up=$gaveUp)")
    val builder = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.driver.memory", "16g")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val q = graft.catalog.QueryCatalog.queries(name)
    q(spark, dir).count() // warm
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val n = q(spark, dir).count()
      println(f"[benchone] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
    }
    spark.stop()
  }
}
