package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up outside the timed region: JVM/codegen/parquet-footer
    // costs land here instead of inflating the alphabetically-first query
    spark.range(1000).selectExpr("sum(id)").collect()
    try spark.read.parquet(s"$sfDir/region.parquet").count()
    catch { case _: Throwable => () }
    // substring filter for local iteration: SPARK_GRAFT_ONLY=ngram sbt 'runMain graft.Bench'
    val only = sys.env.get("SPARK_GRAFT_ONLY")
    // Timed runs per query after one untimed warm run; the reported value is the
    // median, so a transient background-load spike on this shared machine cannot
    // poison a query's official number (single cold runs did exactly that in r4).
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "3").toInt.max(1)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(n.contains) }
      // *_property companions are correctness gates that re-run their
      // underlying operator plus a brute-force comparator — no perf signal
      // beyond the operator queries already timed here
      .filterNot { case (n, _) => n.endsWith("_property") }
    var failures = 0
    val results = selected.map { case (name, fn) =>
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); Some((System.nanoTime() - t0) / 1e9) }
        catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            None
        }
      }
      val warm = once()
      val sec =
        if (warm.isEmpty) { failures += 1; 0.0 }
        else {
          val timed = (1 to runs).flatMap(_ => once())
          if (timed.isEmpty) { failures += 1; warm.get }
          else timed.sorted.apply(timed.size / 2) // median (upper for even n)
        }
      System.err.println(f"[bench] $name%-32s $sec%8.2f s")
      name -> sec
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}""")
    if (failures > 0) System.err.println(s"[bench] $failures queries FAILED")
    spark.stop()
  }
}
