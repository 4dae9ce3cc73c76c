package graft
import org.apache.spark.sql.SparkSession
object Bench {
  /** 1/5/15-min load from /proc/loadavg — recorded with every bench run so
    * a loaded machine can't silently corrupt a round's numbers (r6's 2-5x
    * "regression" on byte-identical code was exactly that). */
  private def loadavg(): String = BenchGuard.loadavg()

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // driver contract: headline queries run at local[32]. The early-round
    // local[4] default predated BenchGuard's quiet-wait; with load gating
    // in place the full machine is the honest configuration (BenchScale
    // already defaults to 32 — this aligns the headline bench with it).
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // wait (bounded) for the machine to go quiet BEFORE any timing —
    // recording loadavg alone let three consecutive rounds ship
    // load-poisoned headline numbers
    val (waitedSec, gaveUp) = BenchGuard.waitUntilQuiet()
    val loadBefore = loadavg()
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
    var sinceGc = 0
    val results = selected.map { case (name, fn) =>
      // bench hygiene: a full GC every 25 queries, OUTSIDE any timed
      // region. Late-suite queries otherwise pay the accumulated heap debt
      // of the ~200 queries before them — r10's q_rollup "regression"
      // (0.28 -> 1.37 s mid-suite, 0.47 s isolated, query text and plan
      // unchanged) was exactly this, not a plan change. See TUNING.md.
      sinceGc += 1
      if (sinceGc >= 25) { sinceGc = 0; System.gc() }
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
      val timed: Seq[Double] =
        if (warm.isEmpty) { failures += 1; Nil }
        else {
          val t = (1 to runs).flatMap(_ => once())
          if (t.isEmpty) failures += 1
          t
        }
      val sec =
        if (timed.nonEmpty) timed.sorted.apply(timed.size / 2) // median (upper for even n)
        else warm.getOrElse(0.0)
      System.err.println(f"[bench] $name%-32s $sec%8.2f s")
      (name, sec, timed)
    }
    val loadAfter = loadavg()
    // stdout contract: ONE short JSON line (the driver tail-captures stdout,
    // so the line is kept small — 3-decimal seconds); the complete artifact
    // with per-run times and load stamps goes to BENCH_DETAIL.json.
    def s3(v: Double): String = f"$v%.3f"
    val total = results.map(_._2).sum
    val detail = {
      val rows = results.map { case (k, v, t) =>
        s""""$k":{"median":${s3(v)},"runs":[${t.map(s3).mkString(",")}]}"""
      }.mkString("{", ",", "}")
      s"""{"metric":"total","value":${s3(total)},"unit":"sec","sf":"$sfDir","cpus":"$cpus",""" +
        s""""runs_per_query":$runs,"loadavg_before":"$loadBefore","loadavg_after":"$loadAfter",""" +
        s""""quiet_wait_sec":$waitedSec,"quiet_gave_up":$gaveUp,""" +
        s""""failures":$failures,"queries":$rows}"""
    }
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_DETAIL.json"), detail)
    catch { case e: Throwable => System.err.println(s"[bench] detail write failed: $e") }
    // totals-only on stdout: the full per-query map made the line ~5 KB,
    // overflowing the driver's stdout tail-capture so BENCH_r{8,9}.json had
    // "parsed": null — per-query medians+runs live in BENCH_DETAIL.json
    println(s"""{"metric":"total","value":${s3(total)},"unit":"sec","n_queries":${results.size},"failures":$failures,"sf":"$sfDir","cpus":$cpus,"load":"$loadBefore;$loadAfter","quiet_wait":"$waitedSec;$gaveUp","detail":"BENCH_DETAIL.json"}""")
    if (failures > 0) System.err.println(s"[bench] $failures queries FAILED")
    spark.stop()
  }
}
