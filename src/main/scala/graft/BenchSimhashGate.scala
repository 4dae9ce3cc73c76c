package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}

/** Empirical probe for the simhash dense-path gate (Dedup.simhashPairs
  * `denseSigLimit`): times BOTH paths — dense broadcast-signature (D²/2
  * bit_count comparisons) and banded chunk-pair blocking — on corpora whose
  * DISTINCT-signature count D is swept up to and past the gate, by
  * replicating the documents table with per-replica token prefixes (each
  * replica lands on fresh signatures, so D scales ~linearly; same
  * replication trick as BenchScale, so pair structure stays organic).
  *
  * The gate's crossover is analytical until this runs: the dense path costs
  * D²/2 comparisons spread over the cores, the blocked path a posting
  * shuffle linear in n with a larger constant. This prints per-D timings
  * and the implied dense comparison throughput so the default limit is a
  * measured number, not a guess → BENCH_SIMHASH_GATE.json.
  *
  * Usage: `sbt 'runMain graft.BenchSimhashGate [baseDir] [replicasCsv]'`
  * (defaults: /root/testdata/sf0.1, replicas 4,13,26 ≈ D 20k/65k/130k).
  */
object BenchSimhashGate {

  def main(args: Array[String]): Unit = {
    val baseDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val replicasList = args.lift(1).getOrElse("4,13,26").split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val (waitedSec, gaveUp) = BenchGuard.waitUntilQuiet()
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = Tables.read(spark, baseDir, "documents").select("doc_id", "text")
    val span = base.agg(F.max("doc_id")).head.getLong(0) + 1

    def scaled(replicas: Int) = (0 until replicas).map { i =>
      base.select(
        (F.col("doc_id") + F.lit(i.toLong * span)).as("doc_id"),
        (if (i == 0) F.col("text")
         else F.regexp_replace(F.col("text"), "(\\w+)", s"zz${i}$$1")).as("text"))
    }.reduce(_ unionByName _)

    def time(body: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      ((System.nanoTime() - t0) / 1e9, n)
    }

    val results = replicasList.map { r =>
      // materialize the corpus once so signature computation isn't retimed
      // per path; localCheckpoint keeps it in block storage
      val corpus = scaled(r).localCheckpoint(true)
      val d = graft.operators.Dedup.simhashPairs(corpus, "doc_id", "text",
        denseSigLimit = Long.MaxValue)  // probe: force dense
      // one untimed warm run per path would double the heavy work; instead
      // warm codegen/JIT once on the base corpus before the sweep (below)
      val (denseSec, densePairs) = time(d.count())
      val b = graft.operators.Dedup.simhashPairs(corpus, "doc_id", "text",
        denseSigLimit = 0L)             // probe: force blocked
      val (blockSec, blockPairs) = time(b.count())
      val nDistinct = graft.operators.Dedup.simhashDistinctSignatures(
        corpus, "doc_id", "text")
      corpus.unpersist(true)
      System.err.println(f"[gate] replicas=$r D=$nDistinct dense=$denseSec%.1fs " +
        f"($densePairs pairs) blocked=$blockSec%.1fs ($blockPairs pairs)")
      (r, nDistinct, denseSec, densePairs, blockSec, blockPairs)
    }
    def s2(v: Double) = f"$v%.2f"
    val rows = results.map { case (r, d, ds, dp, bs, bp) =>
      s"""{"replicas":$r,"distinct_sigs":$d,"dense_sec":${s2(ds)},"dense_pairs":$dp,""" +
        s""""blocked_sec":${s2(bs)},"blocked_pairs":$bp,""" +
        s""""dense_cmp_per_sec":${(d.toDouble * d / 2 / ds).toLong}}"""
    }.mkString("[", ",", "]")
    val json = s"""{"base_dir":"$baseDir","cpus":"$cpus","quiet_wait_sec":$waitedSec,""" +
      s""""quiet_gave_up":$gaveUp,""" +
      s""""default_limit_at_cpus":${graft.operators.Dedup.denseSigLimitFor(cpus.toInt)},""" +
      s""""probes":$rows}"""
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH_SIMHASH_GATE.json"), json)
    println(json)
    spark.stop()
  }
}
