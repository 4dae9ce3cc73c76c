package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: wv-path construction split (parse vs lower vs count) for
  * a TPC-H corpus file and a catalog wv query. (optimization r18; safe to
  * delete) */
object ProbeWv {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    Tables.sessionConfigs.foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[wv] $label%-30s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    val tpchDir = "/root/reference/spec/tpch"
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$tpchDir/q21.wv")))
    // warm
    graft.catalog.QueryCatalog.queries("q_tpch21")(spark, "/root/testdata/sf0.1").count()
    (1 to 3).foreach { i =>
      println(s"--- round $i ---")
      val stmts = t("parse q21.wv")(graft.lang.Parser.parseStatements(text))
      val ctx = graft.lang.Lowering.Context(spark,
        name => Tables.readPath(spark, s"$tpchDir/data/$name.parquet"), "")
      val df = t("lower q21.wv")(graft.lang.Lowering.lowerStatements(stmts, ctx).get)
      t("count q21")(df.count())
      t("full q_tpch21 fn+count")(
        graft.catalog.QueryCatalog.queries("q_tpch21")(spark, "/root/testdata/sf0.1").count())
    }
    spark.stop()
  }
}
