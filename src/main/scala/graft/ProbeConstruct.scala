package graft

import org.apache.spark.sql.SparkSession

/** Scratch probe: where does TPC-DS query CONSTRUCTION time go?
  * (optimization r18 instrumentation; safe to delete) */
object ProbeConstruct {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"[construct] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    // make sure the star views exist (one-time CTAS cost, untimed here)
    graft.catalog.QueryCatalog.queries("q_tpcds_q3")(spark, dir).count()

    // grab q67's text straight from the catalog runner path
    val q67 = """
SELECT * FROM (
  SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy, s_store_id,
         round(sumsales + 5e-9, 4) AS sumsales,
         rank() OVER (PARTITION BY i_category ORDER BY sumsales DESC, i_product_name, d_year, d_qoy, d_moy, s_store_id) AS rk
  FROM (SELECT i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy, s_store_id,
               sum(coalesce(ss_sales_price * ss_quantity, 0)) AS sumsales
        FROM store_sales, date_dim, store, item
        WHERE ss_sold_date_sk = d_date_sk
          AND ss_item_sk = i_item_sk
          AND ss_store_sk = s_store_sk
          AND d_month_seq BETWEEN 1181 AND 1181 + 11
        GROUP BY ROLLUP (i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy, s_store_id)) dw1) dw2
WHERE rk <= 100
ORDER BY i_category, i_class, i_brand, i_product_name, d_year, d_qoy, d_moy, s_store_id, rk
LIMIT 100
"""
    (1 to 3).foreach { i =>
      println(s"--- round $i ---")
      t("ensureRegistered")(graft.functions.TdFunctions.ensureRegistered(spark))
      t("re-register 10 views") {
        Tables.names.foreach { n =>
          try Tables.read(spark, dir, n).createOrReplaceTempView(n)
          catch { case _: Throwable => () }
        }
      }
      val norm = t("SqlDialect.normalize")(SqlDialect.normalize(spark, q67))
      val df = t("spark.sql (parse+analyze)")(norm.map(spark.sql).last)
      t("count")(df.count())
      t("full sqlScript construct")(Graft.sqlScript(spark, q67, Some(dir)))
    }
    spark.stop()
  }
}
