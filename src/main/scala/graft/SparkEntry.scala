package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + BASELINE.json.
  * The operator inventory lives in [[graft.catalog.QueryCatalog]]; each entry
  * is one operator family from SURVEY §2 (or an LLM-pipeline operator), with
  * matching DuckDB oracle SQL where the semantics are engine-portable.
  */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001: the 5-way star join + agg
    * (TPC-H Q5 shape), compiled from flow-language text by Graft. */
  def entry(spark: SparkSession): DataFrame =
    catalog.QueryCatalog.queries("q_join_multi")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.QueryCatalog.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for ops whose hashing/sampling is
    * engine-specific (minhash/simhash/LSH/sample) → rows-only check. */
  def oracleSql: Map[String, String] =
    catalog.QueryCatalog.oracleSql
}
