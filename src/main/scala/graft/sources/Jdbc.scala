package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** JDBC source/sink — the Spark-native analogue of the reference's
  * connector layer (reference wvlet-connector/src/main/scala/wvlet/lang/
  * connector/DBConnector.scala: pooled JDBC connections + JDBCCodec.scala
  * row decoding; concrete engines duckdb/DuckDBConnector.scala,
  * trino/TrinoConnector.scala). Same WHAT, different HOW: the reference
  * SHIPS generated SQL to the remote engine and decodes JDBC rows itself;
  * here the remote database is just another Spark data source —
  * `spark.read.jdbc` handles type mapping, and Catalyst pushes filters and
  * column pruning into the remote query (the `PushedFilters` a remote scan
  * shows in `.explain` are executed by the database, not Spark).
  *
  * Scale posture: an unpartitioned JDBC read is ONE connection streaming
  * the whole table through one task — fine for dimension tables, wrong for
  * facts. [[readPartitioned]] is the 100 TB path: `numPartitions` tasks
  * each issue a bounded-range query (`WHERE col >= lo AND col < hi`), so
  * ingest parallelism and per-task memory are both explicit. Bounds are
  * caller-provided, not probed — a min/max probe would serialize on the
  * database before the parallel read even starts.
  */
object Jdbc {

  /** Single-stream read of a table (or a `(subquery) alias`). */
  def read(
      spark: SparkSession,
      url: String,
      table: String,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  /** Range-partitioned parallel read: `numPartitions` concurrent bounded
    * queries over `[lower, upper)` strides of a numeric `partitionCol`. */
  def readPartitioned(
      spark: SparkSession,
      url: String,
      table: String,
      partitionCol: String,
      numPartitions: Int,
      lower: Long,
      upper: Long,
      options: Map[String, String] = Map.empty
  ): DataFrame = {
    var r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionCol)
      .option("numPartitions", numPartitions.toString)
      .option("lowerBound", lower.toString)
      .option("upperBound", upper.toString)
    options.foreach { case (k, v) => r = r.option(k, v) }
    r.load()
  }

  /** Append/overwrite a DataFrame into a database table. */
  def write(
      df: DataFrame,
      url: String,
      table: String,
      append: Boolean = false,
      options: Map[String, String] = Map.empty
  ): Unit = {
    var w = df.write.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .mode(if (append) SaveMode.Append else SaveMode.Overwrite)
    options.foreach { case (k, v) => w = w.option(k, v) }
    w.save()
  }
}
