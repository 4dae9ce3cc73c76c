package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/** Resolver for the driver-generated TPC-H-ish testdata directory
  * (TESTDATA.md): `region nation customer supplier part orders lineitem
  * events documents embeddings`, one parquet per table.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** SparkSession configs needed to read the testdata (events.parquet uses
    * nanosecond timestamps, which Spark only reads as long). */
  def sessionConfigs: Map[String, String] = Map(
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    "spark.sql.session.timeZone" -> "UTC",
    "spark.sql.parquet.filterPushdown" -> "true",
    // ANSI double-quoted identifiers in raw SQL ("id" = identifier, not
    // string) — the flow language has its own scanner, this only affects
    // the sql"…" escape hatch and the SQL front-end
    "spark.sql.ansi.doubleQuotedIdentifiers" -> "true"
  )

  /** Read a table from `dir`, normalizing types (nanos → microsecond
    * timestamp, matching DuckDB's microsecond truncation of the same files). */
  def read(spark: SparkSession, dir: String, name: String): DataFrame = {
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events" || df.schema.exists(f => f.name == "ts" && f.dataType.typeName == "long")) {
      df.schema.find(_.name == "ts") match {
        case Some(f) if f.dataType.typeName == "long" =>
          // integral div: `/` would promote to double, and ns epoch values
          // (~1.7e18) exceed double's 2^53 exact range — off-by-1µs vs DuckDB
          df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        case _ => df
      }
    } else df
  }

  def resolver(spark: SparkSession, dir: String): String => DataFrame =
    name => read(spark, dir, name)
}
