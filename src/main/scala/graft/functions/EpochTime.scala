package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

/** Timezone-robust epoch conversions.
  *
  * Parquet timestamps may arrive as TIMESTAMP (LTZ, UTC-annotated) or as
  * TIMESTAMP_NTZ (no UTC annotation — Spark 4 infers NTZ for naive
  * parquet `timestamp[us]`). Spark's `unix_micros`/`unix_millis` accept
  * only LTZ and throw `DATATYPE_MISMATCH` on NTZ, whereas the reference
  * engine delegates coercion to DuckDB which freely mixes naive/aware
  * timestamps (reference wvlet-lang model/DataType.scala:393-415). We own
  * that coercion here: every epoch path casts to LTZ first. Under the
  * pinned UTC session timezone the NTZ→LTZ cast is the identity instant
  * mapping, and for LTZ input the cast is a no-op — so oracle arithmetic
  * (DuckDB `epoch_ms(ts)::BIGINT`) stays bit-identical for both flavors.
  */
object EpochTime {

  /** `unix_micros` tolerant of TIMESTAMP_NTZ (and DATE/STRING) input. */
  def unixMicros(c: Column): Column = F.unix_micros(c.cast("timestamp"))

  /** `unix_millis` tolerant of TIMESTAMP_NTZ input. */
  def unixMillis(c: Column): Column = F.unix_millis(c.cast("timestamp"))

  /** Epoch-millis as BIGINT, floor(micros/1000) — matches the DuckDB
    * oracles' `epoch_ms(ts)::BIGINT` exactly (floor, not truncate, so
    * pre-1970 sub-millisecond timestamps agree too). */
  def epochMs(c: Column): Column =
    F.floor(unixMicros(c) / F.lit(1000)).cast("long")

  /** Rewrite `tsCol` to LTZ if (and only if) it is TIMESTAMP_NTZ — used at
    * streaming entry points BEFORE `withWatermark`, because the watermark /
    * event-time-timeout machinery and the java.sql.Timestamp encoder want
    * an LTZ attribute, and casting after the watermark is set would drop
    * the event-time metadata. No-op (no extra projection) on LTZ input. */
  def normalizeTs(df: org.apache.spark.sql.DataFrame, tsCol: String): org.apache.spark.sql.DataFrame =
    df.schema.fields.find(f =>
      f.name.equalsIgnoreCase(tsCol) &&
        f.dataType == org.apache.spark.sql.types.TimestampNTZType) match {
      case Some(f) => df.withColumn(f.name, F.col(f.name).cast("timestamp"))
      case None => df
    }
}
