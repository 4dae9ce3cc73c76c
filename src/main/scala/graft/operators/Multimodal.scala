package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads travel as opaque
  * `binary` columns next to a typed metadata struct — the layout a 100 TB
  * multimodal training corpus uses (one row per asset, parquet binary
  * column, partition-parallel decode).
  *
  * The decode/feature kernels are STUBS — this container ships no
  * image/audio codecs, so `decodeImageStub` synthesizes deterministic fake
  * pixels from the bytes. Everything around the stub is real: the schema
  * contract, the mapPartitions batch shape (the Scala analogue of a Pandas
  * UDF over mapInPandas), and the partition sizing.
  */
object Multimodal {

  /** Metadata schema carried beside every binary media column. */
  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("media_type", StringType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_bytes", LongType),
    StructField("sha", StringType)
  ))

  /** Wrap a text/binary column as a media asset: payload + derived metadata.
    * Pure column expressions — metadata extraction costs one scan. */
  def asMediaColumn(payload: Column, mediaType: String): Column = {
    val bin = payload.cast("binary")
    F.struct(
      F.lit(mediaType).as("media_type"),
      F.lit(null).cast("int").as("width"),
      F.lit(null).cast("int").as("height"),
      F.length(bin).cast("long").as("n_bytes"),
      F.sha2(bin, 256).as("sha")
    )
  }

  /** Deterministic fake "decode": 8 grayscale features from the payload
    * bytes (byte histogram buckets, normalized). STUB — replace the body
    * with a real codec (e.g. javax.imageio / ffmpeg bindings) in production;
    * the signature and plan shape stay identical. Columnar, no UDF. */
  def decodeImageStub(payload: Column, features: Int = 8): Column = {
    val bin = payload.cast("binary")
    val n = F.length(bin)
    F.transform(
      F.sequence(F.lit(1), F.lit(features)),
      i => F.when(n === 0, 0.0).otherwise(
        F.pmod(F.xxhash64(bin, i), F.lit(256L)).cast("double") / 255.0)
    )
  }

  /** Frame sampling plan for video payloads: returns (asset row × frame_idx)
    * for every `stride`-th frame up to `maxFrames` — the explode pattern that
    * precedes per-frame decode at scale. Frame count is metadata-driven
    * (fps × duration), here stubbed from payload size. */
  def sampleFrames(df: DataFrame, payloadCol: String, stride: Int = 10, maxFrames: Int = 8): DataFrame = {
    val frameCount = F.least(
      F.floor(F.length(F.col(payloadCol).cast("binary")) / 1024) + 1,
      F.lit(maxFrames.toLong * stride))
    df.withColumn(
      "frame_idx",
      F.explode(F.sequence(F.lit(0), ((frameCount - 1) / stride).cast("int")) )
    ).withColumn("frame_idx", F.col("frame_idx") * stride)
  }

  /** Batched partition-parallel transform — the Scala analogue of a Pandas
    * UDF over `mapInPandas`: the kernel sees an iterator of rows per
    * partition and can amortize codec/model setup across the batch.
    *
    * The partitioning contract matters at 100 TB: repartition to
    * `targetPartitions` first so each kernel invocation gets a bounded,
    * uniform slice (binary payloads make default file-split sizing wrong).
    */
  def mapMediaPartitions(
      df: DataFrame,
      targetPartitions: Int
  )(kernel: Iterator[Row] => Iterator[Row], outSchema: StructType): DataFrame = {
    val spark = df.sparkSession
    val repartitioned = if (targetPartitions > 0) df.repartition(targetPartitions) else df
    val rdd = repartitioned.rdd.mapPartitions(kernel)
    spark.createDataFrame(rdd, outSchema)
  }
}
