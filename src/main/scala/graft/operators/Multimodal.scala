package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

/** Multimodal column handling: image/audio/video payloads travel as opaque
  * `binary` columns next to a typed metadata struct — the layout a 100 TB
  * multimodal training corpus uses (one row per asset, parquet binary
  * column, partition-parallel decode).
  *
  * IMAGE decode is REAL: [[decodeImages]] / [[resizeImages]] run
  * javax.imageio (PNG/JPEG/BMP/GIF readers ship inside the JDK — no
  * external codec needed) in a mapPartitions kernel, the one operator
  * family where a Catalyst expression genuinely cannot express the work
  * (an imperative codec) and the partition-batched kernel is the right
  * Spark shape. Audio/video decode remains stubbed (`decodeImageStub`
  * synthesizes deterministic fake features from bytes — no
  * ffmpeg/soundfile in this container); the schema contract, explode-per-
  * frame plan, and partition sizing around it are the real ones.
  */
object Multimodal {

  /** Output schema of [[decodeImages]]: real pixel statistics per asset.
    * `decoded=false` rows (payload not a parseable image) keep NULL stats
    * instead of failing the batch — corrupt assets are data, not errors. */
  def decodedSchema(histBuckets: Int): StructType = StructType(Seq(
    StructField("img_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_lum", DoubleType, nullable = true),
    StructField("lum_hist", ArrayType(DoubleType), nullable = true)
  ))

  /** REAL image decode over a binary column: javax.imageio parses each
    * payload and the kernel computes width/height, mean luminance
    * (unweighted (r+g+b)/3 over [0,1] — closed-form checkable), and a
    * normalized `histBuckets`-bucket luminance histogram. Runs through
    * [[mapMediaPartitions]] so codec setup amortizes per partition and
    * partition sizing is explicit — the Scala analogue of a Pandas UDF
    * over mapInPandas, and the documented pattern for the operator class
    * Catalyst cannot express. */
  def decodeImages(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      histBuckets: Int = 8,
      targetPartitions: Int = 0
  ): DataFrame = {
    val schema = decodedSchema(histBuckets)
    val in = df.select(F.col(idCol).cast("long"), F.col(payloadCol).cast("binary"))
    mapMediaPartitions(in, targetPartitions)({ rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val img =
          if (bytes == null || bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Throwable => null }
        if (img == null) Row(id, false, null, null, null, null)
        else {
          val w = img.getWidth
          val h = img.getHeight
          val hist = new Array[Double](histBuckets)
          var lumSum = 0.0
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = img.getRGB(x, y)
              val lum = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
              lumSum += lum
              val b = math.min(histBuckets - 1, (lum * histBuckets).toInt)
              hist(b) += 1.0
              x += 1
            }
            y += 1
          }
          val n = (w.toLong * h).toDouble
          Row(id, true, w, h, lumSum / n, hist.map(_ / n).toSeq)
        }
      }
    }, schema)
  }

  /** REAL resize: decode (javax.imageio), scale with Graphics2D bilinear
    * interpolation, re-encode as PNG — payloads that fail to decode pass
    * through untouched with `resized=false`. Same kernel shape as
    * [[decodeImages]]. */
  def resizeImages(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      width: Int,
      height: Int,
      targetPartitions: Int = 0
  ): DataFrame = {
    val schema = StructType(Seq(
      StructField("img_id", LongType, nullable = false),
      StructField("resized", BooleanType, nullable = false),
      StructField("png", BinaryType, nullable = true)
    ))
    val in = df.select(F.col(idCol).cast("long"), F.col(payloadCol).cast("binary"))
    mapMediaPartitions(in, targetPartitions)({ rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val img =
          if (bytes == null || bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Throwable => null }
        if (img == null) Row(id, false, bytes)
        else {
          val outImg = new java.awt.image.BufferedImage(
            width, height, java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = outImg.createGraphics()
          g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
            java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
          g.drawImage(img, 0, 0, width, height, null)
          g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(outImg, "png", bos)
          Row(id, true, bos.toByteArray)
        }
      }
    }, schema)
  }

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

  /** Output schema of [[decodeAudio]]. */
  val decodedAudioSchema: StructType = StructType(Seq(
    StructField("audio_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("sample_rate", IntegerType, nullable = true),
    StructField("channels", IntegerType, nullable = true),
    StructField("n_samples", LongType, nullable = true),
    StructField("duration_sec", DoubleType, nullable = true),
    StructField("rms", DoubleType, nullable = true),
    StructField("zero_crossings", LongType, nullable = true)
  ))

  /** REAL audio decode over a binary column: javax.sound.sampled (the
    * JDK's own WAV/AIFF PCM reader — no external codec) parses each
    * payload; the kernel computes sample rate, channel count, sample
    * count, duration, RMS amplitude over [-1, 1] (channel-interleaved
    * samples pooled), and zero-crossing count of the first channel.
    * Non-audio payloads come back `decoded=false` with NULL stats — the
    * same corrupt-asset contract as [[decodeImages]]. 16-bit PCM only
    * (the dominant WAV encoding); other depths report undecoded. */
  def decodeAudio(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      targetPartitions: Int = 0
  ): DataFrame = {
    val in = df.select(F.col(idCol).cast("long"), F.col(payloadCol).cast("binary"))
    mapMediaPartitions(in, targetPartitions)({ rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val parsed =
          if (bytes == null || bytes.isEmpty) None
          else
            try {
              val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
                new java.io.ByteArrayInputStream(bytes))
              val fmt = ais.getFormat
              if (fmt.getSampleSizeInBits != 16) None
              else {
                val data = ais.readAllBytes()
                val le = !fmt.isBigEndian
                val channels = fmt.getChannels
                val total = data.length / 2
                var sumSq = 0.0
                var crossings = 0L
                var prevSign = 0
                var i = 0
                while (i < total) {
                  val lo = data(2 * i) & 0xff
                  val hi = data(2 * i + 1) & 0xff
                  val v = (if (le) (hi << 8) | lo else (lo << 8) | hi).toShort.toInt
                  val s = v / 32768.0
                  sumSq += s * s
                  if (i % channels == 0) { // first channel only
                    val sign = if (v > 0) 1 else if (v < 0) -1 else 0
                    if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
                    if (sign != 0) prevSign = sign
                  }
                  i += 1
                }
                Some((fmt.getSampleRate.toInt, channels, (total / channels).toLong,
                  (total / channels).toDouble / fmt.getSampleRate,
                  math.sqrt(sumSq / math.max(1, total)), crossings))
              }
            } catch { case _: Throwable => None }
        parsed match {
          case Some((rate, ch, n, dur, rms, zc)) =>
            Row(id, true, rate, ch, n, dur, rms, zc)
          case None => Row(id, false, null, null, null, null, null, null)
        }
      }
    }, decodedAudioSchema)
  }

  /** Deterministic fake "decode": 8 grayscale features from the payload
    * bytes (byte histogram buckets, normalized). STUB for payloads with no
    * in-JVM codec (video — no ffmpeg in this container); IMAGES and WAV
    * AUDIO have real paths, [[decodeImages]] / [[decodeAudio]]. The stub
    * stays columnar (no UDF) so the surrounding plan shape matches the
    * real kernel's. */
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
