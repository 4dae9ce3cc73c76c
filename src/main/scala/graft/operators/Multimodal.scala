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
  val decodedSchema: StructType = StructType(Seq(
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
    val schema = decodedSchema // same shape for any bucket count
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

  /** DCT grid edge for [[phashImages]] (classic pHash: 32×32 luminance →
    * 8×8 low-frequency block). */
  val PhashGrid = 32
  private val PhashBlock = 8

  /** Cosine table for the 32×32 DCT-II, via StrictMath so hashes are
    * BIT-IDENTICAL across JVMs/platforms (Math.cos is allowed to differ
    * by an ulp per platform — enough to flip a threshold bit). */
  private lazy val phashCos: Array[Array[Double]] = {
    val n = PhashGrid
    Array.tabulate(n, n)((u, x) =>
      StrictMath.cos(StrictMath.PI * (2 * x + 1) * u / (2.0 * n)))
  }

  /** Output schema of [[phashImages]]: 63-bit perceptual hash per asset
    * (bit 63 unused); `decoded=false` rows carry a NULL hash. */
  val phashSchema: StructType = StructType(Seq(
    StructField("img_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("phash", LongType, nullable = true)
  ))

  /** Perceptual hash (classic DCT pHash — the LAION-style near-dup-image
    * key) over a binary image column: decode (javax.imageio), area-average
    * to a 32×32 luminance grid, 2D DCT-II, take the 8×8 low-frequency
    * block EXCLUDING the DC term (63 coefficients), threshold each against
    * the block's lower median → one bit per coefficient.
    *
    * Excluding DC and thresholding against the median makes the hash
    * EXACTLY invariant under affine pixel maps v → a·v + b (a > 0):
    * brightness/contrast changes cannot move a bit. Coefficients are
    * normalized by the block's max |coef| and quantized to 1e-4 before
    * the median compare, so the float noise an affine map introduces
    * (≤ ~1e-12 relative) can never flip a bit either; integer-factor
    * rescales reproduce the 32×32 grid exactly and hash identically.
    * A solid image has an all-zero block → hash 0.
    *
    * Same [[mapMediaPartitions]] kernel shape as [[decodeImages]] — the
    * imperative-codec operator class Catalyst cannot express; everything
    * DOWNSTREAM of the hash (banding, candidate join, hamming filter) is
    * codegen'd relational work in [[Dedup.phashPairs]]. */
  def phashImages(
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
        val img =
          if (bytes == null || bytes.isEmpty) null
          else
            try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
            catch { case _: Throwable => null }
        if (img == null) Row(id, false, null)
        else Row(id, true, phashOf(img))
      }
    }, phashSchema)
  }

  /** The hash kernel on a decoded image — exposed for spec-side
    * closed-form checks. */
  private[graft] def phashOf(img: java.awt.image.BufferedImage): Long = {
    val n = PhashGrid
    val w = img.getWidth
    val h = img.getHeight
    // area-average to n×n with integer block boundaries: an exact
    // pixel-doubled rescale averages constant blocks, reproducing the
    // base grid bit-for-bit
    val g = new Array[Double](n * n)
    var y = 0
    while (y < n) {
      val y0 = y * h / n
      val y1 = math.max(y0 + 1, (y + 1) * h / n)
      var x = 0
      while (x < n) {
        val x0 = x * w / n
        val x1 = math.max(x0 + 1, (x + 1) * w / n)
        var s = 0.0
        var yy = y0
        while (yy < math.min(y1, h)) {
          var xx = x0
          while (xx < math.min(x1, w)) {
            val rgb = img.getRGB(xx, yy)
            s += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / 3.0
            xx += 1
          }
          yy += 1
        }
        val cnt = (math.min(y1, h) - y0).toLong * (math.min(x1, w) - x0)
        g(y * n + x) = if (cnt > 0) s / cnt else 0.0
        x += 1
      }
      y += 1
    }
    // a flat grid has ALL AC coefficients mathematically zero, but float
    // cosine sums leave ~1e-13 residue that max-normalization would
    // amplify into noise bits — the grid's dynamic range is the exact,
    // affine-invariant flatness test (0 for any solid image)
    var gmin = g(0)
    var gmax = g(0)
    g.foreach { v => if (v < gmin) gmin = v; if (v > gmax) gmax = v }
    if (gmax == gmin) return 0L
    // 2D DCT-II of the low-frequency block only (8×8 of a 32×32 grid):
    // separable row pass for u < 8, then column pass — O(n²·block)
    val rowPass = new Array[Double](PhashBlock * n) // [u][y]
    var u = 0
    while (u < PhashBlock) {
      var yy = 0
      while (yy < n) {
        var s = 0.0
        var x = 0
        while (x < n) { s += g(yy * n + x) * phashCos(u)(x); x += 1 }
        rowPass(u * n + yy) = s
        yy += 1
      }
      u += 1
    }
    val coefs = new Array[Double](PhashBlock * PhashBlock)
    var v = 0
    while (v < PhashBlock) {
      u = 0
      while (u < PhashBlock) {
        var s = 0.0
        var yy = 0
        while (yy < n) { s += rowPass(u * n + yy) * phashCos(v)(yy); yy += 1 }
        coefs(v * PhashBlock + u) = s
        u += 1
      }
      v += 1
    }
    // 63 AC coefficients (skip DC at index 0): normalize, quantize,
    // threshold against the lower median
    val ac = java.util.Arrays.copyOfRange(coefs, 1, coefs.length)
    var maxAbs = 0.0
    ac.foreach(c => maxAbs = math.max(maxAbs, math.abs(c)))
    if (maxAbs == 0.0) return 0L
    val quant = ac.map(c => math.round(c / maxAbs * 1e4))
    val sorted = quant.clone()
    java.util.Arrays.sort(sorted)
    val med = sorted(31) // lower median of 63
    var hash = 0L
    var i = 0
    while (i < 63) {
      if (quant(i) > med) hash |= 1L << i
      i += 1
    }
    hash
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

  /** Output schema of [[decodeVideoFrames]]: one row per SAMPLED frame. */
  val decodedFrameSchema: StructType = StructType(Seq(
    StructField("video_id", LongType, nullable = false),
    StructField("decoded", BooleanType, nullable = false),
    StructField("n_frames", IntegerType, nullable = true),
    StructField("frame_idx", IntegerType, nullable = true),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("mean_lum", DoubleType, nullable = true)
  ))

  /** Minimal RIFF/AVI frame extraction: walks the chunk tree to the
    * `movi` list and returns the video-stream frame payloads in order —
    * `..dc` chunks (compressed: MJPEG = per-frame JPEG, decodable by
    * javax.imageio) and `..db` chunks (uncompressed DIB: bottom-up BGR24).
    * Returns None when the payload is not an AVI. */
  private[operators] def aviFrames(bytes: Array[Byte]): Option[Seq[(String, Array[Byte])]] = {
    def u32(o: Int): Long =
      ((bytes(o) & 0xffL)) | ((bytes(o + 1) & 0xffL) << 8) |
        ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
    def fourcc(o: Int): String =
      new String(bytes.slice(o, o + 4), "US-ASCII")
    if (bytes == null || bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
      return None
    val frames = Seq.newBuilder[(String, Array[Byte])]
    // depth-first over LIST chunks, collecting frame chunks inside 'movi'
    def walk(start: Int, end: Int, inMovi: Boolean): Unit = {
      var o = start
      var ok = true
      while (ok && o + 8 <= end) {
        val id = fourcc(o)
        val sz = u32(o + 4).toInt
        val body = o + 8
        // a corrupt/crafted chunk size must stop the walk, not loop or
        // overflow: sizes are unsigned in the container but the payload
        // cap keeps Int arithmetic safe
        if (sz < 0 || sz > end - body) ok = false
        else {
          if (id == "LIST" && body + 4 <= end) {
            val listType = fourcc(body)
            walk(body + 4, body + sz, inMovi || listType == "movi")
          } else if (inMovi && id.length == 4 &&
              (id.endsWith("dc") || id.endsWith("db"))) {
            frames += ((id.takeRight(2), bytes.slice(body, body + sz)))
          }
          o = body + sz + (sz & 1) // chunks are word-aligned
        }
      }
    }
    walk(12, bytes.length, inMovi = false)
    Some(frames.result())
  }

  /** Decode one AVI frame chunk to a BufferedImage: `dc` via javax.imageio
    * (MJPEG frames are JPEGs; PNG-in-AVI decodes the same way), `db` as a
    * bottom-up BGR24 DIB given the stream dims. */
  private def decodeFrame(kind: String, data: Array[Byte],
      w: Int, h: Int): java.awt.image.BufferedImage =
    if (kind == "dc")
      javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(data))
    else {
      val rowBytes = (w * 3 + 3) & ~3 // DIB rows pad to 4 bytes
      if (data.length < rowBytes * h) null
      else {
        val img = new java.awt.image.BufferedImage(
          w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          val src = (h - 1 - y) * rowBytes // bottom-up
          var x = 0
          while (x < w) {
            val b = data(src + x * 3) & 0xff
            val g = data(src + x * 3 + 1) & 0xff
            val r = data(src + x * 3 + 2) & 0xff
            img.setRGB(x, y, (r << 16) | (g << 8) | b)
            x += 1
          }
          y += 1
        }
        img
      }
    }

  /** REAL video frame decode for AVI containers (MJPEG `dc` frames via the
    * JDK's JPEG reader; uncompressed DIB `db` frames parsed directly) —
    * the explode-per-frame shape of [[sampleFrames]] with actual pixels:
    * one output row per sampled frame (`stride`-th up to `maxFrames`) with
    * the frame's dims and mean luminance. Container or frame parse
    * failures yield a single decoded=false row per asset. Dims for `db`
    * streams come from the first decodable `dc` frame or, when the stream
    * is pure DIB, from the avih header (offsets 40/44 of the RIFF body).
    * Other containers (mp4 etc. — no JDK demuxer) report decoded=false. */
  def decodeVideoFrames(
      df: DataFrame,
      idCol: String,
      payloadCol: String,
      stride: Int = 2,
      maxFrames: Int = 8,
      targetPartitions: Int = 0
  ): DataFrame = {
    val in = df.select(F.col(idCol).cast("long"), F.col(payloadCol).cast("binary"))
    mapMediaPartitions(in, targetPartitions)({ rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = if (r.isNullAt(1)) null else r.getAs[Array[Byte]](1)
        val parsed = if (bytes == null) None else aviFrames(bytes)
        parsed match {
          case Some(frames) if frames.nonEmpty =>
            // header dims for DIB-only streams: avih.dwWidth/dwHeight sit
            // 32/36 bytes into the avih chunk body; locating the chunk by
            // fourcc scan keeps the parser independent of list layout.
            // Raw byte compare (no per-offset String), the read of the
            // dims bounds-checked (a fourcc match in the file's tail must
            // degrade to unknown dims, not throw), and LAZY: MJPEG-only
            // streams never pay the scan
            lazy val headerDims: (Int, Int) = {
              def u32(p: Int): Int =
                ((bytes(p) & 0xff)) | ((bytes(p + 1) & 0xff) << 8) |
                  ((bytes(p + 2) & 0xff) << 16) | ((bytes(p + 3) & 0xff) << 24)
              var o = 12
              var dims: (Int, Int) = null
              // need bytes up to o+8+39 for the dims read
              while (dims == null && o + 48 <= bytes.length) {
                if (bytes(o) == 'a' && bytes(o + 1) == 'v' &&
                    bytes(o + 2) == 'i' && bytes(o + 3) == 'h')
                  dims = (u32(o + 8 + 32), u32(o + 8 + 36))
                o += 1
              }
              if (dims == null) (0, 0) else dims
            }
            val step = math.max(1, stride) // 0/negative would divide-by-zero
            val sampled = frames.zipWithIndex
              .filter { case (_, i) => i % step == 0 }
              .take(maxFrames)
            val out = sampled.flatMap { case ((kind, data), idx) =>
              val img = try {
                // only DIB frames need the header dims — keep MJPEG-only
                // streams from paying the lazy header scan at all
                if (kind == "dc") decodeFrame(kind, data, 0, 0)
                else decodeFrame(kind, data, headerDims._1, headerDims._2)
              } catch { case _: Throwable => null }
              if (img == null) None
              else {
                val w = img.getWidth
                val h = img.getHeight
                var lum = 0.0
                var y = 0
                while (y < h) {
                  var x = 0
                  while (x < w) {
                    val rgb = img.getRGB(x, y)
                    lum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) + (rgb & 0xff)) / (3.0 * 255.0)
                    x += 1
                  }
                  y += 1
                }
                Some(Row(id, true, frames.length, idx, w, h, lum / (w.toLong * h)))
              }
            }
            if (out.nonEmpty) out
            else Seq(Row(id, false, null, null, null, null, null))
          case _ => Seq(Row(id, false, null, null, null, null, null))
        }
      }
    }, decodedFrameSchema)
  }

  /** Deterministic fake "decode": 8 grayscale features from the payload
    * bytes (byte histogram buckets, normalized). STUB retained for
    * payloads with no in-JVM demuxer (mp4/webm video, non-PCM audio);
    * images, WAV audio, and AVI video have real paths — [[decodeImages]],
    * [[decodeAudio]], [[decodeVideoFrames]]. The stub stays columnar (no
    * UDF) so the surrounding plan shape matches the real kernel's. */
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
