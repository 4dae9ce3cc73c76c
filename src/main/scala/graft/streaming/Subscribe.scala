package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Subscribe / incrementalize: continuous (or repeatedly-triggered) tumbling
  * window aggregation over an append-only stream, the reference's
  * subscription model (Subscribe relation.scala:1121-1141, rewritten by
  * Incrementalize.scala:27-107 + ExecutionPlanRewriter.scala:37-82 into a
  * watermark + window + staged-append plan).
  *
  * Spark-native mapping:
  *   - the subscription source is a Structured Streaming `readStream`
  *   - the incremental window state is Spark's watermark-bounded stateful
  *     aggregation (no hand-rolled state store)
  *   - the staged append is the parquet sink in append output mode: a window
  *     is written exactly once, when the watermark passes its end
  *   - re-running with `Trigger.AvailableNow` and the same checkpoint gives
  *     the reference's batch-triggered incremental refresh: each run
  *     processes only new files and appends only newly-finalized windows
  *
  * The same aggregation builder ([[tumbling]]) serves the batch path, so
  * batch/stream equivalence is by construction.
  */
object Subscribe {

  /** Tumbling-window aggregation, shared by batch and streaming plans.
    * Emits window_start_ms/window_end_ms epoch columns (portable output).
    * With `slide` set (a divisor of the window), windows hop: each event
    * lands in window/slide overlapping windows — Spark's window() with a
    * slideDuration, the standard smoothed-rate shape. */
  def tumbling(
      df: DataFrame,
      tsCol: String,
      windowDuration: String,
      keys: Seq[String],
      aggs: Seq[Column],
      slide: Option[String] = None
  ): DataFrame = {
    require(aggs.nonEmpty, "at least one aggregate required")
    val win = slide match {
      case Some(s) => F.window(F.col(tsCol), windowDuration, s)
      case None => F.window(F.col(tsCol), windowDuration)
    }
    val grouped = df.groupBy((win.as("__w") +: keys.map(F.col)): _*)
    grouped
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("window_start_ms",
        graft.functions.EpochTime.unixMillis(F.col("__w.start")))
      .withColumn("window_end_ms",
        graft.functions.EpochTime.unixMillis(F.col("__w.end")))
      .drop("__w")
  }

  /** Incrementalized subscription plan: watermark-bounded tumbling windows
    * over a streaming DataFrame. Append output emits each window exactly
    * once, `watermarkDelay` after it closes. */
  def subscribe(
      stream: DataFrame,
      tsCol: String,
      windowDuration: String,
      watermarkDelay: String,
      keys: Seq[String],
      aggs: Seq[Column]
  ): DataFrame = {
    require(stream.isStreaming, "subscribe requires a streaming DataFrame (readStream)")
    val s = graft.functions.EpochTime.normalizeTs(stream, tsCol)
    tumbling(s.withWatermark(tsCol, watermarkDelay), tsCol, windowDuration, keys, aggs)
  }

  /** Streaming exact dedup on ingest: emit each key set (e.g. a content
    * fingerprint — `TextFunctions.fingerprint`) at most once within the
    * watermark horizon, the guard against re-crawled / re-queued documents
    * entering the corpus twice. State is BOUNDED: Spark's
    * dropDuplicatesWithinWatermark evicts keys once the watermark passes
    * them, which is what keeps this viable on an unbounded ingest stream —
    * global-history dedup stays the batch operator's job (Dedup.scala)
    * downstream. Emitted rows are unchanged (append mode safe). */
  def dedupStream(
      stream: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      keyCols: Seq[String]
  ): DataFrame = {
    require(stream.isStreaming, "dedupStream requires a streaming DataFrame (readStream)")
    require(keyCols.nonEmpty, "at least one dedup key required")
    graft.functions.EpochTime.normalizeTs(stream, tsCol)
      .withWatermark(tsCol, watermarkDelay)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)
  }

  /** Normalize a language duration spec ('1h', '30 min', '10 minutes') to
    * Spark's interval wording — the language accepts short units, Spark's
    * watermark/window parsers want the long form. */
  def duration(spec: String): String = {
    // ANCHORED match: an unanchored search silently misparsed compound or
    // decimal specs ('1.5h' matched as '5h', '1h30m' dropped the 30m) —
    // those must reject, not mis-window
    val m = """^(\d+)\s*([a-zA-Z]+)$""".r.findFirstMatchIn(spec.trim).getOrElse(
      throw new IllegalArgumentException(
        s"unrecognized duration '$spec' (expected '<integer> <unit>', e.g. '90 minutes')"))
    val unit = m.group(2).toLowerCase match {
      case "ms" => "milliseconds"
      case "s" | "sec" | "second" | "seconds" => "seconds"
      case "m" | "min" | "minute" | "minutes" => "minutes"
      case "h" | "hour" | "hours" => "hours"
      case "d" | "day" | "days" => "days"
      case u => throw new IllegalArgumentException(s"unrecognized duration unit '$u'")
    }
    s"${m.group(1)} $unit"
  }

  /** A language duration spec as epoch milliseconds. */
  def durationMs(spec: String): Long = {
    val Array(n, unit) = duration(spec).split(" ")
    n.toLong * (unit match {
      case "milliseconds" => 1L
      case "seconds" => 1000L
      case "minutes" => 60000L
      case "hours" => 3600000L
      case "days" => 86400000L
    })
  }

  /** The streaming side of a recorded `tbl.subscribe(dedup_keys: […])`
    * site: apply dedup-on-ingest from the subscription metadata the
    * language front-end records (Lowering ctx.subscriptions — param names
    * watermark_column / watermark_delay / dedup_keys, dedup_keys
    * comma-joined by the parser). */
  def dedupFromParams(stream: DataFrame, params: Map[String, String]): DataFrame = {
    val ts = params.getOrElse("watermark_column",
      throw new IllegalArgumentException("subscribe: dedup_keys requires watermark_column"))
    val delay = duration(params.getOrElse("watermark_delay", "10 minutes"))
    val keys = params.get("dedup_keys")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
    dedupStream(stream, ts, delay, keys)
  }

  /** The FULL incremental plan from recorded subscription metadata:
    * optional dedup-on-ingest (dedup_keys), then watermark-bounded tumbling
    * windows (window_size) or gap sessionization (session_gap +
    * session_keys, Sessionize.sessionizeStream custom state) — so one
    * recorded `subscribe()` site drives the whole streaming pipeline. */
  def subscribeFromParams(
      stream: DataFrame,
      params: Map[String, String],
      keys: Seq[String],
      aggs: Seq[Column]
  ): DataFrame = {
    val ts = params.getOrElse("watermark_column",
      throw new IllegalArgumentException("subscribe requires watermark_column"))
    val delay = duration(params.getOrElse("watermark_delay", "10 minutes"))
    val hasDedup = params.get("dedup_keys").exists(_.trim.nonEmpty)
    val base = if (hasDedup) dedupFromParams(stream, params)
               else graft.functions.EpochTime.normalizeTs(stream, ts).withWatermark(ts, delay)
    (params.get("window_size"), params.get("session_gap")) match {
      case (Some(_), Some(_)) =>
        throw new IllegalArgumentException(
          "subscribe: window_size and session_gap are mutually exclusive")
      case (Some(w), None) =>
        // dedupFromParams already set the watermark; tumbling reuses it
        tumbling(base, ts, duration(w), keys, aggs,
          params.get("window_slide").map(duration))
      case (None, Some(g)) =>
        val sKeys = params.get("session_keys")
          .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq).getOrElse(Nil)
        Sessionize.sessionizeStream(base, ts, delay, sKeys, durationMs(g)).toDF()
      case (None, None) => base
    }
  }

  /** Streaming incremental near-dup dedup: each micro-batch of ingested
    * documents is probed against a PERSISTED MinHash signature index
    * (see [[graft.operators.Dedup.buildMinhashIndex]]) and only the rows
    * with no near-dup in the corpus are appended to `outPath` — the
    * always-on flavor of the daily-ingest shape (dedupe the crawl stream
    * against the multi-TB corpus without ever re-shingling the corpus).
    *
    * Runs through foreachBatch because signature computation is a
    * per-document aggregation over exploded shingles — semantically a
    * per-batch (not cross-batch) computation, which foreachBatch expresses
    * exactly and keeps OFF the streaming state store (the probe is
    * stateless; the only state is the checkpoint's input log). The index
    * DataFrame is re-read per batch, so a concurrently-refreshed index
    * (e.g. a nightly CTAS) is picked up without restarting the query.
    * Exact intra-stream dups are [[dedupStream]]'s job upstream (bounded
    * watermark state); near-dup links WITHIN one batch are intentionally
    * kept (compose [[graft.operators.Dedup.minhashLsh]] on the staged
    * output for that). */
  def dedupIncrementalAppend(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      index: DataFrame,
      outPath: String,
      checkpointPath: String,
      threshold: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 2,
      availableNow: Boolean = true
  ): StreamingQuery = {
    require(stream.isStreaming,
      "dedupIncrementalAppend requires a streaming DataFrame (readStream)")
    val w = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        tuneBatchShuffle(batch)
        writeBatchIdempotent(
          graft.operators.Dedup.dedupAgainstMinhashIndex(
            batch, idCol, textCol, index, threshold, numHashes, bands, shingleSize),
          batchId, outPath)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Stateless-scorer composition for streams — the scorer family's
    * (quality_classifier_score, perplexity_*, dsir_weight) streaming
    * parity path, mirroring [[dedupIncrementalAppend]]: each micro-batch
    * is scored by a BATCH scorer and written through the idempotent
    * per-batch sink. The scorer's model state must not depend on the
    * stream — plan-shipped constants (classifier weights, DSIR bucket
    * tables) or stream-static joins against a model fit ONCE on a static
    * corpus ([[graft.operators.CorpusStats.unigramModel]] →
    * `unigramNllAgainst`) — so scoring a corpus in N micro-batches
    * produces exactly the rows of scoring it in one batch
    * (batch-equivalence spec-gated in SubscribeSpec; the q_subscribe_scored
    * oracle re-derives the scores from the batch SQL). */
  def scoredAppend(
      stream: DataFrame,
      outPath: String,
      checkpointPath: String,
      scorer: DataFrame => DataFrame,
      availableNow: Boolean = true
  ): StreamingQuery = {
    require(stream.isStreaming,
      "scoredAppend requires a streaming DataFrame (readStream)")
    val w = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        tuneBatchShuffle(batch)
        writeBatchIdempotent(scorer(batch), batchId, outPath)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Streaming EXACT incremental dedup against a static corpus — the
    * Dolma crawl-ingest shape composed from the round's two halves:
    * [[graft.operators.Dedup.buildCorpusBloom]] runs ONCE, before the
    * stream starts (the persisted cross-batch state — every micro-batch
    * probes the same corpus bloom, nothing is re-fit per batch), and each
    * micro-batch goes through
    * [[graft.operators.Dedup.bloomDedupAgainstWith]]: the codegen'd bloom
    * probe plus the exact candidate-broadcast recheck against the corpus,
    * written through the idempotent per-batch sink. Because a batch row's
    * (is_dup, dup_of) depends only on the STATIC corpus, the union of the
    * per-batch outputs equals the one-shot batch operator's rows for any
    * micro-batch split (SubscribeSpec gates 2-batch ≡ 1-batch bitwise;
    * the q_subscribe_dedup_against oracle is the plain SQL fingerprint
    * join). */
  def dedupAgainstAppend(
      stream: DataFrame,
      corpus: DataFrame,
      idCol: String,
      textCol: String,
      outPath: String,
      checkpointPath: String,
      fpp: Double = 0.01,
      expectedItems: Option[Long] = None,
      availableNow: Boolean = true
  ): StreamingQuery = {
    require(stream.isStreaming,
      "dedupAgainstAppend requires a streaming DataFrame (readStream)")
    val bloom = graft.operators.Dedup.buildCorpusBloom(
      corpus, textCol, fpp, expectedItems)
    // fingerprint the corpus ONCE, before the first trigger (optimization
    // r19, the phashAgainstAppend pattern): every micro-batch's exact
    // recheck joins the same STATIC (fingerprint, id) frame, and the lazy
    // form re-ran the corpus scan + md5 per trigger. Bounded cross-batch
    // state: two narrow columns per corpus row, MEMORY_AND_DISK with full
    // lineage — same ownership caveats as the image-dedup corpus hashes.
    val cKeyed = graft.operators.Dedup.corpusFingerprints(corpus, idCol, textCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    cKeyed.count()
    val w = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        tuneBatchShuffle(batch)
        writeBatchIdempotent(
          graft.operators.Dedup.bloomDedupAgainstKeyed(
            cKeyed, bloom, batch, idCol, textCol),
          batchId, outPath)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Streaming IMAGE ingest dedup — the LAION-shaped loop composing the
    * round's image pieces the way [[dedupAgainstAppend]] composes the
    * text pieces: the corpus side is pHashed ONCE, before the stream
    * starts (the decode is the expensive half — a (corpus_id, phash)
    * frame persisted across micro-batches), and every micro-batch of new
    * image payloads runs [[graft.operators.Dedup.phashAgainstHashes]]:
    * its own decode + the chunk-blocked candidate join + bit_count
    * verify, written through the idempotent per-batch sink. Links depend
    * only on the STATIC corpus hashes, so the union of per-batch outputs
    * equals the one-shot batch operator for any split (SubscribeSpec
    * gates it bitwise). */
  def phashAgainstAppend(
      stream: DataFrame,
      corpus: DataFrame,
      idCol: String,
      payloadCol: String,
      outPath: String,
      checkpointPath: String,
      maxHamming: Int = 3,
      availableNow: Boolean = true
  ): StreamingQuery = {
    require(stream.isStreaming,
      "phashAgainstAppend requires a streaming DataFrame (readStream)")
    // BOUNDED cross-batch state: n × 16-byte (id, hash) rows, spilling to
    // disk — lives for the session like the dedupIncrementalAppendPath
    // index cache; callers running many corpora through one session can
    // unpersist after the query terminates
    val corpusHashes = graft.operators.Multimodal
      .phashImages(corpus, idCol, payloadCol)
      .filter(F.col("decoded") && F.col("phash").isNotNull)
      .select(F.col("img_id").as("corpus_id"), F.col("phash"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    corpusHashes.count() // decode the corpus ONCE, before the first trigger
    val w = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        tuneBatchShuffle(batch)
        writeBatchIdempotent(
          graft.operators.Dedup.phashAgainstHashes(
            corpusHashes, batch, idCol, payloadCol, maxHamming),
          batchId, outPath)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Scale the per-trigger shuffle width to the MICRO-BATCH, not the
    * cluster (optimization r19, guide §2.2 / r18 verdict next-round #4):
    * AQE is off inside streaming queries, so every conf-driven shuffle in a
    * foreachBatch body (distinct, groupBy, join exchanges) used the
    * session-wide `spark.sql.shuffle.partitions` — 32 partitions for a
    * ~1k-row micro-batch, pure task-scheduling overhead repeated per
    * trigger. foreachBatch hands each batch a CLONED session, so setting
    * the conf here scopes to THIS stream only; sized from the batch's plan
    * statistics at ~32 MB/partition, floored at 4 (corpus-side probe
    * shuffles keep modest parallelism) and capped at defaultParallelism
    * (a large batch behaves exactly as before). Batch-path queries never
    * pass through here and keep the session default. */
  private def tuneBatchShuffle(batch: DataFrame): Unit = {
    val spark = batch.sparkSession
    val cap = spark.sparkContext.defaultParallelism.toLong
    val bytes = batch.queryExecution.optimizedPlan.stats.sizeInBytes
    val target =
      if (!bytes.isValidLong) cap
      else math.max(4L, math.min(cap, bytes.toLong / (32L << 20) + 1))
    spark.conf.set("spark.sql.shuffle.partitions", target.toString)
  }

  /** Idempotent micro-batch sink: each batch lands in its own
    * `__batch_id=<id>` partition via dynamic partition overwrite, so an
    * at-least-once foreachBatch RETRY overwrites its own partition instead
    * of appending duplicate rows — exactly-once output for the operator
    * whose purpose is deduplication. Readers that don't want the
    * idempotence key can drop `__batch_id`. */
  private def writeBatchIdempotent(df: DataFrame, batchId: Long, outPath: String): Unit =
    df.withColumn("__batch_id", F.lit(batchId))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__batch_id")
      .parquet(outPath)

  /** Bounded per-path LRU for [[dedupIncrementalAppend]]'s path flavor:
    * the loaded + persisted signature frame keyed by directory fingerprint
    * (shared eviction/ownership rules with the ANN small-index cache —
    * ADVICE r11 flagged both as unbounded). */
  private val indexCache = new graft.operators.IndexFrameCache(
    sys.env.getOrElse("SPARK_GRAFT_INDEX_CACHE_ENTRIES", "16").toInt)

  /** Test/server hook: drop the calling context's cached index frames. */
  def clearIndexCache(spark: SparkSession): Unit = indexCache.clear(spark)

  /** Diagnostic: how many times a persisted index was (re)loaded from disk
    * — lets the spec prove batch N reused the cache and batch N+1 saw the
    * refreshed CTAS. */
  val indexReloads = new java.util.concurrent.atomic.AtomicLong(0)

  /** One cheap root listing summarizes the index directory: file count +
    * total bytes + newest mtime. A nightly CTAS overwrite changes all
    * three; a no-op batch changes none. */
  private def indexFingerprint(spark: SparkSession, path: String): String =
    graft.Tables.directoryFingerprint(spark, path).getOrElse(
      throw new IllegalArgumentException(
        s"dedup index path '$path' is missing or has no data files — " +
          "build it first (minhash_index CTAS)"))

  /** [[dedupIncrementalAppend]] over a persisted index PATH with
    * refresh-aware caching: the signature frame is loaded once, persisted,
    * and reused across micro-batches — each batch pays one root listing
    * (the fingerprint check), not a full re-list + re-read of the index —
    * and a changed fingerprint (the nightly CTAS refresh landing) swaps in
    * the re-read index without restarting the query. */
  def dedupIncrementalAppendPath(
      stream: DataFrame,
      idCol: String,
      textCol: String,
      indexPath: String,
      outPath: String,
      checkpointPath: String,
      threshold: Double = 0.5,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleSize: Int = 2,
      availableNow: Boolean = true
  ): StreamingQuery = {
    require(stream.isStreaming,
      "dedupIncrementalAppendPath requires a streaming DataFrame (readStream)")
    val w = stream.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointPath)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        tuneBatchShuffle(batch)
        val spark = batch.sparkSession
        val fp = indexFingerprint(spark, indexPath)
        // ownership at SparkContext granularity: foreachBatch hands each
        // micro-batch a CLONED session over the same context, and the
        // persisted frame (a pure parquet read, no session state) stays
        // valid for every session of that context — but never for a
        // different or stopped one. Hit/staleness/LRU rules live in
        // IndexFrameCache.
        val idx = indexCache.getOrLoad(spark, indexPath, fp) {
          indexReloads.incrementAndGet()
          spark.read.parquet(indexPath).persist()
        }
        writeBatchIdempotent(
          graft.operators.Dedup.dedupAgainstMinhashIndex(
            batch, idCol, textCol, idx, threshold, numHashes, bands, shingleSize),
          batchId, outPath)
      }
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start()
  }

  /** Stage finalized windows into an append-only parquet directory. With
    * `Trigger.AvailableNow` the query drains available input and terminates —
    * invoke repeatedly with the same checkpoint for batch-triggered
    * incremental refresh (only new input is read, only newly-closed windows
    * are appended). */
  def stageAppend(
      subscription: DataFrame,
      outPath: String,
      checkpointPath: String,
      availableNow: Boolean = true
  ): StreamingQuery = {
    val w = subscription.writeStream
      .outputMode("append")
      .format("parquet")
      .option("checkpointLocation", checkpointPath)
    (if (availableNow) w.trigger(Trigger.AvailableNow()) else w).start(outPath)
  }
}
