package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization: group a key's events into sessions separated
  * by more than `gapMs` of event-time silence, emitting one row per closed
  * session (key, start, end, event count).
  *
  * Two equivalent builders share the session definition:
  *
  *   - [[sessionizeBatch]] — the declarative batch plan: a lag window marks
  *     session starts, a running sum assigns session ids, one groupBy
  *     aggregates. One shuffle on the keys; the (key, sid) aggregation
  *     reuses the window's partitioning (sid is derived within a key
  *     partition, and hash-partitioning on a subset of the grouping keys
  *     satisfies the clustered distribution), so no second exchange.
  *
  *   - [[sessionizeStream]] — the incremental plan: Structured Streaming
  *     custom state via flatMapGroupsWithState with an event-time timeout.
  *     Per-key state is the OPEN session list only — a session is emitted
  *     and evicted exactly once, when the watermark passes its end + gap,
  *     so state is bounded by a key's concurrently-open sessions (≈1 for
  *     real activity streams), not its history. Late events within the
  *     watermark horizon merge into — or bridge — open sessions, which is
  *     why closed sessions cannot be emitted before the watermark proves
  *     no bridging event can still arrive.
  *
  * The streaming side keys state by a single string (multi-key sets are
  * concat_ws-joined, types cast to string — the state-store key must be one
  * value); the batch side preserves the original key columns and types.
  */
object Sessionize {

  /** One open session in per-key streaming state. */
  case class Sess(start_ms: Long, end_ms: Long, n: Long)
  case class SessState(sessions: Seq[Sess])
  case class SessionRow(
      session_key: String,
      session_start_ms: Long,
      session_end_ms: Long,
      n_events: Long)

  /** Epoch-millis of a timestamp column, floor(micros/1000) — the same
    * arithmetic the DuckDB oracles' epoch_ms(ts)::BIGINT performs, so
    * session bounds are bit-identical across engines. NTZ-tolerant via
    * [[graft.functions.EpochTime]]. */
  private def tsMs(c: Column): Column = graft.functions.EpochTime.epochMs(c)

  /** Merge new event times into a disjoint, gap-separated open-session
    * list. Pure and order-insensitive: every event is a width-0 session,
    * then one sorted sweep coalesces anything within `gapMs` — so a late
    * event landing between two open sessions bridges them into one. */
  private[streaming] def merge(open: Seq[Sess], events: Seq[Long], gapMs: Long): Seq[Sess] = {
    val all = (open ++ events.map(t => Sess(t, t, 1L))).sortBy(s => (s.start_ms, s.end_ms))
    all.foldLeft(List.empty[Sess]) { (acc, s) =>
      acc match {
        case h :: t if s.start_ms <= h.end_ms + gapMs =>
          Sess(h.start_ms, math.max(h.end_ms, s.end_ms), h.n + s.n) :: t
        case _ => s :: acc
      }
    }.reverse
  }

  /** Batch sessionization: per-key lag marks gap crossings, a running sum
    * numbers sessions, one aggregate emits (keys…, session_start_ms,
    * session_end_ms, n_events). */
  def sessionizeBatch(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      gapMs: Long
  ): DataFrame = {
    require(keyCols.nonEmpty, "at least one session key required")
    val w = Window.partitionBy(keyCols.map(F.col): _*).orderBy(F.col("__ts_ms"))
    df.select(keyCols.map(F.col) :+ tsMs(F.col(tsCol)).as("__ts_ms"): _*)
      .withColumn("__prev", F.lag("__ts_ms", 1).over(w))
      .withColumn("__new",
        F.when(F.col("__prev").isNull || F.col("__ts_ms") - F.col("__prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("__sid", F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(keyCols.map(F.col) :+ F.col("__sid"): _*)
      .agg(
        F.min("__ts_ms").as("session_start_ms"),
        F.max("__ts_ms").as("session_end_ms"),
        F.count(F.lit(1)).as("n_events"))
      .drop("__sid")
  }

  /** Per-row session annotation: every input row keeps ALL its columns and
    * gains its session's `session_start_ms` / `session_end_ms` — the raw
    * material for per-session aggregation of arbitrary event columns
    * (`group by <session_keys> agg …` over a sessionized subscription).
    * Same session definition as [[sessionizeBatch]] (lag marks gap
    * crossings, running sum numbers sessions, min/max over the (keys, sid)
    * sub-partition derive bounds). One shuffle on the session keys: every
    * window reuses the same hash partitioning — the (keys, sid) partition
    * is a sub-partition of (keys), which satisfies Spark's clustered
    * distribution without a second exchange. */
  def annotateSessions(
      df: DataFrame,
      tsCol: String,
      keyCols: Seq[String],
      gapMs: Long
  ): DataFrame = {
    require(keyCols.nonEmpty, "at least one session key required")
    val w = Window.partitionBy(keyCols.map(F.col): _*).orderBy(F.col("__ts_ms"))
    val bounds = Window.partitionBy((keyCols :+ "__sid").map(F.col): _*)
    df.withColumn("__ts_ms", tsMs(F.col(tsCol)))
      .withColumn("__prev", F.lag("__ts_ms", 1).over(w))
      .withColumn("__new",
        F.when(F.col("__prev").isNull || F.col("__ts_ms") - F.col("__prev") > gapMs, 1L)
          .otherwise(0L))
      .withColumn("__sid", F.sum("__new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("session_start_ms", F.min("__ts_ms").over(bounds))
      .withColumn("session_end_ms", F.max("__ts_ms").over(bounds))
      .drop("__ts_ms", "__prev", "__new", "__sid")
  }

  /** Streaming sessionization with bounded custom state. Emits each closed
    * session exactly once (append mode), `watermarkDelay` + gap after its
    * last event. */
  def sessionizeStream(
      stream: DataFrame,
      tsCol: String,
      watermarkDelay: String,
      keyCols: Seq[String],
      gapMs: Long
  ): Dataset[SessionRow] = {
    require(stream.isStreaming, "sessionizeStream requires a streaming DataFrame (readStream)")
    require(keyCols.nonEmpty, "at least one session key required")
    val spark = stream.sparkSession
    import spark.implicits._
    // Spark 4 disallows redefining a watermark — respect one already set
    // upstream (e.g. by dedup-on-ingest in subscribeFromParams)
    val hasWatermark = stream.queryExecution.logical.collectFirst {
      case e: org.apache.spark.sql.catalyst.plans.logical.EventTimeWatermark => e
    }.isDefined
    val wmStream =
      if (hasWatermark) stream
      else graft.functions.EpochTime.normalizeTs(stream, tsCol)
        .withWatermark(tsCol, watermarkDelay)
    val keyed = wmStream
      .select(
        // coalesce each key to a NULL sentinel first: concat_ws skips
        // NULLs, which would collapse distinct tuples like ('a', NULL) and
        // (NULL, 'a') into one state-store key — the batch plan keeps them
        // distinct, so the stream must too
        F.concat_ws("\u0001",
          keyCols.map(c => F.coalesce(F.col(c).cast("string"), F.lit("\u0000N"))): _*)
          .as("__key"),
        tsMs(F.col(tsCol)).as("__ts_ms"),
        // the watermarked column itself must survive the projection —
        // Spark's event-time-timeout check requires the event-time
        // attribute in the flatMapGroupsWithState child output
        F.col(tsCol).as("__ts"))
      .as[(String, Long, java.sql.Timestamp)]
    keyed
      .groupByKey(_._1)
      .flatMapGroupsWithState[SessState, SessionRow](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: String, rows: Iterator[(String, Long, java.sql.Timestamp)], state: GroupState[SessState]) =>
          val wm = state.getCurrentWatermarkMs()
          // exactly-once guard, independent of upstream late filtering:
          // an emitted session S has S.end + gap < wm, and only an event
          // t <= S.end + gap could merge into it — so keeping t >= wm and
          // emitting strictly below wm makes re-opening impossible.
          val events = rows.map(_._2).filter(_ >= wm).toSeq
          val open = merge(state.getOption.map(_.sessions).getOrElse(Nil), events, gapMs)
          val (closed, stillOpen) = open.partition(_.end_ms + gapMs < wm)
          if (stillOpen.isEmpty) {
            if (state.exists) state.remove()
          } else {
            state.update(SessState(stillOpen))
            // wake when the earliest open session can close (event-time
            // timeouts fire once the watermark passes the timestamp, which
            // matches the strict emit condition; clamp above the current
            // watermark as the API requires)
            state.setTimeoutTimestamp(
              math.max(stillOpen.map(_.end_ms + gapMs).min, wm + 1))
          }
          closed.sortBy(_.start_ms)
            .map(s => SessionRow(key, s.start_ms, s.end_ms, s.n)).iterator
      }
  }
}
