package graft.flow

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Persistent flow-run records: one JSON file per run under a store
  * directory, so runs survive a driver restart and other processes can
  * inspect them (reference: runner/FlowRunStore.scala + FlowRunRegistry —
  * the reference's default store is exactly this one-JSON-file-per-run
  * shape; its SQLite variant adds cross-process transactions that a
  * single-driver Spark deployment doesn't need).
  *
  * Retention (reference FlowRunRetention.sweep): terminal runs beyond a
  * per-flow `keepRuns` cap are deleted, newest first — and the most recent
  * terminal run of each flow is always kept, because cross-flow gates
  * (`depends on X`, `if X.failed`) read it.
  */
final case class StageRunRecord(
    name: String,
    status: String,
    attempts: Int,
    error: Option[String],
    /** Heartbeat timestamps (epoch ms) observed across the stage's attempts
      * — explicit runWithHeartbeat beats plus automatic Spark task-progress
      * beats (reference FlowExecutor heartbeat contract). */
    heartbeatsMs: List[Long] = Nil)

final case class FlowRunRecord(
    runId: String,
    flowName: String,
    state: String, // running | success | failed | skipped
    startedAtMillis: Long,
    finishedAtMillis: Option[Long],
    stages: List[StageRunRecord],
    /** Liveness lease (reference FlowExecutorConfig.leaseTimeoutMillis):
      * the runner refreshes this while executing; a RUNNING record whose
      * lease expired (process crash) frees its concurrency slot and is
      * treated as failed by cross-flow dependency evaluation. None = no
      * lease (legacy records / external writers) — treated as live. */
    leaseExpiresAtMillis: Option[Long] = None) {
  def isTerminal: Boolean = state != "running"
  def runTimeMillis: Option[Long] = finishedAtMillis.map(_ - startedAtMillis)
  /** A running record counts as LIVE while its lease (if any) holds. */
  def isLiveRunning(nowMillis: Long): Boolean =
    state == "running" && leaseExpiresAtMillis.forall(_ > nowMillis)
  /** Effective state for cross-flow evaluation: an expired running record
    * reads as failed (the process died mid-run). */
  def effectiveState(nowMillis: Long): String =
    if (state == "running" && !isLiveRunning(nowMillis)) "failed" else state
}

final class FlowRunStore(val dir: Path) {
  Files.createDirectories(dir)
  private val mapper = new ObjectMapper()

  private def fileOf(runId: String): Path = dir.resolve(s"$runId.json")

  def save(r: FlowRunRecord): Unit = {
    val m = new java.util.LinkedHashMap[String, Any]()
    m.put("run_id", r.runId)
    m.put("flow", r.flowName)
    m.put("state", r.state)
    m.put("started_at_ms", r.startedAtMillis)
    r.finishedAtMillis.foreach(v => m.put("finished_at_ms", v))
    r.leaseExpiresAtMillis.foreach(v => m.put("lease_expires_ms", v))
    m.put("stages", r.stages.map { s =>
      val sm = new java.util.LinkedHashMap[String, Any]()
      sm.put("name", s.name)
      sm.put("status", s.status)
      sm.put("attempts", s.attempts)
      s.error.foreach(e => sm.put("error", e))
      if (s.heartbeatsMs.nonEmpty)
        sm.put("heartbeats_ms", s.heartbeatsMs.map(java.lang.Long.valueOf).asJava)
      sm
    }.asJava)
    // write-then-move: a reader never sees a half-written record
    val tmp = dir.resolve(s".${r.runId}.tmp")
    Files.writeString(tmp, mapper.writeValueAsString(m))
    Files.move(tmp, fileOf(r.runId), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }

  def get(runId: String): Option[FlowRunRecord] = {
    val f = fileOf(runId)
    if (!Files.exists(f)) None else parse(Files.readString(f))
  }

  /** All records, newest first. Unreadable files are skipped, not fatal.
    * Files.list requires explicit close — a long-lived driver calling this
    * per run/show would otherwise leak a directory fd each time. */
  def list(): List[FlowRunRecord] = {
    val stream = Files.list(dir)
    try stream.iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .flatMap(p =>
        try parse(Files.readString(p))
        catch { case _: Throwable => None })
      .toList.sortBy(-_.startedAtMillis)
    finally stream.close()
  }

  def latestRunOf(flowName: String): Option[FlowRunRecord] =
    list().find(_.flowName == flowName)

  def delete(runId: String): Unit = Files.deleteIfExists(fileOf(runId))

  /** Retention sweep: per flow, keep the `keepRuns` most recent terminal
    * runs (min 1 — the latest terminal run is always kept); running
    * records are never touched. Returns the number of deleted runs. */
  def retain(keepRuns: Int): Int = {
    val keep = math.max(1, keepRuns)
    var deleted = 0
    list().filter(_.isTerminal).groupBy(_.flowName).foreach { case (_, runs) =>
      runs.drop(keep).foreach { r => delete(r.runId); deleted += 1 }
    }
    deleted
  }

  private def parse(json: String): Option[FlowRunRecord] = {
    val m = mapper.readValue(json, classOf[java.util.Map[String, Any]])
    def longOf(v: Any): Long = v match {
      case n: Number => n.longValue
      case other => String.valueOf(other).toLong
    }
    val stages = Option(m.get("stages")).map(_.asInstanceOf[java.util.List[java.util.Map[String, Any]]])
      .map(_.asScala.toList.map { sm =>
        StageRunRecord(
          String.valueOf(sm.get("name")),
          String.valueOf(sm.get("status")),
          longOf(sm.getOrDefault("attempts", 0)).toInt,
          Option(sm.get("error")).map(String.valueOf),
          Option(sm.get("heartbeats_ms"))
            .map(_.asInstanceOf[java.util.List[Any]].asScala.toList.map(longOf))
            .getOrElse(Nil))
      }).getOrElse(Nil)
    Some(FlowRunRecord(
      String.valueOf(m.get("run_id")),
      String.valueOf(m.get("flow")),
      String.valueOf(m.get("state")),
      longOf(m.get("started_at_ms")),
      Option(m.get("finished_at_ms")).map(longOf),
      stages,
      Option(m.get("lease_expires_ms")).map(longOf)))
  }
}

object FlowRunStore {
  /** The store location for a session: `graft.flow.runStoreDir` conf if
    * set, else `<warehouse>/__graft_flow_runs`. */
  def forSession(spark: org.apache.spark.sql.SparkSession): FlowRunStore = {
    val dir = spark.conf.getOption("graft.flow.runStoreDir").getOrElse {
      val wh = spark.conf.get("spark.sql.warehouse.dir")
        .replaceFirst("^file:", "")
      s"$wh/__graft_flow_runs"
    }
    new FlowRunStore(Paths.get(dir))
  }
}
