package graft.flow

import org.apache.spark.sql.DataFrame
import java.util.concurrent.{ConcurrentHashMap, CountDownLatch, Executors, TimeUnit}
import scala.collection.mutable
import scala.jdk.CollectionConverters._
import scala.util.control.NonFatal

/** Flow orchestration: a DAG of named stages over DataFrames with data
  * dependencies, per-stage retries with exponential backoff, and parallel
  * execution of independent stages (reference: flow.scala FlowDef/StageDef +
  * runner/FlowExecutor.scala:52-134 — stages, depends-on, retry/backoff).
  *
  * Spark-native mapping: a stage's `run` receives its dependencies' result
  * DataFrames and returns a DataFrame. Stage results stay LAZY plans unless
  * `materialize = true` (then the stage is checkpointed eagerly so a
  * downstream retry does not recompute — and transient upstream failures
  * cannot resurface inside a downstream stage's action). Independent stages
  * run concurrently on a bounded pool; Spark schedules their jobs fairly
  * within one session.
  */
final case class RetryPolicy(
    maxAttempts: Int = 1,
    initialBackoffMs: Long = 50,
    backoffMultiplier: Double = 2.0,
    maxBackoffMs: Long = 10000
) {
  require(maxAttempts >= 1, "maxAttempts must be >= 1")
  def backoffBeforeAttempt(attempt: Int): Long = // attempt is 2-based
    math.min(
      (initialBackoffMs * math.pow(backoffMultiplier, (attempt - 2).toDouble)).toLong,
      maxBackoffMs)
}

final case class StageDef(
    name: String,
    run: Map[String, DataFrame] => DataFrame,
    dependsOn: Seq[String] = Nil,
    retry: RetryPolicy = RetryPolicy(),
    materialize: Boolean = false,
    /** Stages whose terminal STATE (not data) this stage waits on. */
    gateDeps: Seq[String] = Nil,
    /** Evaluated over the results once deps + gateDeps are terminal; false →
      * the stage is skipped (reference: `stage fallback if broken.failed`). */
    gate: Option[Map[String, StageResult] => Boolean] = None,
    /** Bounds each ATTEMPT's duration (reference StageExecutionConfig
      * timeoutMillis, FlowExecutor.scala:55,855-875): on expiry the
      * attempt's Spark jobs are cancelled server-side, the worker thread is
      * interrupted (freeing the slot for other stages), and the attempt is
      * treated as a retryable failure — a hung stage no longer blocks its
      * downstream cone until the flow-level latch. */
    timeoutMs: Option[Long] = None,
    /** Bounds attempt LIVENESS (reference heartbeatMillis + `heartbeat`
      * trigger, FlowExecutor.scala:56,823-853): an attempt producing no
      * heartbeat within the interval fails retryably like a timeout. Spark
      * task completions in the attempt's job group count as heartbeats
      * automatically (the reference's "an executing SQL statement counts as
      * alive", Spark-native); custom long-running logic reports liveness
      * through [[runWithHeartbeat]]. */
    heartbeatMs: Option[Long] = None,
    /** Heartbeat-aware body override (reference FlowStageRunner
      * .runWithHeartbeat): receives the dependency results plus a beat
      * callback; when absent, [[run]] executes and only automatic Spark
      * task-progress heartbeats apply. */
    runWithHeartbeat: Option[(Map[String, DataFrame], () => Unit) => DataFrame] = None
)

/** An attempt exceeded its `timeoutMs` — retryable. */
final class StageTimeoutException(stage: String, ms: Long)
  extends RuntimeException(s"stage $stage timed out after ${ms}ms")

/** An attempt produced no heartbeat within `heartbeatMs` — retryable. */
final class StageHeartbeatException(stage: String, ms: Long)
  extends RuntimeException(s"stage $stage produced no heartbeat within ${ms}ms")

final case class FlowDef(name: String, stages: Seq[StageDef]) {
  def stage(name: String): StageDef = stages.find(_.name == name).get
}

sealed trait StageResult { def attempts: Int }
final case class StageSucceeded(df: DataFrame, attempts: Int) extends StageResult
final case class StageFailed(error: Throwable, attempts: Int) extends StageResult
final case class StageSkipped(failedDependency: String) extends StageResult {
  def attempts: Int = 0
}

final case class FlowResult(
    flow: String,
    stages: Map[String, StageResult],
    /** Heartbeat timestamps (epoch ms) observed per stage across all its
      * attempts — explicit beats from [[StageDef.runWithHeartbeat]] plus
      * automatic Spark task-progress beats; persisted into FlowRunStore. */
    heartbeats: Map[String, List[Long]] = Map.empty) {
  def apply(name: String): DataFrame = stages(name) match {
    case StageSucceeded(df, _) => df
    case StageFailed(e, n) =>
      throw new IllegalStateException(s"stage $name failed after $n attempt(s)", e)
    case StageSkipped(dep) =>
      throw new IllegalStateException(s"stage $name skipped: dependency $dep failed")
  }
  def succeeded: Boolean = stages.values.forall(_.isInstanceOf[StageSucceeded])
}

object FlowExecutor {

  /** Single shared daemon scheduler for timeout/heartbeat checks — check
    * tasks only flip an AtomicReference and interrupt, so one thread
    * serves every concurrent flow. */
  private lazy val monitor: java.util.concurrent.ScheduledExecutorService =
    Executors.newSingleThreadScheduledExecutor(new java.util.concurrent.ThreadFactory {
      def newThread(r: Runnable): Thread = {
        val t = new Thread(r, "graft-flow-monitor"); t.setDaemon(true); t
      }
    })

  /** Validate and execute the flow. Independent ready stages run in parallel
    * (up to `parallelism` at once); a stage starts when every dependency has
    * succeeded; failures (after retries) skip the downstream cone while the
    * rest of the DAG continues. */
  def run(flow: FlowDef, parallelism: Int = 4): FlowResult = {
    validate(flow)
    val results = new ConcurrentHashMap[String, StageResult]()
    val remaining = new ConcurrentHashMap[String, StageDef](
      flow.stages.map(s => s.name -> s).toMap.asJava)
    val done = new CountDownLatch(flow.stages.size)
    val pool = Executors.newFixedThreadPool(math.max(1, parallelism))
    val lock = new Object

    val heartbeatLog = new ConcurrentHashMap[String, List[Long]]()

    def failedDep(s: StageDef): Option[String] =
      s.dependsOn.find(d => results.get(d) match {
        case _: StageFailed | _: StageSkipped => true
        case _ => false
      })

    def ready(s: StageDef): Boolean =
      (s.dependsOn ++ s.gateDeps).forall(d => results.containsKey(d))

    def gateHolds(s: StageDef): Boolean =
      s.gate.forall(g => g(results.asScala.toMap))

    def schedule(): Unit = lock.synchronized {
      // Loop to a fixpoint instead of recursing: a skip recorded in this pass
      // can make dependents schedulable (as skips) in the next pass. Each
      // stage is claimed via remove()'s return value so a stage observed in
      // an earlier snapshot can never be submitted twice.
      var progressed = true
      while (progressed) {
        progressed = false
        remaining.values().asScala.toSeq.filter(ready).foreach { s =>
          if (remaining.remove(s.name) != null) {
            if (!gateHolds(s)) {
              results.put(s.name, StageSkipped("condition not met"))
              done.countDown()
              progressed = true
            } else failedDep(s) match {
              case Some(dep) =>
                results.put(s.name, StageSkipped(dep))
                done.countDown()
                progressed = true
              case None =>
                pool.submit(new Runnable {
                  def run(): Unit = {
                    results.put(s.name, runStage(s))
                    done.countDown()
                    schedule()
                  }
                })
            }
          }
        }
      }
    }

    def runStage(s: StageDef): StageResult = {
      val inputs: Map[String, DataFrame] =
        s.dependsOn.map(d => d -> results.get(d).asInstanceOf[StageSucceeded].df).toMap
      var attempt = 0
      var lastError: Throwable = null
      val beatLog = List.newBuilder[Long]
      val needsMonitor = s.timeoutMs.isDefined || s.heartbeatMs.isDefined
      val sparkOpt =
        if (needsMonitor)
          org.apache.spark.sql.SparkSession.getActiveSession
            .orElse(org.apache.spark.sql.SparkSession.getDefaultSession)
        else None
      try {
        while (attempt < s.retry.maxAttempts) {
          attempt += 1
          if (attempt > 1)
            try Thread.sleep(s.retry.backoffBeforeAttempt(attempt))
            catch { case _: InterruptedException => () } // late monitor fire
          val worker = Thread.currentThread()
          val killedFor =
            new java.util.concurrent.atomic.AtomicReference[Throwable](null)
          val attemptDone = new java.util.concurrent.atomic.AtomicBoolean(false)
          val lastBeat =
            new java.util.concurrent.atomic.AtomicLong(System.currentTimeMillis())
          val jobTag = s"graft-flow-${flow.name}-${s.name}-$attempt-${System.nanoTime()}"
          val beat: () => Unit = () => {
            val now = System.currentTimeMillis()
            lastBeat.set(now)
            beatLog.synchronized { beatLog += now }
          }
          // a late check firing after the attempt completed must not leak
          // an interrupt into the next attempt / the pool's next stage.
          // attemptLock makes the check-and-interrupt atomic against the
          // finally block's set-done-and-clear: without it, kill() could
          // read attemptDone==false, the worker's finally could then
          // complete (clearing the flag) and return the pooled thread to
          // another stage, and only THEN would interrupt() land — failing
          // an unrelated stage's attempt.
          val attemptLock = new Object
          def kill(e: Throwable): Unit = attemptLock.synchronized {
            if (!attemptDone.get() && killedFor.compareAndSet(null, e)) {
              sparkOpt.foreach(sp =>
                try sp.sparkContext.cancelJobGroup(jobTag)
                catch { case NonFatal(_) => () })
              worker.interrupt()
            }
          }
          val checks = mutable.Buffer.empty[java.util.concurrent.ScheduledFuture[_]]
          s.timeoutMs.foreach { t =>
            checks += monitor.schedule(new Runnable {
              def run(): Unit = kill(new StageTimeoutException(s.name, t))
            }, t, TimeUnit.MILLISECONDS)
          }
          // attempt start is the first liveness observation, so the run
          // record carries beats even for attempts shorter than the interval
          if (s.heartbeatMs.isDefined) beat()
          s.heartbeatMs.foreach { hb =>
            val period = math.max(1L, hb / 2)
            val seenCompleted = new java.util.concurrent.atomic.AtomicLong(0L)
            checks += monitor.scheduleAtFixedRate(new Runnable {
              def run(): Unit = {
                // Spark task progress in this attempt's job group counts as
                // liveness (reference FlowExecutor.scala:204-206: an
                // executing statement is alive) — polled synchronously via
                // the public status tracker, so there is no listener-bus
                // delivery race against attempt completion
                sparkOpt.foreach { sp =>
                  try {
                    val st = sp.sparkContext.statusTracker
                    var completed = 0L
                    var active = 0L
                    st.getJobIdsForGroup(jobTag).foreach { jid =>
                      st.getJobInfo(jid).foreach { ji =>
                        ji.stageIds().foreach { sid =>
                          st.getStageInfo(sid).foreach { si =>
                            completed += si.numCompletedTasks()
                            active += si.numActiveTasks()
                          }
                        }
                      }
                    }
                    if (active > 0 || completed != seenCompleted.getAndSet(completed))
                      beat()
                  } catch { case NonFatal(_) => () }
                }
                if (System.currentTimeMillis() - lastBeat.get() > hb)
                  kill(new StageHeartbeatException(s.name, hb))
              }
            }, period, period, TimeUnit.MILLISECONDS)
          }
          try {
            // the job group (thread-local) lets the monitor cancel THIS
            // attempt's Spark jobs server-side, and lets the heartbeat
            // check attribute task progress to this attempt
            sparkOpt.foreach(_.sparkContext.setJobGroup(jobTag,
              s"flow ${flow.name} stage ${s.name} attempt $attempt",
              interruptOnCancel = true))
            val df = s.runWithHeartbeat
              .map(f => f(inputs, beat))
              .getOrElse(s.run(inputs))
            // materialize: break lineage so downstream stages (and their
            // retries) do not re-execute this stage's work
            val out = if (s.materialize) df.localCheckpoint(true) else df
            return StageSucceeded(out, attempt)
          } catch {
            case e: Throwable if NonFatal(e) || e.isInstanceOf[InterruptedException] =>
              lastError = Option(killedFor.get()).getOrElse(e)
          } finally {
            // same lock as kill(): either kill wins (interrupt lands before
            // the flag flips and is cleared right here) or this block wins
            // (attemptDone true → kill no-ops). No third interleaving.
            attemptLock.synchronized {
              attemptDone.set(true)
              Thread.interrupted() // clear any pending monitor interrupt
            }
            checks.foreach(_.cancel(false))
            sparkOpt.foreach(_.sparkContext.clearJobGroup())
          }
        }
        StageFailed(lastError, attempt)
      } finally {
        val beats = beatLog.synchronized(beatLog.result())
        if (beats.nonEmpty) heartbeatLog.put(s.name, beats)
      }
    }

    try {
      schedule()
      done.await(1, TimeUnit.HOURS)
    } finally {
      pool.shutdown()
    }
    FlowResult(flow.name, results.asScala.toMap, heartbeatLog.asScala.toMap)
  }

  private def validate(flow: FlowDef): Unit = {
    val names = flow.stages.map(_.name)
    require(names.distinct.size == names.size,
      s"duplicate stage names in flow ${flow.name}")
    val nameSet = names.toSet
    flow.stages.foreach { s =>
      (s.dependsOn ++ s.gateDeps).foreach { d =>
        require(nameSet.contains(d), s"stage ${s.name} depends on unknown stage $d")
        require(d != s.name, s"stage ${s.name} depends on itself")
      }
    }
    // cycle check: Kahn's algorithm must consume every stage
    val indeg = mutable.Map(
      flow.stages.map(s => s.name -> (s.dependsOn ++ s.gateDeps).distinct.size): _*)
    val dependents = flow.stages
      .flatMap(s => (s.dependsOn ++ s.gateDeps).distinct.map(_ -> s.name))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val queue = mutable.Queue(names.filter(indeg(_) == 0): _*)
    var seen = 0
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      seen += 1
      dependents.getOrElse(n, Nil).foreach { m =>
        indeg(m) -= 1
        if (indeg(m) == 0) queue += m
      }
    }
    require(seen == names.size, s"flow ${flow.name} has a dependency cycle")
  }
}
