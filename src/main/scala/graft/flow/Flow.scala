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
    gate: Option[Map[String, StageResult] => Boolean] = None
)

final case class FlowDef(name: String, stages: Seq[StageDef]) {
  def stage(name: String): StageDef = stages.find(_.name == name).get
}

sealed trait StageResult { def attempts: Int }
final case class StageSucceeded(df: DataFrame, attempts: Int) extends StageResult
final case class StageFailed(error: Throwable, attempts: Int) extends StageResult
final case class StageSkipped(failedDependency: String) extends StageResult {
  def attempts: Int = 0
}

final case class FlowResult(flow: String, stages: Map[String, StageResult]) {
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
      while (attempt < s.retry.maxAttempts) {
        attempt += 1
        if (attempt > 1)
          Thread.sleep(s.retry.backoffBeforeAttempt(attempt))
        try {
          val df = s.run(inputs)
          // materialize: break lineage so downstream stages (and their
          // retries) do not re-execute this stage's work
          val out = if (s.materialize) df.localCheckpoint(true) else df
          return StageSucceeded(out, attempt)
        } catch {
          case NonFatal(e) => lastError = e
        }
      }
      StageFailed(lastError, attempt)
    }

    try {
      schedule()
      done.await(1, TimeUnit.HOURS)
    } finally {
      pool.shutdown()
    }
    FlowResult(flow.name, results.asScala.toMap)
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
