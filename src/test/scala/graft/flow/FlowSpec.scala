package graft.flow

import graft.SparkTestBase
import org.apache.spark.sql.{functions => F}
import java.util.concurrent.atomic.AtomicInteger

class FlowSpec extends SparkTestBase {

  test("3-stage DAG with an injected transient failure recovers via retry") {
    import spark.implicits._
    val attempts = new AtomicInteger(0)
    val flow = FlowDef("etl", Seq(
      StageDef("extract", _ => Seq((1, "a"), (2, "b"), (3, "a")).toDF("id", "tag")),
      StageDef(
        "transform",
        inputs => {
          // fail the first attempt AFTER producing a plan — the executor must
          // retry and succeed on attempt 2
          if (attempts.incrementAndGet() == 1)
            throw new RuntimeException("transient: simulated executor loss")
          inputs("extract").groupBy("tag").agg(F.count(F.lit(1)).as("n"))
        },
        dependsOn = Seq("extract"),
        retry = RetryPolicy(maxAttempts = 3, initialBackoffMs = 10)),
      StageDef(
        "load",
        inputs => inputs("transform").orderBy("tag"),
        dependsOn = Seq("transform"))
    ))
    val result = FlowExecutor.run(flow)
    assert(result.succeeded)
    assert(result.stages("transform").attempts == 2)
    val rows = result("load").collect()
    assert(rows.map(r => (r.getString(0), r.getLong(1))).toList == List(("a", 2L), ("b", 1L)))
  }

  test("permanent failure skips the downstream cone, independent stages run") {
    import spark.implicits._
    val flow = FlowDef("partial", Seq(
      StageDef("ok_root", _ => Seq(1, 2).toDF("v")),
      StageDef("bad", _ => throw new RuntimeException("boom"),
        retry = RetryPolicy(maxAttempts = 2, initialBackoffMs = 5)),
      StageDef("child_of_bad", inputs => inputs("bad"), dependsOn = Seq("bad")),
      StageDef("ok_leaf", inputs => inputs("ok_root").agg(F.sum("v").as("s")),
        dependsOn = Seq("ok_root"))
    ))
    val result = FlowExecutor.run(flow)
    assert(!result.succeeded)
    assert(result.stages("bad").asInstanceOf[StageFailed].attempts == 2)
    assert(result.stages("child_of_bad") == StageSkipped("bad"))
    assert(result("ok_leaf").collect().head.getLong(0) == 3L)
    intercept[IllegalStateException] { result("bad") }
    intercept[IllegalStateException] { result("child_of_bad") }
  }

  test("a gate-skip alongside launchable siblings never double-submits a stage") {
    import spark.implicits._
    // Regression: schedule() used to recurse inside the foreach over a stale
    // snapshot, so a skip occurring while siblings were launchable submitted
    // those siblings twice (duplicate execution + early latch release).
    val runs = Map("a" -> new AtomicInteger(0), "b" -> new AtomicInteger(0),
      "c" -> new AtomicInteger(0))
    val flow = FlowDef("skip_race", Seq(
      StageDef("skipped", _ => Seq(1).toDF("v"), gate = Some(_ => false)),
      StageDef("a", _ => { runs("a").incrementAndGet(); Seq(1).toDF("v") }),
      StageDef("b", _ => { runs("b").incrementAndGet(); Seq(2).toDF("v") }),
      StageDef("c", in => { runs("c").incrementAndGet(); in("a").union(in("b")) },
        dependsOn = Seq("a", "b"))
    ))
    val result = FlowExecutor.run(flow, parallelism = 4)
    assert(result.stages("skipped").isInstanceOf[StageSkipped])
    assert(result("c").collect().map(_.getInt(0)).sorted.toList == List(1, 2))
    runs.foreach { case (n, cnt) => assert(cnt.get() == 1, s"stage $n ran ${cnt.get()} times") }
  }

  test("diamond dependencies merge both parents' results") {
    import spark.implicits._
    val flow = FlowDef("diamond", Seq(
      StageDef("src", _ => Seq((1, 10), (2, 20)).toDF("id", "v"), materialize = true),
      StageDef("left", in => in("src").withColumn("v", F.col("v") * 2), dependsOn = Seq("src")),
      StageDef("right", in => in("src").withColumn("v", F.col("v") + 1), dependsOn = Seq("src")),
      StageDef("merge", in => in("left").union(in("right")), dependsOn = Seq("left", "right"))
    ))
    val result = FlowExecutor.run(flow)
    assert(result.succeeded)
    assert(result("merge").agg(F.sum("v")).collect().head.getLong(0) == (20 + 40 + 11 + 21))
  }

  test("cron schedule: parse, matches, nextAfter") {
    import java.time.{ZonedDateTime, ZoneId}
    val utc = ZoneId.of("UTC")
    def at(s: String) = ZonedDateTime.parse(s + "[UTC]")
    val daily = CronSchedule.parse("30 9 * * *")
    assert(daily.matches(at("2026-08-12T09:30:00Z")))
    assert(!daily.matches(at("2026-08-12T09:31:00Z")))
    assert(daily.nextAfter(at("2026-08-12T09:30:00Z")) == at("2026-08-13T09:30:00Z"))
    val steps = CronSchedule.parse("*/15 0-6/2 1,15 * *")
    assert(steps.matches(at("2026-08-15T04:45:00Z")))
    assert(!steps.matches(at("2026-08-14T04:45:00Z")))
    // dom/dow either-match when both restricted; 7 == Sunday == 0
    val either = CronSchedule.parse("0 0 13 * 7")
    assert(either.matches(at("2026-08-13T00:00:00Z"))) // 13th (a Thursday)
    assert(either.matches(at("2026-08-16T00:00:00Z"))) // a Sunday
    assert(!either.matches(at("2026-08-14T00:00:00Z")))
    intercept[IllegalArgumentException] { CronSchedule.parse("* * *") }
    intercept[IllegalArgumentException] { CronSchedule.parse("61 * * * *") }
  }

  test("scheduler fires a due flow under a fake clock") {
    import java.time.Instant
    var now = Instant.parse("2026-08-12T08:59:00Z")
    val sched = new FlowScheduler(clock = () => now)
    val fired = new AtomicInteger(0)
    sched.register("nightly", "0 9 * * *", () => { fired.incrementAndGet(); () })
    assert(sched.tick() == Nil) // 08:59 — not due
    now = Instant.parse("2026-08-12T09:00:10Z")
    assert(sched.tick() == List("nightly"))
    assert(fired.get() == 1)
    assert(sched.tick() == Nil) // same minute: already fired, next is tomorrow
    now = Instant.parse("2026-08-13T09:00:00Z")
    assert(sched.tick() == List("nightly"))
    assert(fired.get() == 2)
  }

  test("per-flow timezone: a Tokyo 2am schedule fires at Tokyo 2am, not UTC") {
    import java.time.Instant
    var now = Instant.parse("2026-08-12T16:59:00Z") // 01:59 Tokyo (+9)
    val sched = new FlowScheduler(clock = () => now) // default zone UTC
    val fired = new AtomicInteger(0)
    sched.register("tokyo_nightly", "0 2 * * *",
      () => { fired.incrementAndGet(); () },
      zoneOverride = Some(java.time.ZoneId.of("Asia/Tokyo")))
    assert(sched.tick() == Nil) // 01:59 Tokyo — not due
    now = Instant.parse("2026-08-12T17:00:05Z") // 02:00 Tokyo
    assert(sched.tick() == List("tokyo_nightly"))
    assert(fired.get() == 1)
    // a UTC 2am registration would NOT have fired at this instant
    sched.register("utc_nightly", "0 2 * * *", () => ())
    assert(sched.tick() == Nil)
  }

  test("language flows with schedule metadata register and run on fire") {
    import graft.lang.{Lowering, Parser, FlowRunner}
    import java.time.Instant
    val text = """
      flow Nightly with { schedule: cron('0 3 * * *') } = {
        stage src = from [[1], [2]] as t(v)
        stage agg = from src | count
      }
    """
    val ctx = Lowering.Context(spark, n => fail(s"unexpected table $n"))
    Lowering.lowerStatements(Parser.parseStatements(text), ctx)
    var now = Instant.parse("2026-08-12T03:00:00Z")
    val sched = new FlowScheduler(clock = () => now)
    assert(FlowRunner.scheduleFlows(sched, ctx) == List("Nightly"))
    assert(sched.tick() == List("Nightly")) // runs the flow via FlowRunner
  }

  test("wait until polls a live condition") {
    import graft.lang.{Lowering, Parser, LoweringException}
    val tmp = java.nio.file.Files.createTempDirectory("graft_wait").toString
    // condition initially false; a writer thread satisfies it mid-poll
    import spark.implicits._
    Seq.empty[Int].toDF("v").write.parquet(s"$tmp/sensor.parquet")
    val writer = new Thread(() => {
      Thread.sleep(400)
      // append (not overwrite): a sensor source is append-only, and an
      // overwrite would race the poll's file listing
      Seq(1).toDF("v").write.mode("append").parquet(s"$tmp/sensor.parquet")
    })
    writer.start()
    val df = graft.Graft.query(spark, s"""
      from [[1]] as t(x)
      | wait until (from '$tmp/sensor.parquet' agg _.count) > 0 for '10 s'
    """, n => fail(s"unexpected table $n"))
    writer.join()
    assert(df.count() == 1)
    intercept[LoweringException] {
      graft.Graft.query(spark, s"""
        from [[1]] as t(x)
        | wait until 1 > 2 for '200 ms'
      """, n => fail(s"unexpected table $n"))
    }
  }

  test("timeout kills a hung attempt, consumes a retry, next attempt succeeds") {
    import spark.implicits._
    val attempts = new AtomicInteger(0)
    val t0 = System.currentTimeMillis()
    val flow = FlowDef("timed", Seq(
      StageDef("hang_once",
        run = _ => {
          if (attempts.incrementAndGet() == 1) Thread.sleep(60_000) // hung attempt
          Seq(1, 2, 3).toDF("v")
        },
        retry = RetryPolicy(maxAttempts = 2, initialBackoffMs = 5),
        timeoutMs = Some(400)),
      StageDef("downstream", inputs => inputs("hang_once").agg(F.sum("v").as("s")),
        dependsOn = Seq("hang_once"))
    ))
    val result = FlowExecutor.run(flow)
    assert(result.succeeded, result.stages.toString)
    // the timed-out attempt CONSUMED a retry — success came on attempt 2
    assert(result.stages("hang_once").attempts == 2)
    assert(result("downstream").collect().head.getLong(0) == 6L)
    // the hung attempt was killed at ~400ms, not at the 60s sleep
    assert(System.currentTimeMillis() - t0 < 30_000, "timeout did not fire")
  }

  test("timeout exhausting retries fails with StageTimeoutException, skips the cone") {
    import spark.implicits._
    val t0 = System.currentTimeMillis()
    val flow = FlowDef("timed_fail", Seq(
      StageDef("hangs",
        run = _ => { Thread.sleep(60_000); Seq(1).toDF("v") },
        retry = RetryPolicy(maxAttempts = 2, initialBackoffMs = 5),
        timeoutMs = Some(300)),
      StageDef("child", inputs => inputs("hangs"), dependsOn = Seq("hangs"))
    ))
    val result = FlowExecutor.run(flow)
    assert(!result.succeeded)
    val failed = result.stages("hangs").asInstanceOf[StageFailed]
    assert(failed.attempts == 2)
    assert(failed.error.isInstanceOf[StageTimeoutException], failed.error.toString)
    assert(result.stages("child") == StageSkipped("hangs"))
    assert(System.currentTimeMillis() - t0 < 30_000)
  }

  test("heartbeat: a beating slow stage survives, a silent one is killed") {
    import spark.implicits._
    val flow = FlowDef("hb", Seq(
      StageDef("hb_ok",
        run = _ => fail("runWithHeartbeat must take precedence"),
        runWithHeartbeat = Some((_, beat) => {
          // 8 × 100ms of work, each slice reporting liveness — total run
          // (800ms) far exceeds the 400ms interval, but beats keep it alive
          (1 to 8).foreach { _ => Thread.sleep(100); beat() }
          Seq(1).toDF("v")
        }),
        heartbeatMs = Some(400)),
      StageDef("hb_stall",
        run = _ => { Thread.sleep(60_000); Seq(1).toDF("v") },
        heartbeatMs = Some(300))
    ))
    val result = FlowExecutor.run(flow)
    assert(result.stages("hb_ok").isInstanceOf[StageSucceeded],
      result.stages("hb_ok").toString)
    val stalled = result.stages("hb_stall").asInstanceOf[StageFailed]
    assert(stalled.error.isInstanceOf[StageHeartbeatException], stalled.error.toString)
    // explicit beats are recorded for the run store
    assert(result.heartbeats.getOrElse("hb_ok", Nil).size >= 8,
      result.heartbeats.toString)
  }

  test("spark task completions count as heartbeats (executing work is alive)") {
    // No explicit beat() calls: the stage runs ~2.5s of Spark actions under
    // a 1.5s heartbeat interval — task-end events in the stage's job group
    // must keep the attempt alive (reference: an executing statement counts
    // as alive; FlowExecutor.scala:204-206).
    import spark.implicits._
    val flow = FlowDef("hb_auto", Seq(
      StageDef("working",
        run = _ => {
          (1 to 8).foreach { _ =>
            spark.range(0, 2_000_000, 1, 8).agg(F.sum("id")).collect()
          }
          Seq(1).toDF("v")
        },
        heartbeatMs = Some(1500))
    ))
    val result = FlowExecutor.run(flow)
    assert(result.stages("working").isInstanceOf[StageSucceeded],
      result.stages("working").toString)
    assert(result.heartbeats.getOrElse("working", Nil).nonEmpty,
      "task-end events should have been recorded as heartbeats")
  }

  test("run store roundtrips heartbeat timestamps") {
    val dir = java.nio.file.Files.createTempDirectory("flow_hb_store")
    val store = new FlowRunStore(dir)
    val beats = List(1000L, 2000L, 3000L)
    store.save(FlowRunRecord("r1", "hbflow", "success", 500L, Some(4000L),
      List(StageRunRecord("s", "success", 1, None, beats))))
    val back = store.get("r1").get
    assert(back.stages.head.heartbeatsMs == beats, back.toString)
  }

  test("flow validation: cycles, unknown deps, duplicates") {
    import spark.implicits._
    def s(n: String, deps: String*) = StageDef(n, _ => Seq(1).toDF("v"), dependsOn = deps)
    intercept[IllegalArgumentException] {
      FlowExecutor.run(FlowDef("cyc", Seq(s("a", "b"), s("b", "a"))))
    }
    intercept[IllegalArgumentException] {
      FlowExecutor.run(FlowDef("unk", Seq(s("a", "nope"))))
    }
    intercept[IllegalArgumentException] {
      FlowExecutor.run(FlowDef("dup", Seq(s("a"), s("a"))))
    }
  }
}
