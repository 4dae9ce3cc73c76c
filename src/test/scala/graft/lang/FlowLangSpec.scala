package graft.lang

import graft.SparkTestBase

/** Language-level flows (`flow F = { stage … }` + `run flow F`), mirroring
  * the reference's spec/basic/flow-run.wv scenarios. */
class FlowLangSpec extends SparkTestBase {

  test("healthy flow: all stages succeed, summary is pipeable") {
    wv("""
      flow ExecPipeline = {
        stage src = from [[1, 'a'], [2, 'b'], [3, 'a']] as t(id, name)
        stage filtered = from src | where name = 'a'
        stage output = from filtered | select id
      }
      run flow ExecPipeline
      test _.size should be 3
      test _.columns should be ['stage', 'state', 'attempts', 'error']
      ;
      run flow ExecPipeline
      | where state = 'success'
      count
      test _.rows should be [[3]]
    """)
  }

  test("flow runs persist across a store restart; retention caps history") {
    val dir = java.nio.file.Files.createTempDirectory("flow_runs").toString
    spark.conf.set("graft.flow.runStoreDir", dir)
    try {
      wv("""
        flow Persisted = {
          stage src = from [[1], [2]] as t(id)
          stage out = from src | count
        }
        run flow Persisted
      """).collect()
      // "restart": a NEW store instance over the same directory reads the
      // persisted attempt history
      val store = new graft.flow.FlowRunStore(java.nio.file.Paths.get(dir))
      val rec = store.latestRunOf("Persisted").get
      assert(rec.state == "success" && rec.stages.map(_.name) == List("src", "out"),
        rec.toString)
      assert(rec.stages.forall(s => s.status == "success" && s.attempts == 1))
      assert(rec.finishedAtMillis.exists(_ >= rec.startedAtMillis))
      // the language surface reads the same records
      val shown = wv("show flow_runs").collect()
      assert(shown.length == 1 && shown.head.getAs[String]("flow") == "Persisted",
        shown.toSeq.toString)
      assert(shown.head.getAs[String]("stages") == "src:success:1,out:success:1")
      // retention: cap at 2 — running the flow 3 more times leaves 2 records
      spark.conf.set("graft.flow.keepRuns", "2")
      (1 to 3).foreach { _ =>
        wv("""
          flow Persisted = {
            stage src = from [[1], [2]] as t(id)
            stage out = from src | count
          }
          run flow Persisted
        """).collect()
      }
      val after = new graft.flow.FlowRunStore(java.nio.file.Paths.get(dir)).list()
      assert(after.length == 2, s"retention should keep 2 runs, got ${after.length}")
      assert(after.forall(_.flowName == "Persisted"))
      // a failed run records its stage errors
      spark.conf.unset("graft.flow.keepRuns")
      wv("""
        flow PersistedFail = {
          stage bad = from [[1]] as t(id) | where missing_col > 0
        }
        run flow PersistedFail
      """).collect()
      val failed = new graft.flow.FlowRunStore(java.nio.file.Paths.get(dir))
        .latestRunOf("PersistedFail").get
      assert(failed.state == "failed" && failed.stages.head.error.isDefined,
        failed.toString)
    } finally {
      spark.conf.unset("graft.flow.runStoreDir")
      spark.conf.unset("graft.flow.keepRuns")
    }
  }

  test("failing stage triggers its fallback and skips downstream") {
    val rows = wv("""
      flow FallbackPipeline = {
        stage broken = from nonexistent_table_xyz
        stage fallback if broken.failed = from [[0]] as t(id)
        stage downstream = from broken | select *
      }
      run flow FallbackPipeline
      select stage, state
    """).collect()
    assert(rows.map(r => (r.getString(0), r.getString(1))).toList ==
      List(("broken", "failed"), ("fallback", "success"), ("downstream", "skipped")))
  }

  test("retries are exhausted before the failed state") {
    wv("""
      flow RetryPipeline = {
        stage flaky with {
          retries: 2
          retry_delay: 1ms
        } = from nonexistent_table_xyz
      }
      run flow RetryPipeline
      | where state = 'failed' and attempts = 3
      count
      test _.rows should be [[1]]
    """)
  }

  test("merge fan-in unions stage outputs; flow params bind") {
    wv("""
      flow MergePipeline(min_id: int = 1) = {
        stage source_a = from [[1], [2]] as t(id)
        stage source_b = from [[3]] as t(id)
        stage merged = merge source_a, source_b
        stage output = from merged | where id >= min_id
      }
      run flow MergePipeline
      | where state = 'success'
      count
      test _.rows should be [[4]]
    """)
    // named + positional argument binding
    wv("""
      flow ParamPipeline(target_name: string, min_id: int = 1) = {
        stage src = from [[1, 'a'], [2, 'b'], [3, 'a']] as t(id, name)
        stage filtered = from src | where name = target_name and id >= min_id
      }
      run flow ParamPipeline(target_name = 'a')
      | where state = 'success'
      count
      test _.rows should be [[2]]
    """)
    intercept[LoweringException] {
      wv("""
        flow P(x: int) = { stage s = from [[1]] as t(id) }
        run flow P
      """)
    }
  }

  test("route: consumers read the routing stage filtered by their case") {
    // routed targets see only their slice — verified through a counting stage
    val rows = wv("""
      flow RoutedPipeline = {
        stage src = from [[1, 25], [2, 15], [3, 40]] as t(id, age)
        stage gate = from src | route {
          case _.age >= 18 -> adult
          else -> minor
        }
        stage adult = from gate | select id
        stage minor = from gate | select id
        stage audit = from adult | count
      }
      run flow RoutedPipeline
      | where state = 'success'
      count
      test _.rows should be [[5]]
    """).collect()
    // and the data slice itself: run again, checking adult row count via audit
    val flowText = """
      flow R2 = {
        stage src = from [[1, 25], [2, 15], [3, 40]] as t(id, age)
        stage gate = from src | route {
          case _.age >= 18 -> adult
          else -> minor
        }
        stage adult = from gate | count
        stage minor = from gate | count
      }
      run flow R2
    """
    val ctx = Lowering.Context(spark, name => table(name))
    val stmts = Parser.parseStatements(flowText)
    Lowering.lowerStatements(stmts, ctx)
    val fd = ctx.flows("R2")
    val summary = FlowRunner.run(fd, Nil, ctx)
    assert(summary.filter("state = 'success'").count() == 4)
  }

  test("route: rows with NULL case conditions fall through to else") {
    // age NULL → `_.age >= 18` is NULL → must reach the else target, not vanish
    val flowText = """
      flow RNull = {
        stage src = from [[1, 25], [2, null], [3, 10]] as t(id, age)
        stage gate = from src | route {
          case _.age >= 18 -> adult
          else -> minor
        }
        stage adult = from gate | count
        stage minor = from gate | count
      }
      run flow RNull
    """
    val ctx = Lowering.Context(spark, name => table(name))
    Lowering.lowerStatements(Parser.parseStatements(flowText), ctx)
    val res = graft.flow.FlowExecutor.run(FlowRunner.toFlowDef(ctx.flows("RNull"), Nil, ctx))
    assert(res("adult").collect().head.getLong(0) == 1L)
    assert(res("minor").collect().head.getLong(0) == 2L, "NULL-age row must land in else")
  }

  test("wait / activate / end are executable orchestration steps") {
    wv("""
      flow JourneyPipeline = {
        stage entry = from [[1], [2]] as t(id)
        stage delayed = from entry | wait('10 ms')
        stage send = from delayed | activate('email')
        stage done = from send | end()
      }
      run flow JourneyPipeline
      | where state = 'success'
      count
      test _.rows should be [[4]]
    """)
  }

  test("-> Flow jump triggers the target as a new run after completion") {
    val dir = java.nio.file.Files.createTempDirectory("flow_jump_runs").toString
    spark.conf.set("graft.flow.runStoreDir", dir)
    try {
      wv("""
        flow Retention = {
          stage welcome = from [[1]] as t(id) | activate('email')
        }
        flow Main = {
          stage entry = from [[1], [2]] as t(id)
          stage handoff = from entry | -> Retention
        }
        run flow Main
      """).collect()
      val store = new graft.flow.FlowRunStore(java.nio.file.Paths.get(dir))
      val runs = store.list()
      // BOTH flows have a run record: Main ran, then the jump triggered
      // Retention as its own run (own runId)
      assert(runs.map(_.flowName).toSet == Set("Main", "Retention"), runs.toString)
      assert(runs.forall(_.state == "success"), runs.toString)
      // a jump to an unknown flow is a warning, never a crash
      wv("""
        flow Solo = {
          stage s = from [[1]] as t(id) | -> NoSuchFlow
        }
        run flow Solo
      """).collect()
      assert(store.latestRunOf("Solo").exists(_.state == "success"))
      // a jump CYCLE stops at the depth bound instead of spinning forever
      wv("""
        flow PingA = { stage a = from [[1]] as t(id) | -> PingB }
        flow PingB = { stage b = from [[1]] as t(id) | -> PingA }
        run flow PingA
      """).collect()
      val pings = new graft.flow.FlowRunStore(java.nio.file.Paths.get(dir)).list()
        .count(r => r.flowName == "PingA" || r.flowName == "PingB")
      assert(pings >= 2 && pings <= 8, s"jump chain ran $pings times")
      // a jump recorded mid-pipe in a stage that then FAILS (the select
      // after the jump references an unknown column) must NOT fire: jumps
      // transfer control only from stages that succeeded
      wv("""
        flow NeverRun = { stage w = from [[1]] as t(id) }
        flow MainFail = {
          stage entry = from [[1], [2]] as t(id)
          stage handoff = from entry | -> NeverRun | select no_such_column
        }
        run flow MainFail
      """).collect()
      val after = new graft.flow.FlowRunStore(java.nio.file.Paths.get(dir)).list()
      assert(after.exists(r => r.flowName == "MainFail" && r.state == "failed"),
        after.toString)
      assert(!after.exists(_.flowName == "NeverRun"),
        "jump from a failed stage must not trigger the target flow")
    } finally spark.conf.unset("graft.flow.runStoreDir")
  }

  test("flow-level concurrency limit records an overflowing run as skipped") {
    val dir = java.nio.file.Files.createTempDirectory("flow_conc_runs").toString
    spark.conf.set("graft.flow.runStoreDir", dir)
    try {
      // plant a RUNNING record (another process mid-run over the same
      // warehouse); concurrency: 1 must then skip this run
      val store = new graft.flow.FlowRunStore(java.nio.file.Paths.get(dir))
      store.save(graft.flow.FlowRunRecord("other-run", "Limited", "running",
        System.currentTimeMillis(), None,
        List(graft.flow.StageRunRecord("s", "running", 0, None))))
      val summary = wv("""
        flow Limited with {concurrency: 1} = {
          stage s = from [[1]] as t(id)
        }
        run flow Limited
      """).collect()
      assert(summary.forall(_.getAs[String]("state") == "skipped"), summary.toSeq.toString)
      val skipped = store.list().filter(r => r.flowName == "Limited" && r.state == "skipped")
      assert(skipped.nonEmpty, store.list().toString)
      // slot freed → the next run executes
      store.delete("other-run")
      val again = wv("""
        flow Limited with {concurrency: 1} = {
          stage s = from [[1]] as t(id)
        }
        run flow Limited
      """).collect()
      assert(again.forall(_.getAs[String]("state") == "success"), again.toSeq.toString)
    } finally spark.conf.unset("graft.flow.runStoreDir")
  }

  test("expired lease frees the concurrency slot; flow-level gates evaluate") {
    val dir = java.nio.file.Files.createTempDirectory("flow_lease_runs").toString
    spark.conf.set("graft.flow.runStoreDir", dir)
    try {
      val store = new graft.flow.FlowRunStore(java.nio.file.Paths.get(dir))
      // a crashed process' running record: lease long expired → it must
      // NOT hold the concurrency slot (reference lease semantics)
      store.save(graft.flow.FlowRunRecord("crashed-run", "Leased", "running",
        System.currentTimeMillis() - 120000, None,
        List(graft.flow.StageRunRecord("s", "running", 0, None)),
        leaseExpiresAtMillis = Some(System.currentTimeMillis() - 60000)))
      val summary = wv("""
        flow Leased with {concurrency: 1} = {
          stage s = from [[1]] as t(id)
        }
        run flow Leased
      """).collect()
      assert(summary.forall(_.getAs[String]("state") == "success"),
        s"expired lease should free the slot: ${summary.toSeq}")
      // flow-level gate: `if Other.failed` — Other's latest run SUCCEEDED,
      // so the recovery flow records a skipped run...
      val s1 = wv("""
        flow Upstream = { stage ok = from [[1]] as t(id) }
        flow Recovery if Upstream.failed = { stage alert = from [[1]] as t(id) }
        run flow Upstream
        run flow Recovery
      """).collect()
      assert(s1.forall(_.getAs[String]("state") == "skipped"), s1.toSeq.toString)
      // ...and the expired-lease record reads as FAILED for gates: a gate
      // on Leased2.failed is met by a dead running record
      store.save(graft.flow.FlowRunRecord("crashed-2", "Upstream2", "running",
        System.currentTimeMillis() - 120000, None,
        List(graft.flow.StageRunRecord("s", "running", 0, None)),
        leaseExpiresAtMillis = Some(System.currentTimeMillis() - 60000)))
      val s2 = wv("""
        flow Recovery2 if Upstream2.failed = { stage alert = from [[1]] as t(id) }
        run flow Recovery2
      """).collect()
      assert(s2.forall(_.getAs[String]("state") == "success"), s2.toSeq.toString)
      // depends on: unmet without a successful upstream run
      val s3 = wv("""
        flow Dependent depends on NeverRan = { stage s = from [[1]] as t(id) }
        run flow Dependent
      """).collect()
      assert(s3.forall(_.getAs[String]("state") == "skipped"), s3.toSeq.toString)
    } finally spark.conf.unset("graft.flow.runStoreDir")
  }

  test("stage timeout/heartbeat configs parse, execute, and persist beats") {
    val dir = java.nio.file.Files.createTempDirectory("flow_hb_runs").toString
    spark.conf.set("graft.flow.runStoreDir", dir)
    try {
      // healthy stages under generous timeout/heartbeat budgets succeed;
      // the activate stage materializes through real Spark jobs inside its
      // attempt, so task-end events land as automatic heartbeats in the
      // persisted record
      wv("""
        flow Guarded = {
          stage src with {timeout: 60s} = from lineitem | limit 100
          stage sink with {timeout: 60s, heartbeat: 30s} = from src | activate('email')
        }
        run flow Guarded
      """).collect()
      val rec = new graft.flow.FlowRunStore(java.nio.file.Paths.get(dir))
        .latestRunOf("Guarded").get
      assert(rec.state == "success", rec.toString)
      val sink = rec.stages.find(_.name == "sink").get
      assert(sink.heartbeatsMs.nonEmpty,
        s"save stage should record task-progress heartbeats: $rec")
      // printer round-trip keeps the configs
      val printed = WvPrinter.print(Parser.parseStatements("""
        flow Guarded = {
          stage a with {retries: 2, retry_delay: 10ms, timeout: 5000ms, heartbeat: 1000ms} = from t
        }
      """))
      assert(printed.contains("timeout: 5000ms") && printed.contains("heartbeat: 1000ms"),
        printed)
      val reparsed = Parser.parseStatements(printed)
        .collectFirst { case f: FlowDefStmt => f.stages.head }.get
      assert(reparsed.timeoutMs.contains(5000L) && reparsed.heartbeatMs.contains(1000L))
    } finally {
      spark.conf.unset("graft.flow.runStoreDir")
    }
  }
}
