package graft

import org.scalatest.funsuite.AnyFunSuite

/** Governance gates for the settled-floor machinery (r14 verdict #1): the
  * retime self-defense is only as trustworthy as its floors file, so the
  * parser must never let a metadata field, typo'd key, or malformed value
  * become a floor. */
class BenchFloorsSpec extends AnyFunSuite {

  test("provenanced shape parses: floor value per q_ key") {
    val json =
      """{
        |  "_meta": {"tool":"graft.BenchSettle","generated":"2026-08-15T21:00:00Z",
        |            "sf":"/root/testdata/sf0.1","cpus":"32","runs_per_query":3},
        |  "floors": {
        |    "q_agg_pricing_summary": {"floor":0.280,"run":"2026-08-15T21:00:00Z","load":"1.2;1.3","settled":0.301},
        |    "q_dedup_minhash_lsh": {"floor":1.760,"run":"pre-r15 hand-maintained (TUNING.md)","load":"unknown"}
        |  }
        |}""".stripMargin
    val floors = Bench.referenceFloors(json)
    assert(floors == Map("q_agg_pricing_summary" -> 0.280, "q_dedup_minhash_lsh" -> 1.760))
  }

  test("legacy flat shape still parses") {
    val floors = Bench.referenceFloors("""{"q_count": 0.106, "q_cube": 0.189}""")
    assert(floors == Map("q_count" -> 0.106, "q_cube" -> 0.189))
  }

  test("metadata and non-q_ keys can never become floors") {
    // the r14 advisor finding: the old parser matched ANY "key": number
    // pair, so "sf":0.1 or "updated":20260815 would silently become a
    // floor for a query of that name
    val json =
      """{"sf":0.1,"updated":20260815,"cpus":32,"runs_per_query":3,
        |"Q_UPPER":1.0,"nq_count":2.0,"q_real": 1.5}""".stripMargin
    assert(Bench.referenceFloors(json) == Map("q_real" -> 1.5))
  }

  test("provenance string fields are never floors") {
    // "run"/"load" values are strings — must not be picked up; "settled"
    // and "prev" are numbers but their keys are not q_-prefixed
    val json = """{"floors":{"q_a":{"floor":2.0,"run":"2026-08-15T21:00:00Z","load":"9.9;9.9","settled":9.9,"prev":7.7}}}"""
    assert(Bench.referenceFloors(json) == Map("q_a" -> 2.0))
  }

  test("heavy rows (floor > 2 s) are timed 5 times; light rows keep the base") {
    // the dedup/cluster family's 2x intra-chunk spread with median-of-3
    // triggered retimes four rounds straight — rows with multi-second
    // floors get median-of-5 (r16 verdict #3)
    assert(Bench.runsFor(3, Some(4.99)) == 5)   // q_dedup_ngram_jaccard class
    assert(Bench.runsFor(3, Some(12.11)) == 5)
    assert(Bench.runsFor(3, Some(2.0)) == 3)    // boundary: strictly greater
    assert(Bench.runsFor(3, Some(0.3)) == 3)
    assert(Bench.runsFor(3, None) == 3)         // floorless rows keep base
    assert(Bench.runsFor(7, Some(9.0)) == 7)    // explicit higher base wins
  }

  test("malformed values are dropped, not defaulted") {
    assert(Bench.referenceFloors("""{"q_a": 1.0, "q_b": "oops", "q_c": }""") ==
      Map("q_a" -> 1.0))
  }

  test("a worse retime can never raise a row's effective number") {
    // the r15 regression scenario: q_tpcds_q22 median 1.47 s, retime child
    // ran as ambient load ramped 1.90→6.13 and measured 2.16 s — the
    // unclamped substitution REPLACED the better number with the worse one
    val loaded = Bench.QResult("q_tpcds_q22", 1.47, Seq(1.47), failed = false,
      retimed = Some(2.16))
    assert(Bench.effectiveSec(loaded) == 1.47)
    // the intended direction still works: a quiet retime lowers it
    val quiet = loaded.copy(retimed = Some(0.90))
    assert(Bench.effectiveSec(quiet) == 0.90)
    assert(Bench.effectiveSec(loaded.copy(retimed = None)) == 1.47)
  }

  test("settle log parses and agrees with the floors file's run stamps") {
    // synthetic round-trip of the parsers
    val log =
      """{"run":"2026-08-16T20:00:00Z","sf":"/root/testdata/sf0.1","mode":"min","only":"q_a,q_b","n_executed":2,"executed":["q_a","q_b"],"changed":["q_a"],"added":1,"lowered":0,"failures":0}
        |{"run":"2026-08-16T21:00:00Z","sf":"/root/testdata/sf0.1","mode":"replace","only":"","n_executed":1,"executed":["q_c"],"changed":["q_c"],"added":0,"lowered":1,"failures":0}
        |""".stripMargin
    val runs = BenchSettle.settleLogRuns(log)
    assert(runs == Seq(
      "2026-08-16T20:00:00Z" -> Set("q_a", "q_b"),
      "2026-08-16T21:00:00Z" -> Set("q_c")))
    val floors =
      """{"floors":{
        |  "q_a": {"floor":1.0,"run":"2026-08-16T20:00:00Z","load":"1;1","settled":1.0},
        |  "q_c": {"floor":2.0,"run":"2026-08-16T21:00:00Z","load":"1;1"}
        |}}""".stripMargin
    assert(BenchSettle.floorRunStamps(floors) ==
      Map("q_a" -> "2026-08-16T20:00:00Z", "q_c" -> "2026-08-16T21:00:00Z"))
  }

  test("log ≡ stamps over the repo's actual artifacts") {
    // every floor whose `run` stamp corresponds to a logged settle run
    // must be listed in that run's executed subset — a floor the log
    // cannot explain means hand edits or a logging gap
    val logPath = java.nio.file.Paths.get("BENCH_SETTLE_LOG.jsonl")
    val floorsPath = java.nio.file.Paths.get("BENCH_REFERENCE.json")
    if (java.nio.file.Files.exists(logPath) && java.nio.file.Files.exists(floorsPath)) {
      val byRun = BenchSettle.settleLogRuns(java.nio.file.Files.readString(logPath))
        .groupMapReduce(_._1)(_._2)(_ ++ _)
      val stamps = BenchSettle.floorRunStamps(java.nio.file.Files.readString(floorsPath))
      val orphans = stamps.collect {
        case (name, run) if byRun.contains(run) && !byRun(run).contains(name) => s"$name@$run"
      }
      assert(orphans.isEmpty,
        s"floors stamped to a logged run that did not execute them: ${orphans.mkString(", ")}")
    }
  }

  test("micro-rows keep their floor but not a ratio in the detail artifact") {
    assert(Bench.MicroFloorSec == 0.3)
  }

  test("control rows are real suite queries with oracle entries") {
    // a control row that drifts out of the suite would silently drop from
    // the control_ratio stamp
    Bench.controlRows.foreach { n =>
      assert(SparkEntry.queries.contains(n), s"control row $n not in the suite")
      assert(SparkEntry.oracleSql.contains(n), s"control row $n has no oracle")
    }
  }
}
