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
