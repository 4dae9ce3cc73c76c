package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.types._
import java.nio.file.Files
import java.sql.Timestamp

/** Gap-sessionization semantics: the pure merge kernel, batch/stream
  * equivalence over micro-batches (including a late bridging event — the
  * case that forces sessions to stay open until the watermark proves no
  * merge can still happen), and the language surface driving both plans
  * from one recorded subscribe() site. */
class SessionizeSpec extends SparkTestBase {
  import Sessionize.{Sess, merge}

  private val schema = StructType(Seq(
    StructField("ts", TimestampType),
    StructField("event_type", StringType),
    StructField("value", DoubleType)))

  private def writeBatch(dir: String, name: String, rows: Seq[(String, String, Double)]): Unit = {
    import scala.jdk.CollectionConverters._
    val data = rows.map { case (ts, et, v) =>
      org.apache.spark.sql.Row(Timestamp.valueOf(ts), et, v)
    }
    spark.createDataFrame(data.asJava, schema)
      .coalesce(1).write.mode("append").parquet(s"$dir/$name")
  }

  test("merge kernel: coalescing, bridging, counts") {
    val gap = 10L
    // fresh events split on the gap
    assert(merge(Nil, Seq(0L, 5L, 30L), gap) ==
      Seq(Sess(0, 5, 2), Sess(30, 30, 1)))
    // an event inside an open session only bumps the count
    assert(merge(Seq(Sess(0, 5, 2)), Seq(3L), gap) == Seq(Sess(0, 5, 3)))
    // a late event between two open sessions bridges them into one
    // (bridging needs t within gap of BOTH: t=15 reaches end=5 and start=20)
    assert(merge(Seq(Sess(0, 5, 2), Sess(20, 25, 2)), Seq(15L), gap) ==
      Seq(Sess(0, 25, 5)))
    // an event near only ONE session extends it, no bridge
    assert(merge(Seq(Sess(0, 5, 2), Sess(30, 40, 2)), Seq(14L), gap) ==
      Seq(Sess(0, 14, 3), Sess(30, 40, 2)))
    // boundary: exactly gap apart merges (matches batch's `> gap` split)
    assert(merge(Nil, Seq(0L, 10L), gap) == Seq(Sess(0, 10, 2)))
    assert(merge(Nil, Seq(0L, 11L), gap) == Seq(Sess(0, 0, 1), Sess(11, 11, 1)))
    // order-insensitive
    assert(merge(Nil, Seq(30L, 0L, 5L), gap) == merge(Nil, Seq(0L, 5L, 30L), gap))
  }

  test("merge kernel property: any micro-batch split yields the batch sessions") {
    // the streaming guarantee reduces to this: folding events through merge
    // in ANY batch order/partitioning produces exactly the sessions a
    // single sorted scan produces. 300 randomized trials, fixed seed.
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 300) {
      val gap = 1L + rnd.nextInt(20)
      val events = Seq.fill(1 + rnd.nextInt(40))(rnd.nextInt(200).toLong)
      // reference: sorted scan, split on > gap
      val sorted = events.sorted
      val ref = sorted.tail.foldLeft(List(Sess(sorted.head, sorted.head, 1L))) {
        (acc, t) =>
          if (t - acc.head.end_ms <= gap)
            Sess(acc.head.start_ms, t, acc.head.n + 1) :: acc.tail
          else Sess(t, t, 1L) :: acc
      }.reverse
      // fold the events through merge in random batches of random order
      val shuffled = rnd.shuffle(events)
      var open = Seq.empty[Sess]
      var rest = shuffled
      while (rest.nonEmpty) {
        val k = 1 + rnd.nextInt(rest.length)
        open = merge(open, rest.take(k), gap)
        rest = rest.drop(k)
      }
      assert(open == ref,
        s"gap=$gap events=$events\n  incremental=$open\n  reference=$ref")
    }
  }

  test("stream equals batch; late event bridges two open sessions") {
    val in = Files.createTempDirectory("sess_in").toString
    val out = Files.createTempDirectory("sess_out").toString
    val ck = Files.createTempDirectory("sess_ck").toString
    val gapMs = 30L * 60 * 1000 // 30 min

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(schema).parquet(s"$in/*")
      val sess = Sessionize.sessionizeStream(
        stream, "ts", "2 hours", Seq("event_type"), gapMs)
      val q = Subscribe.stageAppend(sess.toDF(), out, ck)
      q.awaitTermination()
    }

    // batch 1: key 'a' has two apparent sessions (00:00, 01:00 — 60 min
    // apart); nothing can finalize (watermark = max(01:00) - 2 h ≤ 0)
    writeBatch(in, "b1", Seq(
      ("2024-01-01 00:00:00", "a", 1.0),
      ("2024-01-01 01:00:00", "a", 2.0)))
    runOnce()
    val afterB1 =
      try spark.read.parquet(out).count()
      catch { case _: Throwable => 0L }
    assert(afterB1 == 0L,
      s"sessions must stay open while a bridging event can still arrive, got $afterB1 rows")

    // batch 2: a late-but-within-horizon event at 00:30 (exactly gap-adjacent
    // to BOTH open sessions, boundary inclusive) bridges the two
    // open sessions into ONE, and a sentinel key at 06:00 advances the
    // watermark to 04:00 so the merged session (closes at 01:30) emits.
    writeBatch(in, "b2", Seq(
      ("2024-01-01 00:30:00", "a", 3.0),
      ("2024-01-01 06:00:00", "zz", 0.0)))
    runOnce()

    val staged = spark.read.parquet(out)
      .orderBy("session_key", "session_start_ms").collect()
    val aRows = staged.filter(_.getAs[String]("session_key") == "a")
    assert(aRows.length == 1,
      s"late event must bridge the two sessions into one, got ${aRows.toSeq}")
    assert(aRows.head.getAs[Long]("n_events") == 3L, s"got ${aRows.head}")
    assert(aRows.head.getAs[Long]("session_start_ms") ==
      Timestamp.valueOf("2024-01-01 00:00:00").getTime)
    assert(aRows.head.getAs[Long]("session_end_ms") ==
      Timestamp.valueOf("2024-01-01 01:00:00").getTime)

    // batch equivalence on the closed keys: the batch plan over the full
    // input, restricted to key 'a', must equal the staged stream output
    val all = spark.read.schema(schema).parquet(s"$in/*")
    val batch = Sessionize.sessionizeBatch(all, "ts", Seq("event_type"), gapMs)
      .filter(org.apache.spark.sql.functions.col("event_type") === "a")
      .selectExpr("event_type AS session_key", "session_start_ms", "session_end_ms", "n_events")
      .collect()
    assert(batch.map(_.toSeq).toSet == aRows.map(_.toSeq).toSet,
      s"stream/batch mismatch: batch=${batch.toSeq} stream=${aRows.toSeq}")
  }

  test("NULL multi-key tuples stay distinct in streaming state keys") {
    // concat_ws skips NULLs, so without a sentinel ('a', NULL) and
    // (NULL, 'a') would share the state-store key "a" and sessionize
    // together — the batch plan keeps them distinct (ADVICE r7)
    val schema2 = StructType(Seq(
      StructField("ts", TimestampType),
      StructField("k1", StringType),
      StructField("k2", StringType)))
    val in = Files.createTempDirectory("sessn_in").toString
    val out = Files.createTempDirectory("sessn_out").toString
    val ck = Files.createTempDirectory("sessn_ck").toString
    import scala.jdk.CollectionConverters._
    val rows = Seq(
      ("2024-01-01 00:00:00", "a", null),
      ("2024-01-01 00:05:00", null, "a"),
      ("2024-01-01 06:00:00", "zz", "zz")) // advances the watermark
      .map { case (ts, a, b) => org.apache.spark.sql.Row(Timestamp.valueOf(ts), a, b) }
    spark.createDataFrame(rows.asJava, schema2)
      .coalesce(1).write.mode("append").parquet(s"$in/b1")
    val stream = spark.readStream.schema(schema2).parquet(s"$in/*")
    val sess = Sessionize.sessionizeStream(
      stream, "ts", "1 hour", Seq("k1", "k2"), 30L * 60 * 1000)
    Subscribe.stageAppend(sess.toDF(), out, ck).awaitTermination()
    val staged = spark.read.parquet(out)
      .filter(!org.apache.spark.sql.functions.col("session_key").contains("zz"))
      .collect()
    assert(staged.length == 2,
      s"('a', NULL) and (NULL, 'a') must sessionize separately, got ${staged.toSeq}")
    assert(staged.forall(_.getAs[Long]("n_events") == 1L), staged.toSeq.toString)
  }

  test("language surface: subscribe(session_gap) drives batch and stream plans") {
    import graft.lang.{Lowering, Parser}
    val in = Files.createTempDirectory("sessl_in").toString
    val out = Files.createTempDirectory("sessl_out").toString
    val ck = Files.createTempDirectory("sessl_ck").toString
    writeBatch(in, "b1", Seq(
      ("2024-01-01 00:00:00", "a", 1.0),
      ("2024-01-01 00:10:00", "a", 2.0),
      ("2024-01-01 02:00:00", "a", 9.0), // separate session
      ("2024-01-01 09:00:00", "zz", 0.0))) // advances the watermark
    val batchDf = spark.read.schema(schema).parquet(s"$in/*")
    val ctx = Lowering.Context(spark, _ => batchDf)
    val lowered = Lowering.lowerStatements(Parser.parseStatements(
      "from ingest.subscribe(watermark_column: 'ts', watermark_delay: '10m', " +
        "session_gap: '30m', session_keys: ['event_type'])"), ctx).get
    // batch semantics: full-refresh sessionization, all sessions present
    val batchRows = lowered.orderBy("event_type", "session_start_ms").collect()
    assert(batchRows.count(_.getAs[String]("event_type") == "a") == 2,
      s"expected 2 batch sessions for key a: ${batchRows.toSeq}")
    // the recorded metadata drives the streaming custom-state plan
    val params = ctx.subscriptions.head._2
    val stream = spark.readStream.schema(schema).parquet(s"$in/*")
    val sub = Subscribe.subscribeFromParams(stream, params, Seq.empty, Seq.empty)
    val q = Subscribe.stageAppend(sub, out, ck)
    q.awaitTermination()
    val staged = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("session_key") === "a")
      .orderBy("session_start_ms").collect()
    assert(staged.length == 2, s"expected both sessions closed, got ${staged.toSeq}")
    assert(staged.map(_.getAs[Long]("n_events")).toSeq == Seq(2L, 1L), s"${staged.toSeq}")
  }

  test("dedup_keys + session_gap compose: dedup on ingest precedes sessionization") {
    val in = Files.createTempDirectory("sessd_in").toString
    val out = Files.createTempDirectory("sessd_out").toString
    val ck = Files.createTempDirectory("sessd_ck").toString
    // two rows share the dedup key 'a' inside one session window — dedup
    // keeps one, so the closed session counts 1 event, not 2
    writeBatch(in, "b1", Seq(
      ("2024-01-01 00:00:00", "a", 1.0),
      ("2024-01-01 00:05:00", "a", 2.0), // dup key, dropped on ingest
      ("2024-01-01 09:00:00", "zz", 0.0))) // advances the watermark
    val params = Map(
      "watermark_column" -> "ts", "watermark_delay" -> "10m",
      "dedup_keys" -> "event_type", "session_gap" -> "30m",
      "session_keys" -> "event_type")
    val stream = spark.readStream.schema(schema).parquet(s"$in/*")
    val sub = Subscribe.subscribeFromParams(stream, params, Seq.empty, Seq.empty)
    val q = Subscribe.stageAppend(sub, out, ck)
    q.awaitTermination()
    val staged = spark.read.parquet(out)
      .filter(org.apache.spark.sql.functions.col("session_key") === "a").collect()
    assert(staged.length == 1, s"expected one closed session, got ${staged.toSeq}")
    assert(staged.head.getAs[Long]("n_events") == 1L,
      s"dedup-on-ingest must precede sessionization: ${staged.head}")
  }
}
