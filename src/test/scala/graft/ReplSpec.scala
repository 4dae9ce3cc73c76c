package graft

/** REPL contract: one persistent compiler session — definitions accumulate
  * across inputs, errors are reported inline without killing the loop, and
  * meta commands work. */
class ReplSpec extends SparkTestBase {

  private def drive(script: String): String = {
    val in = new java.io.BufferedReader(new java.io.StringReader(script))
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bytes, true, "UTF-8")
    Repl.loop(spark, sfDir, in, out)
    new String(bytes.toByteArray, "UTF-8")
  }

  test("definitions persist across inputs; queries execute") {
    val outText = drive(
      """def double(x) = x * 2
        |val base = 3
        |
        |select n = double(base)
        |
        |:quit
        |""".stripMargin)
    // def+val input alone is a declaration-only unit -> "ok"
    assert(outText.contains("ok"), outText)
    // the later query sees both definitions from the same session
    assert(outText.contains("6"), outText)
  }

  test("model declared in one input is queryable from the next") {
    val outText = drive(
      """model small_nations = {
        |  from nation
        |  where n_regionkey = 2
        |}
        |
        |from small_nations
        |count
        |
        |:quit
        |""".stripMargin)
    assert(outText.contains("5"), outText)
  }

  test("errors report inline and the loop survives") {
    val outText = drive(
      """from nonexistent_table_zz
        |
        |from region
        |count
        |
        |:quit
        |""".stripMargin)
    assert(outText.contains("[error]") || outText.contains("[plan error]"), outText)
    assert(outText.contains("5"), outText) // the next input still ran
  }

  test("meta commands: :tables, :limit, :explain") {
    val outText = drive(
      """:tables
        |:limit 3
        |:explain
        |from nation
        |select n_nationkey
        |order by n_nationkey
        |
        |:quit
        |""".stripMargin)
    assert(outText.contains("lineitem"), outText)
    assert(outText.contains("limit 3"), outText)
    assert(outText.contains("explain on"), outText)
    assert(outText.contains("Physical Plan"), outText)
    assert(outText.contains("only showing top 3 rows"), outText)
  }

  test("embedded tests run per input and do not leak to the next") {
    val outText = drive(
      """from region
        |test _.size should be 99
        |
        |from region
        |count
        |
        |:quit
        |""".stripMargin)
    assert(outText.contains("[test failed]"), outText)
    // the failed test must not re-fire on the next, unrelated input
    assert(outText.linesIterator.count(_.contains("[test failed]")) == 1, outText)
    assert(outText.contains("5"), outText)
  }

  test(":describe shows the buffered pipeline's schema without executing; :fragment runs it keeping the buffer") {
    val outText = drive(
      """from region
        |group by r_regionkey
        |:describe
        |agg n = _.count
        |:fragment
        |order by r_regionkey
        |
        |:quit
        |""".stripMargin)
    // :describe printed a schema tree for the partial chain
    assert(outText.contains("r_regionkey"), outText)
    assert(outText.contains("root"), outText)
    // :fragment ran the chain-so-far (count per key) and kept buffering:
    // the final empty-line execution includes the order by
    assert(outText.contains("| n "  ) || outText.contains("|n"), outText)
    // a failing :describe on an empty buffer reports, loop survives
    val out2 = drive(":describe\n:quit\n")
    assert(out2.contains("nothing buffered"), out2)
  }

  test(":context summarizes accumulated session definitions") {
    val outText = drive(
      """model m1 = { from region }
        |val v1 = 7
        |def f1(x) = x + 1
        |
        |:context
        |:quit
        |""".stripMargin)
    assert(outText.contains("models: m1"), outText)
    assert(outText.contains("vals: v1"), outText)
    assert(outText.contains("defs: f1"), outText)
  }
}
