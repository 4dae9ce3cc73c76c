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

  // ---- terminal surface: LineEditor-driven loop (history, editing,
  // completion) — the reference CLI's JLine3 parity, headless ----------

  /** Drive the REPL through the LineEditor with raw keystroke bytes, the
    * exact path a terminal takes (prompts, arrows, TAB). */
  private def driveRaw(keys: String): (String, graft.repl.LineEditor) = {
    val in = new java.io.ByteArrayInputStream(keys.getBytes("UTF-8"))
    val bytes = new java.io.ByteArrayOutputStream()
    val out = new java.io.PrintStream(bytes, true, "UTF-8")
    val editor = new graft.repl.LineEditor(
      in, out,
      completer = (text, cur) =>
        graft.lang.Lsp.complete(text, cur, spark, sfDir).map(_.label).distinct.take(30))
    Repl.loop(spark, sfDir, (prompt, buffered) => editor.readLine(prompt, buffered), out,
      history = () => editor.historyLines)
    (new String(bytes.toByteArray, "UTF-8"), editor)
  }

  test("line editor: multi-line pipe query through prompts, then cursor editing") {
    val bs = "\u007f"
    // 1st statement: a multi-line pipe chain (continuation prompt between
    // lines), executed by the empty line. 2nd: a line typed with a typo
    // (stray X) fixed by backspace before finishing. Both count region: 5.
    val keys =
      "from region\n| select r_name\n| count\n\n" +
      "from region counX" + bs + "t\n\n" +
      ":quit\n"
    val (outText, editor) = driveRaw(keys)
    // both statements produced the count 5
    assert(outText.linesIterator.count(_.matches(".*\\b5\\b.*")) >= 2, outText)
    // prompts rendered: fresh + continuation
    assert(outText.contains("graft> "), outText)
    assert(outText.contains("     | "), outText)
    // the editor recorded the typed (post-edit) lines in history
    assert(editor.historyLines.contains("from region"), editor.historyLines.toString)
    assert(editor.historyLines.contains("from region count"), editor.historyLines.toString)
  }

  test("line editor: history recall with up-arrow re-executes a prior line") {
    val up = "\u001b[A"
    val keys =
      "from nation count\n\n" +
      up + "\n\n" + // recall "from nation count"
      ":history\n:quit\n"
    val (outText, editor) = driveRaw(keys)
    // the recalled statement ran again: the 25-count appears twice
    assert(outText.linesIterator.count(_.matches(".*\\b25\\b.*")) >= 2, outText)
    assert(editor.historyLines.count(_ == "from nation count") == 1,
      "duplicate-adjacent lines collapse in history: " + editor.historyLines)
    // :history prints the editor's recall ring
    assert(outText.contains("from nation count"), outText)
  }

  test("line editor: TAB completion inserts the unique dot-method") {
    // 'select total = l_quantity.av' + TAB: the Lsp engine offers the
    // stdlib dot-methods for the column; 'avg' is the unique
    // 'av'-prefixed candidate and the editor inserts its remainder —
    // completion sees the `from lineitem` typed on the PREVIOUS line
    // because the REPL passes its statement buffer as completion context
    val keys = "from lineitem\nselect total = l_quantity.av\t\n\n:quit\n"
    val (outText, _) = driveRaw(keys)
    assert(outText.contains("total"), outText)
    // the executed query aggregated: one row, a big number — not an error
    assert(!outText.contains("[error]") && !outText.contains("[plan error]"), outText)
  }

  test("line editor: history persists to the history file across instances") {
    val hist = java.nio.file.Files.createTempFile("graft_hist", ".txt")
    java.nio.file.Files.delete(hist)
    val in1 = new java.io.ByteArrayInputStream("from region count\n".getBytes)
    val sink = new java.io.PrintStream(new java.io.ByteArrayOutputStream())
    val e1 = new graft.repl.LineEditor(in1, sink, historyFile = Some(hist))
    e1.readLine("> ")
    val e2 = new graft.repl.LineEditor(
      new java.io.ByteArrayInputStream(Array.emptyByteArray), sink,
      historyFile = Some(hist))
    assert(e2.historyLines == Seq("from region count"), e2.historyLines.toString)
  }
}
