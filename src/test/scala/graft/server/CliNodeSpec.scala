package graft.server

import graft.SparkTestBase

/** The npm bin wrapper (sdks/cli-node) end-to-end: the system node runs
  * bin/graft.js against an in-process server — compile to SQL from -q /
  * file / stdin, run to JSON lines, usage + compile-error exit codes
  * (reference: sdks/cli-node/bin/wvlet.js, there an embedded Scala.js
  * compiler; here the same contract over the HTTP API). Also gates the
  * vscode-graft TextMate grammar's tokenization test (pure node). */
class CliNodeSpec extends SparkTestBase {

  private lazy val inst = Server.start(spark, sfDir)
  private lazy val bin = new java.io.File("sdks/cli-node/bin/graft.js").getAbsolutePath

  override def afterAll(): Unit = {
    try inst.stop() finally super.afterAll()
  }

  private def nodeAvailable: Boolean =
    try new ProcessBuilder("node", "--version").start().waitFor() == 0
    catch { case _: Throwable => false }

  private def run(args: Seq[String], stdin: Option[String] = None): (Int, String, String) = {
    val pb = new ProcessBuilder((Seq("node", bin) ++ args): _*)
    pb.environment().put("GRAFT_ENDPOINT", s"http://127.0.0.1:${inst.port}")
    val p = pb.start()
    stdin match {
      case Some(s) => p.getOutputStream.write(s.getBytes); p.getOutputStream.close()
      case None => p.getOutputStream.close()
    }
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    (p.waitFor(), out, err)
  }

  test("cli-node: compile and run through the bin, all input modes") {
    assume(nodeAvailable, "node not available")

    val (c1, sql, e1) = run(Seq("compile", "-q", "from lineitem where l_quantity > 45 select l_orderkey"))
    assert(c1 == 0, s"compile exited $c1: $e1")
    assert(sql.toUpperCase.contains("SELECT") && sql.contains("l_quantity"), sql)

    // file input
    val f = java.nio.file.Files.createTempFile("cli_node", ".wv")
    java.nio.file.Files.writeString(f, "from region select r_name order by r_name")
    val (c2, out2, e2) = run(Seq("run", f.toString))
    assert(c2 == 0, s"run exited $c2: $e2")
    val rows = out2.linesIterator.toSeq
    assert(rows.size == 5 && rows.head.contains("AFRICA"), out2)

    // stdin input
    val (c3, out3, _) = run(Seq("compile"), stdin = Some("from region count"))
    assert(c3 == 0 && out3.toUpperCase.contains("COUNT"), out3)

    // compile error -> exit 1, message on stderr
    val (c4, _, e4) = run(Seq("compile", "-q", "from lineitem where"))
    assert(c4 == 1 && e4.contains("compile error"), s"exit $c4 stderr $e4")

    // usage error -> exit 2
    val (c5, _, _) = run(Seq("frobnicate"))
    assert(c5 == 2)
  }

  test("vscode-graft grammar tokenizes the language surface") {
    assume(nodeAvailable, "node not available")
    val p = new ProcessBuilder("node",
      new java.io.File("vscode-graft/test/grammar_test.js").getAbsolutePath).start()
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    assert(p.waitFor() == 0, s"grammar test failed\nstdout: $out\nstderr: $err")
    assert(out.contains("\"ok\":true"), out)
  }

  test("highlightjs-graft definition tokenizes the language surface") {
    assume(nodeAvailable, "node not available")
    val p = new ProcessBuilder("node",
      new java.io.File("sdks/highlightjs-graft/test/hljs_test.js").getAbsolutePath).start()
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    assert(p.waitFor() == 0, s"hljs test failed\nstdout: $out\nstderr: $err")
    assert(out.contains("\"ok\":true"), out)
  }

  test("prismjs-graft definition tokenizes the language surface") {
    assume(nodeAvailable, "node not available")
    val p = new ProcessBuilder("node",
      new java.io.File("sdks/prismjs-graft/test/prism_test.js").getAbsolutePath).start()
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    assert(p.waitFor() == 0, s"prism test failed\nstdout: $out\nstderr: $err")
    assert(out.contains("\"ok\":true"), out)
  }
}
