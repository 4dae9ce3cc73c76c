package graft.lang

import graft.SparkTestBase

/** The VS Code extension's hand-rolled LSP transport (vscode-graft/src/
  * lspclient.js — Content-Length framing, request correlation, lifecycle)
  * against the REAL stdio server: node runs the extension's protocol test,
  * which spawns `java -cp <this suite's classpath> graft.LspServer` and
  * exercises initialize → didOpen/didChange → completion → hover →
  * shutdown over actual pipes. This is the editor-surface twin of
  * PythonSdkSpec (JVM suite driving a non-JVM client end-to-end). */
class VsCodeLspSpec extends SparkTestBase {

  test("vscode lsp client: framing, lifecycle, completion, hover") {
    val node =
      try new ProcessBuilder("node", "--version").start().waitFor() == 0
      catch { case _: Throwable => false }
    assume(node, "node not available")
    val cp = System.getProperty("java.class.path")
    val pb = new ProcessBuilder("node",
      new java.io.File("vscode-graft/test/protocol_test.js").getAbsolutePath)
    pb.environment().put("GRAFT_LSP_CMD",
      s"java -cp '$cp' graft.LspServer --dir $sfDir")
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    val code = p.waitFor()
    assert(code == 0, s"node exited $code\nstdout: $out\nstderr: $err")
    val r = graft.server.Json.parseObject(out.linesIterator.toSeq.last)
    assert(r("capabilities") == true, r.toString)
    assert(r("completion_count").asInstanceOf[Number].intValue > 0, r.toString)
    assert(r("completion_has_sum") == true, r.toString)
    assert(r("hover") == true, r.toString)
  }
}
