package graft.client

import graft.SparkTestBase
import graft.server.Server

/** The typed client against an in-process server — every method group of the
  * reference's FrontendRPC aggregate (FrontendApi / FileApi / FlowApi) plus
  * the compiler-service and editor endpoints, exercised over real HTTP. */
class GraftClientSpec extends SparkTestBase {

  private lazy val workDir: String = {
    val d = java.nio.file.Files.createTempDirectory("cli_ws")
    java.nio.file.Files.writeString(d.resolve("q1.wv"), "from region count")
    java.nio.file.Files.createDirectory(d.resolve("sub"))
    d.toString
  }

  private lazy val inst = Server.start(spark, sfDir, workDir = workDir)
  private lazy val client = GraftClient.connect(s"http://127.0.0.1:${inst.port}")

  override def afterAll(): Unit = {
    try inst.stop() finally super.afterAll()
  }

  test("status returns version and uptime") {
    val st = client.status()
    assert(st.version.nonEmpty)
    assert(st.upTimeMs >= 0L)
  }

  test("runQuery drains pages and decodes schema + rows") {
    // 300 rows forces two server pages (page size 200) through the drain loop
    val info = client.runQuery("from lineitem select l_orderkey, l_quantity limit 300")
    assert(info.status == "finished", info.error)
    assert(info.schema.map(_.name) == Seq("l_orderkey", "l_quantity"))
    assert(info.rows.length == 300)
    assert(info.totalRows == 300)
    assert(info.rows.head.length == 2)
    assert(info.pageToken.isEmpty)
  }

  test("submit/poll split matches the reference contract") {
    val id = client.submitQuery("from region count")
    assert(id.nonEmpty)
    var info = client.getQueryInfo(id)
    val deadline = System.nanoTime() + 60e9.toLong
    while (!info.isTerminal && System.nanoTime() < deadline) {
      Thread.sleep(100); info = client.getQueryInfo(id)
    }
    assert(info.status == "finished", info.error)
    assert(info.rows == Seq(Seq(5L)))
    assert(info.completedAt.nonEmpty)
  }

  test("session state persists across a client's requests") {
    val sid = "client-spec-session"
    client.runQuery("def five = 5", sessionId = sid)
    val info = client.runQuery("from region where r_regionkey < five count", sessionId = sid)
    assert(info.rows == Seq(Seq(5L)))
  }

  test("describe selection compiles without executing") {
    val info = client.runQuery("from region", querySelection = "describe")
    assert(info.schema.map(_.name) == Seq("column_name", "column_type", "nullable"))
    assert(info.rows.exists(_.head == "r_name"))
  }

  test("failed query surfaces the error") {
    val info = client.runQuery("from no_such_table_xyz count")
    assert(info.status == "failed")
    assert(info.error.nonEmpty)
  }

  test("cancelQuery returns false for an already-finished query") {
    val info = client.runQuery("from region count")
    assert(!client.cancelQuery(info.queryId))
  }

  test("unknown query id raises RpcException 404") {
    val e = intercept[GraftClient.RpcException](client.getQueryInfo("nope"))
    assert(e.code == 404)
  }

  test("file API lists directories and .wv scripts, reads content") {
    val entries = client.listFiles()
    assert(entries.exists(e => e.name == "q1.wv" && !e.isDirectory))
    assert(entries.exists(e => e.name == "sub" && e.isDirectory))
    val f = client.readFile("q1.wv")
    assert(f.content.contains("from region count"))
    assert(f.size > 0)
  }

  test("flow API lists runs (empty store is a valid answer)") {
    assert(client.listFlowRuns().isEmpty || client.listFlowRuns().nonEmpty)
    val e = intercept[GraftClient.RpcException](client.getFlowRun("missing-run"))
    assert(e.code == 404)
  }

  test("transpile, toSql, fmt round the compiler services") {
    val wvText = client.transpile("SELECT r_name FROM region ORDER BY r_name")
    assert(wvText.contains("from region"))
    val sql = client.toSql("from region select r_name")
    assert(sql.toLowerCase.contains("select"))
    val formatted = client.fmt("from    region   select   r_name")
    assert(formatted.contains("from region"))
  }

  test("compile envelope: success and 400-with-envelope on error") {
    val ok = client.compile("from region count")
    assert(ok.get("success").contains(true))
    val e = intercept[GraftClient.RpcException](client.compile("from where nonsense !!"))
    assert(e.code == 400)
  }

  test("editor services: completion and definition") {
    val items = client.complete("from reg", 8)
    assert(items.exists(_.label == "region"))
    val text = "def answer = 42\nfrom region where r_regionkey < answer count"
    val off = text.indexOf("answer", 20) + 1 // 1-based, at the use site
    val d = client.definition(text, off)
    assert(d.nonEmpty)
    assert(d.get.startLine == 1)
  }
}
