package graft.server

import graft.SparkTestBase

/** The TypeScript/JavaScript SDK (sdks/typescript) against an in-process
  * server: the system node drives the package's compile/run/session/error
  * surface over real HTTP — the same pattern as PythonSdkSpec. */
class TsSdkSpec extends SparkTestBase {

  private lazy val inst = Server.start(spark, sfDir)
  private lazy val sdk =
    new java.io.File("sdks/typescript/src/index.js").getAbsolutePath

  override def afterAll(): Unit = {
    try inst.stop() finally super.afterAll()
  }

  test("ts sdk: compile, run with page drain, session state, errors") {
    assume(
      try { new ProcessBuilder("node", "--version").start().waitFor() == 0 }
      catch { case _: Throwable => false },
      "node not available")
    val script =
      s"""
const { GraftClient, WvletCompiler, compile, CompilationError, RpcError } =
  require(${Json.write(sdk)});

async function main() {
  const results = {};
  const client = new GraftClient();  // endpoint from GRAFT_ENDPOINT

  results.version = (await client.status()).version;

  // reference-parity compiler facade
  const compiler = new WvletCompiler();
  const sql = await compiler.compile(
    "from lineitem where l_quantity > 45 select l_orderkey, l_quantity");
  results.sql_has_select = sql.toUpperCase().includes("SELECT");
  results.sql_has_filter = sql.includes("l_quantity");

  // drain loop: 300 rows forces two server pages (page size 200)
  const r = await client.run("from lineitem select l_orderkey, l_quantity limit 300");
  results.run_status = r.status;
  results.run_rows = r.rows.length;
  results.run_cols = r.columnNames;
  results.first_obj_keys = Object.keys(r.toObjects()[0]);

  // session state persists across calls sharing a sessionId
  await client.run("def five = 5", { sessionId: "ts-sdk" });
  const r2 = await client.run("from region where r_regionkey < five count",
    { sessionId: "ts-sdk" });
  results.session_count = r2.rows[0][0];

  results.transpiled = await client.transpile(
    "SELECT r_name FROM region WHERE r_regionkey = 1");
  results.fmt_ok = (await client.fmt("from region select r_name")).includes("from");

  try { await compile("from lineitem where"); results.compile_error = "MISSING"; }
  catch (e) { results.compile_error = e instanceof CompilationError ? "raised" : "wrong type"; }

  try {
    await new GraftClient({ endpoint: "http://127.0.0.1:1", timeoutMs: 2000 }).status();
    results.rpc_error = "MISSING";
  } catch (e) { results.rpc_error = e instanceof RpcError ? e.status : "wrong type"; }

  console.log(JSON.stringify(results));
  process.exit(0);
}
main().catch((e) => { console.error(String(e && e.stack || e)); process.exit(1); });
"""
    val f = java.nio.file.Files.createTempFile("ts_sdk_test", ".js")
    java.nio.file.Files.writeString(f, script)
    val pb = new ProcessBuilder("node", f.toString)
    pb.environment().put("GRAFT_ENDPOINT", s"http://127.0.0.1:${inst.port}")
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    val code = p.waitFor()
    assert(code == 0, s"node exited $code\nstdout: $out\nstderr: $err")
    val r = Json.parseObject(out.linesIterator.toSeq.last)
    assert(r("version").toString.nonEmpty)
    assert(r("sql_has_select") == true && r("sql_has_filter") == true, r.toString)
    assert(r("run_status") == "finished")
    assert(r("run_rows").asInstanceOf[Number].intValue == 300)
    assert(r("run_cols") == Seq("l_orderkey", "l_quantity"))
    assert(r("first_obj_keys") == Seq("l_orderkey", "l_quantity"))
    assert(r("session_count").asInstanceOf[Number].intValue == 5)
    assert(r("transpiled").toString.contains("from"), r("transpiled").toString)
    assert(r("fmt_ok") == true)
    assert(r("compile_error") == "raised")
    assert(r("rpc_error").asInstanceOf[Number].intValue == 0)
  }
}
