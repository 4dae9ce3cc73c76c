package graft.server

import graft.SparkTestBase

/** The Python SDK (sdks/python) against an in-process server: the
  * system python3 drives the package's compile/run/transpile/fmt/error
  * surface over real HTTP — the same in-process-server pattern as
  * GraftClientSpec, with the client side swapped for the thin stdlib
  * Python client (reference parity: sdks/python/wvlet's compile + run
  * surface, re-expressed over the HTTP API). */
class PythonSdkSpec extends SparkTestBase {

  private lazy val inst = Server.start(spark, sfDir)
  private lazy val sdkDir = new java.io.File("sdks/python").getAbsolutePath

  override def afterAll(): Unit = {
    try inst.stop() finally super.afterAll()
  }

  private def python(script: String): (Int, String, String) = {
    val f = java.nio.file.Files.createTempFile("sdk_test", ".py")
    java.nio.file.Files.writeString(f, script)
    val pb = new ProcessBuilder("python3", f.toString)
    pb.environment().put("PYTHONPATH", sdkDir)
    pb.environment().put("GRAFT_ENDPOINT", s"http://127.0.0.1:${inst.port}")
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes())
    val err = new String(p.getErrorStream.readAllBytes())
    val code = p.waitFor()
    (code, out, err)
  }

  test("python sdk: compile, run with page drain, session state, errors") {
    assume(
      try { new ProcessBuilder("python3", "--version").start().waitFor() == 0 }
      catch { case _: Throwable => false },
      "python3 not available")
    val (code, out, err) = python(
      """
import json
from graft import compile, GraftClient, CompilationError, RpcError

results = {}
client = GraftClient()   # endpoint from GRAFT_ENDPOINT

# status
results["version"] = client.status()["version"]

# module-level compile -> SQL text
sql = compile("from lineitem where l_quantity > 45 select l_orderkey, l_quantity")
results["sql_has_select"] = sql.upper().startswith("SELECT") or "SELECT" in sql.upper()
results["sql_has_filter"] = "l_quantity" in sql

# run with the drain loop: 300 rows forces two server pages (page size 200)
r = client.run("from lineitem select l_orderkey, l_quantity limit 300")
results["run_status"] = r.status
results["run_rows"] = len(r.rows)
results["run_cols"] = r.column_names
results["run_width"] = len(r.rows[0])

# session state persists across calls sharing a session id
client.run("def five = 5", session_id="py-sdk")
r2 = client.run("from region where r_regionkey < five count", session_id="py-sdk")
results["session_count"] = r2.rows[0][0]

# transpile + fmt
results["transpiled"] = client.transpile("SELECT r_name FROM region WHERE r_regionkey = 1")
results["fmt_ok"] = "from" in client.fmt("from region select r_name")

# compile errors surface as CompilationError
try:
    compile("from lineitem where")
    results["compile_error"] = "MISSING"
except CompilationError as e:
    results["compile_error"] = "raised"

# unreachable server surfaces as RpcError(status=0)
try:
    GraftClient("http://127.0.0.1:1", timeout=2).status()
    results["rpc_error"] = "MISSING"
except RpcError as e:
    results["rpc_error"] = e.status

print(json.dumps(results))
""")
    assert(code == 0, s"python exited $code\nstdout: $out\nstderr: $err")
    val r = graft.server.Json.parseObject(out.linesIterator.toSeq.last)
    assert(r("version").toString.nonEmpty)
    assert(r("sql_has_select") == true && r("sql_has_filter") == true, r.toString)
    assert(r("run_status") == "finished")
    assert(r("run_rows").asInstanceOf[Number].intValue == 300)
    assert(r("run_cols") == Seq("l_orderkey", "l_quantity"))
    assert(r("run_width").asInstanceOf[Number].intValue == 2)
    assert(r("session_count").asInstanceOf[Number].intValue == 5)
    assert(r("transpiled").toString.contains("from"), r("transpiled").toString)
    assert(r("fmt_ok") == true)
    assert(r("compile_error") == "raised")
    assert(r("rpc_error").asInstanceOf[Number].intValue == 0)
  }
}
