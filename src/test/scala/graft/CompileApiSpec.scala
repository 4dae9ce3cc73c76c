package graft

import graft.server.Json

/** The embeddable JSON compile API (reference WvcLib.compile_query_json):
  * success envelope carries schema + analyzed plan; error envelopes carry
  * statusCode/statusType/message and, for parse errors, a recovered
  * line/column location. */
class CompileApiSpec extends SparkTestBase {

  private def call(args: Any*): Map[String, Any] =
    Json.parseObject(CompileApi.compileQueryJson(spark, Json.write(args.toList)))

  test("valid query compiles: success + schema + plan, no job run") {
    val resp = call("-q", "from lineitem where l_quantity > 10 group by l_returnflag agg n = _.count", "-d", sfDir)
    assert(resp("success") == true)
    val schema = resp("schema").asInstanceOf[String]
    assert(schema.contains("l_returnflag") && schema.contains("n"))
    assert(resp("plan").asInstanceOf[String].contains("Aggregate"))
  }

  test("-t dbtype: response carries generated dialect SQL (reference WvcMain -t)") {
    val resp = call("-q", "from part select w = p_name.split(' ').array_sort", "-d", sfDir,
      "-t", "duckdb")
    assert(resp("success") == true)
    assert(resp("sql").asInstanceOf[String].contains("list_sort("), resp("sql"))
    // still the plan/schema envelope on top of the reference's sql-only one
    assert(resp.contains("schema") && resp.contains("plan"))
    def errOf(m: Map[String, Any]) = m("error").asInstanceOf[Map[String, Any]]
    val bad = call("-q", "from part", "-d", sfDir, "-t", "db2")
    assert(bad("success") == false &&
      errOf(bad)("statusCode") == "SQL_GENERATION_ERROR" &&
      errOf(bad)("statusType") == "UserError", bad)
    // a compilable query whose text generation is out of scope is a loud
    // user error, not a silent success without sql
    val unsup = call("-q", "from documents select e = text.lang_id", "-d", sfDir, "-t", "trino")
    assert(unsup("success") == false &&
      errOf(unsup)("statusCode") == "SQL_GENERATION_ERROR", unsup)
  }

  test("parse error: SYNTAX_ERROR with line/column location") {
    val resp = call("-q", "from lineitem\nwhere (l_tax >")
    assert(resp("success") == false)
    val err = resp("error").asInstanceOf[Map[String, Any]]
    assert(err("statusCode") == "SYNTAX_ERROR" && err("statusType") == "UserError")
    val loc = err("location").asInstanceOf[Map[String, Any]]
    assert(loc("line").asInstanceOf[Number].intValue == 2)
    assert(loc("lineContent") == "where (l_tax >")
  }

  test("lexical error: SYNTAX_ERROR (not internal) with a recovered location") {
    val resp = call("-q", "from lineitem\nwhere l_returnflag = 'unterminated")
    assert(resp("success") == false)
    val err = resp("error").asInstanceOf[Map[String, Any]]
    assert(err("statusCode") == "SYNTAX_ERROR" && err("statusType") == "UserError", s"got $err")
    val loc = err("location").asInstanceOf[Map[String, Any]]
    assert(loc("line").asInstanceOf[Number].intValue == 2)
  }

  test("unknown column: ANALYSIS_ERROR, UserError") {
    val resp = call("-q", "from lineitem select no_such_col", "-d", sfDir)
    assert(resp("success") == false)
    val err = resp("error").asInstanceOf[Map[String, Any]]
    assert(err("statusCode") == "ANALYSIS_ERROR")
    assert(err("message").asInstanceOf[String].contains("no_such_col"))
  }

  test("missing -q/-f: INVALID_ARGUMENT") {
    val resp = call("-d", sfDir)
    assert(resp("success") == false)
    assert(resp("error").asInstanceOf[Map[String, Any]]("statusCode") == "INVALID_ARGUMENT")
  }

  test("write-effecting statements are refused, not executed") {
    val out = java.nio.file.Files.createTempDirectory("capi_w").toString + "/out.parquet"
    val resp = call("-q", s"from region\nsave to '$out'", "-d", sfDir)
    assert(resp("success") == false, s"got $resp")
    val err = resp("error").asInstanceOf[Map[String, Any]]
    assert(err("statusCode") == "PLAN_ERROR" && err("statusType") == "UserError")
    assert(err("message").asInstanceOf[String].contains("compile-only"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(out)), "compile wrote data!")
  }

  test("trailing valueless flag and unreadable file are user errors") {
    val dangling = call("-q")
    assert(dangling("error").asInstanceOf[Map[String, Any]]("statusCode") == "INVALID_ARGUMENT")
    val missing = call("-f", "/tmp/definitely_missing_graft.wv")
    val err = missing("error").asInstanceOf[Map[String, Any]]
    assert(err("statusCode") == "INVALID_ARGUMENT", s"got $err")
    assert(err("statusType") == "UserError")
  }

  test("static catalog: compiles offline, embedded tests analyzed but not executed") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_capi").toString
    val cat = s"$tmp/catalog.wv"
    graft.catalog.StaticCatalog.exportDir(spark, sfDir, cat)
    // the test assertion is FALSE on real data; compile-only must not trip it
    val resp = call("-q",
      "from lineitem\ntest _.count should be 0\nwhere l_quantity > 10\nselect l_orderkey",
      "--catalog", cat)
    assert(resp("success") == true, s"got $resp")
    assert(resp("schema").asInstanceOf[String].contains("l_orderkey"))
  }
}
