package graft.server

import org.apache.spark.sql.SparkSession

/** The native-table-function reference page — GENERATED, never
  * hand-maintained (r16 verdict #8: the registry spans 60+ operators
  * across 10 families; a hand-written list would rot like the completion
  * list did in r13/r14). Every column is derived structurally:
  *
  *   - names: `Lowering.nativeTableFunctions` (itself spec-pinned to the
  *     dispatch cases by TableFunctionRegistrySpec);
  *   - args + example: probed FROM THE DISPATCH — each function is
  *     compiled with zero args in analysis-only mode and the signature is
  *     parsed out of its own `expects (…) literals … e.g. …` error (the
  *     text a user sees; zero-arg functions like wv_tables compile and
  *     report `()`);
  *   - output schema: the example itself is compiled (analysis-only, no
  *     execution side effects) against the served tables, with alias
  *     models for the placeholder relations the examples mention;
  *   - oracle rows: QueryCatalog.queryWvTexts scanned for calls of the
  *     function — the wv-surface correctness rows that gate it;
  *   - scale exponent: those rows' entries in BENCH_SCALE.json (absent
  *     file → column omitted).
  *
  * OperatorDocsSpec pins the page to the registry (every registry name
  * present, every entry carrying a parsed signature), so the page cannot
  * drift from the dispatch without failing the build. */
object OperatorDocs {

  final case class OpDoc(
      name: String,
      args: String,
      example: String,
      schema: String,
      oracleRows: Seq[String],
      scaleExponents: Map[String, Double])

  private val cache = scala.collection.concurrent.TrieMap.empty[String, Seq[OpDoc]]

  /** Alias models for the placeholder relations the dispatch examples
    * reference, so the schema probe can lower them against the served
    * tables. Purely analysis-time; missing ones just cost that example
    * its schema column. */
  private val preamble: String =
    """model trainset = { from documents }
      |model evalset = { from documents where doc_id < 3 }
      |model reference_docs = { from documents where doc_id < 5 }
      |model evalvecs = { from embeddings where vec_id < 5 }
      |model my_vocab = { from documents select text as token }
      |""".stripMargin

  def build(spark: SparkSession, dir: String): Seq[OpDoc] =
    cache.getOrElseUpdate(dir, {
      val exps = scaleExponents()
      val texts = graft.catalog.QueryCatalog.queryWvTexts
      val allRowNames = graft.catalog.QueryCatalog.queries.keySet
      graft.lang.Lowering.nativeTableFunctions.map { name =>
        val (args, example, schema) = probe(spark, dir, name)
        // oracle rows, both derivations structural: wv-surface rows whose
        // text CALLS the function, plus rows NAMED for it (the API-built
        // rows follow the q_<operator>… convention — e.g. the
        // similarity_topk family is API-built so only the name carries the
        // association)
        val callRe = ("""(?s).*\b""" + java.util.regex.Pattern.quote(name) + """\s*\(.*""").r
        val byText = texts.collect { case (n, t) if callRe.matches(t) => n }
        val byName = allRowNames.filter(_.drop(2).contains(name))
        val rows = (byText.toSet ++ byName).toSeq.sorted
        OpDoc(name, args, example, schema, rows,
          rows.flatMap(r => exps.get(r).map(r -> _)).toMap)
      }
    })

  /** Test hook: drop the per-dir cache (mirrors Subscribe.clearIndexCache). */
  def clearCache(): Unit = cache.clear()

  private def schemaOf(df: org.apache.spark.sql.DataFrame): String =
    df.schema.fields.map(f => s"${f.name}: ${f.dataType.simpleString}").mkString(", ")

  private def probe(spark: SparkSession, dir: String, name: String): (String, String, String) =
    try {
      val df = graft.CompileApi.compileOnly(spark, s"from $name()", dir, None)
      ("()", s"$name()", schemaOf(df))
    } catch {
      case e: Throwable =>
        val msg = Option(e.getMessage).getOrElse("")
        val args = """(?s)expects\s+(.*?)\s+literals""".r
          .findFirstMatchIn(msg).map(_.group(1).trim)
          // messages without the "literals" suffix (each_top_k): take up
          // to the example instead
          .orElse("""(?s)expects\s+(.*?),?\s+e\.g\.""".r
            .findFirstMatchIn(msg).map(_.group(1).trim))
          .getOrElse(msg.linesIterator.toSeq.headOption.getOrElse("").take(160))
        val example = msg.lastIndexOf("e.g. ") match {
          case -1 => ""
          case i => msg.substring(i + 5).trim
        }
        val schema =
          if (example.isEmpty) ""
          else
            try schemaOf(graft.CompileApi.compileOnly(
              spark, preamble + s"from $example", dir, None))
            catch { case _: Throwable => "" }
        (args, example, schema)
    }

  /** Per-row scale exponents from BENCH_SCALE.json (machine-written by
    * graft.BenchScale); absent or malformed file → empty. */
  private[server] def scaleExponents(): Map[String, Double] = {
    val p = java.nio.file.Paths.get("BENCH_SCALE.json")
    if (!java.nio.file.Files.exists(p)) return Map.empty
    val json = try java.nio.file.Files.readString(p) catch { case _: Throwable => return Map.empty }
    """"(q_[a-z0-9_]+)"\s*:\s*\{[^{}]*"exponent"\s*:\s*(-?[0-9.eE+]+)""".r
      .findAllMatchIn(json)
      .flatMap(m => m.group(2).toDoubleOption.map(m.group(1) -> _)).toMap
  }

  /** Server-rendered HTML reference table (the /operators page). */
  def page(spark: SparkSession, dir: String): String = {
    def esc(s: String): String =
      s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
    val rows = build(spark, dir).map { d =>
      val oracle = d.oracleRows.map { r =>
        val exp = d.scaleExponents.get(r).map(e => f" <span class=exp>exp $e%.2f</span>")
          .getOrElse("")
        s"<li><code>${esc(r)}</code>$exp</li>"
      }.mkString
      s"""<tr><td><code>${esc(d.name)}</code></td>
         |<td><code>${esc(d.args)}</code><div class=ex>e.g. <code>${esc(d.example)}</code></div></td>
         |<td><code>${esc(d.schema)}</code></td>
         |<td><ul>$oracle</ul></td></tr>""".stripMargin
    }.mkString("\n")
    s"""<!doctype html><html><head><meta charset="utf-8">
       |<title>graft · operator reference</title>
       |<style>
       |body{font:14px/1.5 system-ui,sans-serif;margin:2rem;max-width:1200px}
       |table{border-collapse:collapse;width:100%}
       |td,th{border:1px solid #ccc;padding:.4rem .6rem;vertical-align:top;text-align:left}
       |code{font:12px ui-monospace,monospace;word-break:break-word}
       |.ex{color:#666;margin-top:.3rem}.exp{color:#06c;font-size:11px}
       |ul{margin:0;padding-left:1.1rem}
       |</style></head><body>
       |<h1>Native table functions</h1>
       |<p>Generated from the lowering dispatch registry
       |(<code>Lowering.nativeTableFunctions</code>), the correctness catalog, and
       |BENCH_SCALE.json — nothing on this page is hand-maintained.</p>
       |<table><tr><th>function</th><th>signature</th><th>output schema</th>
       |<th>oracle rows · scale exponent</th></tr>
       |$rows
       |</table></body></html>""".stripMargin
  }
}
