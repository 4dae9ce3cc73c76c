package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.lang._

/** Public entry points for the Graft engine: compile flow-style queries
  * (the reference language's pipe syntax) into Spark DataFrames.
  *
  * {{{
  * val df = Graft.query(spark, """
  *   from orders
  *   where o_orderstatus = 'F'
  *   group by o_custkey
  *   agg order_count = _.count, total = o_totalprice.sum
  *   order by total desc
  *   limit 10
  * """, name => spark.read.parquet(s"/data/$name.parquet"))
  * }}}
  */
object Graft {

  /** Compile + lower a query text to a DataFrame. Multi-statement inputs
    * (model defs, vals, then a query) are supported; the last query wins. */
  def query(
      spark: SparkSession,
      text: String,
      tableResolver: String => DataFrame,
      basePath: String = "",
      params: Seq[Any] = Nil
  ): DataFrame = {
    val ctx = Lowering.Context(spark, tableResolver, basePath, params = params)
    val stmts = Parser.parseStatements(text)
    val out = Lowering.lowerStatements(stmts, ctx)
    runDebugs(ctx)
    // declaration-only programs (model/flow/type defs) are valid units
    out.getOrElse(spark.emptyDataFrame)
  }

  /** Execute `debug { … }` side branches eagerly, printing a bounded sample
    * to stderr (the reference runs the branch as a side task —
    * ExecutionPlanner.scala:39-41; a silent no-op would hide user errors). */
  private def runDebugs(ctx: Lowering.Context): Unit =
    ctx.debugs.foreach { df =>
      df.limit(20).collect().foreach(r => System.err.println(s"[debug] $r"))
    }

  /** Like `query` but resolves table names through the session catalog. */
  def query(spark: SparkSession, text: String): DataFrame =
    query(spark, text, name => spark.table(name))

  /** Compile and also evaluate embedded `test ...` assertions (the
    * reference's self-verifying spec style; RunnerSpec.scala:30-93).
    * Returns the final DataFrame; throws TestFailure on assertion failure. */
  def run(
      spark: SparkSession,
      text: String,
      tableResolver: String => DataFrame,
      basePath: String = ""
  ): DataFrame = {
    val ctx = Lowering.Context(spark, tableResolver, basePath)
    val stmts = Parser.parseStatements(text)
    val out = Lowering.lowerStatements(stmts, ctx)
    runDebugs(ctx)
    ctx.tests.foreach { case (df, assertion) => TestRunner.check(df, assertion) }
    out.getOrElse(spark.emptyDataFrame)
  }

  /** Like [[run]] but against a caller-held Context, so definitions (models,
    * vals, defs, types, flows) persist across invocations — the REPL
    * contract (reference: WvletScriptRunner keeps one compiler session).
    * Embedded tests and debug branches run for THIS input only: the
    * context's accumulators are drained afterwards so the next input
    * doesn't re-run them. */
  def runWith(ctx: Lowering.Context, text: String): DataFrame = {
    val out = Lowering.lowerStatements(Parser.parseStatements(text), ctx)
    try {
      runDebugs(ctx)
      ctx.tests.foreach { case (df, assertion) => TestRunner.check(df, assertion) }
    } finally {
      ctx.debugs.clear()
      ctx.tests.clear()
    }
    out.getOrElse(ctx.spark.emptyDataFrame)
  }

  /** Raw Spark SQL escape hatch (the reference's RawSQL node). */
  def sql(spark: SparkSession, text: String): DataFrame = spark.sql(text)

  /** Register `dir`'s tables as temp views for the SQL front-end, skipping
    * the work when nothing changed. Re-reading 10 parquet schemas +
    * re-registering 10 views measured 0.76-0.89 s PER sqlScript CALL at
    * sf0.1 (vs 0.055 s for the actual SQL parse+analyze) — ~85% of every
    * TPC-DS bench row was view re-registration (optimization r18, guide
    * §1). The memo is keyed by (session, dir, directory fingerprint):
    * any rewrite of the dir (DML, CTAS refresh) changes the fingerprint
    * (file count + total bytes + newest mtime — the same signal the
    * persisted-index caches trust) and re-registers, so the views never
    * serve a stale file listing. WeakHashMap: a collected session drops
    * its entry; identity semantics keep cloned sessions distinct. */
  // The memo value carries, per table name, the IDENTITY of the temp-view
  // relation this code registered (SessionCatalog.getRawTempView) — a later
  // script statement that shadows a base-table name (CREATE OR REPLACE TEMP
  // VIEW nation AS …) swaps that object, so the hit-check below detects it
  // and re-registers, restoring the pre-memo semantics where every
  // sqlScript(dir) call stomped user views with the dir tables (r18 advice:
  // a fingerprint hit must not silently serve a shadowed view).
  // The view handles are WEAK references so the memo value cannot pin the
  // session (the WeakHashMap-value-refs-key leak): the session catalog
  // itself strongly holds every registered temp view, so a cleared ref can
  // only mean the view was dropped or replaced — which is exactly the
  // "re-register" case.
  private val sqlTablesFor =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession,
        (String, String, Map[String, java.lang.ref.WeakReference[AnyRef]])]())
  private def ensureSqlTables(spark: SparkSession, d: String): Unit = {
    val fp = Tables.directoryFingerprint(spark, d).getOrElse("__missing__")
    def rawView(n: String): AnyRef =
      try spark.sessionState.catalog.getRawTempView(n).orNull
      catch { case _: Throwable => null }
    val memo = sqlTablesFor.get(spark)
    val hit = memo != null && memo._1 == d && memo._2 == fp &&
      Tables.names.forall(n => memo._3.get(n).forall(_.get eq rawView(n)))
    if (!hit) {
      val registered = Tables.names.map { n =>
        try Tables.read(spark, d, n).createOrReplaceTempView(n)
        catch { case _: Throwable => () } // tolerate missing tables in dir
        n -> new java.lang.ref.WeakReference[AnyRef](rawView(n))
      }.toMap
      sqlTablesFor.put(spark, (d, fp, registered))
    }
  }

  /** SQL front-end: execute a multi-statement `.sql` script (the reference
    * compiles .sql units through the same plan — SqlParser.scala; here
    * Spark's own SQL parser plays that role, sharing Catalyst with the flow
    * language). Tables from `dir` are registered as temp views so the SQL
    * and flow front-ends see the same catalog. Returns the last statement's
    * result. */
  def sqlScript(spark: SparkSession, text: String, dir: Option[String] = None): DataFrame = {
    graft.functions.TdFunctions.ensureRegistered(spark)
    dir.foreach(ensureSqlTables(spark, _))
    val raw = splitSqlStatements(text)
    if (raw.isEmpty)
      throw new graft.lang.LoweringException("empty SQL script")
    // normalize + execute statement by statement: normalization may consult
    // the catalog (CREATE TABLE LIKE inlines a source schema, ALTER TABLE
    // rewrites column shapes), so it must see the effects of earlier
    // statements in the same script
    val results = raw.flatMap(r => SqlDialect.normalize(spark, r).map(spark.sql))
    // registration-only scripts (PREPARE/DEALLOCATE, comments) run nothing
    if (results.isEmpty) spark.emptyDataFrame else results.last
  }

  /** Markdown literate queries (the reference's .md front-end): execute the
    * fenced `wv` and `sql` code blocks of a document in order — other
    * languages and prose are skipped — returning the last result. Blocks
    * share one session (a `wv` block's models/vals are NOT visible to a
    * later block; each block is its own compilation unit, matching the
    * reference's per-block statement units). */
  def markdownScript(
      spark: SparkSession,
      text: String,
      tableResolver: String => DataFrame,
      basePath: String = "."
  ): DataFrame = {
    val blocks = graft.lang.Markdown.queryBlocks(text)
    if (blocks.isEmpty)
      throw new graft.lang.LoweringException("no wv/sql code blocks in document")
    blocks.map {
      case ("sql", _, code) => sqlScript(spark, code, None)
      case (_, _, code) => run(spark, code, tableResolver, basePath)
    }.last
  }

  /** Split on top-level `;` (quote- and comment-aware). */
  private[graft] def splitSqlStatements(text: String): List[String] = {
    val out = List.newBuilder[String]
    val sb = new StringBuilder
    var i = 0
    var quote: Char = 0
    while (i < text.length) {
      val c = text.charAt(i)
      if (quote != 0) {
        sb += c
        if (c == quote) quote = 0
        i += 1
      } else if (c == '\'' || c == '"') { quote = c; sb += c; i += 1 }
      else if (c == '-' && i + 1 < text.length && text.charAt(i + 1) == '-') {
        while (i < text.length && text.charAt(i) != '\n') { sb += text.charAt(i); i += 1 }
      } else if (c == ';') { out += sb.toString; sb.clear(); i += 1 }
      else { sb += c; i += 1 }
    }
    out += sb.toString
    val bySemicolon = out.result().map(_.trim).filter(_.nonEmpty)
    // a script with NO semicolons at all (reference sql corpus: at-alias.sql
    // — its SqlParser splits statements by grammar) falls back to blank-line
    // boundaries: a blank line followed by a line opening with a statement
    // keyword starts a new statement
    if (bySemicolon.lengthCompare(1) == 0 && text.indexOf(';') < 0) {
      val kw = """(?is)^\s*(SELECT|WITH|VALUES|INSERT|UPDATE|DELETE|CREATE|DROP|ALTER|SHOW|DESCRIBE|EXPLAIN|PREPARE|EXECUTE|DEALLOCATE|USE|TRUNCATE|MERGE)\b.*""".r
      val blocks = List.newBuilder[String]
      val cur = new StringBuilder
      def isStmtStart(block: String): Boolean = {
        val noComments = block.linesIterator
          .filterNot(_.trim.startsWith("--")).mkString("\n").trim
        kw.pattern.matcher(noComments).matches()
      }
      // depth-0 text (string literals and parenthesized groups removed):
      // used to recognize a buffer that is still only a WITH prelude —
      // `with name as (…)` before its main query (tpc-h q15 has a blank
      // line there) must not be closed at a blank-line boundary
      def depthZero(block: String): String = {
        val sb = new StringBuilder
        var depth = 0; var quote: Char = 0; var i = 0
        while (i < block.length) {
          val c = block.charAt(i)
          if (quote != 0) { if (c == quote) quote = 0 }
          else if (c == '\'' || c == '"') quote = c
          else if (c == '-' && i + 1 < block.length && block.charAt(i + 1) == '-') {
            while (i < block.length && block.charAt(i) != '\n') i += 1
          } else if (c == '(') depth += 1
          else if (c == ')') depth -= 1
          else if (depth == 0) sb += c
          i += 1
        }
        sb.toString
      }
      def isComplete(block: String): Boolean = {
        val d0 = depthZero(block).trim
        !d0.matches("""(?is)^with\s+(recursive\s+)?([\w`"]+\s+as\s*,?\s*)*$""")
      }
      text.split("\n\\s*\n").foreach { para =>
        if (cur.nonEmpty && isStmtStart(para) && isComplete(cur.toString)) {
          blocks += cur.toString; cur.clear()
        }
        if (cur.nonEmpty) cur ++= "\n\n"
        cur ++= para
      }
      if (cur.nonEmpty) blocks += cur.toString
      blocks.result().map(_.trim).filter { b =>
        // drop comment-only blocks (file headers)
        b.linesIterator.exists(l => l.trim.nonEmpty && !l.trim.startsWith("--"))
      }
    } else bySemicolon
  }

  /** Parse only — returns statements for inspection / tooling. */
  def parse(text: String): List[Statement] = Parser.parseStatements(text)
}
