package graft

import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** DuckDB/Trino → Spark SQL dialect normalization for the SQL front-end
  * (reference: SqlParser.scala, 3,722 LoC, parses these dialects into the
  * shared plan; here Spark's parser is the backend, so the recurring
  * dialect idioms are rewritten TEXTUALLY before parsing — playing the
  * role of the reference's dialect-specific codegen in reverse).
  *
  * All rewrites are string-literal aware: rules apply only outside quoted
  * strings (except backslash doubling, which applies inside), so `'a[b]'`
  * or `'DECIMAL ''x'''` content is never touched.
  */
object SqlDialect {

  // --- prepared-statement registry (PREPARE / EXECUTE / DEALLOCATE) --------
  private val prepared =
    new java.util.concurrent.ConcurrentHashMap[(Int, String), String]()

  private def sessionKey(spark: SparkSession): Int = System.identityHashCode(spark)

  /** Normalize one statement; returns the Spark statements to actually run
    * (possibly several, possibly none for pure-registration statements). */
  def normalize(spark: SparkSession, stmt0: String): List[String] = {
    val stmt = stmt0.trim
    val bare = stripComments(stmt).trim
    if (bare.isEmpty) return Nil

    // PREPARE name FROM <q> (Trino) / PREPARE name AS <q> (DuckDB)
    val prepRe = """(?is)^PREPARE\s+([A-Za-z_][A-Za-z0-9_]*)\s+(FROM|AS)\s+(.+)$""".r
    bare match {
      case prepRe(name, _, query) =>
        prepared.put((sessionKey(spark), name.toLowerCase), query.trim)
        return Nil
      case _ =>
    }
    // DEALLOCATE [PREPARE] name
    val deallocRe = """(?is)^DEALLOCATE\s+(?:PREPARE\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*$""".r
    bare match {
      case deallocRe(name) =>
        prepared.remove((sessionKey(spark), name.toLowerCase))
        return Nil
      case _ =>
    }
    // EXECUTE name [USING a, b] / EXECUTE name(a, b) / EXECUTE name
    val execRe = """(?is)^EXECUTE\s+([A-Za-z_][A-Za-z0-9_]*)\s*(?:USING\s+(.+)|\(\s*(.*?)\s*\))?\s*$""".r
    bare match {
      case execRe(name, usingArgs, parenArgs) =>
        val q = prepared.get((sessionKey(spark), name.toLowerCase))
        if (q == null)
          throw new IllegalArgumentException(s"prepared statement '$name' not found")
        val args = Option(usingArgs).orElse(Option(parenArgs)).map(_.trim)
          .filter(_.nonEmpty).map(splitTopLevel).getOrElse(Nil)
        return normalize(spark, bindParams(q, args))
      case _ =>
    }
    // DESCRIBE INPUT name → one row per `?` parameter of the registered
    // statement (Trino's column shape: Position, Type — types are unknown
    // without an analyzer pass, Trino itself prints `unknown` for bare ?);
    // an unregistered name yields the empty result (the corpus DESCRIBEs
    // statements it never PREPAREd — parse-only surface).
    val descInRe = """(?is)^DESCRIBE\s+INPUT\s+["`]?([A-Za-z_][A-Za-z0-9_]*)["`]?\s*$""".r
    bare match {
      case descInRe(name) =>
        val q = prepared.get((sessionKey(spark), name.toLowerCase))
        val params = if (q == null) 0 else {
          var n = 0; var inStr = false
          q.foreach { c =>
            if (c == '\'') inStr = !inStr else if (!inStr && c == '?') n += 1
          }
          n
        }
        return List(
          if (params == 0)
            "SELECT CAST(NULL AS INT) AS position, CAST(NULL AS STRING) AS type WHERE FALSE"
          else
            (0 until params).map(i => s"SELECT $i AS position, 'unknown' AS type")
              .mkString(" UNION ALL "))
      case _ =>
    }
    // DESCRIBE OUTPUT name → Trino's output-metadata shape; empty without
    // an analyzer pass over the registered statement
    val descOutRe = """(?is)^DESCRIBE\s+OUTPUT\s+["`]?([A-Za-z_][A-Za-z0-9_]*)["`]?\s*$""".r
    if (descOutRe.pattern.matcher(bare).matches())
      return List(
        "SELECT CAST(NULL AS STRING) AS column_name, CAST(NULL AS STRING) AS type WHERE FALSE")
    // SET SESSION key = value → Spark SET (arbitrary conf keys are legal)
    val setSessRe = """(?is)^SET\s+SESSION\s+([\w.]+)\s*=\s*(.+)$""".r
    bare match {
      case setSessRe(k, v) => return List(s"SET $k=${v.trim.stripPrefix("'").stripSuffix("'")}")
      case _ =>
    }
    // Trino SHOW statements Spark lacks → executable equivalents
    normalizeTrinoShow(bare) match {
      case Some(r) => return r
      case None =>
    }
    // EXPLAIN (TYPE …, FORMAT …) / EXPLAIN ANALYZE [VERBOSE] / EXPLAIN PLAN
    // FOR → Spark explain modes (one text plan per statement; Trino's
    // type/format axes have no Spark equivalent beyond FORMATTED/EXTENDED)
    val explainOptsRe = """(?is)^EXPLAIN\s*\(\s*[^)]*\)\s*(.+)$""".r
    val explainAnalyzeRe = """(?is)^EXPLAIN\s+ANALYZE\s+(?:VERBOSE\s+)?(.+)$""".r
    val explainPlanForRe = """(?is)^EXPLAIN\s+PLAN\s+FOR\s+(.+)$""".r
    bare match {
      case explainOptsRe(q) => return normalize(spark, s"EXPLAIN FORMATTED $q")
      case explainAnalyzeRe(q) => return normalize(spark, s"EXPLAIN $q")
      case explainPlanForRe(q) => return normalize(spark, s"EXPLAIN $q")
      case _ =>
    }
    // ALTER TABLE: the v1-expressible subset (rename/add/drop/rename-column/
    // type change) + no-op governance forms; column-shape ops on plain
    // parquet are read-transform-overwrite rewrites
    if (bare.toUpperCase.matches("(?s)ALTER\\s+TABLE\\b.*"))
      return normalizeAlterTable(spark, bare)
    // CREATE OR REPLACE TABLE t AS … → v1 tables lack RTAS; drop + create
    val cortRe = """(?is)^CREATE\s+OR\s+REPLACE\s+TABLE\s+(\S+)\s+(.*)$""".r
    bare match {
      case cortRe(name, rest) =>
        return List(s"DROP TABLE IF EXISTS $name") ++
          normalize(spark, s"CREATE TABLE $name $rest")
      case _ =>
    }
    // DELETE FROM t WHERE c → rewrite-the-survivors in place, reusing the
    // ALTER TABLE layout-preserving rewrite (the previous tmp-CTAS + rename
    // dance silently dropped the table's partitioning/bucketing)
    val delRe = """(?is)^DELETE\s+FROM\s+(\S+)\s+WHERE\s+(.+)$""".r
    bare match {
      case delRe(name, cond) =>
        val plain = name.replace("`", "").replace("\"", "")
        val fixedCond = rewriteExpressions(cond)
        return rewriteTableInPlace(spark, plain,
          df => df.filter(s"NOT coalesce(($fixedCond), false)"))
      case _ =>
    }
    // CREATE TABLE: Trino/Postgres DDL surface Spark lacks → normalize
    if (bare.toUpperCase.startsWith("CREATE TABLE") ||
        bare.toUpperCase.startsWith("CREATE OR REPLACE TABLE"))
      return List(rewriteExpressions(normalizeCreateTable(spark, stmt)))
    List(rewriteExpressions(stmt))
  }

  /** Trino SHOW statements with no Spark spelling → executable results:
    * governance/branch listings (grants, roles, branches) are empty typed
    * results (plain parquet tables carry no such metadata — the honest
    * answer, not an error); SHOW SESSION → Spark SET (the session-conf
    * listing); SHOW CREATE SCHEMA/FUNCTION/MATERIALIZED VIEW → the
    * reconstructable DDL as a one-row result (Spark's SHOW CREATE covers
    * tables/views only); SHOW STATS FOR t → the per-column describe. */
  private def normalizeTrinoShow(bare: String): Option[List[String]] = {
    val b = bare.trim
    def one(sql: String) = Some(List(sql))
    val showCreateSchema = """(?is)^SHOW\s+CREATE\s+SCHEMA\s+([\w.`"]+)\s*$""".r
    val showCreateFn = """(?is)^SHOW\s+CREATE\s+FUNCTION\s+([\w.`"]+)\s*$""".r
    val showCreateMv = """(?is)^SHOW\s+CREATE\s+MATERIALIZED\s+VIEW\s+([\w.`"]+)\s*$""".r
    val showStats = """(?is)^SHOW\s+STATS\s+FOR\s+([\w.`"]+)\s*$""".r
    val showBranches = """(?is)^SHOW\s+BRANCHES(\s+(FROM|IN)\s+TABLE\s+[\w.`"]+)?\s*$""".r
    val showGrants = """(?is)^SHOW\s+GRANTS(\s+ON\s+[\w.`"]+)?\s*$""".r
    val showRoles = """(?is)^SHOW\s+(CURRENT\s+ROLES|ROLE\s+GRANTS)(\s+(FROM|IN)\s+[\w.`"]+)?\s*$""".r
    val showSession = """(?is)^SHOW\s+SESSION\s*$""".r
    b match {
      case showCreateSchema(n) =>
        one(s"SELECT 'CREATE SCHEMA ${n.replace("'", "''")}' AS create_schema")
      case showCreateFn(n) =>
        one(s"SELECT 'CREATE FUNCTION ${n.replace("'", "''")}' AS create_function")
      case showCreateMv(n) =>
        one(s"SELECT 'CREATE MATERIALIZED VIEW ${n.replace("'", "''")}' AS create_mv")
      case showStats(t) => one(s"DESCRIBE TABLE $t")
      case showBranches(_, _) =>
        one("SELECT CAST(NULL AS STRING) AS branch WHERE FALSE")
      case showGrants(_) =>
        one("SELECT CAST(NULL AS STRING) AS grantee, CAST(NULL AS STRING) AS privilege WHERE FALSE")
      case showRoles(_, _, _) =>
        one("SELECT CAST(NULL AS STRING) AS role WHERE FALSE")
      case showSession() => one("SET")
      case _ => None
    }
  }

  /** ALTER TABLE dialect normalization. Catalog-level operations (RENAME
    * TO, ADD COLUMNS, SET TBLPROPERTIES, column defaults) map to Spark DDL;
    * column-shape operations v1 tables lack (DROP/RENAME COLUMN, type
    * change) are read-transform-overwrite rewrites executed here — the
    * same policy as the flow language's AlterTableStmt (Lowering.scala).
    * Governance/maintenance forms with no parquet meaning (SET
    * AUTHORIZATION, EXECUTE optimize/vacuum, SET/DROP NOT NULL) are
    * no-ops, mirroring how WITH-property blocks are stripped; EXECUTE
    * analyze maps to ANALYZE TABLE. */
  private def normalizeAlterTable(spark: SparkSession, bare: String): List[String] = {
    val re = """(?is)^ALTER\s+TABLE\s+(IF\s+EXISTS\s+)?([\w.`"]+)\s+(.*)$""".r
    bare match {
      case re(ifE, table0, rest0) =>
        val table = table0.replace("\"", "`")
        val plain = table.replace("`", "")
        val exists =
          try spark.catalog.tableExists(plain)
          catch { case _: Throwable => false }
        if (ifE != null && !exists) return Nil
        val rest = rest0.trim
        def schemaOf = spark.table(plain).schema
        def rewrite(f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): List[String] =
          rewriteTableInPlace(spark, plain, f)
        val renameTo = """(?is)^RENAME\s+TO\s+([\w.`"]+)\s*$""".r
        val addCol =
          """(?is)^ADD\s+COLUMNS?\s+(IF\s+NOT\s+EXISTS\s+)?([\w`"]+)\s+(\w+(?:\s*\([^)]*\))?(?:\s*<[^>]*>)?)(\s+NOT\s+NULL)?(\s+COMMENT\s+'(?:[^']|'')*')?\s*$""".r
        val dropCol = """(?is)^DROP\s+COLUMNS?\s+(IF\s+EXISTS\s+)?([\w`"]+)\s*$""".r
        val renameCol =
          """(?is)^RENAME\s+COLUMN\s+(IF\s+EXISTS\s+)?([\w`"]+)\s+TO\s+([\w`"]+)\s*$""".r
        // DuckDB `ALTER c TYPE T [USING expr]` and standard
        // `ALTER COLUMN c SET DATA TYPE T [USING expr]` / `ALTER COLUMN c TYPE T`
        val colType =
          """(?is)^ALTER\s+(?:COLUMN\s+)?([\w`"]+)\s+(?:SET\s+DATA\s+TYPE|TYPE)\s+(\w+(?:\s*\([^)]*\))?)(?:\s+USING\s+(.+?))?\s*$""".r
        val setProps = """(?is)^SET\s+PROPERTIES\s+(.+)$""".r
        val colDefault =
          """(?is)^ALTER\s+COLUMN\s+([\w`"]+)\s+(SET\s+DEFAULT\s+.+|DROP\s+DEFAULT)\s*$""".r
        val notNullNoop =
          """(?is)^ALTER\s+COLUMN\s+[\w`"]+\s+(SET|DROP)\s+NOT\s+NULL\s*$""".r
        val setAuth = """(?is)^SET\s+AUTHORIZATION\b.*$""".r
        val execRe = """(?is)^EXECUTE\s+(\w+)\b.*$""".r
        def colName(c: String) = c.replace("`", "").replace("\"", "")
        def hasCol(c: String) = schemaOf.fieldNames.exists(_.equalsIgnoreCase(colName(c)))
        def sparkType(t: String) = translateTypeExpr(t)
        rest match {
          case renameTo(n) => List(s"ALTER TABLE $table RENAME TO $n")
          case addCol(ifNE, c, t, _, comment) =>
            if (ifNE != null && hasCol(c)) Nil // column already present
            else {
              val cmt = Option(comment).map(_.trim).map(" " + _).getOrElse("")
              // NOT NULL dropped: parquet v1 columns are nullable; the
              // constraint is unenforceable metadata here
              List(s"ALTER TABLE $table ADD COLUMNS ($c ${sparkType(t)}$cmt)")
            }
          case dropCol(ifE2, c) =>
            if (!hasCol(c)) {
              if (ifE2 != null) Nil
              else throw new IllegalArgumentException(s"column ${colName(c)} does not exist in $plain")
            } else rewrite(_.drop(colName(c)))
          case renameCol(ifE2, o, n) =>
            if (!hasCol(o)) {
              if (ifE2 != null) Nil
              else throw new IllegalArgumentException(s"column ${colName(o)} does not exist in $plain")
            } else rewrite(_.withColumnRenamed(colName(o), colName(n)))
          case colType(c, t, using) =>
            val cn = colName(c)
            val tpe = sparkType(t)
            if (using == null)
              rewrite(df => df.withColumn(cn, df.col(cn).cast(tpe)))
            else
              rewrite(df => df.withColumn(cn,
                org.apache.spark.sql.functions.expr(rewriteExpressions(using)).cast(tpe)))
          case setProps(props) =>
            val kv = splitTopLevel(props).map { p =>
              val eq = p.indexOf('=')
              val k = p.substring(0, eq).trim
              val v = p.substring(eq + 1).trim
              s"'$k' = ${if (v.startsWith("'")) v else s"'$v'"}"
            }
            List(s"ALTER TABLE $table SET TBLPROPERTIES (${kv.mkString(", ")})")
          case colDefault(c, action) =>
            List(s"ALTER TABLE $table ALTER COLUMN $c ${action.trim}")
          case notNullNoop(_) => Nil
          case setAuth() => Nil
          case execRe(cmd) =>
            if (cmd.equalsIgnoreCase("analyze"))
              List(s"ANALYZE TABLE $table COMPUTE STATISTICS")
            else Nil // optimize/vacuum: no compaction layer on plain parquet
          case other => List(s"ALTER TABLE $table $other") // pass through
        }
      case _ => List(bare)
    }
  }

  /** CREATE TABLE dialect normalization: strip `WITH (k = v, …)` property
    * blocks (table- and column-level — engine hints with no Spark meaning),
    * strip non-foldable DEFAULTs, map Postgres-ish column types, convert
    * `( LIKE t INCLUDING PROPERTIES )` to Spark `LIKE t`, and give
    * properties-only definitions a placeholder column (Spark requires a
    * schema). */
  /** Materialize via localCheckpoint to break lineage from the files being
    * overwritten, then rewrite in place — re-applying the table's
    * partitioning/bucketing layout, which saveAsTable would otherwise
    * silently drop. A layout column removed or renamed by the transform
    * itself can't be re-applied; it is dropped from the layout (the
    * surviving columns keep theirs). Shared by the ALTER TABLE column ops
    * and the DELETE FROM rewrite. */
  private def rewriteTableInPlace(spark: SparkSession, plain: String,
      f: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): List[String] = {
    val meta =
      try Some(spark.sessionState.catalog.getTableMetadata(
        spark.sessionState.sqlParser.parseTableIdentifier(plain)))
      catch { case _: Throwable => None }
    val out = f(spark.table(plain)).localCheckpoint()
    val outCols = out.columns.map(_.toLowerCase).toSet
    var w = out.write.mode("overwrite")
    meta.foreach { m =>
      val parts = m.partitionColumnNames.filter(c => outCols(c.toLowerCase))
      if (parts.nonEmpty) w = w.partitionBy(parts: _*)
      m.bucketSpec.foreach { b =>
        val bCols = b.bucketColumnNames.filter(c => outCols(c.toLowerCase))
        if (bCols.nonEmpty) {
          w = w.bucketBy(b.numBuckets, bCols.head, bCols.tail: _*)
          val sCols = b.sortColumnNames.filter(c => outCols(c.toLowerCase))
          if (sCols.nonEmpty) w = w.sortBy(sCols.head, sCols.tail: _*)
        }
      }
    }
    w.saveAsTable(plain)
    Nil
  }

  private def normalizeCreateTable(spark: SparkSession, stmt0: String): String = {
    var stmt = stmt0
    // Trino `LIKE t [INCLUDING|EXCLUDING PROPERTIES]` column-list entries →
    // the source table's column DDL inlined (Spark's CREATE TABLE … LIKE
    // exists only as a standalone form; Trino mixes LIKE with columns and
    // allows several). Resolution happens here, at normalize time, against
    // the live catalog — exactly what Trino's analyzer does.
    val likeRe = """(?is)\bLIKE\s+([\w.`"]+?)(\s+(?:INCLUDING|EXCLUDING)\s+PROPERTIES)?\s*([,)])""".r
    var expanding = stmt.toUpperCase.contains("LIKE")
    // only inside a CREATE TABLE column list (the statement was dispatched
    // here on its CREATE TABLE prefix); skip the standalone Spark form
    if (stripComments(stmt).trim.matches(
        """(?is)CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?[\w.`"]+\s+LIKE\s+[\w.`"]+\s*"""))
      expanding = false
    // …and never inside a CTAS body: a LIKE there is a predicate, not a
    // Trino column entry (`CREATE TABLE t AS SELECT if(n LIKE p, 1, 0)…`
    // misread the pattern as a source table). Column-entry LIKEs can only
    // occur before the top-level AS.
    val ctasAsPos: Int = {
      val mask = stringMask(stmt)
      var depth = 0
      var pos = -1
      val asRe = """(?i)\bAS\b""".r
      var k = 0
      while (pos < 0 && k < stmt.length) {
        val c = stmt.charAt(k)
        if (!mask(k)) {
          if (c == '(' || c == '[') depth += 1
          else if (c == ')' || c == ']') depth -= 1
          else if (depth == 0 && (c == 'a' || c == 'A') &&
              asRe.findPrefixOf(stmt.substring(k)).isDefined &&
              (k == 0 || (!stmt.charAt(k - 1).isLetterOrDigit && stmt.charAt(k - 1) != '_')))
            pos = k
        }
        k += 1
      }
      pos
    }
    while (expanding) {
      findOutsideStrings(stmt, likeRe) match {
        case Some((start, _)) if ctasAsPos >= 0 && start > ctasAsPos =>
          expanding = false // LIKE inside the CTAS query body — a predicate
        case Some((start, _)) =>
          val m = likeRe.findAllMatchIn(stmt).find(_.start == start).get
          val src = m.group(1).replace("`", "").replace("\"", "")
            .replaceAll("(?i)^catalog\\.", "") // placeholder catalog prefix
          val ddl =
            try spark.table(src).schema.toDDL
            catch {
              case e: Throwable =>
                throw new IllegalArgumentException(
                  s"CREATE TABLE LIKE: source table $src not found", e)
            }
          stmt = stmt.substring(0, m.start) + ddl + m.group(3) + stmt.substring(m.end)
        case None => expanding = false
      }
    }
    // WITH (…) at any depth — table properties or column properties
    var stripping = true
    while (stripping) {
      findOutsideStrings(stmt, """(?is)\bWITH\s*\(""".r) match {
        case Some((start, openIdx)) =>
          val close = matchDelim(stmt, openIdx, '(', ')')
          if (close < 0) stripping = false
          else stmt = stmt.substring(0, start) + stmt.substring(close + 1)
        case None => stripping = false
      }
    }
    stmt = replaceSpanning(stmt,
      """(?is)\bDEFAULT\s+(CURRENT_TIMESTAMP\b|'(?:[^']|'')*'|\d+(?:\.\d+)?)""", "")
    stmt = replaceOutsideStrings(stmt, """(?i)\btext\b""", "string")
    stmt = replaceOutsideStrings(stmt, """(?i)\bserial\b""", "int")
    stmt = replaceOutsideStrings(stmt, """(?i)\bjsonb\b""", "string")
    stmt = replaceOutsideStrings(stmt,
      """(?is)\(\s*LIKE\s+([A-Za-z_][A-Za-z0-9_.]*)\s+INCLUDING\s+PROPERTIES\s*\)""",
      " LIKE $1")
    if (stripComments(stmt).trim.matches("""(?is)CREATE\s+TABLE\s+(IF\s+NOT\s+EXISTS\s+)?\S+\s*"""))
      stmt = stmt + " (__placeholder INT)"
    // Trino allows an explicit schema on CTAS; Spark forbids it — the AS
    // SELECT defines the schema, drop the column list
    findOutsideStrings(stmt, """(?is)\bCREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?[^\s(]+\s*\(""".r)
      .foreach { case (_, openIdx) =>
        val close = matchDelim(stmt, openIdx, '(', ')')
        if (close >= 0 &&
            stmt.substring(close + 1).trim.toUpperCase.startsWith("AS"))
          stmt = stmt.substring(0, openIdx) + stmt.substring(close + 1)
      }
    stmt
  }

  /** The ordered expression-level rewrites. */
  private[graft] def rewriteExpressions(sql0: String): String = {
    var s = sql0
    // backslashes in string literals are literal in DuckDB; Spark treats
    // them as escapes — double them (inside strings only)
    s = mapStrings(s)(_.replace("\\", "\\\\"))
    // CAST(JSON '…' AS MAP(VARCHAR, VARCHAR)) → from_json(…, map type)
    s = replaceSpanning(s,
      """(?is)CAST\s*\(\s*JSON\s+('(?:[^']|'')*')\s+AS\s+MAP\s*\(\s*VARCHAR\s*,\s*VARCHAR\s*\)\s*\)""",
      "from_json($1, 'map<string,string>')")
    // JSON '…' typed literal → plain string
    s = replaceSpanning(s, """(?is)\bJSON\s+('(?:[^']|'')*')""", "$1")
    // DECIMAL '…' typed literal → bare numeric literal (Spark parses
    // fractional literals as decimal already)
    s = replaceSpanning(s, """(?is)\bDECIMAL\s+'([0-9eE.+-]+)'""", "$1")
    // TIME '…' literal → plain string (lexicographic comparisons preserved;
    // Spark has no TIME type)
    s = replaceSpanning(s, """(?is)\bTIME\s+('(?:[^']|'')*')""", "$1")
    // TIMESTAMP '… <zone>' → strip the zone suffix Spark cannot parse
    s = replaceSpanning(s,
      """(?is)\bTIMESTAMP\s+'(\d{4}-\d{2}-\d{2}[ T][\d:.]+)\s+(?:UTC|[A-Za-z]+/[A-Za-z_]+)'""",
      "TIMESTAMP '$1'")
    // timestamp(3) precision → timestamp, then with[out] time zone → timestamp
    s = replaceOutsideStrings(s, """(?i)\btimestamp\s*\(\s*\d+\s*\)""", "timestamp")
    s = replaceOutsideStrings(s,
      """(?is)\btimestamp\s+with(?:out)?\s+time\s+zone\b""", "timestamp")
    // parameterless varchar → string
    s = replaceOutsideStrings(s, """(?i)\bvarchar\b(?!\s*\()""", "string")
    // ARRAY[…] → array(…)  (balanced; nested brackets/parens handled)
    s = convertArrayBrackets(s)
    // MAP(array(...), array(...)) → map_from_arrays
    s = replaceOutsideStrings(s, """(?is)\bMAP\s*\(\s*array\s*\(""", "map_from_arrays(array(")
    // DuckDB/Trino spellings of Spark builtins
    s = replaceOutsideStrings(s, """(?i)\barray_concat\s*\(""", "concat(")
    s = replaceOutsideStrings(s, """(?i)\blist_transform\s*\(""", "transform(")
    s = replaceOutsideStrings(s, """(?i)\bstarts_with\s*\(""", "startswith(")
    s = replaceOutsideStrings(s, """(?i)\bapprox_quantile\s*\(""", "approx_percentile(")
    // time('…') function — Spark has no TIME builder
    s = replaceOutsideStrings(s, """(?i)\btime\s*\(""", "to_timestamp(")
    // TABLESAMPLE BERNOULLI/SYSTEM (expr[%]) and DuckDB USING SAMPLE forms
    s = convertTablesample(s)
    // FETCH [FIRST|NEXT] n ROWS ONLY → LIMIT n
    s = replaceOutsideStrings(s,
      """(?is)\bFETCH\s+(?:FIRST|NEXT)\s+(\d+)\s+ROWS?\s+ONLY\b""", "LIMIT $1")
    // DuckDB in-parens null treatment: f(x IGNORE NULLS, a, b) / f(x IGNORE
    // NULLS) → the Spark placement f(x, a, b) IGNORE NULLS. Spanning: the
    // trailing args may contain string literals
    s = replaceSpanning(s,
      """(?is)\(\s*([^(),']+?)\s+(IGNORE|RESPECT)\s+NULLS\s*,([^()]*)\)""",
      "($1,$3) $2 NULLS")
    s = replaceOutsideStrings(s,
      """(?is)\s+(IGNORE|RESPECT)\s+NULLS\s*\)""", ") $1 NULLS")
    // SHOW CREATE VIEW → SHOW CREATE TABLE (Spark spelling)
    s = replaceOutsideStrings(s, """(?is)\bSHOW\s+CREATE\s+VIEW\b""", "SHOW CREATE TABLE")
    // the corpus' placeholder catalog prefix — Spark has no such catalog
    s = s.replace("\"catalog\".", "")
    // <expr> AT TIME ZONE 'z' → from_utc_timestamp(<expr>, 'z') (balanced
    // operand extraction)
    s = convertAtTimeZone(s)
    // Trino 2-argument if(c, v) → if(c, v, NULL)
    s = convertTwoArgIf(s)
    // DuckDB MAP {'k': v, …} struct-ish literal → map('k', v, …)
    s = convertMapBraces(s)
    // array_agg(expr ORDER BY …) → struct-sort rewrite (Spark SQL has no
    // ordered-aggregate syntax; the flow front-end supports it natively)
    s = convertOrderedArrayAgg(s)
    // `_` as a lambda parameter (reference issue #1243) — Spark reserves
    // `_`-leading names in lambdas; rename the standalone token
    if (replaceOutsideStrings(s, """\(?\s*_\s*\)?\s*->""", "").length != s.length)
      s = replaceOutsideStrings(s, """(?<![A-Za-z0-9_])_(?![A-Za-z0-9_])""", "__lv")
    // Trino ROW(...)-type CAST algebra → Spark struct types, then ROW value
    // constructors → struct(...)
    s = convertRowTypes(s)
    // JSON_OBJECT('k', v, …) / JSON_OBJECT(KEY 'k' VALUE v, … [modifiers])
    // → to_json(named_struct('k', v, …)) — Spark has no json type; the
    // serialized-string form is the engine-portable reading
    s = convertJsonObject(s)
    // single-parameter parenthesized lambda `(x) -> …` → `x -> …` (Spark's
    // grammar only parenthesizes multi-parameter lambdas)
    s = replaceOutsideStrings(s,
      """\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)\s*->""", "$1 ->")
    // DuckDB numeric truthiness in an identity lambda PREDICATE (`x -> x`
    // inside a filter-family call): truthy = non-null and non-zero; Spark
    // lambdas are typed boolean. Anchored to the ENCLOSING CALL NAME — a
    // bare identity-lambda rewrite also converted value-returning lambdas
    // (aggregate finishers, transform) to booleans
    s = rewriteIdentityLambdaPredicates(s)
    // `VALUES (struct(…))` single-struct rows: Spark's inline-table rule
    // expands a lone struct row into its fields, breaking 1-column aliases —
    // rewrite to a SELECT chain that keeps the struct value intact
    s = convertStructValuesRows(s)
    // DuckDB `//` integer division → Spark's div operator
    s = replaceOutsideStrings(s, """//""", " div ")
    // Hive `STORED AS <fmt>` → Spark `USING <fmt>` (DDL only — `stored`
    // is a legal column alias in queries; leading comment lines skipped)
    if (s.matches("""(?is)\s*(--[^\n]*\n\s*)*CREATE\b.*"""))
      s = replaceOutsideStrings(s, """(?i)\bSTORED\s+AS\s+(\w+)""", "USING $1")
    // Trino IPADDRESS literals / casts → plain strings (no inet type;
    // string order preserves the corpus' equality comparisons)
    s = replaceSpanning(s, """(?is)\bIPADDRESS\s+('(?:[^']|'')*')""", "$1")
    s = replaceSpanning(s, """(?is)\bIPADDRESS\s+"([^"]*)"""", "'$1'")
    s = replaceOutsideStrings(s, """(?i)\bIPADDRESS\s*\(""", "string(")
    // the corpus' placeholder `catalog.` prefix (unquoted form)
    // (\z: a following double-quoted identifier is now its own masked
    // segment, so `catalog."t"` shows up here as a segment ending in
    // `catalog.`)
    s = replaceOutsideStrings(s, """(?i)\bcatalog\.(?=[\w`"]|\z)""", "")
    // Trino/DuckDB anonymous VALUES columns are column1, column2, …;
    // Spark's are col1, col2, … (rename only when VALUES is present)
    if (findOutsideStrings(s, """(?i)\bVALUES\s*\(""".r).isDefined)
      s = replaceOutsideStrings(s, """(?i)\bcolumn(\d+)\b""", "col$1")
    // Trino parenthesized INSERT source `INSERT INTO t (WITH … SELECT …)`
    // → bare query (Spark's grammar takes the query unparenthesized)
    findOutsideStrings(s, """(?is)\bINSERT\s+INTO\s+(?:TABLE\s+)?[\w.`"]+\s*\(\s*WITH\b""".r)
      .foreach { case (_, lastIdx) =>
        val open = s.lastIndexOf('(', lastIdx)
        val close = matchDelim(s, open, '(', ')')
        if (close >= 0 && s.substring(close + 1).trim.isEmpty)
          s = s.substring(0, open) + s.substring(open + 1, close) + s.substring(close + 1)
      }
    // Hivemall-style `each_top_k(k, grp, score, a…) AS (cols)` UDTF →
    // window-rank rewrite (the one executable UDTF shape in the corpus)
    if (s.toLowerCase.contains("each_top_k")) s = convertEachTopK(s)
    // TD_* time functions take numeric-or-string time values; the UDFs are
    // registered over strings and ANSI mode won't implicitly cast — wrap
    // each top-level argument in CAST(… AS STRING)
    if (s.toLowerCase.contains("td_time_")) s = convertTdCalls(s)
    // Hive permits orderless ranking windows (`row_number() OVER (PARTITION
    // BY x)`); Spark requires an ORDER BY — a constant key keeps the
    // (already arbitrary) within-partition order legal
    s = convertOrderlessRankingWindows(s)
    s
  }

  /** `row_number|rank|dense_rank() OVER (PARTITION BY … )` with no ORDER BY
    * → append ` ORDER BY 1` inside the window spec. */
  private def convertOrderlessRankingWindows(s0: String): String = {
    var s = s0
    val re = """(?is)\b(?:row_number|rank|dense_rank)\s*\(\s*\)\s*OVER\s*\(""".r
    var from = 0
    var continue = true
    while (continue) {
      val sub = s.substring(from)
      findOutsideStrings(sub, re) match {
        case None => continue = false
        case Some((_, open0)) =>
          val open = from + open0
          val close = matchDelim(s, open, '(', ')')
          if (close < 0) continue = false
          else {
            val spec = s.substring(open + 1, close)
            if (!"""(?is)\bORDER\s+BY\b""".r.findFirstIn(spec).exists { _ =>
                // top-level only: masked/nested ORDER BY doesn't count
                val mask = stringMask(spec)
                """(?is)\bORDER\s+BY\b""".r.findAllMatchIn(spec).exists { m =>
                  !mask(m.start) && {
                    var d = 0; var i = 0
                    while (i < m.start) {
                      val c = spec.charAt(i)
                      if (!mask(i)) { if (c == '(') d += 1 else if (c == ')') d -= 1 }
                      i += 1
                    }
                    d == 0
                  }
                }
              })
              s = s.substring(0, close) + " ORDER BY 1" + s.substring(close)
            from = close + 1
          }
      }
    }
    s
  }

  /** Wrap every top-level argument of a `TD_*(…)` call in CAST(… AS
    * STRING) so the string-typed UDFs accept numeric epochs under ANSI. */
  private def convertTdCalls(s0: String): String = {
    val re = """(?i)\bTD_[A-Z_]+\s*\(""".r
    def wrapOne(s: String, from: Int): String = {
      val sub = s.substring(from)
      findOutsideStrings(sub, re) match {
        case None => s
        case Some((start0, open0)) =>
          val open = from + open0
          val close = matchDelim(s, open, '(', ')')
          if (close < 0) return s
          // nested TD_ calls are wrapped by the continued forward scan
          val args = splitTopLevel(s.substring(open + 1, close))
            .map(a => s"CAST($a AS STRING)")
          val head = s.substring(0, open + 1)
          val rebuilt = head + args.mkString(", ") + s.substring(close)
          wrapOne(rebuilt, open + 1)
      }
    }
    wrapOne(s0, 0)
  }

  /** `SELECT each_top_k(k, grp, score, a1, a2, …) AS (c1, c2, …) FROM rest`
    * → `SELECT * FROM (SELECT rank() OVER (PARTITION BY grp ORDER BY score
    * DESC) AS c1, score AS c2, a1 AS c3, … FROM rest) WHERE c1 <= k`.
    * Hivemall's each_top_k emits (rank, score, args…) per group — the
    * window form is the distributed-native equivalent (one shuffle on grp,
    * same as the CLUSTER BY the Hive original requires). */
  private def convertEachTopK(s0: String): String = {
    val re = """(?is)\bSELECT\s+each_top_k\s*\(""".r
    findOutsideStrings(s0, re) match {
      case None => s0
      case Some((selStart, openIdx)) =>
        val closeArgs = matchDelim(s0, openIdx, '(', ')')
        if (closeArgs < 0) return s0
        val args = splitTopLevel(s0.substring(openIdx + 1, closeArgs))
        val asRe = """(?is)^\s*AS\s*\(""".r
        asRe.findFirstMatchIn(s0.substring(closeArgs + 1)) match {
          case None => s0
          case Some(m) =>
            val colsOpen = closeArgs + 1 + m.end - 1
            val colsClose = matchDelim(s0, colsOpen, '(', ')')
            if (colsClose < 0 || args.length < 3) return s0
            val cols = splitTopLevel(s0.substring(colsOpen + 1, colsClose))
            if (cols.length != args.length - 1) return s0
            // rest extends to where paren depth drops below the SELECT's
            var k = colsClose + 1; var depth = 0; var inStr = false
            var end = s0.length
            while (k < s0.length && end == s0.length) {
              val c = s0.charAt(k)
              if (c == '\'') inStr = !inStr
              else if (!inStr && c == '(') depth += 1
              else if (!inStr && c == ')') { depth -= 1; if (depth < 0) end = k }
              k += 1
            }
            val rest = s0.substring(colsClose + 1, end)
            val (kLim, grp, score) = (args(0), args(1), args(2))
            val inner = (s"rank() OVER (PARTITION BY $grp ORDER BY $score DESC) AS ${cols(0)}" ::
              s"$score AS ${cols(1)}" ::
              args.drop(3).zip(cols.drop(2)).map { case (a, c) => s"$a AS $c" }).mkString(", ")
            val repl = s"SELECT * FROM (SELECT $inner $rest) WHERE ${cols(0)} <= $kLim"
            convertEachTopK(s0.substring(0, selStart) + repl + s0.substring(end))
        }
    }
  }

  /** `(VALUES (struct(…))[, (struct(…))]*) AS t(x)` → `(SELECT struct(…) AS
    * x [UNION ALL SELECT …]) t`. Only engages when every row is a single
    * top-level struct(...) expression and the alias names exactly one
    * column (the Trino ROW-value inline-table idiom). */
  private def convertStructValuesRows(s0: String): String = {
    val re = """(?i)\(\s*VALUES\s*\(""".r
    findOutsideStrings(s0, re) match {
      case None => s0
      case Some((start, firstOpen)) =>
        // collect the parenthesized rows
        var rows = List.newBuilder[String]
        var open = firstOpen
        var ok = true
        var end = -1
        var continue = true
        while (continue) {
          val close = matchDelim(s0, open, '(', ')')
          if (close < 0) { ok = false; continue = false }
          else {
            rows += s0.substring(open + 1, close)
            // next non-space: ',' → another row; ')' → end of VALUES
            var j = close + 1
            while (j < s0.length && Character.isWhitespace(s0.charAt(j))) j += 1
            if (j < s0.length && s0.charAt(j) == ',') {
              var k = j + 1
              while (k < s0.length && Character.isWhitespace(s0.charAt(k))) k += 1
              if (k < s0.length && s0.charAt(k) == '(') { open = k }
              else { ok = false; continue = false }
            } else if (j < s0.length && s0.charAt(j) == ')') {
              end = j; continue = false
            } else { ok = false; continue = false }
          }
        }
        val aliasRe = """(?is)^\s*(?:AS\s+)?([A-Za-z_][A-Za-z0-9_]*)\s*\(\s*([A-Za-z_][A-Za-z0-9_]*)\s*\)""".r
        val after = if (end >= 0) s0.substring(end + 1) else ""
        val rowList = rows.result()
        val allStruct = rowList.nonEmpty && rowList.forall { r =>
          r.trim.toLowerCase.startsWith("struct(") &&
            splitTopLevel(r).lengthCompare(1) == 0
        }
        aliasRe.findFirstMatchIn(after) match {
          case Some(m) if ok && allStruct =>
            val (tbl, col) = (m.group(1), m.group(2))
            val sel = rowList.map(r => s"SELECT ${r.trim} AS $col").mkString(" UNION ALL ")
            val rebuilt = s"($sel) $tbl" + after.substring(m.end)
            convertStructValuesRows(s0.substring(0, start) + rebuilt)
          case _ =>
            // leave untouched; avoid rescanning the same site by translating
            // only the remainder after this VALUES keyword
            val head = s0.substring(0, firstOpen + 1)
            head + convertStructValuesRows(s0.substring(firstOpen + 1))
        }
      }
  }

  /** Normalize a raw `sql"…"` fragment that Spark's parser rejected: the
    * full expression rewrite plus DuckDB-only literal forms that are too
    * ambiguous to apply to whole scripts — bare `[1, 2, 3]` array literals
    * (distinguished from subscripts `a[1]` by the preceding token). */
  private[graft] def normalizeRawFragment(sql0: String): String =
    convertBareArrayBrackets(rewriteExpressions(sql0))

  /** `array_agg([DISTINCT] expr ORDER BY k1 [ASC|DESC] [NULLS F|L], …)` →
    * `transform(array_sort(array_agg([DISTINCT] struct(expr AS __v, k1 AS
    * __k1, …)), (l, r) -> CASE…), s -> s.__v)`. The struct agg keeps rows
    * whose ORDER keys are null (the comparator places them per the NULLS
    * clause; default asc→last, desc→first, the Trino/DuckDB default). */
  private def convertOrderedArrayAgg(s0: String): String = {
    var s = s0
    val re = """(?i)\barray_agg\s*\(""".r
    var searchFrom = 0
    var continue = true
    while (continue) {
      val sub = s.substring(searchFrom)
      findOutsideStrings(sub, re) match {
        case None => continue = false
        case Some((start0, openIdx0)) =>
          val start = searchFrom + start0
          val openIdx = searchFrom + openIdx0
          val close = matchDelim(s, openIdx, '(', ')')
          if (close < 0) continue = false
          else {
            val inner = s.substring(openIdx + 1, close)
            // top-level ORDER BY split (outside strings, depth 0)
            val mask = stringMask(inner)
            val obRe = """(?i)\bORDER\s+BY\b""".r
            val obAt = obRe.findAllMatchIn(inner).find { m =>
              !mask(m.start) && {
                var depth = 0
                var i = 0
                var top = true
                while (i < m.start) {
                  val c = inner.charAt(i)
                  if (!mask(i)) {
                    if (c == '(' || c == '[') depth += 1
                    else if (c == ')' || c == ']') depth -= 1
                  }
                  i += 1
                }
                top && depth == 0
              }
            }
            obAt match {
              case None => searchFrom = close + 1
              case Some(m) =>
                var exprPart = inner.substring(0, m.start).trim
                val distinct = """(?i)^DISTINCT\b""".r.findFirstIn(exprPart).isDefined
                if (distinct) exprPart = exprPart.substring("DISTINCT".length).trim
                val keys = splitTopLevel(inner.substring(m.end)).map { k0 =>
                  var k = k0.trim
                  var desc = false
                  var nullsFirst: Option[Boolean] = None
                  val nf = """(?i)\s+NULLS\s+(FIRST|LAST)\s*$""".r
                  nf.findFirstMatchIn(k).foreach { mm =>
                    nullsFirst = Some(mm.group(1).equalsIgnoreCase("FIRST"))
                    k = k.substring(0, mm.start).trim
                  }
                  val ad = """(?i)\s+(ASC|DESC)\s*$""".r
                  ad.findFirstMatchIn(k).foreach { mm =>
                    desc = mm.group(1).equalsIgnoreCase("DESC")
                    k = k.substring(0, mm.start).trim
                  }
                  (k, desc, nullsFirst.getOrElse(desc)) // default: asc→nulls last, desc→nulls first
                }
                val fields = (s"($exprPart) AS __v" ::
                  keys.zipWithIndex.map { case ((k, _, _), i) => s"($k) AS __k$i" }).mkString(", ")
                val cmp = keys.zipWithIndex.flatMap { case ((_, desc, nFirst), i) =>
                  val (lt, gt) = if (desc) ("1", "-1") else ("-1", "1")
                  val (nl, nr) = if (nFirst) ("-1", "1") else ("1", "-1")
                  List(
                    s"WHEN l.__k$i IS NULL AND r.__k$i IS NOT NULL THEN $nl",
                    s"WHEN r.__k$i IS NULL AND l.__k$i IS NOT NULL THEN $nr",
                    s"WHEN l.__k$i < r.__k$i THEN $lt",
                    s"WHEN l.__k$i > r.__k$i THEN $gt")
                }.mkString(" ")
                val distinctKw = if (distinct) "DISTINCT " else ""
                val repl =
                  s"transform(array_sort(array_agg(${distinctKw}struct($fields)), " +
                    s"(l, r) -> CASE $cmp ELSE 0 END), s -> s.__v)"
                s = s.substring(0, start) + repl + s.substring(close + 1)
                searchFrom = start + repl.length
            }
          }
      }
    }
    s
  }

  /** Trino/DuckDB ROW-type algebra: the AS-operand of a CAST translated to
    * Spark type syntax — `ROW(id bigint, name varchar)` → `struct<id:
    * bigint, name: string>`, `array(T)`/`map(K,V)` → `array<T>`/`map<K,V>`
    * — then remaining `ROW(…)` VALUE constructors → `struct(…)`. Spark
    * casts struct→struct positionally, which is exactly Trino's ROW cast. */
  private def convertRowTypes(s0: String): String = {
    var s = s0
    // only engage when a ROW( appears (keeps the common path untouched)
    if ("""(?i)\bROW\s*\(""".r.findFirstIn(s).isEmpty) return s
    // 1. translate CAST type operands
    val castRe = """(?i)\bCAST\s*\(""".r
    var from = 0
    var continue = true
    while (continue) {
      val sub = s.substring(from)
      findOutsideStrings(sub, castRe) match {
        case None => continue = false
        case Some((cs0, open0)) =>
          val open = from + open0
          val close = matchDelim(s, open, '(', ')')
          if (close < 0) continue = false
          else {
            val inner = s.substring(open + 1, close)
            val mask = stringMask(inner)
            // last top-level ` AS ` splits value from type
            val asRe = """(?i)\sAS\s""".r
            val splits = asRe.findAllMatchIn(inner).filter { m =>
              !mask(m.start) && {
                var depth = 0; var i = 0
                while (i < m.start) {
                  val c = inner.charAt(i)
                  if (!mask(i)) {
                    if (c == '(' || c == '[') depth += 1
                    else if (c == ')' || c == ']') depth -= 1
                  }
                  i += 1
                }
                depth == 0
              }
            }.toList
            if (splits.isEmpty) { from = close + 1 }
            else {
              val m = splits.last
              val valuePart = inner.substring(0, m.start)
              val typePart = inner.substring(m.end).trim
              val newType = translateTypeExpr(typePart)
              val rebuilt = s"CAST($valuePart AS $newType)"
              s = s.substring(0, from + cs0) + rebuilt + s.substring(close + 1)
              from = from + cs0 + rebuilt.length
            }
          }
      }
    }
    // 2. remaining ROW( are value constructors
    replaceOutsideStrings(s, """(?i)\bROW\s*\(""", "struct(")
  }

  /** Recursive type-expression translation (Trino/DuckDB → Spark DDL). */
  private def translateTypeExpr(t0: String): String = {
    val t = t0.trim
    val paren = t.indexOf('(')
    if (paren < 0) {
      t.toLowerCase match {
        case "varchar" | "text" => "string"
        case "integer" => "int"
        case other => other
      }
    } else {
      val head = t.substring(0, paren).trim.toLowerCase
      val close = matchDelim(t, paren, '(', ')')
      if (close < 0) return t
      val inner = t.substring(paren + 1, close)
      head match {
        case "row" =>
          val fields = splitTopLevel(inner).map { f0 =>
            val f = f0.trim
            val sp = f.indexOf(' ')
            if (sp < 0) f
            else {
              val fname = f.substring(0, sp).trim
              val ftype = translateTypeExpr(f.substring(sp + 1))
              s"$fname: $ftype"
            }
          }
          s"struct<${fields.mkString(", ")}>"
        case "array" => s"array<${translateTypeExpr(inner)}>"
        case "map" =>
          val parts = splitTopLevel(inner).map(translateTypeExpr)
          s"map<${parts.mkString(", ")}>"
        case "decimal" | "numeric" | "char" => t // parameterized scalars pass through
        case _ => t
      }
    }
  }

  /** `JSON_OBJECT('k', v, …)` and the standard-SQL `JSON_OBJECT(KEY 'k'
    * VALUE v, … [NULL|ABSENT ON NULL] [WITH|WITHOUT UNIQUE KEYS])` →
    * `to_json(named_struct('k', v, …))`; modifiers are serialization hints
    * dropped with the json type itself. */
  private def convertJsonObject(s0: String): String = {
    var s = s0
    val re = """(?i)\bJSON_OBJECT\s*\(""".r
    var continue = true
    while (continue) {
      findOutsideStrings(s, re) match {
        case None => continue = false
        case Some((start, openIdx)) =>
          val close = matchDelim(s, openIdx, '(', ')')
          if (close < 0) continue = false
          else {
            var inner = s.substring(openIdx + 1, close)
            // strip trailing modifiers (they follow the final pair)
            inner = inner.replaceAll(
              """(?is)\s+(NULL|ABSENT)\s+ON\s+NULL(\s+WITH(OUT)?\s+UNIQUE\s+KEYS)?\s*$""", "")
            inner = inner.replaceAll(
              """(?is)\s+WITH(OUT)?\s+UNIQUE\s+KEYS\s*$""", "")
            val items = splitTopLevel(inner).map(_.trim).filter(_.nonEmpty)
            val kvRe = """(?is)^KEY\s+(.+?)\s+VALUE\s+(.+)$""".r
            val pairs: List[String] =
              if (items.forall(kvRe.pattern.matcher(_).matches()))
                items.flatMap { it =>
                  val m = kvRe.findFirstMatchIn(it).get
                  List(m.group(1).trim, m.group(2).trim)
                }
              else items // DuckDB alternating style is already k, v, k, v
            val repl = s"to_json(named_struct(${pairs.mkString(", ")}))"
            s = s.substring(0, start) + repl + s.substring(close + 1)
          }
      }
    }
    s
  }

  /** DuckDB `MAP {'k1': v1, 'k2': v2}` → `map('k1', v1, 'k2', v2)`. */
  private def convertMapBraces(s0: String): String = {
    var s = s0
    val re = """(?i)\bMAP\s*\{""".r
    var continue = true
    while (continue) {
      findOutsideStrings(s, re) match {
        case None => continue = false
        case Some((start, openIdx)) =>
          val close = matchDelim(s, openIdx, '{', '}')
          if (close < 0) continue = false
          else {
            val inner = s.substring(openIdx + 1, close)
            val pairs = splitTopLevel(inner).flatMap { kv =>
              // split on the FIRST top-level colon (values may nest maps)
              val mask = stringMask(kv)
              var depth = 0; var cut = -1; var i = 0
              while (i < kv.length && cut < 0) {
                val c = kv.charAt(i)
                if (!mask(i)) {
                  if (c == '(' || c == '[' || c == '{') depth += 1
                  else if (c == ')' || c == ']' || c == '}') depth -= 1
                  else if (c == ':' && depth == 0) cut = i
                }
                i += 1
              }
              if (cut < 0) List(kv.trim)
              else List(kv.substring(0, cut).trim, kv.substring(cut + 1).trim)
            }
            s = s.substring(0, start) + "map(" + pairs.mkString(", ") + ")" +
              s.substring(close + 1)
          }
      }
    }
    s
  }

  /** DuckDB bare array literals `[e1, e2]` → `array(e1, e2)`, leaving
    * subscripts `a[1]` / `f(x)[2]` alone: a `[` is a literal only when the
    * preceding non-space character cannot END an operand (start of input,
    * `(`, `[`, `{`, `,` or an operator/colon). */
  private def convertBareArrayBrackets(s0: String): String = {
    val mask = stringMask(s0)
    def isLiteralStart(idx: Int): Boolean = {
      var j = idx - 1
      while (j >= 0 && Character.isWhitespace(s0.charAt(j))) j -= 1
      if (j < 0) true
      else "([{,=<>+-*/%:&|!".indexOf(s0.charAt(j)) >= 0 ||
        // a preceding KEYWORD (select, where, then, and, …) also opens an
        // operand position; identifiers/`)`/`]`/quotes close one (subscript)
        {
          var k = j
          while (k >= 0 && (Character.isLetterOrDigit(s0.charAt(k)) || s0.charAt(k) == '_')) k -= 1
          val word = s0.substring(k + 1, j + 1).toLowerCase
          Set("select", "where", "when", "then", "else", "and", "or", "not",
            "in", "values", "on", "having", "by", "as", "return", "union",
            "all", "distinct", "case").contains(word)
        }
    }
    val openIdx = s0.indices.find(i => !mask(i) && s0.charAt(i) == '[' && isLiteralStart(i))
    openIdx match {
      case None => s0
      case Some(i) =>
        val close = matchDelim(s0, i, '[', ']')
        if (close < 0) s0
        else convertBareArrayBrackets(
          s0.substring(0, i) + "array(" +
            convertBareArrayBrackets(s0.substring(i + 1, close)) + ")" +
            s0.substring(close + 1))
    }
  }

  // --- helpers ---------------------------------------------------------------

  /** Split `a, 'x,y', f(1,2)` on TOP-LEVEL commas. */
  private def splitTopLevel(s: String): List[String] = {
    val out = List.newBuilder[String]
    val sb = new StringBuilder
    var depth = 0
    var inStr = false
    s.foreach {
      case '\'' => inStr = !inStr; sb += '\''
      case c if inStr => sb += c
      // brackets count for depth but pass through UNCHANGED — rewriting
      // [ to ( corrupted subscripts (`k[1]` became the call `k(1)`)
      case c @ ('(' | '[') => depth += 1; sb += c
      case c @ (')' | ']') => depth -= 1; sb += c
      case ',' if depth == 0 => out += sb.toString.trim; sb.clear()
      case c => sb += c
    }
    if (sb.nonEmpty) out += sb.toString.trim
    out.result().filter(_.nonEmpty)
  }

  /** Bind `?` (sequential), `$1` (positional), `$name` (by position) params. */
  private def bindParams(q: String, args: List[String]): String = {
    var i = 0
    val sb = new StringBuilder
    var inStr = false
    var k = 0
    while (k < q.length) {
      val c = q.charAt(k)
      if (c == '\'') { inStr = !inStr; sb += c; k += 1 }
      else if (inStr) { sb += c; k += 1 }
      else if (c == '?') {
        sb ++= args.lift(i).getOrElse("NULL"); i += 1; k += 1
      } else if (c == '$' && k + 1 < q.length &&
          (q.charAt(k + 1).isDigit || q.charAt(k + 1).isLetter || q.charAt(k + 1) == '_')) {
        var j = k + 1
        while (j < q.length && (q.charAt(j).isLetterOrDigit || q.charAt(j) == '_')) j += 1
        val token = q.substring(k + 1, j)
        val idx = token.toIntOption.map(_ - 1).getOrElse { val v = i; i += 1; v }
        sb ++= args.lift(idx).getOrElse("NULL")
        k = j
      } else { sb += c; k += 1 }
    }
    sb.toString
  }

  private def stripComments(s: String): String = {
    val sb = new StringBuilder
    var inStr = false
    var inDq = false
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      if (!inStr && !inDq && c == '-' && k + 1 < s.length && s.charAt(k + 1) == '-') {
        while (k < s.length && s.charAt(k) != '\n') k += 1
      } else {
        if (!inStr && c == '"') inDq = !inDq
        else if (!inDq && c == '\'') inStr = !inStr
        sb += c
        k += 1
      }
    }
    sb.toString
  }

  /** Apply `f` to string-literal segments only. */
  private def mapStrings(s: String)(f: String => String): String =
    mapSegments(s)((seg, inStr) => if (inStr) f(seg) else seg)

  /** Regex replace applied to non-string segments only. */
  private def replaceOutsideStrings(s: String, pattern: String, replacement: String): String =
    mapSegments(s)((seg, inStr) => if (inStr) seg else seg.replaceAll(pattern, replacement))

  /** Regex replace over the WHOLE text (matches may span string literals,
    * e.g. typed literals `DECIMAL '0.95'`), applied only when the match
    * STARTS outside a string literal. */
  private def replaceSpanning(s0: String, pattern: String, replacement: String): String = {
    var s = s0
    val re = pattern.r
    var continue = true
    while (continue) {
      val mask = stringMask(s)
      re.findAllMatchIn(s).find(m => !mask(m.start)) match {
        case None => continue = false
        case Some(m) =>
          s = s.substring(0, m.start) + m.matched.replaceAll(pattern, replacement) +
            s.substring(m.end)
      }
    }
    s
  }

  /** TABLESAMPLE BERNOULLI/SYSTEM (expr[%]) and DuckDB USING SAMPLE forms →
    * Spark `TABLESAMPLE (n PERCENT|n ROWS)`. Integer arithmetic inside the
    * parens is folded (Spark only accepts literal percentages). */
  private def convertTablesample(s0: String): String = {
    var s = s0
    def fold(inner0: String): Option[String] = {
      val inner = inner0.trim.stripSuffix("%").trim
      if (inner.matches("""[0-9.\s()+\-*/]+""")) Some(evalArith(inner).map(v =>
        if (v == v.floor) v.toLong.toString else v.toString).getOrElse(inner))
      else None
    }
    val re = """(?is)\bTABLESAMPLE\s+(?:BERNOULLI|SYSTEM)\s*\(""".r
    var continue = true
    while (continue) {
      findOutsideStrings(s, re) match {
        case None => continue = false
        case Some((start, openIdx)) =>
          val close = matchDelim(s, openIdx, '(', ')')
          if (close < 0) continue = false
          else {
            val folded = fold(s.substring(openIdx + 1, close)).getOrElse("10")
            s = s.substring(0, start) + s"TABLESAMPLE ($folded PERCENT)" + s.substring(close + 1)
          }
      }
    }
    // USING SAMPLE reservoir(10%) / 10% / 10 percent / 5 [rows]
    s = replaceOutsideStrings(s,
      """(?is)\bUSING\s+SAMPLE\s+reservoir\s*\(\s*(\d+)\s*%?\s*\)""", "TABLESAMPLE ($1 PERCENT)")
    s = replaceOutsideStrings(s,
      """(?is)\bUSING\s+SAMPLE\s+(\d+)\s*(?:%|percent)""", "TABLESAMPLE ($1 PERCENT)")
    s = replaceOutsideStrings(s,
      """(?is)\bUSING\s+SAMPLE\s+(\d+)(?:\s+rows)?\b""", "TABLESAMPLE ($1 ROWS)")
    s
  }

  /** Fold a small integer/decimal arithmetic expression (for TABLESAMPLE). */
  private def evalArith(e: String): Option[Double] = {
    // recursive-descent over + - * / and parens
    val s = e.replaceAll("\\s+", "")
    var pos = 0
    def peek: Char = if (pos < s.length) s.charAt(pos) else ' '
    def expr(): Double = {
      var v = term()
      while (peek == '+' || peek == '-') {
        val op = s.charAt(pos); pos += 1
        val r = term()
        v = if (op == '+') v + r else v - r
      }
      v
    }
    def term(): Double = {
      var v = factor()
      while (peek == '*' || peek == '/') {
        val op = s.charAt(pos); pos += 1
        val r = factor()
        v = if (op == '*') v * r else v / r
      }
      v
    }
    def factor(): Double =
      if (peek == '(') { pos += 1; val v = expr(); pos += 1; v }
      else {
        val start = pos
        while (pos < s.length && (s.charAt(pos).isDigit || s.charAt(pos) == '.')) pos += 1
        s.substring(start, pos).toDouble
      }
    try { val v = expr(); if (pos == s.length) Some(v) else None }
    catch { case _: Throwable => None }
  }

  /** Split into alternating outside/inside-string segments, map, re-join.
    * Inside segments exclude the surrounding quotes; '' stays one literal.
    * `--` comments pass through untouched — an apostrophe in a comment
    * (don't!) must not flip the string state. Double-quoted IDENTIFIERS
    * (`"offset"`, `"a//b"` — double quotes are identifiers in this
    * front-end) pass through verbatim, never handed to `f`: they are
    * neither rewritable SQL text nor string literals, and a textual rule
    * firing inside one would corrupt the identifier. */
  private def mapSegments(s: String)(f: (String, Boolean) => String): String = {
    val sb = new StringBuilder
    val seg = new StringBuilder
    var inStr = false
    var k = 0
    def flush(): Unit = { sb ++= f(seg.toString, inStr); seg.clear() }
    while (k < s.length) {
      val c = s.charAt(k)
      if (!inStr && c == '-' && k + 1 < s.length && s.charAt(k + 1) == '-') {
        flush()
        while (k < s.length && s.charAt(k) != '\n') { sb += s.charAt(k); k += 1 }
      } else if (!inStr && c == '/' && k + 1 < s.length && s.charAt(k + 1) == '*') {
        // block comment: copy through untouched (an apostrophe inside one
        // must not flip string state for the rest of the statement)
        flush()
        val end = s.indexOf("*/", k + 2)
        val stop = if (end < 0) s.length else end + 2
        while (k < stop) { sb += s.charAt(k); k += 1 }
      } else if (!inStr && c == '`') {
        // backtick identifier (Spark native quoting): copy untouched
        flush()
        sb += '`'; k += 1
        while (k < s.length && s.charAt(k) != '`') { sb += s.charAt(k); k += 1 }
        if (k < s.length) { sb += '`'; k += 1 }
      } else if (!inStr && c == '"') {
        // double-quoted identifier: copy through untouched ("" stays escaped)
        flush()
        sb += '"'; k += 1
        var closed = false
        while (k < s.length && !closed) {
          if (s.charAt(k) == '"' && k + 1 < s.length && s.charAt(k + 1) == '"') {
            sb ++= "\"\""; k += 2
          } else if (s.charAt(k) == '"') { sb += '"'; k += 1; closed = true }
          else { sb += s.charAt(k); k += 1 }
        }
      } else if (!inStr && c == '\'') { flush(); sb += '\''; inStr = true; k += 1 }
      else if (inStr && c == '\'' && k + 1 < s.length && s.charAt(k + 1) == '\'') {
        seg ++= "''"; k += 2
      } else if (inStr && c == '\'') { flush(); sb += '\''; inStr = false; k += 1 }
      else { seg += c; k += 1 }
    }
    flush()
    sb.toString
  }

  /** ARRAY[a, b] → array(a, b), nesting-aware, strings skipped. */
  private def convertArrayBrackets(s0: String): String = {
    var s = s0
    val re = """(?i)\bARRAY\s*\[""".r
    var continue = true
    while (continue) {
      val posOpt = findOutsideStrings(s, re)
      posOpt match {
        case None => continue = false
        case Some((start, openIdx)) =>
          val close = matchDelim(s, openIdx, '[', ']')
          if (close < 0) { continue = false }
          else {
            s = s.substring(0, start) + "array(" +
              s.substring(openIdx + 1, close) + ")" + s.substring(close + 1)
          }
      }
    }
    s
  }

  /** First match of `re` outside string literals: (matchStart, lastCharIdx). */
  private def findOutsideStrings(s: String, re: scala.util.matching.Regex): Option[(Int, Int)] = {
    val inString = stringMask(s)
    re.findAllMatchIn(s).find(m => !inString(m.start))
      .map(m => (m.start, m.end - 1))
  }

  private val identityLambdaHosts =
    Set("filter", "list_filter", "array_filter", "any_match", "all_match", "none_match")

  /** `x -> x` inside a filter-family call → `x -> coalesce(x, 0) <> 0`
    * (DuckDB numeric truthiness). The enclosing call is found by scanning
    * back to the unmatched '(' and reading the identifier before it, so a
    * first argument full of commas/parens (`filter(array(1,2,NULL), x->x)`)
    * anchors correctly and value-returning identity lambdas elsewhere
    * (transform, aggregate finishers) stay untouched. */
  private def rewriteIdentityLambdaPredicates(s0: String): String = {
    val re = """\b([A-Za-z_][A-Za-z0-9_]*)\s*->\s*\1\s*([,)])""".r
    var s = s0
    var search = 0
    var continue = true
    while (continue) {
      val mask = stringMask(s)
      re.findAllMatchIn(s).find(m => m.start >= search && !mask(m.start)) match {
        case None => continue = false
        case Some(m) =>
          var depth = 0
          var k = m.start - 1
          var open = -1
          while (open < 0 && k >= 0) {
            val c = s.charAt(k)
            if (!mask(k)) {
              if (c == ')' || c == ']') depth += 1
              else if (c == '(' || c == '[') {
                if (depth == 0) open = k else depth -= 1
              }
            }
            k -= 1
          }
          val fnName =
            if (open > 0) {
              var e = open - 1
              while (e >= 0 && s.charAt(e).isWhitespace) e -= 1
              var b = e
              while (b >= 0 && (s.charAt(b).isLetterOrDigit || s.charAt(b) == '_')) b -= 1
              s.substring(b + 1, e + 1).toLowerCase
            } else ""
          if (identityLambdaHosts(fnName)) {
            val v = m.group(1)
            val tail = m.group(2)
            val repl = s"$v -> coalesce($v, 0) <> 0$tail"
            s = s.substring(0, m.start) + repl + s.substring(m.end)
            search = m.start + repl.length
          } else search = m.end
      }
    }
    s
  }

  /** mask(i) = i is inside a string literal, a quoted identifier
    * (double-quote or backtick), or a comment (`--` line or slash-star
    * block) — rules must not fire in any of them; comment/backtick
    * apostrophes do not flip string state. */
  private def stringMask(s: String): Array[Boolean] = {
    val mask = new Array[Boolean](s.length)
    var inStr = false
    var inDq = false
    var inBt = false
    var k = 0
    while (k < s.length) {
      val c = s.charAt(k)
      if (!inStr && !inDq && !inBt && c == '-' && k + 1 < s.length && s.charAt(k + 1) == '-') {
        while (k < s.length && s.charAt(k) != '\n') { mask(k) = true; k += 1 }
      } else if (!inStr && !inDq && !inBt && c == '/' && k + 1 < s.length &&
          s.charAt(k + 1) == '*') {
        // block comment: mask through the closing */ (or to end of input)
        val end = s.indexOf("*/", k + 2)
        val stop = if (end < 0) s.length else end + 2
        while (k < stop) { mask(k) = true; k += 1 }
      } else if (!inStr && !inBt && c == '"') { mask(k) = true; inDq = !inDq; k += 1 }
      else if (!inStr && !inDq && c == '`') { mask(k) = true; inBt = !inBt; k += 1 }
      else if (!inDq && !inBt && c == '\'') { mask(k) = true; inStr = !inStr; k += 1 }
      else { mask(k) = inStr || inDq || inBt; k += 1 }
    }
    mask
  }

  /** Index of the delimiter matching `open` at `openIdx` (nesting, strings,
    * and `--` comments respected). */
  private def matchDelim(s: String, openIdx: Int, open: Char, close: Char): Int = {
    var depth = 0
    var inStr = false
    var inDq = false
    var k = openIdx
    while (k < s.length) {
      val c = s.charAt(k)
      if (!inStr && !inDq && c == '-' && k + 1 < s.length && s.charAt(k + 1) == '-') {
        while (k < s.length && s.charAt(k) != '\n') k += 1
      } else if (!inStr && !inDq && c == '/' && k + 1 < s.length && s.charAt(k + 1) == '*') {
        val end = s.indexOf("*/", k + 2)
        k = if (end < 0) s.length - 1 else end + 1
      } else if (!inStr && c == '"') inDq = !inDq
      else if (!inDq && c == '\'') inStr = !inStr
      else if (!inStr && !inDq && (c == open || c == '(' || c == '[')) depth += 1
      else if (!inStr && !inDq && (c == close || c == ')' || c == ']')) {
        depth -= 1
        if (depth == 0) return k
      }
      k += 1
    }
    -1
  }

  /** `<operand> AT TIME ZONE 'z'` → `from_utc_timestamp(<operand>, 'z')`.
    * The operand is the longest preceding primary chain: literal, quoted
    * string, identifier/function-call/paren group, `::type` casts. */
  private def convertAtTimeZone(s0: String): String = {
    var s = s0
    val re = """(?is)\bAT\s+TIME\s+ZONE\s+('[^']*')""".r
    var continue = true
    while (continue) {
      val inString = stringMask(s)
      re.findAllMatchIn(s).find(m => !inString(m.start)) match {
        case None => continue = false
        case Some(m) =>
          val tz = m.group(1)
          // walk left from the keyword over one primary chain:
          //   ident | 'literal' | TIMESTAMP 'literal' | f(…) | (…) | x::type
          var end = m.start
          while (end > 0 && s.charAt(end - 1).isWhitespace) end -= 1
          // one primary unit ending at `pos` (exclusive); returns its start
          def primaryStart(pos: Int): Int = {
            if (pos <= 0) return pos
            val c = s.charAt(pos - 1)
            if (c == ')') {
              var depth = 0; var k = pos - 1; var inStr = false
              while (k >= 0) {
                val ch = s.charAt(k)
                if (ch == '\'') inStr = !inStr
                else if (!inStr && ch == ')') depth += 1
                else if (!inStr && ch == '(') {
                  depth -= 1
                  if (depth == 0) {
                    // include a directly-preceding function name
                    var j = k
                    while (j > 0 && (s.charAt(j - 1).isLetterOrDigit || s.charAt(j - 1) == '_')) j -= 1
                    return j
                  }
                }
                k -= 1
              }
              pos
            } else if (c == '\'') {
              var k = pos - 2
              while (k >= 0 && s.charAt(k) != '\'') k -= 1
              // include a typed-literal keyword (TIMESTAMP '…' / DATE '…')
              var j = k
              while (j > 0 && s.charAt(j - 1).isWhitespace) j -= 1
              var i2 = j
              while (i2 > 0 && (s.charAt(i2 - 1).isLetterOrDigit || s.charAt(i2 - 1) == '_')) i2 -= 1
              val word = s.substring(i2, j).toLowerCase
              if (word == "timestamp" || word == "date") i2 else k
            } else if (c.isLetterOrDigit || c == '_') {
              var k = pos - 1
              while (k >= 0 && (s.charAt(k).isLetterOrDigit || s.charAt(k) == '_' || s.charAt(k) == '.')) k -= 1
              k + 1
            } else pos
          }
          var begin = primaryStart(end)
          // extend left over `::`-cast chains: <primary>::type
          var extending = true
          while (extending && begin > 1 &&
              s.charAt(begin - 1) == ':' && s.charAt(begin - 2) == ':') {
            val b2 = primaryStart(begin - 2)
            if (b2 < begin - 2) begin = b2 else extending = false
          }
          val operand = s.substring(begin, end)
          s = s.substring(0, begin) + s"from_utc_timestamp($operand, $tz)" +
            s.substring(m.end)
      }
    }
    s
  }

  /** Trino `if(cond, value)` → `if(cond, value, NULL)`. */
  private def convertTwoArgIf(s0: String): String = {
    var s = s0
    val re = """(?i)\bIF\s*\(""".r
    var searchFrom = 0
    var continue = true
    while (continue) {
      val inString = stringMask(s)
      re.findAllMatchIn(s).find(m => m.start >= searchFrom && !inString(m.start)) match {
        case None => continue = false
        case Some(m) =>
          val openIdx = m.end - 1
          val close = matchDelim(s, openIdx, '(', ')')
          if (close < 0) continue = false
          else {
            // count top-level commas
            var depth = 0; var inStr = false; var commas = 0
            var k = openIdx
            while (k <= close) {
              val c = s.charAt(k)
              if (c == '\'') inStr = !inStr
              else if (!inStr && (c == '(' || c == '[')) depth += 1
              else if (!inStr && (c == ')' || c == ']')) depth -= 1
              else if (!inStr && c == ',' && depth == 1) commas += 1
              k += 1
            }
            if (commas == 1)
              s = s.substring(0, close) + ", NULL" + s.substring(close)
            searchFrom = m.end
          }
      }
    }
    s
  }
}
