package graft.lang

/** wv → SQL text generation for a TARGET DIALECT — the reference's core
  * codegen surface (`wvlet compile -t <dbtype>`,
  * compiler/codegen/SqlGenerator.scala, 1,842 LoC, with per-dialect branch
  * points on `DBType` and the dialect rewrite phases
  * compiler/transform/TrinoRewritePivot.scala and HiveRewriteFunctions.scala)
  * re-expressed over this engine's AST. This engine executes through
  * DataFrames, so SQL text is not needed to run queries; the generator
  * exists for the migration/interop story: hand a wv pipeline to any system
  * that speaks one of the target dialects.
  *
  * Targets:
  *   - [[Target.Spark]] (default) — Spark SQL; execution-gated by
  *     WvToSqlSpec against the DataFrame lowering on all TPC-H files.
  *   - [[Target.DuckDb]] — DuckDB SQL; execution-gated through the driver's
  *     DuckDB oracle: the q_wv2duckdb_* catalog rows hand the GENERATED
  *     text as their oracle, so a wrong spelling turns the row red.
  *   - [[Target.Trino]] — Trino SQL; text-gated (no Trino in the
  *     container). Follows the reference's Trino branches: approx_distinct,
  *     arbitrary, format_datetime, OFFSET-before-LIMIT, UNNEST WITH
  *     ORDINALITY, and the pivot→conditional-aggregation rewrite
  *     (reference TrinoRewritePivot.scala).
  *   - [[Target.Hive]] — HiveQL; mirrors the reference's Hive rewrite
  *     phases (HiveRewriteFunctions.scala: FILTER clause → CASE argument,
  *     array_agg→collect_list, array_distinct→collect_set,
  *     regexp_like→regexp; HiveRewriteUnnest.scala: LATERAL VIEW explode —
  *     already this generator's unnest spelling). Spark SQL is
  *     HiveQL-derived, so Hive output is additionally execution-gated
  *     through spark.sql in WvToSqlDialectSpec.
  *
  * Mechanics: the pipe chain folds bottom-up into SQL select blocks
  * (from/where/group/select/having/order/limit); an operator that cannot
  * join the current block (a second `select`, a filter after a projection,
  * sort after limit) wraps it as a subquery — the same block algebra the
  * reference generator uses. Models lower as CTEs; scalar/IN/EXISTS
  * subqueries render inline. Dot-methods map to per-dialect SQL functions
  * via the same name table the DataFrame lowering uses ([[Stdlib]]
  * semantics, text form).
  *
  * Deliberately out of scope (throws [[WvToSql.Unsupported]]): streaming
  * subscriptions, flows, DML/DDL, sampling, text-pipeline methods backed
  * by native Catalyst expressions, and parameterized models — surfaces
  * with no faithful single-statement SQL equivalent. Pivot and unpivot ARE
  * supported (Spark: native PIVOT/UNPIVOT clauses; DuckDB/Trino/Hive:
  * rewritten to conditional aggregation / UNION ALL stacks, the same
  * strategy as the reference's TrinoRewritePivot).
  */
object WvToSql {

  final class Unsupported(msg: String) extends Exception(msg)

  /** Target SQL dialect — the reference's `DBType` (compiler/DBType.scala)
    * narrowed to the engines its SqlGenerator actually branches on. */
  sealed abstract class Target(val name: String)
  object Target {
    case object Spark extends Target("spark")
    case object DuckDb extends Target("duckdb")
    case object Trino extends Target("trino")
    case object Hive extends Target("hive")
    val all: List[Target] = List(Spark, DuckDb, Trino, Hive)
    def parse(s: String): Target =
      all.find(_.name == s.trim.toLowerCase).getOrElse(
        throw new Unsupported(s"unknown target dialect '$s' (expected ${all.map(_.name).mkString("|")})"))
  }

  /** Generate one SQL statement (Spark dialect) for the unit's last query
    * statement; parameterless models become CTEs, constant vals inline. */
  def generate(text: String): String = generate(text, Target.Spark)

  def generate(text: String, target: Target): String = {
    val stmts = Parser.parseStatements(text)
    generateStatements(stmts, target)
  }

  def generateStatements(stmts: List[Statement]): String =
    generateStatements(stmts, Target.Spark)

  def generateStatements(stmts: List[Statement], target: Target): String = {
    val models = stmts.collect { case m: ModelDef if m.params.isEmpty => m }
    val consts: Map[String, Expr] = stmts.collect {
      case ValDef(n, e) if e.isInstanceOf[Literal] => n.toLowerCase -> e
    }.toMap
    stmts.collect { case m: ModelDef if m.params.nonEmpty => m } match {
      case m :: _ => throw new Unsupported(s"parameterized model '${m.name}'")
      case Nil => ()
    }
    val query = stmts.reverseIterator.collectFirst { case QueryStatement(r) => r }
      .getOrElse(throw new Unsupported("no query statement"))
    val gen = new Gen(models.map(m => m.name.toLowerCase -> m).toMap, consts, target)
    val body = gen.render(query)
    val used = gen.usedModels.toList
    if (used.isEmpty) body
    else {
      // CTEs in declaration order, only those actually referenced
      // (transitively: a used model's body may reference earlier models)
      val ordered = models.filter(m => gen.usedModels.contains(m.name.toLowerCase))
      val ctes = ordered.map(m => s"${identFor(target, m.name)} AS (\n${gen.render(m.body)}\n)")
      s"WITH ${ctes.mkString(",\n")}\n$body"
    }
  }

  // ------------------------------------------------------------------ names

  private val plainIdent = "[A-Za-z_][A-Za-z0-9_]*".r

  /** Quote a non-plain identifier in the dialect's quoting style: backticks
    * for Spark/Hive, double quotes for DuckDB/Trino (reference SqlGenerator
    * emits double-quoted identifiers for its SQL targets). */
  private def identFor(target: Target, n: String): String =
    if (plainIdent.matches(n)) n
    else target match {
      case Target.Spark | Target.Hive => "`" + n.replace("`", "``") + "`"
      case Target.DuckDb | Target.Trino => "\"" + n.replace("\"", "\"\"") + "\""
    }

  /** Convert a Java/Spark datetime pattern (yyyy-MM-dd HH:mm:ss) to the
    * C-style strftime pattern DuckDB's strftime takes. Unknown pattern
    * letters are rejected rather than silently mis-translated. */
  private[lang] def javaToStrftime(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c.isLetter) {
        var j = i
        while (j < fmt.length && fmt.charAt(j) == c) j += 1
        val run = j - i
        val out = (c, run) match {
          case ('y', 4) => "%Y"
          case ('y', 2) => "%y"
          case ('M', 2) => "%m"
          case ('M', 3) => "%b"
          case ('M', 4) => "%B"
          case ('d', 2) => "%d"
          case ('H', 2) => "%H"
          case ('h', 2) => "%I"
          case ('m', 2) => "%M"
          case ('s', 2) => "%S"
          case ('E', n) if n >= 4 => "%A"
          case ('E', _) => "%a"
          case ('a', _) => "%p"
          // only DDD is zero-padded like %j; shorter runs are unpadded in
          // Java and would silently diverge
          case ('D', 3) => "%j"
          case _ => throw new Unsupported(s"datetime pattern '$c'×$run has no strftime equivalent")
        }
        sb ++= out
        i = j
      } else if (c == '\'') {
        // java pattern quoting: '...' is literal text; '' is a literal
        // quote both outside and INSIDE a quoted run ('o''clock' → o'clock)
        if (i + 1 < fmt.length && fmt.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
        else {
          var j = i + 1
          var closed = false
          val lit = new StringBuilder
          while (j < fmt.length && !closed) {
            if (fmt.charAt(j) == '\'') {
              if (j + 1 < fmt.length && fmt.charAt(j + 1) == '\'') { lit += '\''; j += 2 }
              else { closed = true; j += 1 }
            } else { lit += fmt.charAt(j); j += 1 }
          }
          if (!closed) throw new Unsupported("unterminated quote in datetime pattern")
          sb ++= lit.toString.replace("%", "%%")
          i = j
        }
      } else { if (c == '%') sb ++= "%%" else sb += c; i += 1 }
    }
    sb.toString
  }

  // ------------------------------------------------------------- the worker

  private final class Gen(models: Map[String, ModelDef], consts: Map[String, Expr],
      target: Target) {
    import Target._
    val usedModels = scala.collection.mutable.LinkedHashSet.empty[String]

    private def ident(n: String): String = identFor(target, n)

    /** SQL text type name for CAST targets per dialect. */
    private def strType: String = target match {
      case Spark | Hive => "STRING"
      case DuckDb | Trino => "VARCHAR"
    }

    /** Dialect type text for a wv type name (CAST targets). Parameterized
      * and nested types map recursively so inner scalars get the dialect
      * spelling too (`array(string)` → `VARCHAR[]` on duckdb,
      * `array(varchar)` on trino). */
    private def sqlType(t: String): String = {
      val mapped = Lowering.mapTypeName(t)
      target match {
        case Spark | Hive =>
          // array(t)/map(k,v) wv spelling → angle brackets
          mapped.replace("array(", "array<").replace("map(", "map<") match {
            case s if s.contains("<") => s.replace(")", ">")
            case s => s
          }
        case DuckDb | Trino => mapDialectType(mapped.trim)
      }
    }
    /** Split "a, b" at the top nesting level (for map(k, v) params). */
    private def topSplit(s: String): List[String] = {
      val out = scala.collection.mutable.ListBuffer.empty[String]
      var depth = 0; var start = 0
      s.zipWithIndex.foreach {
        case ('(', _) => depth += 1
        case (')', _) => depth -= 1
        case (',', i) if depth == 0 => out += s.substring(start, i).trim; start = i + 1
        case _ => ()
      }
      out += s.substring(start).trim
      out.toList
    }
    private def mapDialectType(s: String): String = {
      val inner = (p: String) => s.stripPrefix(p).stripSuffix(")")
      s match {
        case a if a.startsWith("array(") && a.endsWith(")") =>
          if (target == DuckDb) mapDialectType(inner("array(")) + "[]"
          else s"array(${mapDialectType(inner("array("))})"
        case m if m.startsWith("map(") && m.endsWith(")") =>
          val kv = topSplit(inner("map("))
          if (kv.length != 2) throw new Unsupported(s"type '$s'")
          s"map(${mapDialectType(kv.head)}, ${mapDialectType(kv(1))})"
        case d if d.startsWith("decimal(") => d
        case "string" | "varchar" => "VARCHAR"
        case "binary" => if (target == DuckDb) "BLOB" else "VARBINARY"
        case "float" | "real" => if (target == Trino) "REAL" else "FLOAT"
        case scalar if !scalar.contains("(") && !scalar.contains("<") => scalar
        case other => throw new Unsupported(s"type '$other' for ${target.name}")
      }
    }

    /** A SQL select block under assembly. Invariant: fields fill in query
      * order; filling one that is already occupied (or out of order) wraps
      * the block into a subquery first. */
    private case class Block(
        from: String,
        where: List[String] = Nil,
        groupBy: List[String] = Nil,
        select: Option[List[String]] = None,
        distinct: Boolean = false,
        having: List[String] = Nil,
        orderBy: List[String] = Nil,
        limit: Option[Long] = None,
        offset: Option[Long] = None
    ) {
      def sql: String = {
        val sb = new StringBuilder
        sb ++= "SELECT "
        if (distinct) sb ++= "DISTINCT "
        sb ++= select.map(_.mkString(", ")).getOrElse("*")
        sb ++= s"\nFROM $from"
        if (where.nonEmpty) sb ++= s"\nWHERE ${where.mkString(" AND ")}"
        if (groupBy.nonEmpty) sb ++= s"\nGROUP BY ${groupBy.mkString(", ")}"
        if (having.nonEmpty) sb ++= s"\nHAVING ${having.mkString(" AND ")}"
        if (orderBy.nonEmpty) sb ++= s"\nORDER BY ${orderBy.mkString(", ")}"
        // Trino's grammar takes OFFSET before LIMIT; Spark/DuckDB/Hive the
        // reverse (reference SqlGenerator orders per dialect the same way)
        if (target == Trino) {
          offset.foreach(n => sb ++= s"\nOFFSET $n")
          limit.foreach(n => sb ++= s"\nLIMIT $n")
        } else {
          limit.foreach(n => sb ++= s"\nLIMIT $n")
          offset.foreach(n => sb ++= s"\nOFFSET $n")
        }
        sb.toString
      }
      def isBareFrom: Boolean =
        where.isEmpty && groupBy.isEmpty && select.isEmpty && !distinct &&
          having.isEmpty && orderBy.isEmpty && limit.isEmpty && offset.isEmpty
    }

    private def wrap(b: Block): Block = Block(from = s"(\n${b.sql}\n)")

    def render(r: Relation): String = build(r).sql

    /** FROM-clause text for a relation (table name, subquery, join tree). */
    private def fromText(r: Relation): String = r match {
      case TableRef(n) =>
        models.get(n.toLowerCase) match {
          case Some(_) => usedModels += n.toLowerCase; ident(n)
          case None => ident(n)
        }
      case ModelRef(n, Nil) =>
        if (models.contains(n.toLowerCase)) { usedModels += n.toLowerCase; ident(n) }
        else throw new Unsupported(s"unknown model '$n'")
      case ModelRef(n, _) => throw new Unsupported(s"parameterized model call '$n'")
      case AliasedRelation(c, a, Nil) => s"${fromText(c)} AS ${ident(a)}"
      case AliasedRelation(c, a, cols) =>
        s"${fromText(c)} AS ${ident(a)}(${cols.map(ident).mkString(", ")})"
      case BracedRelation(c) => s"(\n${render(c)}\n)"
      case j: Join => joinText(j)
      case Values(rows, alias, cols) =>
        val vals = rows.map(row => row.map(ex(_, agg = false)).mkString("(", ", ", ")"))
          .mkString(", ")
        val a = alias.map(ident).getOrElse("v")
        val cs = if (cols.nonEmpty) cols.map(ident).mkString("(", ", ", ")") else ""
        s"(VALUES $vals) AS $a$cs"
      case RawSql(sql) => s"(\n$sql\n)"
      case other =>
        // anything already shaped as a select block nests as a subquery
        s"(\n${render(other)}\n)"
    }

    private def joinText(j: Join): String = {
      if (j.asof) throw new Unsupported(s"asof join has no ${target.name} SQL equivalent")
      if (j.lateral) throw new Unsupported("lateral join")
      val l = fromText(j.left)
      val r = j.right match {
        // a right side that is itself a pipeline nests
        case t: TableRef => fromText(t)
        case a: AliasedRelation => fromText(a)
        case b: BracedRelation => fromText(b)
        case v: Values => fromText(v)
        case jj: Join => s"(${joinText(jj)})"
        case other => s"(\n${render(other)}\n)"
      }
      val kw = j.kind match {
        case JoinKind.Inner => "JOIN"
        case JoinKind.Left => "LEFT JOIN"
        case JoinKind.Right => "RIGHT JOIN"
        case JoinKind.Full => "FULL JOIN"
        case JoinKind.Cross => if (j.on.isEmpty && j.usingColumns.isEmpty) "CROSS JOIN" else "JOIN"
        case JoinKind.Semi => target match {
          case Spark | Hive => "LEFT SEMI JOIN"
          case DuckDb => "SEMI JOIN"
          case Trino => throw new Unsupported("semi join (rendered as EXISTS at block level for trino)")
        }
        case JoinKind.Anti => target match {
          case Spark | Hive => "LEFT ANTI JOIN"
          case DuckDb => "ANTI JOIN"
          case Trino => throw new Unsupported("anti join (rendered as NOT EXISTS at block level for trino)")
        }
      }
      val natural = if (j.natural) "NATURAL " else ""
      val cond =
        if (j.usingColumns.nonEmpty) s" USING (${j.usingColumns.map(ident).mkString(", ")})"
        else j.on.map(c => s" ON ${ex(c, agg = false)}").getOrElse("")
      s"$l $natural$kw $r$cond"
    }

    private def build(r: Relation): Block = r match {
      case t: TableRef => Block(from = fromText(t))
      case m: ModelRef => Block(from = fromText(m))
      case a: AliasedRelation => Block(from = fromText(a))
      case b: BracedRelation =>
        // braces bound a sub-pipeline; its block is complete — later
        // operators must not merge into it unless it is a bare from
        val inner = build(b.child)
        if (inner.isBareFrom) inner else wrap(inner)
      case j: Join if target == Trino && (j.kind == JoinKind.Semi || j.kind == JoinKind.Anti) =>
        // Trino has no SEMI/ANTI join keyword — the reference targets it by
        // keeping such plans as EXISTS in the first place; here the join
        // node rewrites to an EXISTS predicate over the right side
        val on = j.on.getOrElse(throw new Unsupported(
          "trino semi/anti join requires an ON condition"))
        val not = if (j.kind == JoinKind.Anti) "NOT " else ""
        Block(
          from = fromText(j.left),
          where = List(s"${not}EXISTS (SELECT 1 FROM ${fromText(j.right)} WHERE ${ex(on, agg = false)})"))
      case j: Join => Block(from = joinText(j))
      case v: Values => Block(from = fromText(v))
      case RawSql(sql) => Block(from = s"(\n$sql\n)")

      case Filter(child, cond) =>
        val b = build(child)
        if (b.groupBy.nonEmpty && hasAggExpr(cond) && b.orderBy.isEmpty && b.limit.isEmpty)
          // post-group filter on an aggregate (`group by k where x.sum > 300`)
          // → HAVING, whether or not the select list has been emitted yet
          b.copy(having = b.having :+ ex(cond, agg = true))
        else if (b.select.isEmpty && b.groupBy.isEmpty && b.orderBy.isEmpty && b.limit.isEmpty)
          b.copy(where = b.where :+ ex(cond, agg = false))
        else
          // filter over projected/aliased output — wrap and filter outside
          wrap(b).copy(where = List(ex(cond, agg = false)))

      case GroupBy(child, keys) =>
        val b0 = build(child)
        val b = if (b0.groupBy.isEmpty && b0.select.isEmpty && b0.orderBy.isEmpty &&
          b0.limit.isEmpty) b0 else wrap(b0)
        // forward-alias keys (`group by supplier_no` + `select supplier_no = …`)
        // render as written: Spark resolves GROUP BY against select aliases
        b.copy(groupBy = keys.map(k => ex(k.expr, agg = false)))

      case GroupByStyled(child, keys, style) =>
        val b0 = build(child)
        val b = if (b0.groupBy.isEmpty && b0.select.isEmpty) b0 else wrap(b0)
        val ks = keys.map(k => ex(k.expr, agg = false))
        val g = style match {
          case GroupingStyle.Plain => ks
          case GroupingStyle.Rollup => List(s"ROLLUP(${ks.mkString(", ")})")
          case GroupingStyle.Cube => List(s"CUBE(${ks.mkString(", ")})")
          case GroupingStyle.Sets(sets) =>
            List("GROUPING SETS " + sets.map(s =>
              s.map(e => ex(e, agg = false)).mkString("(", ", ", ")")).mkString("(", ", ", ")"))
        }
        b.copy(groupBy = g)

      case Agg(child, items) =>
        val b0 = build(child)
        val b = if (b0.select.isEmpty && b0.orderBy.isEmpty && b0.limit.isEmpty) b0 else wrap(b0)
        // keys project first (the DataFrame lowering's output order), then
        // the aggregation items
        val keyCols = groupKeySelect(child)
        b.copy(select = Some(keyCols ++ items.zipWithIndex.map { case (it, i) =>
          item(it, i, agg = true) }))

      case Project(child, items, distinct) =>
        val b0 = build(child)
        val grouped = b0.groupBy.nonEmpty && b0.select.isEmpty
        val aggMode = grouped || items.exists(it => hasAggExpr(it.expr))
        val b = if (b0.select.isEmpty && b0.orderBy.isEmpty && b0.limit.isEmpty) b0 else wrap(b0)
        b.copy(
          select = Some(items.zipWithIndex.map { case (it, i) => item(it, i, aggMode) }),
          distinct = distinct || b.distinct)

      case Sort(child, items) =>
        val b0 = build(child)
        val b = if (b0.orderBy.isEmpty && b0.limit.isEmpty) b0 else wrap(b0)
        b.copy(orderBy = items.map { s =>
          val d = if (s.descending) " DESC" else ""
          val n = s.nullsFirst match {
            case Some(true) => " NULLS FIRST"
            case Some(false) => " NULLS LAST"
            case None => ""
          }
          // sort keys referencing select aliases stay as written
          ex(s.expr, agg = false) + d + n
        })

      case Limit(child, n) =>
        val b = build(child)
        if (b.limit.isEmpty) b.copy(limit = Some(n)) else wrap(b).copy(limit = Some(n))
      case Offset(child, n) =>
        // fold into the block even when its LIMIT is already set: SQL's
        // `LIMIT x OFFSET y` applies OFFSET first, which IS the semantics
        // of the `limit x offset y` pipe pair (reference SqlGenerator
        // groups the trailing pair into one block, SqlGenerator.scala:431;
        // Lowering.scala's Offset case mirrors it) — wrapping here instead
        // produced take-x-then-skip-y, caught by the differential fuzzer
        val b = build(child)
        if (b.offset.isEmpty) b.copy(offset = Some(n))
        else wrap(b).copy(offset = Some(n))

      case DedupRel(child) => // wv `distinct` / `dedup` pipes
        val b = build(child)
        if (b.select.isEmpty && !b.distinct) b.copy(distinct = true, select = Some(List("*")))
        else wrap(b).copy(distinct = true, select = Some(List("*")))
      case CountRel(child) =>
        wrap(build(child)).copy(select = Some(List("count(*) AS " + ident("count"))))

      case p @ Pivot(child, pivotCol, values, agg) if values.nonEmpty && agg.nonEmpty =>
        target match {
          case Spark =>
            // Spark SQL PIVOT groups by every column not referenced in the
            // agg and not the pivot column — the same rule the DataFrame
            // lowering applies. The agg stays UNALIASED: a single aliased
            // agg would suffix every pivoted column (`a_total`) where the
            // DataFrame path names them by value alone (`a`).
            val aggSql = ex(agg.get.expr, agg = true)
            val vals = values.map(v => ex(v, agg = false)).mkString(", ")
            Block(from =
              s"(\n${render(child)}\n) PIVOT ($aggSql FOR ${ident(pivotCol)} IN ($vals))")
          case _ => pivotAsConditionalAgg(p)
        }
      case _: Pivot =>
        // inferred value lists / count-pivot zero-fill need execution-time
        // schema knowledge a text generator doesn't have
        throw new Unsupported("pivot without explicit `in (...)` values and `using` agg")

      case LateralUnnest(child, e, alias, cols, withOrd) =>
        val outName = cols.headOption.orElse(alias).getOrElse("col")
        target match {
          case Spark | Hive =>
            // `cross join unnest(arr)` → LATERAL VIEW (explode): appends the
            // exploded column(s) after the child's, the same order the
            // DataFrame lowering's select(*, explode(...)) produces; the
            // with-ordinality form emits 1-based ordinals (SQL-standard WITH
            // ORDINALITY; posexplode's pos is 0-based) via a wrapping select
            if (withOrd) {
              val lv = s"LATERAL VIEW posexplode(${ex(e, agg = false)}) __lv AS " +
                s"__graft_pos, ${ident(outName)}"
              // HiveQL has no `* EXCEPT`: with an explicit child select the
              // remaining columns project by name; an implicit schema is
              // only expressible on Spark
              val head = (target, lastSelectNames(child)) match {
                case (Spark, _) => s"* EXCEPT (__graft_pos, ${ident(outName)})"
                case (_, Some(cols)) => cols.map(ident).mkString(", ")
                case _ => throw new Unsupported(
                  "with-ordinality unnest on an implicit-schema child is not expressible in hive")
              }
              Block(from =
                s"(SELECT $head, " +
                  s"__graft_pos + 1 AS ${ident(outName + "_ordinal")}, ${ident(outName)} " +
                  s"FROM (\n${render(child)}\n) $lv)")
            } else {
              val lv = s"LATERAL VIEW explode(${ex(e, agg = false)}) __lv AS ${ident(outName)}"
              Block(from = s"(\n${render(child)}\n) $lv")
            }
          case DuckDb =>
            // DuckDB expands rows for unnest() in the select list; two
            // unnests of equal length zip — the ordinal rides a
            // generate_series of the same length
            val arr = ex(e, agg = false)
            if (withOrd)
              Block(from = s"(SELECT *, " +
                s"unnest(generate_series(1, len($arr))) AS ${ident(outName + "_ordinal")}, " +
                s"unnest($arr) AS ${ident(outName)} FROM (\n${render(child)}\n))")
            else
              Block(from =
                s"(SELECT *, unnest($arr) AS ${ident(outName)} FROM (\n${render(child)}\n))")
          case Trino =>
            // native UNNEST [WITH ORDINALITY]; note Trino appends the
            // ordinal AFTER the value column in the alias list
            val arr = ex(e, agg = false)
            if (withOrd)
              Block(from = s"(\n${render(child)}\n) CROSS JOIN UNNEST($arr) " +
                s"WITH ORDINALITY AS __lv(${ident(outName)}, ${ident(outName + "_ordinal")})")
            else
              Block(from =
                s"(\n${render(child)}\n) CROSS JOIN UNNEST($arr) AS __lv(${ident(outName)})")
        }

      case Unpivot(child, valueCol, varCol, cols) =>
        target match {
          case Spark =>
            // INCLUDE NULLS matches Dataset.unpivot (SQL UNPIVOT drops null
            // measure rows by default; the DataFrame path keeps them)
            Block(from =
              s"(\n${render(child)}\n) UNPIVOT INCLUDE NULLS " +
                s"(${ident(valueCol)} FOR ${ident(varCol)} IN (${cols.map(ident).mkString(", ")}))")
          case _ =>
            // UNION ALL stack, one leg per measure: keeps NULL measures
            // (an engine's UNPIVOT clause drops them), matching the
            // DataFrame melt the Spark path produces. Id columns come from
            // the child's explicit select when statically known; DuckDB
            // additionally has `* EXCLUDE` for implicit-schema children.
            val legBody = lastSelectNames(child) match {
              case Some(all) =>
                val ids = all.filterNot(c => cols.exists(_.equalsIgnoreCase(c)))
                Some((c: String) => (ids.map(ident) :+
                  s"'${c}' AS ${ident(varCol)}" :+
                  s"${ident(c)} AS ${ident(valueCol)}").mkString(", "))
              case None if target == DuckDb =>
                Some((c: String) => s"* EXCLUDE (${cols.map(ident).mkString(", ")}), " +
                  s"'${c}' AS ${ident(varCol)}, ${ident(c)} AS ${ident(valueCol)}")
              case None => None
            }
            legBody match {
              case Some(body) =>
                val legs = cols.map(c => s"SELECT ${body(c)} FROM (\n${render(child)}\n)")
                Block(from = s"(\n${legs.mkString("\nUNION ALL\n")}\n)")
              case None =>
                throw new Unsupported(
                  s"unpivot on an implicit-schema child is not expressible in ${target.name}")
            }
        }

      case SetOp(kind, left, right, distinct) =>
        val op = kind match {
          case SetOpKind.Concat => "UNION ALL"
          case SetOpKind.Union => "UNION"
          case SetOpKind.Intersect => if (distinct) "INTERSECT" else "INTERSECT ALL"
          case SetOpKind.Except => if (distinct) "EXCEPT" else "EXCEPT ALL"
        }
        Block(from = s"(\n${render(left)}\n$op\n${render(right)}\n)")

      case AddColumns(child, items, prepend) =>
        // `add` appends computed columns after *, `prepend` before — the
        // same positions the DataFrame lowering produces. The block wraps
        // whenever a select list exists, so later WHERE clauses correctly
        // cannot see the aliases until the subquery boundary (and wv
        // filters over added columns land outside it).
        val b0 = build(child)
        val b = if (b0.select.isEmpty && b0.groupBy.isEmpty && b0.orderBy.isEmpty &&
          b0.limit.isEmpty) b0 else wrap(b0)
        val cols = items.zipWithIndex.map { case (it, i) => item(it, i, agg = false) }
        b.copy(select = Some(if (prepend) cols :+ "*" else "*" :: cols))

      case ExcludeColumns(child, columns) =>
        val b0 = build(child)
        val b = if (b0.select.isEmpty && b0.groupBy.isEmpty && b0.orderBy.isEmpty &&
          b0.limit.isEmpty) b0 else wrap(b0)
        target match {
          case Spark =>
            // Spark SQL's `* EXCEPT (...)` preserves the remaining column order
            b.copy(select = Some(List(s"* EXCEPT (${columns.map(ident).mkString(", ")})")))
          case DuckDb =>
            b.copy(select = Some(List(s"* EXCLUDE (${columns.map(ident).mkString(", ")})")))
          case Trino | Hive =>
            // no `* EXCEPT`: with an explicit child select the remaining
            // columns project by name; implicit schemas are inexpressible
            lastSelectNames(child) match {
              case Some(all) =>
                val keep = all.filterNot(c => columns.exists(_.equalsIgnoreCase(c)))
                b.copy(select = Some(keep.map(ident)))
              case None => throw new Unsupported(
                s"`exclude` on an implicit-schema child is not expressible in ${target.name}")
            }
        }

      case SubscribeRel(child, _) => build(child) // batch view of a subscription
      case other =>
        throw new Unsupported(s"relation ${other.getClass.getSimpleName}")
    }

    /** Pivot → conditional aggregation, the reference's strategy for
      * engines without a PIVOT clause (TrinoRewritePivot.scala): group by
      * the child's remaining columns, one `agg(CASE WHEN pivot = v THEN x
      * END) AS v` per value. The reference runs this on the RESOLVED plan
      * (it knows the schema); a text generator only knows the columns when
      * the child ends in an explicit select — otherwise DuckDB falls back
      * to `* EXCLUDE` + `GROUP BY ALL`, and Trino (which has neither)
      * rejects. */
    private def pivotAsConditionalAgg(p: Pivot): Block = {
      val Pivot(child, pivotCol, values, agg) = p
      val aggItem = agg.get
      val aggRefs = identNames(aggItem.expr) - pivotCol.toLowerCase
      val childCols: Option[List[String]] = lastSelectNames(child)
      // count-family aggregates need a presence guard: a real PIVOT yields
      // NULL for a (group, value) cell with no rows, where the conditional
      // rewrite's count(...) would yield 0 — guard on any-matching-row
      val countFamily = Set("count", "count_if", "count_distinct",
        "count_approx_distinct", "approx_count_distinct")
      val isCount = topAggName(aggItem.expr).exists(countFamily)
      val pivotAggs = values.map { v =>
        val cond = BinaryOp("=", Ident(pivotCol), v)
        val injected = injectAggFilter(aggItem.expr, cond)
        val name = v match {
          case StringLit(s) => s
          case LongLit(n) => n.toString
          case BoolLit(b) => b.toString
          case other => ex(other, agg = false)
        }
        val body = ex(injected, agg = true)
        val guarded =
          if (isCount)
            s"(CASE WHEN count(CASE WHEN ${ex(cond, agg = false)} THEN 1 END) > 0 " +
              s"THEN $body ELSE NULL END)"
          else body
        s"$guarded AS ${ident(name)}"
      }
      childCols match {
        case Some(cols) =>
          val groupCols = cols.filterNot(c =>
            c.toLowerCase == pivotCol.toLowerCase || aggRefs.contains(c.toLowerCase))
          Block(
            from = s"(\n${render(child)}\n)",
            groupBy = groupCols.map(ident),
            select = Some(groupCols.map(ident) ++ pivotAggs))
        case None if target == DuckDb =>
          val excl = (pivotCol :: aggRefs.toList.sorted).map(ident).mkString(", ")
          Block(
            from = s"(\n${render(child)}\n)",
            groupBy = List("ALL"),
            select = Some(s"* EXCLUDE ($excl)" :: pivotAggs))
        case None =>
          throw new Unsupported(
            s"pivot on an implicit-schema child is not expressible in ${target.name}")
      }
    }

    /** Column names of the child's final explicit select, when statically
      * known (simple idents or aliased items). */
    private def lastSelectNames(r: Relation): Option[List[String]] = r match {
      case Project(_, items, _) =>
        val names = items.map {
          case SelectItem(_, Some(a)) => Some(a)
          case SelectItem(Ident(n), None) => Some(n)
          case _ => None
        }
        if (names.forall(_.isDefined)) Some(names.map(_.get)) else None
      case Filter(c, _) => lastSelectNames(c)
      case Sort(c, _) => lastSelectNames(c)
      case Limit(c, _) => lastSelectNames(c)
      case Offset(c, _) => lastSelectNames(c)
      case BracedRelation(c) => lastSelectNames(c)
      case _ => None
    }

    /** Name of the outermost aggregate applied in the expression (for the
      * pivot rewrite's count-vs-null presence guard). */
    private def topAggName(e: Expr): Option[String] = e match {
      case DotRef(t, n) =>
        if (Stdlib.isAggMethod(n)) Some(n.toLowerCase) else topAggName(t)
      case MethodCall(t, n, _) =>
        if (Stdlib.isAggMethod(n)) Some(n.toLowerCase) else topAggName(t)
      case FunctionCall(n, args, _, _) =>
        if (Stdlib.aggFunctionNames.contains(n.toLowerCase)) Some(n.toLowerCase)
        else args.flatMap(topAggName).headOption
      case BinaryOp(_, l, r) => topAggName(l).orElse(topAggName(r))
      case UnaryOp(_, v) => topAggName(v)
      case Cast(v, _, _) => topAggName(v)
      case IfExpr(c, t, el) =>
        topAggName(c).orElse(topAggName(t)).orElse(el.flatMap(topAggName))
      case _ => None
    }

    /** Lower-cased COLUMN names referenced in an expression. A qualified
      * reference `t.col` contributes `col`, never the qualifier `t` — the
      * qualifier is a relation alias, not a column (a struct-field access
      * `s.f` also contributes the field name; the struct column then stays
      * a grouping key in the pivot rewrite, an accepted limitation of
      * schema-free text generation). */
    private def identNames(e: Expr): Set[String] = {
      val out = scala.collection.mutable.Set.empty[String]
      def walk(x: Expr): Unit = x match {
        case Ident(n) => out += n.toLowerCase
        case DotRef(t, n) if Stdlib.isAggMethod(n) || Stdlib.scalarMethods.contains(n.toLowerCase) => walk(t)
        case DotRef(Ident(_), n) => out += n.toLowerCase
        case DotRef(t, _) => walk(t)
        case MethodCall(t, _, args) => walk(t); args.foreach(walk)
        case FunctionCall(_, args, _, f) => args.foreach(walk); f.foreach(walk)
        case BinaryOp(_, l, r) => walk(l); walk(r)
        case UnaryOp(_, v) => walk(v)
        case Not(v) => walk(v)
        case Cast(v, _, _) => walk(v)
        case IfExpr(c, t, e2) => walk(c); walk(t); e2.foreach(walk)
        case Between(v, lo, hi, _) => walk(v); walk(lo); walk(hi)
        case InList(v, items, _) => walk(v); items.foreach(walk)
        case CaseWhen(op, bs, ot) =>
          op.foreach(walk); bs.foreach { case (c, v) => walk(c); walk(v) }; ot.foreach(walk)
        case _ => ()
      }
      walk(e)
      out.toSet
    }

    /** Rewrite the single aggregate application inside `e` so its argument
      * is CASE WHEN cond THEN arg END — the FILTER-to-CASE transform the
      * reference applies for Hive (HiveRewriteFunctions.scala) and for the
      * pivot rewrite (TrinoRewritePivot.scala). `_.count` becomes
      * count(CASE WHEN cond THEN 1 END). */
    private def injectAggFilter(e: Expr, cond: Expr): Expr = e match {
      case DotRef(t, n) if Stdlib.isAggMethod(n) =>
        DotRef(caseArg(t, cond), n)
      case MethodCall(t, n, args) if Stdlib.isAggMethod(n) =>
        MethodCall(caseArg(t, cond), n, args)
      case MethodCall(t, n, args) =>
        MethodCall(injectAggFilter(t, cond), n, args.map(injectAggFilter(_, cond)))
      case DotRef(t, n) => DotRef(injectAggFilter(t, cond), n)
      case FunctionCall(n, args, d, f) if Stdlib.aggFunctionNames.contains(n.toLowerCase) =>
        val newArgs =
          if (args.isEmpty || args.forall(_.isInstanceOf[Star])) List(caseArg(Underscore, cond))
          else args.map(a => caseArg(a, cond))
        FunctionCall(n, newArgs, d, f)
      case FunctionCall(n, args, d, f) =>
        FunctionCall(n, args.map(injectAggFilter(_, cond)), d, f)
      case BinaryOp(op, l, r) => BinaryOp(op, injectAggFilter(l, cond), injectAggFilter(r, cond))
      case Cast(v, t, isTry) => Cast(injectAggFilter(v, cond), t, isTry)
      case other => other
    }
    private def caseArg(t: Expr, cond: Expr): Expr = t match {
      case Underscore => IfExpr(cond, LongLit(1), None)
      case other => IfExpr(cond, other, None)
    }

    /** Select-list text for the group keys of the relation under an `agg`. */
    private def groupKeySelect(r: Relation): List[String] = r match {
      case GroupBy(_, keys) => keys.zipWithIndex.map { case (k, i) => item(k, i, agg = false) }
      case GroupByStyled(_, keys, _) =>
        keys.zipWithIndex.map { case (k, i) => item(k, i, agg = false) }
      case Filter(c, _) => groupKeySelect(c)
      case _ => Nil
    }

    private def item(it: SelectItem, idx: Int, agg: Boolean): String = {
      val sql = ex(it.expr, agg)
      it.alias match {
        case Some(a) => s"$sql AS ${ident(a)}"
        case None => it.expr match {
          case Ident(_) | DotRef(Ident(_), _) if !agg => sql
          case Star(_) => sql
          case _ if plainIdent.matches(sql) => sql
          case _ => s"$sql AS ${ident(autoName(it.expr, idx))}"
        }
      }
    }

    private def autoName(e: Expr, idx: Int): String = e match {
      case Ident(n) => n
      case DotRef(Ident(_), n) if !Stdlib.isAggMethod(n) && !Stdlib.scalarMethods.contains(n) => n
      case DotRef(Ident(c), n) if Stdlib.isAggMethod(n) => s"${n}_$c"
      case MethodCall(Ident(c), n, Nil) if Stdlib.isAggMethod(n) => s"${n}_$c"
      case Cast(inner, _, _) => autoName(inner, idx)
      case _ => s"_c$idx"
    }

    private def hasAggExpr(e: Expr): Boolean = e match {
      case DotRef(t, n) => Stdlib.isAggMethod(n) || hasAggExpr(t)
      case MethodCall(t, n, args) =>
        Stdlib.isAggMethod(n) || hasAggExpr(t) || args.exists(hasAggExpr)
      case FunctionCall(n, args, _, _) =>
        Stdlib.aggFunctionNames.contains(n.toLowerCase) || args.exists(hasAggExpr)
      case BinaryOp(_, l, r) => hasAggExpr(l) || hasAggExpr(r)
      case UnaryOp(_, v) => hasAggExpr(v)
      case Not(v) => hasAggExpr(v)
      case Cast(v, _, _) => hasAggExpr(v)
      case IfExpr(c, t, e2) => hasAggExpr(c) || hasAggExpr(t) || e2.exists(hasAggExpr)
      case Between(v, lo, hi, _) => hasAggExpr(v) || hasAggExpr(lo) || hasAggExpr(hi)
      case InList(v, items, _) => hasAggExpr(v) || items.exists(hasAggExpr)
      case _ => false
    }

    private def isStringy(e: Expr): Boolean = e match {
      case StringLit(_) => true
      case BinaryOp("+", l, r) => isStringy(l) || isStringy(r)
      case Cast(_, t, _) => Lowering.mapTypeName(t).toLowerCase.startsWith("string")
      case MethodCall(_, n, _) =>
        Set("to_string", "upper", "lower", "trim", "substring", "substr", "replace",
          "date_format", "strftime", "lpad", "rpad", "array_join")(n.toLowerCase)
      case _ => false
    }

    // ------------------------------------------------------- expressions

    private def castStr(x: String): String = s"CAST($x AS $strType)"

    /** Per-dialect rename of a function name when the argument list shape
      * is unchanged (shared by dot-method and plain call positions, and by
      * the DISTINCT path). */
    private def aggFnName(n0: String): String = n0.toLowerCase match {
      case "collect_list" | "array_agg" | "to_array" =>
        if (target == DuckDb || target == Trino) "array_agg" else "collect_list"
      case "any_value" | "arbitrary" | "any" =>
        if (target == Trino) "arbitrary" else "any_value"
      case "approx_count_distinct" | "count_approx_distinct" =>
        if (target == Trino) "approx_distinct" else "approx_count_distinct"
      case "mean" => "avg"
      case "regexp_like" => target match { // reference HiveRewriteFunctions.scala
        case Hive => "regexp"
        case DuckDb => "regexp_matches"
        case _ => "regexp_like"
      }
      case other => other
    }

    /** Per-dialect spelling of a function call given rendered args —
      * restructures the call when a dialect needs a different shape. */
    private def aggFnCall(n0: String, as: List[String]): String = n0.toLowerCase match {
      case "collect_set" | "array_distinct_agg" =>
        if (target == DuckDb || target == Trino) s"array_agg(DISTINCT ${as.mkString(", ")})"
        else s"collect_set(${as.mkString(", ")})"
      case "percentile" => target match {
        case DuckDb => s"quantile_cont(${as.mkString(", ")})"
        case Trino => throw new Unsupported("exact percentile has no trino spelling")
        case _ => s"percentile(${as.mkString(", ")})"
      }
      case "percentile_approx" | "approx_quantile" => target match {
        case DuckDb => s"approx_quantile(${as.take(2).mkString(", ")})"
        case Trino => s"approx_percentile(${as.take(2).mkString(", ")})"
        case _ => s"percentile_approx(${as.mkString(", ")})"
      }
      case "count_if" if target == Hive =>
        // coalesce preserves count_if's zero-on-empty contract: a global
        // aggregate over zero rows sums to NULL, but count_if returns 0.
        // In window position the wrapper must be skipped — OVER binds to
        // the call and coalesce(...) OVER is invalid HiveQL (and window
        // partitions are never empty, so the contract holds without it).
        val sum = s"sum(CASE WHEN ${as.head} THEN 1 ELSE 0 END)"
        if (inWindow) sum else s"coalesce($sum, 0)"
      case "string_agg" | "listagg" =>
        stringAggSql(as.head, as.drop(1).headOption.getOrElse("','"))
      // Hive lacks bool_or/bool_and; the CASE keeps the all-NULL → NULL
      // behavior (sum over an all-NULL column is NULL)
      case "bool_or" | "exists_agg" if target == Hive =>
        s"(sum(CASE WHEN ${as.head} THEN 1 WHEN NOT ${as.head} THEN 0 END) > 0)"
      case "bool_and" if target == Hive =>
        s"(min(CASE WHEN ${as.head} THEN 1 WHEN NOT ${as.head} THEN 0 END) = 1)"
      case "exists_agg" => s"bool_or(${as.mkString(", ")})"
      case other => s"${aggFnName(other)}(${as.mkString(", ")})"
    }

    private def stringAggSql(inner: String, sep: String): String = target match {
      case Spark | Hive => s"array_join(sort_array(collect_list(CAST($inner AS STRING))), $sep)"
      case DuckDb => s"array_to_string(list_sort(array_agg(CAST($inner AS VARCHAR))), $sep)"
      case Trino => s"array_join(array_sort(array_agg(CAST($inner AS VARCHAR))), $sep)"
    }

    /** DISTINCT-call spelling, routed through the same per-dialect shape
      * table as aggFnCall — blindly emitting aggFnName(n)(DISTINCT ...)
      * leaked Spark spellings (collect_set, percentile) into duckdb/trino/
      * hive text when the plain path would have restructured them. */
    private def aggFnCallDistinct(n0: String, as: List[String]): String = {
      def plain = s"${aggFnName(n0)}(DISTINCT ${as.mkString(", ")})"
      n0.toLowerCase match {
        // already set-valued: DISTINCT is idempotent, reuse the plain
        // rewrite (which spells DISTINCT itself where needed)
        case "collect_set" | "array_distinct_agg" => aggFnCall(n0, as)
        // boolean aggregates: DISTINCT cannot change an or/and over
        // booleans — drop it and take the plain (Hive-safe) rewrite
        case "bool_or" | "bool_and" | "exists_agg" => aggFnCall(n0, as)
        case "string_agg" | "listagg" =>
          val sep = as.drop(1).headOption.getOrElse("','")
          target match {
            case Spark | Hive =>
              s"array_join(sort_array(collect_set(CAST(${as.head} AS STRING))), $sep)"
            case DuckDb =>
              s"array_to_string(list_sort(array_agg(DISTINCT CAST(${as.head} AS VARCHAR))), $sep)"
            case Trino =>
              s"array_join(array_sort(array_agg(DISTINCT CAST(${as.head} AS VARCHAR))), $sep)"
          }
        // shape-rewritten on these targets with no DISTINCT-preserving
        // form — refuse rather than emit a non-existent spelling
        case "percentile" if target == DuckDb || target == Trino =>
          throw new Unsupported(s"DISTINCT percentile has no ${target.toString.toLowerCase} spelling")
        case "percentile_approx" | "approx_quantile" if target == DuckDb || target == Trino =>
          throw new Unsupported(s"DISTINCT $n0 has no ${target.toString.toLowerCase} spelling")
        case "count_if" if target == Hive =>
          throw new Unsupported("DISTINCT count_if has no hive spelling")
        case _ => plain
      }
    }

    /** True while rendering the function of a WindowApply: dialect rewrites
      * that wrap the whole aggregate (e.g. Hive count_if's coalesce) must
      * stay un-wrapped there — OVER attaches to the call, and
      * `coalesce(sum(...), 0) OVER (...)` is invalid HiveQL. A window
      * partition is never empty, so the zero-on-empty wrapper is also
      * semantically unnecessary in window position. */
    private var inWindow = false

    def ex(e: Expr, agg: Boolean): String = e match {
      case Ident(n) =>
        consts.get(n.toLowerCase) match {
          case Some(lit) => ex(lit, agg)
          case None => ident(n)
        }
      case Underscore => "1" // only meaningful under an agg method
      case NullLit() => "NULL"
      case BoolLit(b) => if (b) "TRUE" else "FALSE"
      case LongLit(v) => v.toString
      case DoubleLit(v) => s"CAST($v AS DOUBLE)" // plain 1.5 parses as DECIMAL in Spark/DuckDB/Trino
      case DecimalLit(v) => v.toString
      case StringLit(s) => target match {
        case Spark | Hive => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
        // standard SQL string literals: quote doubling, backslash literal
        case DuckDb | Trino => "'" + s.replace("'", "''") + "'"
      }
      case Star(None) => "*"
      case Star(Some(q)) => s"${ident(q)}.*"
      case ArrayLit(items) => target match {
        case Spark | Hive => items.map(ex(_, agg)).mkString("array(", ", ", ")")
        case DuckDb => items.map(ex(_, agg)).mkString("[", ", ", "]")
        case Trino => items.map(ex(_, agg)).mkString("ARRAY[", ", ", "]")
      }
      case TupleLit(items) => items.map(ex(_, agg)).mkString("(", ", ", ")")
      case StructLit(fields) => target match {
        case Spark | Hive =>
          fields.map { case (n, v) => s"'${n}', ${ex(v, agg)}" }
            .mkString("named_struct(", ", ", ")")
        case DuckDb =>
          fields.map { case (n, v) => s"${ident(n)} := ${ex(v, agg)}" }
            .mkString("struct_pack(", ", ", ")")
        case Trino =>
          // anonymous ROW(...) loses field names; a named row needs a typed
          // CAST the text generator cannot infer
          throw new Unsupported("struct literal needs a typed ROW cast in trino")
      }
      case MapLit(entries) => target match {
        case Spark | Hive =>
          entries.map { case (k, v) => s"${ex(k, agg)}, ${ex(v, agg)}" }
            .mkString("map(", ", ", ")")
        case DuckDb =>
          val ks = entries.map(e2 => ex(e2._1, agg)).mkString("[", ", ", "]")
          val vs = entries.map(e2 => ex(e2._2, agg)).mkString("[", ", ", "]")
          s"map($ks, $vs)"
        case Trino =>
          val ks = entries.map(e2 => ex(e2._1, agg)).mkString("ARRAY[", ", ", "]")
          val vs = entries.map(e2 => ex(e2._2, agg)).mkString("ARRAY[", ", ", "]")
          s"MAP($ks, $vs)"
      }
      case Subscript(t, StringLit(s)) =>
        val key = target match {
          case Spark | Hive => s.replace("'", "\\'")
          case DuckDb | Trino => s.replace("'", "''")
        }
        s"${ex(t, agg)}['$key']"
      case Subscript(t, i) => target match {
        case Spark | Trino => s"element_at(${ex(t, agg)}, ${ex(i, agg)})"
        case DuckDb => s"list_extract(${ex(t, agg)}, ${ex(i, agg)})"
        case Hive => i match {
          // HiveQL has no element_at: arrays index 0-based via brackets
          // (valid Spark SQL too, so the execution gate covers it);
          // element_at's negative-from-the-end form has no bracket
          // equivalent
          case LongLit(v) if v >= 1 => s"${ex(t, agg)}[${v - 1}]"
          case LongLit(_) => throw new Unsupported("negative array index for hive")
          case _ => s"${ex(t, agg)}[(${ex(i, agg)}) - 1]"
        }
      }

      case DotRef(target2, name) => method(target2, name, Nil, agg)
      case MethodCall(target2, name, args) => method(target2, name, args, agg)

      case FunctionCall("__interval", List(StringLit(s)), _, _) =>
        // parser-internal interval marker → dialect INTERVAL literal
        target match {
          case Spark | DuckDb => s"INTERVAL '$s'"
          case Trino | Hive =>
            // quantity-string + singular unit keyword form
            val cut = s.lastIndexOf(' ')
            if (cut < 0) throw new Unsupported(s"interval '$s' has no unit")
            val unit = s.drop(cut + 1).toUpperCase.stripSuffix("S")
            s"INTERVAL '${s.take(cut)}' $unit"
        }

      case FunctionCall(n, args, isDistinct, filter) =>
        val d = if (isDistinct) "DISTINCT " else ""
        val argSql = args.map(ex(_, agg))
        // plain function-call position goes through the SAME per-dialect
        // aggregate-name table as the dot-method form — otherwise
        // approx_count_distinct / percentile / collect_set etc. would leak
        // their Spark spellings into duckdb/trino/hive text
        def call(as: List[String]): String =
          if (isDistinct) aggFnCallDistinct(n, as)
          else aggFnCall(n, as)
        filter match {
          case Some(f) if target == Hive =>
            // Hive has no FILTER clause → CASE argument
            // (reference HiveRewriteFunctions.scala)
            val newArgs =
              if (args.isEmpty || args.forall(_.isInstanceOf[Star]))
                List(s"CASE WHEN ${ex(f, agg = false)} THEN 1 END")
              else argSql.map(a => s"CASE WHEN ${ex(f, agg = false)} THEN $a END")
            call(newArgs)
          case Some(f) =>
            s"${call(argSql)} FILTER (WHERE ${ex(f, agg = false)})"
          case None => call(argSql)
        }

      case WindowApply(fn, spec) =>
        val partition =
          if (spec.partitionBy.isEmpty) ""
          else s"PARTITION BY ${spec.partitionBy.map(ex(_, agg = false)).mkString(", ")}"
        val order =
          if (spec.orderBy.isEmpty) ""
          else s"ORDER BY ${spec.orderBy.map { s =>
            ex(s.expr, agg = false) + (if (s.descending) " DESC" else "")
          }.mkString(", ")}"
        val frame = spec.frame.map { f =>
          def bound(b: Option[Long], isStart: Boolean): String = b match {
            case None => if (isStart) "UNBOUNDED PRECEDING" else "UNBOUNDED FOLLOWING"
            case Some(0) => "CURRENT ROW"
            case Some(v) if v < 0 => s"${-v} PRECEDING"
            case Some(v) => s"$v FOLLOWING"
          }
          val kind = if (f.isRows) "ROWS" else "RANGE"
          s"$kind BETWEEN ${bound(f.start, isStart = true)} AND ${bound(f.end, isStart = false)}"
        }.getOrElse("")
        val inner = {
          val prev = inWindow
          inWindow = true
          try ex(fn, agg = true) finally inWindow = prev
        }
        val over = s"$inner OVER (${List(partition, order, frame).filter(_.nonEmpty).mkString(" ")})"
        // Hive count_if zero-on-empty: coalesce can't wrap the CALL (OVER
        // binds to it), but an explicit frame (e.g. rows[,-1]) CAN be empty
        // — there Spark's native count_if returns 0 while sum(CASE...) OVER
        // returns NULL. Wrap the WHOLE windowed expression instead:
        // coalesce(sum(CASE...) OVER (...), 0) is valid HiveQL.
        def isCountIf(e: Expr): Boolean = e match {
          case FunctionCall(n, _, false, _) => n.equalsIgnoreCase("count_if")
          case MethodCall(_, n, _) => n.equalsIgnoreCase("count_if")
          case _ => false
        }
        if (target == Hive && isCountIf(fn)) s"coalesce($over, 0)" else over

      case BinaryOp("+", l, r) if isStringy(l) || isStringy(r) =>
        s"concat(${castStr(ex(l, agg))}, ${castStr(ex(r, agg))})"
      case BinaryOp("//", l, r) =>
        s"CAST(floor((${ex(l, agg)}) / (${ex(r, agg)})) AS BIGINT)"
      case BinaryOp("||", l, r) =>
        s"concat(${castStr(ex(l, agg))}, ${castStr(ex(r, agg))})"
      case BinaryOp(op, l, r) =>
        val o = op.toLowerCase match {
          case "and" => "AND"
          case "or" => "OR"
          case "!=" => if (target == Trino) "<>" else "!="
          case other => other
        }
        s"(${ex(l, agg)} $o ${ex(r, agg)})"
      case UnaryOp("-", v) => s"(- ${ex(v, agg)})"
      case UnaryOp(op, _) => throw new Unsupported(s"unary op $op")
      case Not(v) => s"(NOT ${ex(v, agg)})"
      case IsNull(v, negated) =>
        s"(${ex(v, agg)} IS ${if (negated) "NOT " else ""}NULL)"
      case Between(v, lo, hi, negated) =>
        s"(${ex(v, agg)} ${if (negated) "NOT " else ""}BETWEEN ${ex(lo, agg)} AND ${ex(hi, agg)})"
      case InList(v, items, negated) =>
        s"(${ex(v, agg)} ${if (negated) "NOT " else ""}IN (${items.map(ex(_, agg)).mkString(", ")}))"
      case InSubquery(v, q, negated) =>
        s"(${ex(v, agg)} ${if (negated) "NOT " else ""}IN (\n${render(q)}\n))"
      case ExistsExpr(q) => s"EXISTS (\n${render(q)}\n)"
      case ScalarSubquery(q) => s"(\n${render(q)}\n)"
      case LikeOp(v, p, negated) =>
        s"(${ex(v, agg)} ${if (negated) "NOT " else ""}LIKE ${ex(p, agg)})"
      case RLikeOp(v, p, negated) =>
        val r = target match {
          case Spark | Hive => s"(${ex(v, agg)} RLIKE ${ex(p, agg)})"
          case DuckDb => s"regexp_matches(${ex(v, agg)}, ${ex(p, agg)})"
          case Trino => s"regexp_like(${ex(v, agg)}, ${ex(p, agg)})"
        }
        if (negated) s"(NOT $r)" else r
      case Cast(v, t, isTry) =>
        // Hive has no TRY_CAST; its CAST already yields NULL on failure
        val kw = if (isTry && target != Hive) "TRY_CAST" else "CAST"
        s"$kw(${ex(v, agg)} AS ${sqlType(t)})"
      case CaseWhen(operand, branches, otherwise) =>
        val op = operand.map(o => " " + ex(o, agg)).getOrElse("")
        val whens = branches.map { case (c, v) =>
          s"WHEN ${ex(c, agg)} THEN ${ex(v, agg)}"
        }.mkString(" ")
        val el = otherwise.map(v => s" ELSE ${ex(v, agg)}").getOrElse("")
        s"CASE$op $whens$el END"
      case IfExpr(c, t, e2) =>
        s"(CASE WHEN ${ex(c, agg)} THEN ${ex(t, agg)}${e2.map(v => s" ELSE ${ex(v, agg)}").getOrElse("")} END)"
      case Extract(field, from) => s"extract(${field.toUpperCase} FROM ${ex(from, agg)})"
      case AtTimeZone(v, tz) => target match {
        case Spark | Hive =>
          s"from_utc_timestamp(to_utc_timestamp(${ex(v, agg)}, current_timezone()), ${ex(tz, agg)})"
        case DuckDb => s"timezone(${ex(tz, agg)}, ${ex(v, agg)})"
        case Trino => s"(${ex(v, agg)} AT TIME ZONE ${ex(tz, agg)})"
      }
      case RawSqlExpr(sql) => sql
      case other => throw new Unsupported(s"expression ${other.getClass.getSimpleName}")
    }

    /** Dot-method → SQL. In agg position, agg methods render as aggregate
      * calls (`x.sum` → sum(x), `_.count` → count(*)); scalar methods map
      * through the per-dialect Stdlib-equivalent SQL spellings. A name that
      * is neither renders as a qualified column reference (DotRef) or a
      * plain function call (MethodCall). */
    private def method(tgt: Expr, name: String, args: List[Expr], agg: Boolean): String = {
      val n = name.toLowerCase
      def t = ex(tgt, agg)
      def a(i: Int) = ex(args(i), agg)
      def all = (tgt :: args).map(ex(_, agg)).mkString(", ")
      if (agg && Stdlib.isAggMethod(n)) {
        val inner = tgt match {
          case Underscore => if (n == "count") "*" else "1"
          case other => ex(other, agg = false)
        }
        n match {
          case "count_distinct" => s"count(DISTINCT $inner)"
          case "string_agg" =>
            stringAggSql(inner, if (args.nonEmpty) ex(args.head, agg = false) else "','")
          case "min_by" | "max_by" => s"$n($inner, ${ex(args.head, agg = false)})"
          case "approx_quantile" =>
            aggFnCall("approx_quantile", List(inner, ex(args.head, agg = false), "10000"))
          case "percentile" => aggFnCall("percentile", List(inner, ex(args.head, agg = false)))
          case "count_if" =>
            val p = if (args.nonEmpty) ex(args.head, agg = false) else inner
            aggFnCall("count_if", List(p))
          case _ => aggFnCall(n, List(inner))
        }
      } else if (n == "in" && args.nonEmpty) {
        s"($t IN (${args.map(ex(_, agg)).mkString(", ")}))"
      } else if (n == "not_in" && args.nonEmpty) {
        s"($t NOT IN (${args.map(ex(_, agg)).mkString(", ")}))"
      } else if (n == "between" && args.length == 2) {
        s"($t BETWEEN ${a(0)} AND ${a(1)})"
      } else if (Stdlib.scalarMethods.contains(n)) {
        n match {
          case "to_string" => castStr(t)
          case "to_int" => s"CAST($t AS INT)"
          case "to_long" => s"CAST($t AS BIGINT)"
          case "to_float" => target match {
            case Trino => s"CAST($t AS REAL)"
            case _ => s"CAST($t AS FLOAT)"
          }
          case "to_double" => s"CAST($t AS DOUBLE)"
          case "to_boolean" => s"CAST($t AS BOOLEAN)"
          case "to_date" => s"CAST($t AS DATE)"
          case "to_timestamp" => s"CAST($t AS TIMESTAMP)"
          case "to_decimal" => s"CAST($t AS DECIMAL(38,9))"
          case "or_else" | "if_null" => s"coalesce($t, ${a(0)})"
          case "null_if" => s"nullif($t, ${a(0)})"
          case "is_null" => s"($t IS NULL)"
          case "is_not_null" => s"($t IS NOT NULL)"
          case "strlen" | "length" => s"length($t)"
          case "substring" | "substr" =>
            if (args.length >= 2) s"substring($t, ${a(0)}, ${a(1)})"
            else s"substring($t, ${a(0)})"
          case "contains" => target match {
            case Spark => s"contains($t, ${a(0)})"
            case Hive => s"(instr($t, ${a(0)}) > 0)" // no contains() in HiveQL
            case DuckDb => s"contains($t, ${a(0)})"
            case Trino => s"(strpos($t, ${a(0)}) > 0)" // trino's contains() is array-only
          }
          case "starts_with" => target match {
            case Spark => s"startswith($t, ${a(0)})"
            case Hive => s"(substr($t, 1, length(${a(0)})) = ${a(0)})" // no startswith in HiveQL
            case DuckDb | Trino => s"starts_with($t, ${a(0)})"
          }
          case "ends_with" => target match {
            case Spark => s"endswith($t, ${a(0)})"
            case Hive | Trino => // no endswith; compare the tail substring
              s"(substr($t, length($t) - length(${a(0)}) + 1) = ${a(0)})"
            case DuckDb => s"ends_with($t, ${a(0)})"
          }
          case "split" => target match {
            case Spark | Hive => s"split($t, ${a(0)})"
            case DuckDb => s"string_split_regex($t, ${a(0)})" // split() is regex-based in Spark
            case Trino => s"regexp_split($t, ${a(0)})"
          }
          case "regexp_matches" | "regexp_like" => target match {
            case Spark => s"regexp_like($t, ${a(0)})"
            case Hive => s"regexp($t, ${a(0)})" // HiveRewriteFunctions.scala
            case DuckDb => s"regexp_matches($t, ${a(0)})" // partial-match, same as Spark RLIKE
            case Trino => s"regexp_like($t, ${a(0)})"
          }
          case "like" => s"($t LIKE ${a(0)})" // operator form is universal
          case "strftime" | "date_format" => target match {
            case Spark | Hive => s"date_format($t, ${a(0)})"
            case DuckDb =>
              // DuckDB strftime takes C-style patterns; translate the
              // Java-pattern literal or reject a non-literal format. The
              // translated pattern re-enters a SQL string literal, so
              // quotes from Java '' escapes must re-escape
              args.head match {
                case StringLit(f) =>
                  s"strftime($t, '${javaToStrftime(f).replace("'", "''")}')"
                case _ => throw new Unsupported("non-literal date_format pattern for duckdb")
              }
            case Trino => s"format_datetime($t, ${a(0)})" // Joda pattern ≈ Java pattern
          }
          case "date_trunc" => s"date_trunc(${a(0)}, $t)"
          case "extract" => target match {
            case Spark | DuckDb => s"date_part(${a(0)}, $t)"
            case Trino | Hive => args.head match {
              // no date_part in trino/hive: needs the unit as a keyword
              // (extract(... FROM ...) is valid Spark SQL too, so the
              // hive execution gate still covers it)
              case StringLit(u) => s"extract(${u.toUpperCase} FROM $t)"
              case _ => throw new Unsupported(s"non-literal extract unit for ${target.name}")
            }
          }
          case "md5" => target match {
            case Spark | Hive => s"md5(CAST($t AS BINARY))"
            case DuckDb => s"md5($t)"
            case Trino => s"lower(to_hex(md5(to_utf8($t))))"
          }
          case "sha256" => target match {
            case Spark | Hive => s"sha2(CAST($t AS BINARY), 256)"
            case DuckDb => s"sha256($t)"
            case Trino => s"lower(to_hex(sha256(to_utf8($t))))"
          }
          case "hash" => target match {
            case Spark | Hive => s"xxhash64($t)"
            // engine-native 64-bit hashes: VALUES differ across engines by
            // design (the reference's `hash` is engine-delegated too)
            case DuckDb => s"hash($t)"
            case Trino => s"xxhash64(to_utf8(CAST($t AS VARCHAR)))"
          }
          case "ln" => s"ln($t)"
          case "sign" => target match {
            case Spark | Hive => s"signum($t)"
            case DuckDb | Trino => s"sign($t)"
          }
          case "array_size" | "size" => target match {
            case Spark | Hive => s"size($t)"
            case DuckDb => s"len($t)"
            case Trino => s"cardinality($t)"
          }
          case "array_sort" => target match {
            case Spark | Hive => s"sort_array($t)"
            case DuckDb => s"list_sort($t)"
            case Trino => s"array_sort($t)"
          }
          case "array_distinct" => target match {
            case DuckDb => s"list_distinct($t)"
            case _ => s"array_distinct($t)"
          }
          case "array_contains" => target match {
            case Spark | Hive => s"array_contains($t, ${a(0)})"
            case DuckDb => s"list_contains($t, ${a(0)})"
            case Trino => s"contains($t, ${a(0)})"
          }
          case "exclude" | "array_except" => target match {
            // reference stdlib array.wv:27-28 defines `exclude` per dialect;
            // this engine's semantics is Spark's array_except: DISTINCT
            // elements, first-occurrence order, null-as-a-value. DuckDB's
            // list_distinct drops nulls and does not pin order, so the
            // spelling is an index-aware filter instead: keep x at position
            // i iff i is x's first occurrence and x ∉ right (nulls matched
            // via an IS NULL projection). Verified cell-for-cell against
            // the Spark lowering on null/dup/order cases.
            case Spark | Hive | Trino => s"array_except($t, ${a(0)})"
            case DuckDb =>
              val (l, r) = (t, a(0))
              s"list_filter($l, (x, i) -> CASE WHEN x IS NULL " +
                s"THEN list_position(list_transform($l, y -> y IS NULL), true) = i " +
                s"AND NOT coalesce(list_contains(list_transform($r, y -> y IS NULL), true), false) " +
                s"ELSE list_position($l, x) = i AND NOT coalesce(list_contains($r, x), false) END)"
          }
          case "array_join" => target match {
            case DuckDb => s"array_to_string($t, ${a(0)})"
            case _ => s"array_join($t, ${a(0)})"
          }
          case "day" => target match {
            case Spark | Hive => s"dayofmonth($t)"
            case DuckDb | Trino => s"day($t)"
          }
          case "last_day" => target match {
            case Trino => s"last_day_of_month($t)"
            case _ => s"last_day($t)"
          }
          case "json_extract_string" | "json_value" => target match {
            case Spark | Hive => s"get_json_object($t, ${jsonPath(args.headOption)})"
            case DuckDb => s"json_extract_string($t, ${jsonPath(args.headOption)})"
            case Trino => s"json_extract_scalar($t, ${jsonPath(args.headOption)})"
          }
          case "json_array_length" =>
            val inner = target match {
              case Spark | Hive =>
                if (args.isEmpty) t else s"get_json_object($t, ${jsonPath(args.headOption)})"
              case DuckDb =>
                if (args.isEmpty) t else s"json_extract($t, ${jsonPath(args.headOption)})"
              case Trino =>
                if (args.isEmpty) t else s"json_extract($t, ${jsonPath(args.headOption)})"
            }
            s"json_array_length($inner)"
          case "token_count" | "subword_count" | "quality_score" | "lang_id" |
              "fingerprint" | "redact_pii" | "strip_html" | "stopword_ratio" |
              "alpha_ratio" | "dup_line_fraction" | "dup_char_fraction" |
              "top_token_fraction" | "sentence_count" | "terminal_punct_line_fraction" |
              "c4_clean" | "c4_keep" | "simhash64" | "cosine_similarity" | "dot_product" |
              "quantize_int8" =>
            throw new Unsupported(s"native text/vector method $n")
          case _ => s"$n($all)"
        }
      } else if (args.isEmpty) {
        // plain qualified column reference `q.c`
        tgt match {
          case Ident(q) => s"${ident(q)}.${ident(name)}"
          case _ => s"${t}.${ident(name)}"
        }
      } else s"${n}($all)"
    }

    private def jsonPath(arg: Option[Expr]): String = arg match {
      case Some(StringLit(s)) if s.startsWith("$") => s"'${s}'"
      case Some(StringLit(s)) => s"'$$.${s}'"
      case Some(other) => ex(other, agg = false)
      case None => "'$'"
    }
  }
}
