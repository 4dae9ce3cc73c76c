package graft.lang

/** Prints a parsed AST back to wvlet text that re-parses to the SAME tree —
  * the reference's WvletGenerator surface (codegen/WvletGenerator.scala:
  * parse → print → parse plan equality, RoundTripSpec*), which powers
  * `wvlet fmt` / query regeneration. Canonical choices (parens around every
  * binary operation, `alias = expr` select items, compact `rows[a, b]`
  * frames) keep the printer total without tracking precedence.
  *
  * [[WvRoundTripSpec]] drives parse∘print = id over the reference's own
  * spec corpora; throwing [[WvPrinter.Unprintable]] on a node keeps
  * failures diagnosable per-statement.
  */
object WvPrinter {

  final case class Unprintable(what: String)
      extends RuntimeException(s"wv print: unsupported $what")

  /** Statements joined with `;` — without it a following front-select /
    * test line would merge into the previous statement's pipe chain. */
  def print(stmts: List[Statement]): String = stmts.map(statement).mkString("\n;\n")

  // ---------------------------------------------------------------- helpers

  private val plainIdent = "^[A-Za-z_][A-Za-z0-9_]*$".r

  /** Keywords that would derail the parser when a bare identifier starts a
    * select item / pipe position (mirrors Parser.pipeOpKeywords +
    * statement starters). Shared with SqlToWvlet — ONE definition, so the
    * printer and the transpiler cannot drift on what needs backquoting. */
  private[lang] val keywords = Set(
    "where", "select", "group", "agg", "order", "limit", "offset", "count",
    "dedup", "distinct", "sample", "add", "prepend", "transform", "exclude",
    "rename", "shift", "join", "inner", "left", "right", "full", "cross",
    "asof", "concat", "union", "intersect", "except", "pivot", "unpivot",
    "unnest", "describe", "test", "debug", "from", "model", "val", "def",
    "flow", "show", "run", "delete", "truncate", "insert", "create", "merge",
    "update", "alter", "type", "execute", "stage", "save", "append", "and",
    "or", "not", "in", "is", "like", "rlike", "between", "case", "when",
    "then", "else", "end", "over", "filter", "as", "on", "using", "natural",
    "by", "rows", "range", "exists", "lateral", "null", "true", "false",
    "if", "cast", "try_cast", "extract", "interval", "contains", "should",
    "route", "fork", "wait", "activate", "with", "package", "import", "use")

  private[lang] def ident(name: String): String =
    if (plainIdent.findFirstIn(name).isDefined && !keywords.contains(name.toLowerCase))
      name
    else s"`$name`"

  private def dotName(name: String): String =
    if (plainIdent.findFirstIn(name).isDefined) name else s"`$name`"

  /** A dotted name (table/target): quote each segment independently. */
  private def dotted(name: String): String =
    if (name.contains('.') && !name.contains('`'))
      name.split('.').map(ident).mkString(".")
    else ident(name)

  /** An option/property value prints bare only when it is a WELL-FORMED
    * number the scanner can re-lex (one optional sign, digits, at most one
    * dot) — the loose `[0-9.]+` form let "1.2.3" print unquoted and fail
    * re-parse. Everything else is a string literal. */
  private def optValue(v: String): String =
    if (v.matches("^-?\\d+(\\.\\d+)?$")) v else str(v)

  private def str(s: String): String =
    "'" + s.flatMap {
      case '\\' => "\\\\"
      case '\'' => "\\'"
      case '\n' => "\\n"
      case '\t' => "\\t"
      case '\r' => "\\r"
      case c => c.toString
    } + "'"

  private def indent(s: String): String =
    s.linesIterator.map("  " + _).mkString("\n")

  private def items(its: List[SelectItem]): String = its.map(item).mkString(", ")

  private def item(it: SelectItem): String = it.alias match {
    case Some(a) => s"${ident(a)} = ${ex(it.expr)}"
    case None => ex(it.expr)
  }

  private def sortItems(its: List[SortItem]): String = its.map(sortItem).mkString(", ")

  private def sortItem(s: SortItem): String = {
    val dir = if (s.descending) " desc" else ""
    val nulls = s.nullsFirst match {
      case Some(true) => " nulls first"
      case Some(false) => " nulls last"
      case None => ""
    }
    s"${ex(s.expr)}$dir$nulls"
  }

  // ------------------------------------------------------------- statements

  def statement(s: Statement): String = s match {
    case QueryStatement(r) => rel(r)
    case m: ModelDef =>
      // paramSig carries the `name:type` annotations the AST params drop —
      // zip with defaults so the re-parsed signature matches
      val sigParts = if (m.paramSig.nonEmpty) m.paramSig.split(", ").toList else Nil
      val ps = m.params.zipWithIndex.map { case ((pname, default), i) =>
        val base = if (i < sigParts.length) sigParts(i) else pname
        base + default.map(d => s" = ${ex(d)}").getOrElse("")
      }
      val sig = if (ps.isEmpty) "" else ps.mkString("(", ", ", ")")
      // `--- doc ---` blocks re-attach by a source regex at parse time; a
      // doc containing `---` cannot survive that scan
      val doc =
        if (m.doc.isEmpty) ""
        else if (m.doc.contains("---")) throw Unprintable("model doc containing ---")
        else s"--- ${m.doc} ---\n"
      s"${doc}model ${ident(m.name)}$sig = {\n${indent(rel(m.body))}\n}"
    case ValDef(name, e) => s"val ${ident(name)} = ${ex(e)}"
    case FuncDef(name, params, body) =>
      if (name.startsWith("__native_"))
        s"def ${ident(name.stripPrefix("__native_"))}(${params.map(ident).mkString(", ")}) = native"
      else if (params.isEmpty) s"def ${ident(name)} = ${ex(body)}"
      else s"def ${ident(name)}(${params.map(ident).mkString(", ")}) = ${ex(body)}"
    case PartialDef(name, params, body) =>
      val sig = if (params.isEmpty) "" else params.map(ident).mkString("(", ", ", ")")
      s"def ${ident(name)}$sig = ${chainFrom(body, PipeInput)}"
    case SaveTo(r, target, append, partitionBy, options) =>
      val verb = if (append) "append" else "save"
      val parts =
        if (partitionBy.isEmpty) ""
        else s" partition by ${partitionBy.map(ident).mkString(", ")}"
      val opts =
        if (options.isEmpty) ""
        else " with " + options.map { case (k, v) =>
          s"${ident(k)}: ${optValue(v)}"
        }.mkString(", ")
      s"${rel(r)}\n$verb to ${saveTarget(target)}$parts$opts"
    case DeleteStmt(target, cond) =>
      s"delete from ${saveTarget(target)} where ${ex(cond)}"
    case TruncateStmt(target) => s"truncate ${saveTarget(target)}"
    case UseStmt(name) => s"use $name"
    case ExecuteStmt(sql) => s"execute sql${rawStr(sql)}"
    case UpdateStmt(target, sets, cond) =>
      val setTxt = sets.map { case (c, e) => s"${ident(c)} = ${ex(e)}" }.mkString(", ")
      s"update ${saveTarget(target)} set $setTxt" +
        cond.map(c => s" where ${ex(c)}").getOrElse("")
    case MergeInto(target, source, keys, matchedDelete, notMatchedInsert) =>
      // four-case table, written directly: (delete?, insert?) →
      //   (T,T) both clauses; (T,F) delete only; (F,T) bare merge (the
      //   default upsert spelling); (F,F) update-only
      val clTxt =
        if (matchedDelete && notMatchedInsert)
          " when matched then delete when not matched then insert"
        else if (matchedDelete) " when matched then delete"
        else if (notMatchedInsert) "" // bare merge re-parses as full upsert
        else " when matched then update"
      s"merge into ${saveTarget(target)} using {\n${indent(rel(source))}\n} " +
        s"on ${keys.map(ident).mkString(", ")}$clTxt"
    case CreateTableAs(name, r, orReplace, partitionBy) =>
      val rep = if (orReplace) "or replace " else ""
      val parts =
        if (partitionBy.isEmpty) ""
        else s" partitioned by (${partitionBy.map(ident).mkString(", ")})"
      s"create ${rep}table ${dotted(name)}$parts as {\n${indent(rel(r))}\n}"
    case AlterTableStmt(table, ifExists, op) =>
      val ie = if (ifExists) "if exists " else ""
      val opTxt = op match {
        case RenameTableTo(n) => s"rename to ${ident(n)}"
        case AddColumnOp(n, t, ine) =>
          s"add column ${if (ine) "if not exists " else ""}${ident(n)} $t"
        case DropColumnOp(n, ie2) =>
          s"drop column ${if (ie2) "if exists " else ""}${ident(n)}"
        case RenameColumnOp(o, n) => s"rename column ${ident(o)} to ${ident(n)}"
        case SetColumnTypeOp(n, t) => s"alter column ${ident(n)} set data type $t"
        case SetPropertiesOp(props) =>
          "set properties " + props.map { case (k, v) =>
            s"${ident(k)}: ${optValue(v)}"
          }.mkString(", ")
      }
      s"alter table $ie${saveTarget(table)} $opTxt"
    case f: FlowDefStmt => flowDef(f)
    case PackageDecl(n) => s"package $n"
    case ImportStmt(n) => s"import $n"
    case TypeDefStmt(name, location, fields, defs, parent) =>
      val loc = location.map(l => s" in $l").getOrElse("")
      val par = parent.map(p => s" extends $p").getOrElse("")
      val body = fields.map { case (f, t) => s"  ${ident(f)}: $t" } ++
        defs.map { case (d, e) => s"  def ${ident(d)} = ${ex(e)}" }
      s"type ${ident(name)}$loc$par = {\n${body.mkString("\n")}\n}"
  }

  /** A save/update target: an identifier chain when it looks like one, a
    * string literal otherwise (paths). */
  private def saveTarget(t: String): String =
    if (t.split('.').forall(seg => plainIdent.findFirstIn(seg).isDefined) &&
      !t.contains('/')) dotted(t)
    else str(t)

  private def flowDef(f: FlowDefStmt): String = {
    val ps =
      if (f.params.isEmpty) ""
      else f.params.map { case (n, d) =>
        ident(n) + d.map(e => s" = ${ex(e)}").getOrElse("")
      }.mkString("(", ", ", ")")
    val cfg =
      if (f.config.isEmpty) ""
      else " with {" + f.config.map { case (k, v) => s"${ident(k)}: ${ex(v)}" }
        .mkString(", ") + "}"
    val dep = f.dependsOnFlow.map(d => s" depends on ${ident(d)}").getOrElse("")
    val gate = f.flowGate.map { case (fl, st) => s" if ${ident(fl)}.$st" }.getOrElse("")
    val stages = f.stages.map { st =>
      val cfgItems =
        (if (st.retries == 0 && st.retryDelayMs == 50L) Nil
         else List(s"retries: ${st.retries}", s"retry_delay: ${st.retryDelayMs}ms")) ++
          st.timeoutMs.map(t => s"timeout: ${t}ms").toList ++
          st.heartbeatMs.map(h => s"heartbeat: ${h}ms").toList
      val withTxt =
        if (cfgItems.isEmpty) "" else cfgItems.mkString(" with {", ", ", "}")
      val g = st.gate.map(ge => s" if ${gateEx(ge)}").getOrElse("")
      val body = st.body match {
        case Left(merge) => s"merge ${merge.map(ident).mkString(", ")}"
        case Right(r) => rel(r).linesIterator.mkString(" ")
      }
      s"  stage ${ident(st.name)}$withTxt$g = $body"
    }
    s"flow ${ident(f.name)}$ps$cfg$dep$gate = {\n${stages.mkString("\n")}\n}"
  }

  private def gateEx(g: GateExpr): String = g match {
    case GateAtom(stage, state) => s"${ident(stage)}.$state"
    case GateAnd(l, r) => s"(${gateEx(l)} and ${gateEx(r)})"
    case GateOr(l, r) => s"(${gateEx(l)} or ${gateEx(r)})"
  }

  // -------------------------------------------------------------- relations

  def rel(r: Relation): String = r match {
    case TableRef(name) if name.startsWith("__show_") => showText(name)
    case TableRef(name) => s"from ${dotted(name)}"
    case TableRefDyn(interp) => s"from ${backquoteInterp(interp)}"
    case ModelRef(name, args) =>
      s"from ${ident(name)}(${args.map(ex).mkString(", ")})"
    case PipeInput =>
      // marker leaf — chainFrom strips this line for partial-query bodies
      "from __pipe_input__"
    case FileScan(path) => s"from ${str(path)}"
    case v: Values => s"from ${valuesText(v)}"
    case RawSql(sql) => s"from sql${rawStr(sql)}"
    case RawJson(json) => s"from json${rawStr(json)}"
    case EmptyRelation =>
      throw Unprintable("empty relation outside a front-select")
    case CallToolRel(connector, tool, args) =>
      val a = args.map { case (n, e) => s"${ident(n)}: ${ex(e)}" }.mkString(", ")
      s"call ${ident(connector)}.${ident(tool)}($a)"
    case RunFlow(name, args) =>
      val a =
        if (args.isEmpty) ""
        else "(" + args.map {
          case (Some(n), e) => s"${ident(n)} = ${ex(e)}"
          case (None, e) => ex(e)
        }.mkString(", ") + ")"
      s"run flow ${ident(name)}$a"
    case UnnestRel(e, alias, cols, withOrd) =>
      val ord = if (withOrd) " with ordinality" else ""
      s"from unnest(${ex(e)})$ord${aliasText(alias, cols)}"
    case SubscribeRel(child, params) =>
      val base = rel(child)
      val ps = params.map { case (k, v) => s"$k: ${str(v)}" }.mkString(", ")
      // the method form attaches to a table name in from position
      child match {
        case TableRef(_) => s"$base.subscribe($ps)"
        case _ => throw Unprintable("subscribe over a non-table relation")
      }
    case AliasedRelation(child, alias, cols) =>
      s"${rel(child)}${aliasText(Some(alias), cols)}"
    case b: BracedRelation => s"from ${bracedText(b)}"
    case SelectAsNamed(child, name) => s"${rel(child)}\nselect as ${ident(name)}"
    case SelectAsNamedDyn(child, interp) =>
      s"${rel(child)}\nselect as ${backquoteInterp(interp)}"

    case Filter(child, cond) => s"${rel(child)}\nwhere ${ex(cond)}"
    case Project(child, List(SelectItem(Star(None), None)), true) =>
      s"${rel(child)}\ndistinct"
    case Project(child, its, distinct) =>
      val d = if (distinct) "distinct " else ""
      child match {
        case EmptyRelation => s"select $d${items(its)}"
        case _ => s"${rel(child)}\nselect $d${items(its)}"
      }
    case GroupBy(child, keys) => s"${rel(child)}\ngroup by ${items(keys)}"
    case GroupByStyled(child, keys, style) =>
      style match {
        case GroupingStyle.Plain => s"${rel(child)}\ngroup by ${items(keys)}"
        case GroupingStyle.Rollup => s"${rel(child)}\ngroup by rollup ${items(keys)}"
        case GroupingStyle.Cube => s"${rel(child)}\ngroup by cube ${items(keys)}"
        case GroupingStyle.Sets(sets) =>
          val s = sets.map(set => set.map(ex).mkString("(", ", ", ")"))
            .mkString(", ")
          s"${rel(child)}\ngroup by grouping sets ($s)"
      }
    case Agg(child, its) => s"${rel(child)}\nagg ${items(its)}"
    case AddColumns(child, its, prepend) =>
      s"${rel(child)}\n${if (prepend) "prepend" else "add"} ${items(its)}"
    case TransformColumns(child, its) => s"${rel(child)}\ntransform ${items(its)}"
    case ExcludeColumns(child, cols) =>
      s"${rel(child)}\nexclude ${cols.map(ident).mkString(", ")}"
    case RenameColumns(child, renames) =>
      val rs = renames.map { case (f, t) => s"${ident(f)} as ${ident(t)}" }.mkString(", ")
      s"${rel(child)}\nrename $rs"
    case ShiftColumns(child, cols, toLeft) =>
      val dir = if (toLeft) "" else "to right "
      s"${rel(child)}\nshift $dir${cols.map(ident).mkString(", ")}"
    case Sort(child, its) => s"${rel(child)}\norder by ${sortItems(its)}"
    case Limit(child, n) => s"${rel(child)}\nlimit $n"
    case Offset(child, n) => s"${rel(child)}\noffset $n"
    case CountRel(child) => s"${rel(child)}\ncount"
    case DedupRel(child) => s"${rel(child)}\ndedup"
    case SampleRel(child, method, isPercent, size) =>
      val sz = if (size.isWhole) size.toLong.toString else size.toString
      val pct = if (isPercent) "%" else ""
      method match {
        case Some(m) => s"${rel(child)}\nsample $m($sz$pct)"
        case None => s"${rel(child)}\nsample $sz$pct"
      }
    case j: Join => join(j)
    case SetOp(kind, left, right, distinct) =>
      val op = kind match {
        case SetOpKind.Concat => "concat"
        case SetOpKind.Union => "union"
        case SetOpKind.Intersect => if (distinct) "intersect" else "intersect all"
        case SetOpKind.Except => if (distinct) "except" else "except all"
      }
      s"${rel(left)}\n$op\n{\n${indent(rel(right))}\n}"
    case Pivot(child, col, values, agg) =>
      val in = if (values.isEmpty) "" else s" in (${values.map(ex).mkString(", ")})"
      val using = agg.map(a => s" using ${item(a)}").getOrElse("")
      s"${rel(child)}\npivot on ${ident(col)}$in$using"
    case Unpivot(child, valueCol, varCol, cols) =>
      s"${rel(child)}\nunpivot ${ident(valueCol)} for ${ident(varCol)} in " +
        s"(${cols.map(ident).mkString(", ")})"
    case LateralUnnest(child, e, alias, cols, withOrd) =>
      val ord = if (withOrd) " with ordinality" else ""
      s"${rel(child)}\ncross join unnest(${ex(e)})$ord${aliasText(alias, cols)}"
    case DescribeRel(child) => s"${rel(child)}\ndescribe"
    case ExplainRel(child) =>
      child match {
        case RawSql(sql) => s"explain sql${rawStr(sql)}"
        case _ => s"explain ${rel(child)}"
      }
    case TestRel(child, assertion) => s"${rel(child)}\n${testText(assertion)}"
    case DebugRel(child, body) =>
      if (body eq child) s"${rel(child)}\ndebug"
      else s"${rel(child)}\ndebug {\n${indent(chainFrom(body, child))}\n}"
    case DeleteRel(child) => s"${rel(child)}\ndelete"
    case SaveRel(child, target, append) =>
      s"${rel(child)}\n${if (append) "append" else "save"} to ${saveTarget(target)}"
    case RouteRel(child, cases, by) =>
      val byTxt = by.map(e => s" by ${ex(e)}").getOrElse("")
      val cs = cases.map {
        case (Some(c), t) => s"  case ${ex(c)} -> ${ident(t)}"
        case (None, t) => s"  else -> ${ident(t)}"
      }
      s"${rel(child)}\nroute$byTxt {\n${cs.mkString("\n")}\n}"
    case ForkRel(child, branches) =>
      val bs = branches.map { case (n, r) =>
        s"  stage ${ident(n)} = ${rel(r).linesIterator.mkString(" ")}"
      }
      s"${rel(child)}\nfork {\n${bs.mkString("\n")}\n}"
    case OrchOp(child, kind, args) =>
      kind match {
        case "jump" =>
          val name = args match {
            case List(StringLit(n)) => n
            case _ => throw Unprintable("jump target")
          }
          s"${rel(child)}\n-> ${ident(name)}"
        case "wait_until" =>
          val cond = ex(args.head)
          val timeout = args.drop(1).headOption.map(t => s" for ${ex(t)}").getOrElse("")
          s"${rel(child)}\nwait until $cond$timeout"
        case "end" => s"${rel(child)}\nend()"
        case k => s"${rel(child)}\n$k(${args.map(ex).mkString(", ")})"
      }
    case PartialApply(child, name, args) =>
      val a = if (args.isEmpty) "" else s"(${args.map(ex).mkString(", ")})"
      s"${rel(child)}\n${ident(name)}$a"
    case other => throw Unprintable(s"relation ${other.getClass.getSimpleName}")
  }

  /** The pipe-op chain of `body` ABOVE the node `stop` (reference-equal
    * child), without re-printing the shared prefix — debug blocks and
    * partial-query defs print their operators relative to the input. */
  private def chainFrom(body: Relation, stop: Relation): String = {
    if (body eq stop) throw Unprintable("empty operator chain")
    val full = rel(body)
    val prefix = rel(stop)
    if (!full.startsWith(prefix))
      throw Unprintable("operator chain does not extend its input")
    full.drop(prefix.length).dropWhile(_ == '\n')
  }

  private def join(j: Join): String = {
    val left = rel(j.left)
    if (j.lateral) {
      val kw = j.kind match {
        case JoinKind.Inner => "join"
        case JoinKind.Left => "left join"
        case k => throw Unprintable(s"lateral join kind $k")
      }
      val on = j.on.map(c => s" on ${ex(c)}").getOrElse("")
      return s"$left\n$kw lateral {\n${indent(rel(j.right))}\n}$on"
    }
    val kindTxt = j.kind match {
      case JoinKind.Inner => "join"
      case JoinKind.Left => "left join"
      case JoinKind.Right => "right join"
      case JoinKind.Full => "full join"
      case JoinKind.Cross => "cross join"
      case k => throw Unprintable(s"join kind $k")
    }
    val asof = if (j.asof) "asof " else ""
    val natural = if (j.natural) "natural " else ""
    val right = fromItemText(j.right)
    val tail =
      if (j.usingColumns.nonEmpty)
        s" using (${j.usingColumns.map(ident).mkString(", ")})"
      else j.on.map(c => s" on ${ex(c)}").getOrElse("")
    s"$left\n$asof$natural$kindTxt $right$tail"
  }

  /** A relation in from/join-right position (single item, no `from`). */
  private def fromItemText(r: Relation): String = r match {
    case TableRef(name) => dotted(name)
    case FileScan(path) => str(path)
    case v: Values => valuesText(v)
    case RawSql(sql) => s"sql${rawStr(sql)}"
    case RawJson(json) => s"json${rawStr(json)}"
    case ModelRef(name, args) => s"${ident(name)}(${args.map(ex).mkString(", ")})"
    case b: BracedRelation => bracedText(b)
    case UnnestRel(e, alias, cols, withOrd) =>
      val ord = if (withOrd) " with ordinality" else ""
      s"unnest(${ex(e)})$ord${aliasText(alias, cols)}"
    case AliasedRelation(child, alias, cols) =>
      s"${fromItemText(child)}${aliasText(Some(alias), cols)}"
    case other => s"{\n${indent(rel(other))}\n}"
  }

  private def bracedText(b: BracedRelation): String =
    s"{\n${indent(rel(b.child))}\n}"

  private def aliasText(alias: Option[String], cols: List[String]): String =
    alias match {
      case Some(a) =>
        val cs = if (cols.isEmpty) "" else s"(${cols.map(ident).mkString(", ")})"
        s" as ${ident(a)}$cs"
      case None => ""
    }

  private def valuesText(v: Values): String = {
    val rows = v.rows.map(r => r.map(ex).mkString("[", ", ", "]")).mkString("[", ", ", "]")
    s"$rows${aliasText(v.alias, v.columns)}"
  }

  private def showText(name: String): String = {
    val body = name.stripPrefix("__show_")
    val (what, like) = body.indexOf("?like=") match {
      case -1 => (body, "")
      case i => (body.take(i), s" like ${str(body.drop(i + 6))}")
    }
    what.split(":", 2) match {
      case Array("columns", t) => s"show columns in ${dotted(t)}"
      case Array("create", t) => s"show create table ${dotted(t)}"
      case Array("tables", s0) => s"show tables in ${dotted(s0)}$like"
      case Array("query", n) => s"show query ${ident(n)}"
      case Array(other) => s"show $other$like"
      case _ => throw Unprintable(s"show form $name")
    }
  }

  private def testText(assertion: Expr): String = assertion match {
    case FunctionCall("__should_be", List(l, r), _, _) =>
      s"test ${ex(l)} should be ${ex(r)}"
    case FunctionCall("__should_not_be", List(l, r), _, _) =>
      s"test ${ex(l)} should not be ${ex(r)}"
    case FunctionCall("__should_contain", List(l, r), _, _) =>
      s"test ${ex(l)} should contain ${ex(r)}"
    case FunctionCall("__should_not_contain", List(l, r), _, _) =>
      s"test ${ex(l)} should not contain ${ex(r)}"
    case FunctionCall("__assert", List(e), _, _) => s"test ${ex(e)}"
    case other => throw Unprintable(s"test assertion ${other.getClass.getSimpleName}")
  }

  // ------------------------------------------------------------ expressions

  def ex(e: Expr): String = e match {
    case Ident(n) => ident(n)
    case Underscore => "_"
    case Star(None) => "*"
    case Star(Some(q)) => s"${ident(q)}.*"
    case NullLit() => "null"
    case BoolLit(v) => v.toString
    case LongLit(v) => v.toString
    case DoubleLit(v) =>
      // must lex as a DoubleLit token: keep a '.' or exponent in the text
      val s = v.toString
      if (s.contains('.') || s.contains('e') || s.contains('E')) s else s + ".0"
    case DecimalLit(v) => s"cast(${str(v.toString)} as decimal(38,9))"
    case StringLit(v) => str(v)
    case ArrayLit(its) => its.map(ex).mkString("[", ", ", "]")
    case TupleLit(its) => its.map(ex).mkString("(", ", ", ")")
    case ParamRef(_) => "?"
    case MapLit(entries) =>
      "map {" + entries.map { case (k, v) => s"${ex(k)}: ${ex(v)}" }.mkString(", ") + "}"
    case StructLit(fields) =>
      "{" + fields.map { case (n, v) => s"${ident(n)}: ${ex(v)}" }.mkString(", ") + "}"
    // a name after '.' cannot collide with a keyword — print bare
    case DotRef(q, n) => s"${ex(q)}.${dotName(n)}"
    case MethodCall(t, n, args) => s"${ex(t)}.${dotName(n)}(${args.map(ex).mkString(", ")})"
    case f: FunctionCall => functionText(f)
    case WindowApply(fn, spec) => s"${ex(fn)} over (${windowSpec(spec)})"
    case AtTimeZone(operand, tz) => s"${ex(operand)} at time zone ${ex(tz)}"
    case Subscript(t, i) => s"${ex(t)}[${ex(i)}]"
    case LambdaExpr(List(p), body) => s"${ident(p)} -> ${ex(body)}"
    case LambdaExpr(ps, body) => s"(${ps.map(ident).mkString(", ")}) -> ${ex(body)}"
    case BinaryOp(op, l, r) => s"(${ex(l)} $op ${ex(r)})"
    case UnaryOp("-", operand) =>
      // a nested negation would print as `--x`, which the scanner lexes as
      // a LINE COMMENT — parenthesize any operand that renders with a
      // leading '-' so print∘parse stays the identity
      val inner = ex(operand)
      if (inner.startsWith("-")) s"-($inner)" else s"-$inner"
    case UnaryOp(op, operand) => throw Unprintable(s"unary $op")
    case Not(operand) => s"not (${ex(operand)})"
    case IsNull(operand, negated) =>
      s"${ex(operand)} is ${if (negated) "not " else ""}null"
    case Between(operand, lo, hi, negated) =>
      s"${ex(operand)} ${if (negated) "not " else ""}between ${ex(lo)} and ${ex(hi)}"
    case InList(operand, its, negated) =>
      s"${ex(operand)} ${if (negated) "not " else ""}in (${its.map(ex).mkString(", ")})"
    case InSubquery(operand, q, negated) =>
      s"${ex(operand)} ${if (negated) "not " else ""}in { ${flat(q)} }"
    case ExistsExpr(q) => s"exists { ${flat(q)} }"
    case ScalarSubquery(q) => s"{ ${flat(q)} }"
    case LikeOp(operand, p, negated) =>
      s"${ex(operand)} ${if (negated) "not " else ""}like ${ex(p)}"
    case RLikeOp(operand, p, negated) =>
      s"${ex(operand)} ${if (negated) "not " else ""}rlike ${ex(p)}"
    case Cast(operand, tpe, isTry) =>
      s"${if (isTry) "try_cast" else "cast"}(${ex(operand)} as $tpe)"
    case CaseWhen(target, branches, otherwise) =>
      val t = target.map(x => s" ${ex(x)}").getOrElse("")
      val whens = branches.map { case (c, v) => s"when ${ex(c)} then ${ex(v)}" }
      val els = otherwise.map(o => s" else ${ex(o)}").getOrElse("")
      s"case$t ${whens.mkString(" ")}$els end"
    case IfExpr(cond, thenE, elseE) =>
      s"if(${ex(cond)}, ${ex(thenE)}${elseE.map(x => s", ${ex(x)}").getOrElse("")})"
    case i: Interpolation => s"s\"${interpBody(i)}\""
    case Extract(field, from) => s"extract($field from ${ex(from)})"
    case RawSqlExpr(sql) => s"sql${rawStr(sql)}"
    case other => throw Unprintable(s"expression ${other.getClass.getSimpleName}")
  }

  private def functionText(f: FunctionCall): String = f.name match {
    case "__interval" =>
      f.args match {
        case List(StringLit(s)) =>
          val cut = s.lastIndexOf(' ')
          if (cut < 0) throw Unprintable(s"interval '$s'")
          s"interval ${str(s.take(cut))} ${s.drop(cut + 1)}"
        case _ => throw Unprintable("interval args")
      }
    case name =>
      // `f(args [order by …])` — trailing __orderby markers from agg calls
      val (plain, orderings) = f.args.partition {
        case FunctionCall("__orderby", _, _, _) => false
        case _ => true
      }
      val ob =
        if (orderings.isEmpty) ""
        else " order by " + orderings.map {
          case FunctionCall("__orderby", List(e2, BoolLit(desc)), _, _) =>
            s"${ex(e2)}${if (desc) " desc" else ""}"
          case other => throw Unprintable(s"orderby marker $other")
        }.mkString(", ")
      val d = if (f.isDistinct) "distinct " else ""
      val fn =
        if (plainIdent.findFirstIn(name).isDefined) name
        else s"`$name`"
      val filt = f.filter.map(c => s" filter (where ${ex(c)})").getOrElse("")
      s"$fn($d${plain.map(ex).mkString(", ")}$ob)$filt"
  }

  private def windowSpec(spec: WindowSpec): String = {
    val parts = List.newBuilder[String]
    if (spec.partitionBy.nonEmpty)
      parts += s"partition by ${spec.partitionBy.map(ex).mkString(", ")}"
    if (spec.orderBy.nonEmpty)
      parts += s"order by ${sortItems(spec.orderBy)}"
    spec.frame.foreach { f =>
      val kind = if (f.isRows) "rows" else "range"
      parts += s"$kind[${f.start.map(_.toString).getOrElse("")}, ${f.end.map(_.toString).getOrElse("")}]"
    }
    parts.result().mkString(" ")
  }

  /** A relation flattened for expression position (subqueries). */
  private def flat(r: Relation): String = rel(r).linesIterator.mkString(" ")

  private def interpBody(i: Interpolation): String = {
    val sb = new StringBuilder
    i.parts.zipWithIndex.foreach { case (p, idx) =>
      sb ++= p.flatMap {
        case '\\' => "\\\\"
        case '"' => "\\\""
        case '\n' => "\\n"
        case '\t' => "\\t"
        case '\r' => "\\r"
        case c => c.toString
      }
      if (idx < i.args.length) sb ++= s"$${${ex(i.args(idx))}}"
    }
    sb.toString
  }

  private def backquoteInterp(i: Interpolation): String = {
    val sb = new StringBuilder("s`")
    i.parts.zipWithIndex.foreach { case (p, idx) =>
      sb ++= p
      if (idx < i.args.length) sb ++= s"$${${ex(i.args(idx))}}"
    }
    sb ++= "`"
    sb.toString
  }

  /** A raw string body (sql"…" / json"…"): single-quoted with escapes. */
  private def rawStr(s: String): String = str(s)
}
