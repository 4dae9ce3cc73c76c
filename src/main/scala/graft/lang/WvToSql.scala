package graft.lang

/** wv → Spark SQL text generation — the reference's core codegen surface
  * (`wvlet compile -t <dbtype>`, compiler/codegen/SqlGenerator.scala,
  * 1,842 LoC) re-expressed for one target dialect. This engine executes
  * through DataFrames, so SQL text is not needed to run queries; the
  * generator exists for the migration/interop story: hand a wv pipeline to
  * any system that speaks Spark SQL.
  *
  * Mechanics: the pipe chain folds bottom-up into SQL select blocks
  * (from/where/group/select/having/order/limit); an operator that cannot
  * join the current block (a second `select`, a filter after a projection,
  * sort after limit) wraps it as a subquery — the same block algebra the
  * reference generator uses. Models lower as CTEs; scalar/IN/EXISTS
  * subqueries render inline. Dot-methods map to Spark SQL functions via
  * the same name table the DataFrame lowering uses ([[Stdlib]] semantics,
  * text form).
  *
  * Deliberately out of scope (throws [[WvToSql.Unsupported]]): streaming
  * subscriptions, flows, DML/DDL, sampling, text-pipeline methods
  * backed by native Catalyst expressions, and parameterized models —
  * surfaces with no faithful single-statement SQL equivalent. Pivot and
  * unpivot ARE supported (generated as Spark SQL PIVOT/UNPIVOT clauses).
  */
object WvToSql {

  final class Unsupported(msg: String) extends Exception(msg)

  /** Generate one Spark SQL statement for the unit's last query statement;
    * parameterless models become CTEs (referenced or not — unreferenced
    * ones are dropped), constant vals inline. */
  def generate(text: String): String = {
    val stmts = Parser.parseStatements(text)
    generateStatements(stmts)
  }

  def generateStatements(stmts: List[Statement]): String = {
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
    val gen = new Gen(models.map(m => m.name.toLowerCase -> m).toMap, consts)
    val body = gen.render(query)
    val used = gen.usedModels.toList
    if (used.isEmpty) body
    else {
      // CTEs in declaration order, only those actually referenced
      // (transitively: a used model's body may reference earlier models)
      val ordered = models.filter(m => gen.usedModels.contains(m.name.toLowerCase))
      val ctes = ordered.map(m => s"${ident(m.name)} AS (\n${gen.render(m.body)}\n)")
      s"WITH ${ctes.mkString(",\n")}\n$body"
    }
  }

  // ------------------------------------------------------------------ names

  private val plainIdent = "[A-Za-z_][A-Za-z0-9_]*".r
  private def ident(n: String): String =
    if (plainIdent.matches(n)) n else "`" + n.replace("`", "``") + "`"

  /** Spark SQL type text for a wv type name. */
  private def sqlType(t: String): String = {
    val mapped = Lowering.mapTypeName(t)
    // array(t)/map(k,v) wv spelling → angle brackets
    mapped.replace("array(", "array<").replace("map(", "map<") match {
      case s if s.contains("<") => s.replace(")", ">")
      case s => s
    }
  }

  // ------------------------------------------------------------- the worker

  private final class Gen(models: Map[String, ModelDef], consts: Map[String, Expr]) {
    val usedModels = scala.collection.mutable.LinkedHashSet.empty[String]

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
        limit.foreach(n => sb ++= s"\nLIMIT $n")
        offset.foreach(n => sb ++= s"\nOFFSET $n")
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
      if (j.asof) throw new Unsupported("asof join has no Spark SQL equivalent")
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
        case JoinKind.Semi => "LEFT SEMI JOIN"
        case JoinKind.Anti => "LEFT ANTI JOIN"
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

      case Pivot(child, pivotCol, values, agg) if values.nonEmpty && agg.nonEmpty =>
        // Spark SQL PIVOT groups by every column not referenced in the agg
        // and not the pivot column — the same rule the DataFrame lowering
        // applies. The agg stays UNALIASED: a single aliased agg would
        // suffix every pivoted column (`a_total`) where the DataFrame path
        // names them by value alone (`a`).
        val aggSql = ex(agg.get.expr, agg = true)
        val vals = values.map(v => ex(v, agg = false)).mkString(", ")
        Block(from =
          s"(\n${render(child)}\n) PIVOT ($aggSql FOR ${ident(pivotCol)} IN ($vals))")
      case _: Pivot =>
        // inferred value lists / count-pivot zero-fill need execution-time
        // schema knowledge a text generator doesn't have
        throw new Unsupported("pivot without explicit `in (...)` values and `using` agg")

      case LateralUnnest(child, e, alias, cols, withOrd) =>
        // `cross join unnest(arr)` → Spark SQL LATERAL VIEW: appends the
        // exploded column(s) after the child's, the same order the
        // DataFrame lowering's select(*, explode(...)) produces; the
        // with-ordinality form emits 1-based ordinals (SQL-standard WITH
        // ORDINALITY; posexplode's pos is 0-based) via a wrapping select
        val outName = cols.headOption.orElse(alias).getOrElse("col")
        if (withOrd) {
          val lv = s"LATERAL VIEW posexplode(${ex(e, agg = false)}) __lv AS " +
            s"__graft_pos, ${ident(outName)}"
          Block(from =
            s"(SELECT * EXCEPT (__graft_pos, ${ident(outName)}), " +
              s"__graft_pos + 1 AS ${ident(outName + "_ordinal")}, ${ident(outName)} " +
              s"FROM (\n${render(child)}\n) $lv)")
        } else {
          val lv = s"LATERAL VIEW explode(${ex(e, agg = false)}) __lv AS ${ident(outName)}"
          Block(from = s"(\n${render(child)}\n) $lv")
        }

      case Unpivot(child, valueCol, varCol, cols) =>
        // INCLUDE NULLS matches Dataset.unpivot (SQL UNPIVOT drops null
        // measure rows by default; the DataFrame path keeps them)
        Block(from =
          s"(\n${render(child)}\n) UNPIVOT INCLUDE NULLS " +
            s"(${ident(valueCol)} FOR ${ident(varCol)} IN (${cols.map(ident).mkString(", ")}))")

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
        // Spark SQL's `* EXCEPT (...)` preserves the remaining column order
        val b0 = build(child)
        val b = if (b0.select.isEmpty && b0.groupBy.isEmpty && b0.orderBy.isEmpty &&
          b0.limit.isEmpty) b0 else wrap(b0)
        b.copy(select = Some(List(
          s"* EXCEPT (${columns.map(ident).mkString(", ")})")))

      case SubscribeRel(child, _) => build(child) // batch view of a subscription
      case other =>
        throw new Unsupported(s"relation ${other.getClass.getSimpleName}")
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
      case DoubleLit(v) => s"CAST($v AS DOUBLE)" // plain 1.5 parses as DECIMAL in Spark SQL
      case DecimalLit(v) => v.toString
      case StringLit(s) => "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
      case Star(None) => "*"
      case Star(Some(q)) => s"${ident(q)}.*"
      case ArrayLit(items) => items.map(ex(_, agg)).mkString("array(", ", ", ")")
      case TupleLit(items) => items.map(ex(_, agg)).mkString("(", ", ", ")")
      case StructLit(fields) =>
        fields.map { case (n, v) => s"'${n}', ${ex(v, agg)}" }
          .mkString("named_struct(", ", ", ")")
      case MapLit(entries) =>
        entries.map { case (k, v) => s"${ex(k, agg)}, ${ex(v, agg)}" }
          .mkString("map(", ", ", ")")
      case Subscript(t, StringLit(s)) => s"${ex(t, agg)}['${s.replace("'", "\\'")}']"
      case Subscript(t, i) => s"element_at(${ex(t, agg)}, ${ex(i, agg)})"

      case DotRef(target, name) => method(target, name, Nil, agg)
      case MethodCall(target, name, args) => method(target, name, args, agg)

      case FunctionCall(n, args, isDistinct, filter) =>
        val d = if (isDistinct) "DISTINCT " else ""
        val base = s"${n.toLowerCase}($d${args.map(ex(_, agg)).mkString(", ")})"
        filter match {
          case Some(f) => s"$base FILTER (WHERE ${ex(f, agg = false)})"
          case None => base
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
        val inner = ex(fn, agg = true)
        s"$inner OVER (${List(partition, order, frame).filter(_.nonEmpty).mkString(" ")})"

      case BinaryOp("+", l, r) if isStringy(l) || isStringy(r) =>
        s"concat(CAST(${ex(l, agg)} AS STRING), CAST(${ex(r, agg)} AS STRING))"
      case BinaryOp("//", l, r) =>
        s"CAST(floor((${ex(l, agg)}) / (${ex(r, agg)})) AS BIGINT)"
      case BinaryOp("||", l, r) =>
        s"concat(CAST(${ex(l, agg)} AS STRING), CAST(${ex(r, agg)} AS STRING))"
      case BinaryOp(op, l, r) =>
        val o = op.toLowerCase match {
          case "and" => "AND"
          case "or" => "OR"
          case "!=" => "!="
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
        val r = s"(${ex(v, agg)} RLIKE ${ex(p, agg)})"
        if (negated) s"(NOT $r)" else r
      case Cast(v, t, isTry) =>
        s"${if (isTry) "TRY_CAST" else "CAST"}(${ex(v, agg)} AS ${sqlType(t)})"
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
      case AtTimeZone(v, tz) =>
        s"from_utc_timestamp(to_utc_timestamp(${ex(v, agg)}, current_timezone()), ${ex(tz, agg)})"
      case RawSqlExpr(sql) => sql
      case other => throw new Unsupported(s"expression ${other.getClass.getSimpleName}")
    }

    /** Dot-method → SQL. In agg position, agg methods render as aggregate
      * calls (`x.sum` → sum(x), `_.count` → count(*)); scalar methods map
      * through the Stdlib-equivalent SQL spellings. A name that is neither
      * renders as a qualified column reference (DotRef) or a plain function
      * call (MethodCall). */
    private def method(target: Expr, name: String, args: List[Expr], agg: Boolean): String = {
      val n = name.toLowerCase
      def t = ex(target, agg)
      def a(i: Int) = ex(args(i), agg)
      def all = (target :: args).map(ex(_, agg)).mkString(", ")
      if (agg && Stdlib.isAggMethod(n)) {
        val inner = target match {
          case Underscore => if (n == "count") "*" else "1"
          case other => ex(other, agg = false)
        }
        n match {
          case "count_distinct" => s"count(DISTINCT $inner)"
          case "array_distinct_agg" => s"collect_set($inner)"
          case "to_array" | "array_agg" => s"collect_list($inner)"
          case "arbitrary" | "any" | "any_value" => s"any_value($inner)"
          case "mean" => s"avg($inner)"
          case "count_approx_distinct" | "approx_count_distinct" =>
            s"approx_count_distinct($inner)"
          case "string_agg" =>
            val sep = if (args.nonEmpty) ex(args.head, agg = false) else "','"
            s"array_join(sort_array(collect_list(CAST($inner AS STRING))), $sep)"
          case "min_by" | "max_by" => s"$n($inner, ${ex(args.head, agg = false)})"
          case "approx_quantile" => s"percentile_approx($inner, ${ex(args.head, agg = false)}, 10000)"
          case "count_if" =>
            if (args.nonEmpty) s"count_if(${ex(args.head, agg = false)})" else s"count_if($inner)"
          case "exists_agg" => s"bool_or($inner)"
          case _ => s"$n($inner)"
        }
      } else if (n == "in" && args.nonEmpty) {
        s"($t IN (${args.map(ex(_, agg)).mkString(", ")}))"
      } else if (n == "not_in" && args.nonEmpty) {
        s"($t NOT IN (${args.map(ex(_, agg)).mkString(", ")}))"
      } else if (n == "between" && args.length == 2) {
        s"($t BETWEEN ${a(0)} AND ${a(1)})"
      } else if (Stdlib.scalarMethods.contains(n)) {
        n match {
          case "to_string" => s"CAST($t AS STRING)"
          case "to_int" => s"CAST($t AS INT)"
          case "to_long" => s"CAST($t AS BIGINT)"
          case "to_float" => s"CAST($t AS FLOAT)"
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
          case "contains" => s"contains($t, ${a(0)})"
          case "starts_with" => s"startswith($t, ${a(0)})"
          case "ends_with" => s"endswith($t, ${a(0)})"
          case "regexp_matches" | "regexp_like" => s"regexp_like($t, ${a(0)})"
          case "like" => s"($t LIKE ${a(0)})"
          case "strftime" | "date_format" => s"date_format($t, ${a(0)})"
          case "date_trunc" => s"date_trunc(${a(0)}, $t)"
          case "extract" => s"date_part(${a(0)}, $t)"
          case "md5" => s"md5(CAST($t AS BINARY))"
          case "sha256" => s"sha2(CAST($t AS BINARY), 256)"
          case "hash" => s"xxhash64($t)"
          case "ln" => s"ln($t)"
          case "sign" => s"signum($t)"
          case "array_size" | "size" => s"size($t)"
          case "array_sort" => s"sort_array($t)"
          case "day" => s"dayofmonth($t)"
          case "json_extract_string" | "json_value" =>
            s"get_json_object($t, ${jsonPath(args.headOption)})"
          case "json_array_length" =>
            if (args.isEmpty) s"json_array_length($t)"
            else s"json_array_length(get_json_object($t, ${jsonPath(args.headOption)}))"
          case "token_count" | "subword_count" | "quality_score" | "lang_id" |
              "fingerprint" | "redact_pii" | "strip_html" | "stopword_ratio" |
              "alpha_ratio" | "dup_line_fraction" | "dup_char_fraction" |
              "top_token_fraction" | "sentence_count" | "terminal_punct_line_fraction" |
              "c4_clean" | "c4_keep" | "simhash64" | "cosine_similarity" | "dot_product" =>
            throw new Unsupported(s"native text/vector method $n")
          case _ => s"$n($all)"
        }
      } else if (args.isEmpty) {
        // plain qualified column reference `q.c`
        target match {
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
