package graft.lang

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis._
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.plans._

/** SQL → Wvlet transpiler: prints a parsed (unresolved) Catalyst plan back
  * as wvlet pipeline text, the migration path the reference ships as
  * `wvlet transpile` (codegen/WvletGenerator.scala:1-1045 — the reference
  * prints its own typed plan; here the source of truth is Spark's parser,
  * so any SQL Spark accepts is a transpile candidate). The emitted text is
  * executable by graft's language front-end: RoundTripSpec re-runs it and
  * compares results row-for-row against the original SQL.
  *
  * Shapes outside the supported surface throw [[SqlToWvlet.Unsupported]]
  * with the node that stopped the walk — per-statement, so a script's
  * supported statements still transpile.
  */
object SqlToWvlet {

  final case class Unsupported(what: String)
      extends RuntimeException(s"SQL→wv: unsupported $what")

  /** Transpile one SQL statement to wvlet text. */
  def transpile(sql: String, spark: SparkSession): String = {
    val plan = spark.sessionState.sqlParser.parsePlan(sql)
    val ctes = List.newBuilder[String]
    val body = rel(plan, ctes)
    val defs = ctes.result()
    (defs :+ body).mkString("\n")
  }

  private def indent(s: String): String =
    s.linesIterator.map("  " + _).mkString("\n")

  /** Backquoting delegates to the wv printer's single keyword set (plus
    * the grouping-set starters the transpiler can emit in key position) —
    * one definition, no drift. */
  private val extraKeywords = Set("grouping", "sets", "rollup", "cube")

  private def ident(name: String): String =
    if (extraKeywords.contains(name.toLowerCase)) s"`$name`"
    else WvPrinter.ident(name)

  private def identPath(parts: Seq[String]): String = parts.map(ident).mkString(".")

  // ---------------------------------------------------------------- relations

  /** A pipeline (starting with `from` / `select`). CTE model defs are
    * appended to `ctes` as standalone statements. */
  private def rel(p: LogicalPlan, ctes: scala.collection.mutable.Builder[String, List[String]]): String =
    p match {
      case w: logical.UnresolvedWith =>
        w.cteRelations.foreach { case (name, sub, _) =>
          // nested WITH defs hoist to the top level (models are
          // file-global in wv; rel() appends them before this one)
          val body = rel(sub.child, ctes)
          ctes += s"model ${ident(name)} = {\n${indent(body)}\n}"
        }
        rel(w.child, ctes)

      case logical.Project(items, logical.OneRowRelation()) =>
        s"select ${items.map(item).mkString(", ")}"
      case logical.Project(items, child) =>
        s"${rel(child, ctes)}\nselect ${items.map(item).mkString(", ")}"

      case logical.Filter(cond, agg: logical.Aggregate) =>
        // WHERE below GROUP BY in plan order = SQL WHERE … GROUP BY? No:
        // Filter ABOVE Aggregate only parses from HAVING (see
        // UnresolvedHaving) — a plain filter over an aggregate subquery
        // keeps a SubqueryAlias in between. Treat as having.
        having(cond, agg, ctes)
      case h: UnresolvedHaving =>
        h.child match {
          case agg: logical.Aggregate => having(h.havingCondition, agg, ctes)
          case other => throw Unsupported(s"HAVING over ${other.nodeName}")
        }
      case logical.Filter(cond, child) =>
        s"${rel(child, ctes)}\nwhere ${ex(cond)}"

      case agg: logical.Aggregate =>
        aggregateText(agg, ctes, havingText = None)

      case logical.Sort(order, true, child, _) =>
        s"${rel(child, ctes)}\norder by ${order.map(sortItem).mkString(", ")}"

      case logical.GlobalLimit(Literal(n, _), logical.LocalLimit(_, child)) =>
        s"${rel(child, ctes)}\nlimit $n"
      case logical.Offset(Literal(n, _), child) =>
        s"${rel(child, ctes)}\noffset $n"

      case logical.Distinct(logical.Project(items, child)) =>
        s"${rel(child, ctes)}\nselect distinct ${items.map(item).mkString(", ")}"
      case logical.Distinct(child) =>
        s"${rel(child, ctes)}\ndistinct"
      case logical.Deduplicate(_, child) =>
        s"${rel(child, ctes)}\ndedup"

      case p: logical.Pivot if p.groupByExprsOpt.isEmpty =>
        // SQL PIVOT → wv `pivot on col in (…) using agg` (both group by
        // every remaining column). wv pivot carries ONE aggregate.
        val aggText = p.aggregates match {
          case Seq(Alias(e, n)) => s"${ident(n)} = ${ex(e)}"
          case Seq(e) => ex(e)
          case _ => throw Unsupported("PIVOT with multiple aggregates")
        }
        val vals = p.pivotValues.map(ex).mkString(", ")
        s"${rel(p.child, ctes)}\npivot on ${ex(p.pivotColumn)} in ($vals) using $aggText"
      case _: logical.Pivot => throw Unsupported("PIVOT with explicit GROUP BY")

      case u: logical.Unpivot
          if u.ids.isEmpty && u.valueColumnNames.lengthCompare(1) == 0 &&
            u.values.exists(_.forall(_.lengthCompare(1) == 0)) &&
            u.aliases.forall(_.forall(_.isEmpty)) =>
        // SQL UNPIVOT → wv `unpivot valueCol for varCol in (cols)`. The
        // parser expresses default null-exclusion as an explicit
        // Filter(isnotnull(coalesce(value))) ABOVE this node, which the
        // generic Filter case prints as a `where` — INCLUDE NULLS simply
        // has no such filter, so both flavors round-trip.
        val cols = u.values.get.map(v => ex(v.head)).mkString(", ")
        s"${rel(u.child, ctes)}\nunpivot ${ident(u.valueColumnNames.head)} " +
          s"for ${ident(u.variableColumnName)} in ($cols)"
      case _: logical.Unpivot =>
        throw Unsupported("UNPIVOT with ids/aliases/multi-column value lists")

      case g: logical.Generate if !g.outer =>
        // LATERAL VIEW explode(e) lv AS c → wv `cross join unnest(e) as lv(c)`.
        // posexplode is excluded: its SQL-side `pos` column name has no wv
        // spelling (the wv ordinality form names it `<c>_ordinal`), so a
        // downstream reference to `pos` would break after transpile.
        val (fnName, fnArgs) = g.generator match {
          case u: UnresolvedGenerator => (u.name.funcName.toLowerCase, u.children)
          case f: UnresolvedFunction => (f.nameParts.last.toLowerCase, f.arguments)
          case other => throw Unsupported(s"generator ${other.getClass.getSimpleName}")
        }
        if (fnName != "explode" || fnArgs.lengthCompare(1) != 0 ||
            g.generatorOutput.lengthCompare(1) != 0)
          throw Unsupported(s"LATERAL VIEW $fnName")
        val colName = g.generatorOutput.head match {
          case a: UnresolvedAttribute => a.name
          case a => a.toString
        }
        val aliasTxt = g.qualifier.map(q => s" as ${ident(q)}(${ident(colName)})")
          .getOrElse(s" as __lv(${ident(colName)})")
        s"${rel(g.child, ctes)}\ncross join unnest(${ex(fnArgs.head)})$aliasTxt"

      case j: logical.Join => join(j, ctes)

      case u: logical.Union =>
        u.children.map(c => braced(c, ctes)).reduce((a, b) => s"$a\nconcat\n$b") match {
          case s if s.startsWith("{") =>
            // a pipeline can't START with a braced relation — open with from
            s"from $s"
          case s => s
        }
      case logical.Except(left, right, isAll) =>
        s"${rel(left, ctes)}\nexcept${if (isAll) " all" else ""}\n${braced(right, ctes)}"
      case logical.Intersect(left, right, isAll) =>
        s"${rel(left, ctes)}\nintersect${if (isAll) " all" else ""}\n${braced(right, ctes)}"

      case leaf @ (_: UnresolvedRelation | _: logical.SubqueryAlias |
          _: logical.LocalRelation | _: UnresolvedInlineTable |
          _: UnresolvedSubqueryColumnAliases) =>
        s"from ${fromItem(leaf, ctes)}"
      case other => throw Unsupported(s"relation ${other.nodeName}")
    }

  private def having(
      cond: Expression,
      agg: logical.Aggregate,
      ctes: scala.collection.mutable.Builder[String, List[String]]): String =
    aggregateText(agg, ctes, havingText = Some(ex(cond)))

  /** `group by keys [where having] select items` — the wv shape whose
    * lowering (Grouped + havings + projection) matches SQL's
    * GROUP BY/HAVING/SELECT exactly, with SQL's output column order. */
  private def aggregateText(
      agg: logical.Aggregate,
      ctes: scala.collection.mutable.Builder[String, List[String]],
      havingText: Option[String]): String = {
    val child = rel(agg.child, ctes)
    // GROUP BY 1 ordinals: substitute the referenced select item expression
    def keyAt(n: Int): Expression = agg.aggregateExpressions(n - 1) match {
      case Alias(e, _) => e
      case e => e
    }
    val keys = agg.groupingExpressions.map {
      case Literal(n: Int, _) if n >= 1 && n <= agg.aggregateExpressions.length => keyAt(n)
      case UnresolvedOrdinal(n) if n >= 1 && n <= agg.aggregateExpressions.length => keyAt(n)
      case e => e
    }
    val sb = new StringBuilder(child)
    if (keys.nonEmpty) {
      val styled = keys match {
        // children, not groupByExprs — the latter asserts resolution on an
        // unresolved plan
        case Seq(r: Rollup) => s"rollup ${r.children.map(ex).mkString(", ")}"
        case Seq(c: Cube) => s"cube ${c.children.map(ex).mkString(", ")}"
        case Seq(gs: GroupingSets) =>
          val sets = gs.groupingSets
            .map(s => s.map(ex).mkString("(", ", ", ")")).mkString(", ")
          s"grouping sets ($sets)"
        case ks if ks.exists(k => k.isInstanceOf[Rollup] || k.isInstanceOf[Cube] ||
          k.isInstanceOf[GroupingSets]) =>
          throw Unsupported("mixed/complex grouping sets")
        case ks => ks.map(ex).mkString(", ")
      }
      sb.append(s"\ngroup by $styled")
    }
    havingText.foreach(h => sb.append(s"\nwhere $h"))
    sb.append(s"\nselect ${agg.aggregateExpressions.map(item).mkString(", ")}")
    sb.toString
  }

  private def join(
      j: logical.Join,
      ctes: scala.collection.mutable.Builder[String, List[String]]): String = {
    val left = rel(j.left, ctes)
    val right = fromItem(j.right, ctes)
    def kw(tpe: JoinType): String = tpe match {
      case Inner => "join"
      case LeftOuter => "left join"
      case RightOuter => "right join"
      case FullOuter => "full join"
      case Cross => "cross join"
      case other => throw Unsupported(s"join type $other")
    }
    j.joinType match {
      case UsingJoin(tpe, cols) =>
        s"$left\n${kw(tpe)} $right using (${cols.map(ident).mkString(", ")})"
      case NaturalJoin(tpe) =>
        s"$left\nnatural ${kw(tpe)} $right"
      case Cross => s"$left\ncross join $right"
      case Inner if j.condition.isEmpty => s"$left\ncross join $right"
      case tpe =>
        val cond = j.condition.getOrElse(throw Unsupported("outer join without ON"))
        s"$left\n${kw(tpe)} $right on ${ex(cond)}"
    }
  }

  /** A relation usable after `from` / `join` / a set-op: a (qualified)
    * table name, a VALUES literal, or a braced subquery — each optionally
    * aliased. */
  private def fromItem(
      p: LogicalPlan,
      ctes: scala.collection.mutable.Builder[String, List[String]]): String = p match {
    case u: UnresolvedRelation => identPath(u.multipartIdentifier)
    case logical.SubqueryAlias(id, child) =>
      val alias = ident(id.name)
      child match {
        case u: UnresolvedRelation => s"${identPath(u.multipartIdentifier)} as $alias"
        case UnresolvedSubqueryColumnAliases(cols, inner) =>
          s"${valuesText(inner)} as $alias(${cols.map(ident).mkString(", ")})"
        case lr: logical.LocalRelation =>
          s"${valuesText(lr)} as $alias(${lr.output.map(a => ident(a.name)).mkString(", ")})"
        case inline: UnresolvedInlineTable =>
          s"${valuesText(inline)} as $alias(${inline.names.map(ident).mkString(", ")})"
        case sub => s"${braced(sub, ctes)} as $alias"
      }
    case lr: logical.LocalRelation =>
      s"${valuesText(lr)} as ${ident("t")}(${lr.output.map(a => ident(a.name)).mkString(", ")})"
    case other => braced(other, ctes)
  }

  private def braced(
      p: LogicalPlan,
      ctes: scala.collection.mutable.Builder[String, List[String]]): String =
    s"{\n${indent(rel(p, ctes))}\n}"

  /** VALUES rows as a wv inline-values literal `[[…], […]]`. */
  private def valuesText(p: LogicalPlan): String = p match {
    case lr: logical.LocalRelation =>
      val schema = lr.schema
      val rows = lr.data.map { row =>
        schema.fields.zipWithIndex.map { case (f, i) =>
          ex(Literal(row.get(i, f.dataType), f.dataType))
        }.mkString("[", ", ", "]")
      }
      rows.mkString("[", ", ", "]")
    case t: UnresolvedInlineTable =>
      t.rows.map(r => r.map(ex).mkString("[", ", ", "]")).mkString("[", ", ", "]")
    case other => throw Unsupported(s"VALUES shape ${other.nodeName}")
  }

  // -------------------------------------------------------------- expressions

  /** A select item: `name = expr` when aliased. */
  private def item(e: Expression): String = e match {
    case Alias(child, name) => s"${ident(name)} = ${ex(child)}"
    case UnresolvedAlias(child, _) => ex(child)
    case other => ex(other)
  }

  private def sortItem(s: SortOrder): String = {
    val dir = s.direction match {
      case Ascending => ""
      case Descending => " desc"
    }
    val nulls = (s.direction, s.nullOrdering) match {
      case (Ascending, NullsLast) => " nulls last"
      case (Descending, NullsFirst) => " nulls first"
      case _ => "" // engine default for the direction
    }
    // ORDER BY 1 — wv sort supports ordinals directly
    val key = s.child match {
      case UnresolvedOrdinal(n) => n.toString
      case c => ex(c)
    }
    s"$key$dir$nulls"
  }

  private def ex(e: Expression): String = e match {
    case a: UnresolvedAttribute => identPath(a.nameParts)
    case UnresolvedStar(target) => target.map(t => s"${identPath(t)}.*").getOrElse("*")
    case l: Literal => literal(l)
    // an alias in expression position (inside a function call, a grouping
    // key…) carries no meaning in wv — print the expression itself
    case Alias(child, _) => ex(child)

    case f: UnresolvedFunction => function(f)

    case And(l, r) => s"(${ex(l)} and ${ex(r)})"
    case Or(l, r) => s"(${ex(l)} or ${ex(r)})"
    case Not(EqualNullSafe(l, r)) => s"${ex(l)} is distinct from ${ex(r)}"
    case EqualNullSafe(l, r) => s"${ex(l)} is not distinct from ${ex(r)}"
    case Not(IsNull(c)) => s"${ex(c)} is not null"
    case Not(In(v, list)) => s"${ex(v)} not in (${list.map(ex).mkString(", ")})"
    case Not(c) => s"not (${ex(c)})"
    case IsNull(c) => s"${ex(c)} is null"
    case IsNotNull(c) => s"${ex(c)} is not null"
    case In(v, list) => s"${ex(v)} in (${list.map(ex).mkString(", ")})"
    case InSubquery(vals, q) =>
      if (vals.length != 1) throw Unsupported("tuple IN subquery")
      s"${ex(vals.head)} in { ${flat(q.plan)} }"
    case Like(l, r, '\\') => s"${ex(l)} like ${ex(r)}"
    case Like(_, _, _) => throw Unsupported("LIKE … ESCAPE")
    case RLike(l, r) => s"${ex(l)} rlike ${ex(r)}"

    case t: StringTrim =>
      t.trimStr match {
        case None => s"trim(${ex(t.srcStr)})"
        case Some(ts) => s"btrim(${ex(t.srcStr)}, ${ex(ts)})"
      }
    case t: StringTrimLeft =>
      t.trimStr match {
        case None => s"ltrim(${ex(t.srcStr)})"
        case Some(ts) => s"ltrim(${ex(ts)}, ${ex(t.srcStr)})"
      }
    case t: StringTrimRight =>
      t.trimStr match {
        case None => s"rtrim(${ex(t.srcStr)})"
        case Some(ts) => s"rtrim(${ex(ts)}, ${ex(t.srcStr)})"
      }
    case s: CreateNamedStruct =>
      s"named_struct(${s.children.map(ex).mkString(", ")})"

    case c: Cast =>
      val tpe = c.dataType.sql
      if (tpe.contains("<")) throw Unsupported(s"cast to $tpe")
      val fn = if (c.evalMode == EvalMode.TRY) "try_cast" else "cast"
      s"$fn(${ex(c.child)} as $tpe)"

    case CaseWhen(branches, elseValue) =>
      val whens = branches.map { case (c, v) => s"when ${ex(c)} then ${ex(v)}" }
      val els = elseValue.map(v => s" else ${ex(v)}").getOrElse("")
      s"case ${whens.mkString(" ")}$els end"

    case w: WindowExpression =>
      s"${ex(w.windowFunction)} over (${windowSpec(w.windowSpec)})"

    case l: LambdaFunction =>
      val args = l.arguments.map {
        case v: UnresolvedNamedLambdaVariable => v.nameParts.mkString(".")
        case other => throw Unsupported(s"lambda arg ${other.nodeName}")
      }
      val head = if (args.length == 1) args.head else args.mkString("(", ", ", ")")
      s"$head -> ${ex(l.function)}"
    case v: UnresolvedNamedLambdaVariable => v.nameParts.mkString(".")

    case UnresolvedExtractValue(child, Literal(name, org.apache.spark.sql.types.StringType)) =>
      s"${ex(child)}[${literal(Literal(name, org.apache.spark.sql.types.StringType))}]"
    case UnresolvedExtractValue(child, idx) => s"${ex(child)}[${ex(idx)}]"

    case s: org.apache.spark.sql.catalyst.expressions.ScalarSubquery =>
      s"(${flat(s.plan)})"
    case ex0: Exists => s"exists { ${flat(ex0.plan)} }"

    case s: SortOrder => sortItem(s)

    case b: BinaryOperator => s"(${ex(b.left)} ${b.symbol} ${ex(b.right)})"

    case other => throw Unsupported(s"expression ${other.nodeName} (${other.toString.take(60)})")
  }

  /** A subquery flattened onto one line (expression position). */
  private def flat(p: LogicalPlan): String = {
    val inner = List.newBuilder[String]
    val text = rel(p, inner)
    if (inner.result().nonEmpty) throw Unsupported("WITH inside an expression subquery")
    text.linesIterator.mkString(" ")
  }

  private def function(f: UnresolvedFunction): String = {
    if (f.ignoreNulls) throw Unsupported("IGNORE NULLS")
    if (f.orderingWithinGroup.nonEmpty) throw Unsupported("WITHIN GROUP ordering")
    // raw name — a function name is always followed by '(' so it cannot
    // collide with a pipe keyword, and backquoting would un-function it
    val name = f.nameParts.mkString(".")
    name.toLowerCase match {
      case "between" if f.arguments.length == 3 =>
        val Seq(v, lo, hi) = f.arguments
        s"${ex(v)} between ${ex(lo)} and ${ex(hi)}"
      case "extract" if f.arguments.length == 2 =>
        // parses as extract('FIELD', src); wv grammar wants the SQL form
        val field = f.arguments.head match {
          case Literal(s, org.apache.spark.sql.types.StringType) => s.toString.toLowerCase
          case other => throw Unsupported(s"extract field $other")
        }
        s"extract($field from ${ex(f.arguments(1))})"
      case _ =>
        val distinct = if (f.isDistinct) "distinct " else ""
        val args =
          if (f.arguments.isEmpty && name.equalsIgnoreCase("count")) "*"
          else f.arguments.map {
            // COUNT(1) = COUNT(*) — but COUNT(DISTINCT 1) counts the one
            // distinct constant, not distinct rows
            case Literal(1, org.apache.spark.sql.types.IntegerType)
                if name.equalsIgnoreCase("count") && f.arguments.length == 1 &&
                  !f.isDistinct => "*"
            case a => ex(a)
          }.mkString(", ")
        val filt = f.filter.map(c => s" filter (where ${ex(c)})").getOrElse("")
        s"$name($distinct$args)$filt"
    }
  }

  private def windowSpec(spec: WindowSpecDefinition): String = {
    val parts = List.newBuilder[String]
    if (spec.partitionSpec.nonEmpty)
      parts += s"partition by ${spec.partitionSpec.map(ex).mkString(", ")}"
    if (spec.orderSpec.nonEmpty)
      parts += s"order by ${spec.orderSpec.map(sortItem).mkString(", ")}"
    spec.frameSpecification match {
      case UnspecifiedFrame => ()
      case SpecifiedWindowFrame(frameType, lower, upper) =>
        val kind = frameType match {
          case RowFrame => "rows"
          case RangeFrame => "range"
        }
        def bound(b: Expression, side: String): String = b match {
          case UnboundedPreceding => "unbounded preceding"
          case UnboundedFollowing => "unbounded following"
          case CurrentRow => "current row"
          case Literal(n: Int, _) =>
            if (n < 0) s"${-n} preceding" else s"$n following"
          case Literal(n: Long, _) =>
            if (n < 0) s"${-n} preceding" else s"$n following"
          case other => throw Unsupported(s"window frame bound $other")
        }
        parts += s"$kind between ${bound(lower, "l")} and ${bound(upper, "u")}"
    }
    parts.result().mkString(" ")
  }

  private def literal(l: Literal): String = l.value match {
    case null => "null"
    case _: java.lang.Boolean => l.sql.toLowerCase
    case _ =>
      l.dataType match {
        case org.apache.spark.sql.types.StringType => l.sql
        case d: org.apache.spark.sql.types.DecimalType =>
          // the 1.5BD suffix form doesn't parse in wv; a cast keeps the type
          s"cast('${l.value}' as ${d.sql})"
        case org.apache.spark.sql.types.IntegerType |
            org.apache.spark.sql.types.LongType |
            org.apache.spark.sql.types.DoubleType |
            org.apache.spark.sql.types.FloatType |
            org.apache.spark.sql.types.ShortType |
            org.apache.spark.sql.types.ByteType => l.value.toString
        case t @ (org.apache.spark.sql.types.DateType |
            org.apache.spark.sql.types.TimestampType |
            org.apache.spark.sql.types.TimestampNTZType) =>
          // DATE '…' typed literals don't parse in wv — extract the quoted
          // text from the SQL form and cast it
          val quoted = l.sql.dropWhile(_ != '\'')
          s"cast($quoted as ${t.sql.toLowerCase})"
        case _: org.apache.spark.sql.types.DayTimeIntervalType |
            _: org.apache.spark.sql.types.YearMonthIntervalType =>
          l.sql // INTERVAL '…' form
        case other => throw Unsupported(s"literal of type $other")
      }
  }
}
