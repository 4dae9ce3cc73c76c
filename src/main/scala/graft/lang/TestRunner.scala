package graft.lang

import org.apache.spark.sql.DataFrame

final class TestFailure(msg: String) extends Exception(msg)

/** Evaluates in-query `test` assertions against a collected DataFrame
  * (reference: QueryExecutor.scala:943-993 — `should be / not be / contain`
  * over `_.columns`, `_.size`, `_.rows`, `_.output`, `_.json`, plus bare
  * boolean assertions like `test 1 <= 2`). Driver-side by design: assertions
  * are a debugging aid over small results, never part of the data plan.
  */
object TestRunner {

  def check(df: DataFrame, assertion: Expr): Unit = assertion match {
    case FunctionCall("__assert", List(cond), _, _) =>
      if (!evalBool(df, cond))
        throw new TestFailure(s"assertion failed: $cond")
    case FunctionCall(op, List(target, expected), _, _) if op.startsWith("__should_") =>
      val isOutput = target == DotRef(Underscore, "output")
      val isJson = target == DotRef(Underscore, "json")
      val isRows = target == DotRef(Underscore, "rows")
      val actual = evalTarget(df, target)
      val expectedV = evalExpected(expected)
      def eq: Boolean =
        if (isOutput) outputEq(df, expectedV.asInstanceOf[String])
        else if (isRows && !hasGlobalSort(df)) (actual, expectedV) match {
          // Spark gives no row order without an explicit sort (parquet part
          // enumeration is not insertion order, unlike the reference's
          // single-node engines) — unordered plans compare as multisets
          case (a: List[_], e: List[_]) =>
            a.length == e.length && {
              val as = a.sortBy(_.toString)
              val es = e.sortBy(_.toString)
              as.zip(es).forall { case (x, y) => valueEq(x, y) }
            }
          case _ => valueEq(actual, expectedV)
        }
        else (isJson, expectedV) match {
          case (true, s: String) if s.linesIterator.size > 1 || actual.asInstanceOf[List[_]].length == 1 =>
            // `_.json should be """{…}\n{…}"""` — one JSON object per line
            val want = s.linesIterator.map(_.trim).filter(_.nonEmpty).toList
            val got = actual.asInstanceOf[List[String]]
            want.length == got.length &&
              want.zip(got).forall { case (w, g) => valueEq(g, w) }
          case _ => valueEq(actual, expectedV)
        }
      op match {
        case "__should_be" =>
          if (!eq) throw new TestFailure(s"expected $expectedV but got $actual")
        case "__should_not_be" =>
          if (eq) throw new TestFailure(s"expected not $expectedV but got $actual")
        case "__should_contain" =>
          actual match {
            case rows: List[_] if rows.exists(r => valueEq(r, expectedV)) => ()
            case _ => throw new TestFailure(s"$actual does not contain $expectedV")
          }
        case "__should_not_contain" =>
          actual match {
            case rows: List[_] =>
              if (rows.exists(r => valueEq(r, expectedV)))
                throw new TestFailure(s"$actual contains $expectedV")
            case other =>
              // a non-list target can never "not contain" meaningfully —
              // silent pass would hide a typo'd target
              throw new TestFailure(s"contain assertion requires a list target, got $other")
          }
        case other => throw new TestFailure(s"unknown assertion op $other")
      }
    case other => throw new TestFailure(s"unsupported test assertion: $other")
  }

  private def hasGlobalSort(df: DataFrame): Boolean =
    df.queryExecution.analyzed.collectFirst {
      case s: org.apache.spark.sql.catalyst.plans.logical.Sort if s.global => s
    }.isDefined

  /** Bare boolean assertion (`test 1 <= 2`, `test _.size = 3` handled as
    * __should_be upstream; this covers <, <=, >, >=, is-null, not). */
  private def evalBool(df: DataFrame, e: Expr): Boolean = e match {
    case BinaryOp(op, l, r) =>
      val (lv, rv) = (evalAny(df, l), evalAny(df, r))
      op match {
        case "=" => valueEq(lv, rv)
        case "!=" | "<>" => !valueEq(lv, rv)
        case "<" | "<=" | ">" | ">=" =>
          (lv, rv) match {
            case (a: Number, b: Number) =>
              val c = java.lang.Double.compare(a.doubleValue(), b.doubleValue())
              op match {
                case "<" => c < 0; case "<=" => c <= 0
                case ">" => c > 0; case _ => c >= 0
              }
            case (a, b) if a != null && b != null =>
              val c = a.toString.compareTo(b.toString)
              op match {
                case "<" => c < 0; case "<=" => c <= 0
                case ">" => c > 0; case _ => c >= 0
              }
            case _ => false
          }
        case "and" => evalBool(df, l) && evalBool(df, r)
        case "or" => evalBool(df, l) || evalBool(df, r)
        case other => throw new TestFailure(s"unsupported assertion operator: $other")
      }
    case Not(x) => !evalBool(df, x)
    case IsNull(x, negated) =>
      val v = evalAny(df, x)
      if (negated) v != null else v == null
    case other => throw new TestFailure(s"unsupported assertion expression: $other")
  }

  private def evalAny(df: DataFrame, e: Expr): Any = e match {
    case DotRef(Underscore, _) | MethodCall(Underscore, _, _) => evalTarget(df, e)
    case other =>
      Lowering.constValue(other).getOrElse(
        throw new TestFailure(s"assertion operand must be constant or a _ accessor: $other"))
  }

  private def evalTarget(df: DataFrame, target: Expr): Any = target match {
    case DotRef(Underscore, "columns") => df.columns.toList
    case DotRef(Underscore, "size") => df.count()
    case DotRef(Underscore, "rows") =>
      df.collect().toList.map(_.toSeq.toList)
    case DotRef(Underscore, "json") =>
      df.toJSON.collect().toList
    case DotRef(Underscore, "output") =>
      df // compared structurally by outputEq
    case MethodCall(Underscore, "size", Nil) => df.count()
    case other =>
      // `test 1 = 1` style: the "target" side may itself be a constant
      Lowering.constValue(other).getOrElse(
        throw new TestFailure(s"unsupported test target: $other"))
  }

  private def evalExpected(e: Expr): Any = e match {
    case ArrayLit(items) => items.map(evalExpected)
    case other =>
      Lowering.constValue(other).getOrElse(
        throw new TestFailure(s"test expectation must be constant: $other"))
  }

  /** Structural comparison of a rendered result table (the reference's
    * `_.output should be """┌──┐…"""` form): cell values and column headers
    * are extracted from the box drawing and compared as display strings —
    * robust to box-art width/alignment differences between engines. */
  private def outputEq(df: DataFrame, expected: String): Boolean = {
    val allLines = expected.linesIterator
      .map(_.trim)
      .filter(l => l.startsWith("│") || l.startsWith("|"))
      .map(_.split("[│|]").map(_.trim).filter(_.nonEmpty).toList)
      .filter(_.nonEmpty)
      .toList
    // the "N rows" footer asserts the total row count (reference:
    // spec/neg/test-failure.wv — a count mismatch must be detected)
    val footerCount = allLines.collectFirst {
      case cells if cells.length == 1 && cells.head.matches("\\d+ rows?.*") =>
        cells.head.takeWhile(_.isDigit).toLong
    }
    val cellLines = allLines
      .filterNot(cells => cells.length == 1 && cells.head.matches("\\d+ rows?.*"))
    if (footerCount.exists(_ != df.count())) return false
    if (cellLines.isEmpty) return df.count() == 0
    val header = cellLines.head
    // the reference renderer prints a type row under the header
    val body0 = cellLines.tail
    val body =
      if (body0.nonEmpty && body0.head.forall(t =>
        Set("string", "long", "int", "double", "float", "boolean", "date",
          "timestamp", "decimal", "binary", "array", "struct", "map").exists(t.startsWith)))
        body0.tail
      else body0
    val actualHeader = df.columns.toList
    val actualRows = df.collect().toList.map(_.toSeq.map(render).toList)
    actualHeader == header && actualRows == body
  }

  private def render(v: Any): String = v match {
    case null => "NULL"
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, vv) => s"$k=$vv" }.mkString("{", ", ", "}")
    case d: Double if d == d.floor && !d.isInfinite && math.abs(d) < 1e15 =>
      // engines render integral doubles differently; normalize to x.0
      val s = d.toString
      if (s.endsWith(".0")) s else s + ".0"
    case other => other.toString
  }

  /** Loose equality with numeric coercion (reference `should be` coerces
    * int/long/double and string dates) and order-insensitive JSON-object
    * comparison for string operands that parse as JSON. */
  private def valueEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
      // mutable.ArraySeq (Row cell values) and immutable List (expectations)
      // both count as sequences
      x.length == y.length &&
        x.iterator.zip(y.iterator).forall { case (u, v) => valueEq(u, v) }
    case (x: Number, y: Number) =>
      math.abs(x.doubleValue() - y.doubleValue()) < 1e-9 ||
        x.doubleValue() == y.doubleValue()
    case (x: String, y: String)
        if x.trim.startsWith("{") && y.trim.startsWith("{") =>
      jsonEq(x, y) || x == y
    case (x, y) => x.toString == y.toString
  }

  private lazy val jsonMapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Field-order-insensitive JSON equality (JSON objects are unordered maps;
    * engines serialize fields in different orders). */
  private def jsonEq(a: String, b: String): Boolean =
    try jsonMapper.readTree(a) == jsonMapper.readTree(b)
    catch { case _: Throwable => false }
}
