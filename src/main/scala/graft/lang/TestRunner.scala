package graft.lang

import org.apache.spark.sql.DataFrame

final class TestFailure(msg: String) extends Exception(msg)

/** Evaluates in-query `test` assertions against a collected DataFrame
  * (reference: QueryExecutor.scala:943-993 — `should be / not be / contain`
  * over `_.columns`, `_.size`, `_.rows`). Driver-side by design: assertions
  * are a debugging aid over small results, never part of the data plan.
  */
object TestRunner {

  def check(df: DataFrame, assertion: Expr): Unit = assertion match {
    case FunctionCall(op, List(target, expected), _, _) if op.startsWith("__should_") =>
      val actual = evalTarget(df, target)
      val expectedV = evalExpected(expected)
      op match {
        case "__should_be" =>
          if (!valueEq(actual, expectedV))
            throw new TestFailure(s"expected $expectedV but got $actual")
        case "__should_not_be" =>
          if (valueEq(actual, expectedV))
            throw new TestFailure(s"expected not $expectedV but got $actual")
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

  private def evalTarget(df: DataFrame, target: Expr): Any = target match {
    case DotRef(Underscore, "columns") => df.columns.toList
    case DotRef(Underscore, "size") => df.count()
    case DotRef(Underscore, "rows") =>
      df.collect().toList.map(_.toSeq.toList)
    case MethodCall(Underscore, "size", Nil) => df.count()
    case other => throw new TestFailure(s"unsupported test target: $other")
  }

  private def evalExpected(e: Expr): Any = e match {
    case ArrayLit(items) => items.map(evalExpected)
    case other =>
      Lowering.constValue(other).getOrElse(
        throw new TestFailure(s"test expectation must be constant: $other"))
  }

  /** Loose equality with numeric coercion (reference `should be` coerces
    * int/long/double and string dates). */
  private def valueEq(a: Any, b: Any): Boolean = (a, b) match {
    case (null, null) => true
    case (null, _) | (_, null) => false
    case (x: Seq[_], y: Seq[_]) =>
      x.length == y.length && x.zip(y).forall { case (u, v) => valueEq(u, v) }
    case (x: Number, y: Number) =>
      math.abs(x.doubleValue() - y.doubleValue()) < 1e-9 ||
        x.doubleValue() == y.doubleValue()
    case (x, y) => x.toString == y.toString
  }
}
