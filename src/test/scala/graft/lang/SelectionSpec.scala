package graft.lang

import org.scalatest.funsuite.AnyFunSuite

/** Editor query selection (reference QuerySelection: Single / Subquery /
  * Describe / AllBefore / All + linePosition). Pure text-level — spans come
  * from the parser, no Spark session needed. */
class SelectionSpec extends AnyFunSuite {

  private val unit =
    """model big = {
      |  from orders
      |  where o_totalprice > 1000
      |}
      |
      |from big
      |group by o_orderstatus
      |agg n = _.count
      |
      |from region
      |select r_name
      |""".stripMargin
  // line numbers: 1-4 model, 6-8 first query, 10-11 second query

  test("all returns the unit unchanged") {
    assert(Selection.selectText(unit, "all", 7) == unit)
  }

  test("single picks the statement under the cursor, keeping declarations") {
    val s = Selection.selectText(unit, "single", 7)
    assert(s.contains("model big"))
    assert(s.contains("group by o_orderstatus"))
    assert(!s.contains("from region"))
    val s2 = Selection.selectText(unit, "single", 10)
    assert(s2.contains("model big")) // declarations always in scope
    assert(s2.contains("from region") && !s2.contains("group by"))
  }

  test("allbefore keeps everything up to and including the cursor statement") {
    val s = Selection.selectText(unit, "allbefore", 7)
    assert(s.contains("model big") && s.contains("agg n"))
    assert(!s.contains("from region"))
  }

  test("subquery truncates the pipe chain at the cursor line") {
    val s = Selection.selectText(unit, "subquery", 7)
    assert(s.contains("group by o_orderstatus"))
    assert(!s.contains("agg n")) // line 8 cut off
    // and the fragment must itself be parseable
    Parser.parseStatements(s)
  }

  test("subquery inside a braced block falls back to the whole statement") {
    val s = Selection.selectText(unit, "subquery", 2) // inside model body
    assert(s.contains("model big") && s.contains("}"))
    Parser.parseStatements(s)
  }

  test("cursor on a blank/trailing line resolves to the nearest statement") {
    val s = Selection.selectText(unit, "single", 5) // blank line between stmts
    assert(s.nonEmpty)
    Parser.parseStatements(s)
    val tail = Selection.selectText(unit, "single", 99) // past EOF
    assert(tail.contains("from region"))
  }

  test("unknown selection mode raises a parse error") {
    intercept[ParseException] { Selection.selectText(unit, "nope", 1) }
  }
}
