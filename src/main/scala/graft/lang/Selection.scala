package graft.lang

/** Editor-style query selection (reference: QuerySelection enum,
  * wvlet-api/src/main/scala/wvlet/lang/api/v1/query/QuerySelection.scala,
  * consumed by QueryRequest.querySelection + linePosition): given a
  * compilation unit and a 1-based cursor line, slice the SOURCE TEXT to
  * execute. Working on text (via the parser's statement spans) rather than
  * re-printed ASTs keeps the executed query byte-identical to what the
  * user wrote.
  *
  *   - `all`       — the whole unit (default)
  *   - `single`    — the statement containing the cursor, with every
  *                   declaration statement (model/def/val/type/flow/…)
  *                   kept as context
  *   - `allbefore` — every statement up to and including the cursor's
  *   - `subquery`  — the cursor's statement truncated at the end of the
  *                   cursor line — pipe chains are prefix-valid, so this
  *                   runs the partial pipeline an editor cursor points at
  *                   (falls back to the whole statement if the prefix
  *                   doesn't parse, e.g. cursor inside a braced block)
  *   - `describe`  — same slice as `subquery`; the caller renders schema
  *                   instead of rows (QuerySelection.Describe)
  */
object Selection {

  def selectText(src: String, mode: String, line: Int): String = {
    val m = Option(mode).getOrElse("").trim.toLowerCase
    if (m.isEmpty || m == "all") return src
    val (stmts, spans) = Parser.parseStatementsWithSpans(src)
    if (stmts.isEmpty) return src
    val (ls, le) = lineRange(src, line)
    val idx = pickIndex(spans, ls, le)
    m match {
      case "single" => withDeclContext(src, stmts, spans, idx,
        src.substring(spans(idx)._1, spans(idx)._2).trim)
      case "allbefore" => src.substring(0, spans(idx)._2).trim
      case "subquery" | "describe" =>
        val (a, b) = spans(idx)
        val stop = math.max(a, math.min(le, b))
        val frag = src.substring(a, stop).trim
        val fragOk = frag.nonEmpty &&
          (try { Parser.parseStatements(frag); true }
           catch { case _: ParseException | _: ScannerException => false })
        withDeclContext(src, stmts, spans, idx,
          if (fragOk) frag else src.substring(a, b).trim)
      case other =>
        throw new ParseException(s"unknown querySelection '$other' " +
          "(expected all, single, allbefore, subquery, describe)")
    }
  }

  /** Declarations define names the selected statement may reference — keep
    * them all (the reference compiles the full unit and runs the selected
    * query; declarations are lazy, so carrying them is execution-free). */
  private def withDeclContext(src: String, stmts: List[Statement],
      spans: List[(Int, Int)], idx: Int, selected: String): String = {
    val decls = stmts.zip(spans).zipWithIndex.collect {
      case (((s, (a, b)), i)) if i != idx && isDecl(s) => src.substring(a, b).trim
    }
    (decls :+ selected).mkString("\n;\n")
  }

  private def isDecl(s: Statement): Boolean = s match {
    case _: ModelDef | _: ValDef | _: FuncDef | _: PartialDef |
        _: FlowDefStmt | _: TypeDefStmt | _: PackageDecl | _: ImportStmt => true
    case _ => false
  }

  /** Char offsets [start, endExclusive) of a 1-based source line. */
  private def lineRange(src: String, line: Int): (Int, Int) = {
    var start = 0
    var l = 1
    while (l < line && start < src.length) {
      val nl = src.indexOf('\n', start)
      if (nl < 0) return (src.length, src.length)
      start = nl + 1
      l += 1
    }
    val end = src.indexOf('\n', start)
    (start, if (end < 0) src.length else end)
  }

  /** First statement whose span intersects the cursor line; else the last
    * statement starting before the line's end; else the first. */
  private def pickIndex(spans: List[(Int, Int)], ls: Int, le: Int): Int = {
    val arr = spans.toArray
    var i = 0
    while (i < arr.length) {
      val (a, b) = arr(i)
      if (a < le + 1 && b > ls) return i
      i += 1
    }
    var last = 0
    i = 0
    while (i < arr.length) { if (arr(i)._1 <= le) last = i; i += 1 }
    last
  }
}
