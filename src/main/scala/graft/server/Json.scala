package graft.server

/** Minimal dependency-free JSON codec for the server API. The toolchain has
  * no JSON library on the compile classpath (zero-egress build), and the
  * API's payloads are small control messages — a hand-rolled
  * recursive-descent parser and a string-building emitter cover the whole
  * surface. Numbers parse to Double (or Long when integral), objects to
  * Map[String, Any], arrays to Vector[Any], null to null.
  */
object Json {

  final class JsonParseException(msg: String) extends RuntimeException(msg)

  // ------------------------------------------------------------------ emit

  def quote(s: String): String = {
    val b = new StringBuilder(s.length + 8)
    b.append('"')
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case '\n' => b.append("\\n")
      case '\r' => b.append("\\r")
      case '\t' => b.append("\\t")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"')
    b.toString
  }

  /** Emit a JSON value: Map → object (insertion order), Seq → array,
    * String/Boolean/Number/null as themselves; everything else via
    * toString as a JSON string (timestamps, dates, decimals). */
  def write(v: Any): String = v match {
    case null | None => "null"
    case Some(x) => write(x)
    case m: scala.collection.Map[_, _] =>
      m.map { case (k, x) => s"${quote(String.valueOf(k))}:${write(x)}" }
        .mkString("{", ",", "}")
    case s: scala.collection.Seq[_] => s.map(write).mkString("[", ",", "]")
    case s: String => quote(s)
    case b: Boolean => b.toString
    case d: Double => if (d.isNaN || d.isInfinite) quote(d.toString) else d.toString
    case f: Float => write(f.toDouble)
    case n: Number => n.toString
    case other => quote(other.toString)
  }

  // ----------------------------------------------------------------- parse

  def parse(text: String): Any = {
    val p = new P(text)
    val v = p.value()
    p.ws()
    if (!p.eof) throw new JsonParseException(s"trailing input at ${p.pos}")
    v
  }

  def parseObject(text: String): Map[String, Any] = parse(text) match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case other => throw new JsonParseException(s"expected JSON object, got $other")
  }

  private final class P(s: String) {
    var pos = 0
    def eof: Boolean = pos >= s.length
    def ws(): Unit = while (!eof && s.charAt(pos).isWhitespace) pos += 1
    private def fail(msg: String): Nothing =
      throw new JsonParseException(s"$msg at offset $pos")
    private def expect(c: Char): Unit = {
      if (eof || s.charAt(pos) != c) fail(s"expected '$c'")
      pos += 1
    }
    def value(): Any = {
      ws()
      if (eof) fail("unexpected end of input")
      s.charAt(pos) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' => lit("true", java.lang.Boolean.TRUE)
        case 'f' => lit("false", java.lang.Boolean.FALSE)
        case 'n' => lit("null", null)
        case _ => num()
      }
    }
    private def lit(word: String, v: Any): Any = {
      if (!s.startsWith(word, pos)) fail(s"expected $word")
      pos += word.length; v
    }
    private def obj(): Map[String, Any] = {
      expect('{'); ws()
      val b = scala.collection.immutable.ListMap.newBuilder[String, Any]
      if (!eof && s.charAt(pos) == '}') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        ws()
        val k = str()
        ws(); expect(':')
        b += k -> value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect('}'); done = true }
      }
      b.result()
    }
    private def arr(): Vector[Any] = {
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (!eof && s.charAt(pos) == ']') { pos += 1; return b.result() }
      var done = false
      while (!done) {
        b += value()
        ws()
        if (!eof && s.charAt(pos) == ',') pos += 1
        else { expect(']'); done = true }
      }
      b.result()
    }
    private def str(): String = {
      expect('"')
      val b = new StringBuilder
      while (true) {
        if (eof) fail("unterminated string")
        s.charAt(pos) match {
          case '"' => pos += 1; return b.toString
          case '\\' =>
            pos += 1
            if (eof) fail("unterminated escape")
            s.charAt(pos) match {
              case '"' => b.append('"'); pos += 1
              case '\\' => b.append('\\'); pos += 1
              case '/' => b.append('/'); pos += 1
              case 'b' => b.append('\b'); pos += 1
              case 'f' => b.append('\f'); pos += 1
              case 'n' => b.append('\n'); pos += 1
              case 'r' => b.append('\r'); pos += 1
              case 't' => b.append('\t'); pos += 1
              case 'u' =>
                if (pos + 4 >= s.length) fail("truncated \\u escape")
                b.append(Integer.parseInt(s.substring(pos + 1, pos + 5), 16).toChar)
                pos += 5
              case c => fail(s"bad escape '\\$c'")
            }
          case c => b.append(c); pos += 1
        }
      }
      throw new IllegalStateException("unreachable")
    }
    private def num(): Any = {
      val start = pos
      if (!eof && (s.charAt(pos) == '-' || s.charAt(pos) == '+')) pos += 1
      while (!eof && (s.charAt(pos).isDigit || "eE+-.".indexOf(s.charAt(pos)) >= 0)) pos += 1
      val t = s.substring(start, pos)
      if (t.isEmpty) fail("expected value")
      try {
        if (t.forall(c => c.isDigit || c == '-' || c == '+')) java.lang.Long.valueOf(t)
        else java.lang.Double.valueOf(t)
      } catch { case _: NumberFormatException => fail(s"bad number '$t'") }
    }
  }
}
