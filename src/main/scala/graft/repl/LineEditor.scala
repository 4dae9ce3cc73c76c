package graft.repl

import scala.collection.mutable

/** Terminal line editor for the interactive REPL — the role JLine3 plays
  * in the reference CLI (wvlet-cli WvletREPL.scala + JLine3Terminal.scala),
  * built directly on the raw byte stream so the offline toolchain needs no
  * terminal dependency. Supports:
  *
  *   - cursor editing: left/right arrows, Home/End (and ctrl-A/ctrl-E),
  *     Backspace, Delete, ctrl-K (kill to end), ctrl-U (kill line),
  *     ctrl-W (delete word)
  *   - history: Up/Down recall over an in-memory ring, optionally
  *     persisted to a history file across sessions
  *   - completion: TAB calls the pluggable completer with (buffer, cursor);
  *     a unique candidate is inserted in place, multiple candidates print
  *     below the line, which is then redrawn
  *   - ctrl-D on an empty line = EOF; ctrl-C clears the line
  *
  * Rendering uses plain ANSI: the line is redrawn in place with
  * carriage-return + erase-to-end, and the cursor is positioned with a
  * relative left-move. Headless tests drive the editor with a scripted
  * byte stream and assert on the returned lines plus the history state —
  * the same keystroke path the terminal takes. */
final class LineEditor(
    in: java.io.InputStream,
    out: java.io.PrintStream,
    completer: (String, Int) => Seq[String] = (_, _) => Nil,
    historyFile: Option[java.nio.file.Path] = None,
    maxHistory: Int = 500
) {

  private val history = mutable.ArrayBuffer.empty[String]
  historyFile.foreach { p =>
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.readAllLines(p).asScala
        .filter(_.nonEmpty).takeRight(maxHistory).foreach(history += _)
    }
  }

  /** Lines accepted so far (oldest first) — exposed for :history and specs. */
  def historyLines: Seq[String] = history.toSeq

  private def saveHistory(): Unit = historyFile.foreach { p =>
    try {
      Option(p.getParent).foreach(java.nio.file.Files.createDirectories(_))
      java.nio.file.Files.writeString(p,
        history.takeRight(maxHistory).mkString("", "\n", "\n"))
    } catch { case _: Throwable => () }
  }

  /** Read one edited line. None = EOF (stream end, or ctrl-D on an empty
    * line). The returned line is recorded in history when non-blank.
    * `contextPrefix` is prepended to the buffer when asking the completer
    * — the REPL passes its multi-line statement buffer here so TAB sees
    * the whole pipeline (the schema of `from …` typed two lines ago), not
    * just the line being edited. */
  def readLine(prompt: String, contextPrefix: String = ""): Option[String] = {
    val buf = new StringBuilder
    var cursor = 0
    var histIdx = history.length // one past the end = the line being typed
    var stash = "" // the in-progress line while browsing history

    def redraw(): Unit = {
      out.print("\r" + prompt + buf.toString + "\u001b[K")
      val back = buf.length - cursor
      if (back > 0) out.print(s"\u001b[${back}D")
      out.flush()
    }

    def set(text: String): Unit = {
      buf.clear(); buf.append(text); cursor = text.length; redraw()
    }

    redraw()
    while (true) {
      val c = in.read()
      c match {
        case -1 =>
          return if (buf.isEmpty) None else accept(buf.toString)
        case 4 => // ctrl-D
          if (buf.isEmpty) { out.println(); return None }
          else if (cursor < buf.length) { buf.deleteCharAt(cursor); redraw() }
        case 3 => // ctrl-C clears the line
          buf.clear(); cursor = 0; out.println(); redraw()
        case '\r' | '\n' =>
          out.println()
          return accept(buf.toString)
        case 9 => // TAB — completion (completer returns FULL candidate
          // labels; the editor strips the already-typed partial word)
          val partial = {
            var i = cursor
            while (i > 0 && (buf.charAt(i - 1).isLetterOrDigit || buf.charAt(i - 1) == '_')) i -= 1
            buf.substring(i, cursor)
          }
          val cands = completer(contextPrefix + buf.toString, contextPrefix.length + cursor)
            .filter(c => partial.isEmpty || c.toLowerCase.startsWith(partial.toLowerCase))
          if (cands.size == 1) {
            val rest = cands.head.drop(partial.length)
            buf.insert(cursor, rest); cursor += rest.length; redraw()
          } else if (cands.size > 1) {
            out.println()
            out.println(cands.mkString("  "))
            redraw()
          }
        case 1 => cursor = 0; redraw() // ctrl-A
        case 5 => cursor = buf.length; redraw() // ctrl-E
        case 11 => buf.setLength(cursor); redraw() // ctrl-K
        case 21 => buf.clear(); cursor = 0; redraw() // ctrl-U
        case 23 => // ctrl-W delete word before cursor
          var i = cursor
          while (i > 0 && buf.charAt(i - 1).isWhitespace) i -= 1
          while (i > 0 && !buf.charAt(i - 1).isWhitespace) i -= 1
          buf.delete(i, cursor); cursor = i; redraw()
        case 127 | 8 => // backspace
          if (cursor > 0) { buf.deleteCharAt(cursor - 1); cursor -= 1; redraw() }
        case 27 => // ESC sequence
          in.read() match {
            case '[' =>
              // full CSI grammar: parameter bytes 0x30-0x3F (digits, ';'),
              // then one final byte 0x40-0x7E. Consuming the WHOLE sequence
              // keeps modifier forms (ctrl-arrow ESC[1;5C) from leaking
              // their tail bytes into the edit buffer as literal text.
              val params = new StringBuilder
              var fin = in.read()
              while (fin >= 0x30 && fin <= 0x3f) { params += fin.toChar; fin = in.read() }
              val p = params.toString
              fin match {
                case 'A' => // up: older history
                  if (histIdx > 0) {
                    if (histIdx == history.length) stash = buf.toString
                    histIdx -= 1; set(history(histIdx))
                  }
                case 'B' => // down: newer history / back to the stash
                  if (histIdx < history.length) {
                    histIdx += 1
                    set(if (histIdx == history.length) stash else history(histIdx))
                  }
                case 'C' => if (cursor < buf.length) { cursor += 1; redraw() }
                case 'D' => if (cursor > 0) { cursor -= 1; redraw() }
                case 'H' => cursor = 0; redraw()
                case 'F' => cursor = buf.length; redraw()
                case '~' => p match {
                  case "3" => // delete
                    if (cursor < buf.length) { buf.deleteCharAt(cursor); redraw() }
                  case "1" | "7" => cursor = 0; redraw() // home variants
                  case "4" | "8" => cursor = buf.length; redraw() // end variants
                  case _ => () // other ~-terminated keys: ignored, fully consumed
                }
                case _ => () // unknown final byte: sequence consumed, no-op
              }
            case _ => () // bare ESC — ignored
          }
        case ch if ch >= 0xc2 && ch <= 0xf4 =>
          // UTF-8 multibyte lead: read the continuation bytes and decode —
          // inserting raw bytes would mojibake every non-ASCII char
          val n = if (ch >= 0xf0) 3 else if (ch >= 0xe0) 2 else 1
          val bytes = new Array[Byte](n + 1)
          bytes(0) = ch.toByte
          var k = 0
          var ok = true
          while (k < n && ok) {
            val b = in.read()
            if (b < 0x80 || b > 0xbf) ok = false
            else { bytes(k + 1) = b.toByte; k += 1 }
          }
          if (ok) {
            val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
            buf.insert(cursor, s); cursor += s.length; redraw()
          }
        case ch if ch >= 32 && ch < 127 =>
          buf.insert(cursor, ch.toChar); cursor += 1; redraw()
        case _ => ()
      }
    }
    None // unreachable
  }

  private def accept(line: String): Option[String] = {
    if (line.trim.nonEmpty && !history.lastOption.contains(line)) {
      history += line
      if (history.length > maxHistory) history.remove(0, history.length - maxHistory)
      saveHistory()
    }
    Some(line)
  }
}
