package graft.lang

/** Markdown literate queries (the reference's MarkdownParser,
  * compiler/parser/MarkdownParser.scala + spec/markdown): a `.md` document
  * is a sequence of blocks; fenced code blocks tagged `wv` or `sql` are
  * executable query units, everything else is prose.
  *
  * Like the reference's CST design the parse is ROUNDTRIP-preserving: every
  * block keeps its raw source slice, and concatenating `raw` over the block
  * list reproduces the input byte-for-byte (the reference stores Spans and
  * re-extracts text; raw slices are the same contract without the source
  * file indirection).
  */
object Markdown {

  sealed trait Block { def raw: String }
  /** `#`..`######` heading. */
  final case class Heading(level: Int, text: String, raw: String) extends Block
  /** Fenced code block. `lang` is the info-string language (None for bare
    * fences); attrs are `key="value"` pairs after it (title=, highlight=). */
  final case class Code(
      lang: Option[String],
      attrs: Map[String, String],
      code: String,
      raw: String
  ) extends Block
  /** Prose run: paragraphs, lists, blockquotes, blank lines. */
  final case class Prose(raw: String) extends Block

  private val fenceOpen = """^```\s*([A-Za-z0-9_+-]*)\s*(.*)$""".r
  private val headingRe = """^(#{1,6})\s+(.*)$""".r
  private val attrRe = """([A-Za-z_][A-Za-z0-9_-]*)="([^"]*)"""".r

  def parse(text: String): List[Block] = {
    // keep line terminators so raw slices concatenate back to the input
    val lines = text.split("(?<=\n)", -1).toList match {
      case init :+ "" => init
      case all => all
    }
    val blocks = List.newBuilder[Block]
    val prose = new StringBuilder
    def flushProse(): Unit =
      if (prose.nonEmpty) { blocks += Prose(prose.toString); prose.clear() }
    var i = 0
    while (i < lines.length) {
      val line = lines(i)
      line.stripLineEnd match {
        case fenceOpen(lang, rest) =>
          flushProse()
          val body = new StringBuilder
          val rawB = new StringBuilder(line)
          var j = i + 1
          var closed = false
          while (j < lines.length && !closed) {
            rawB ++= lines(j)
            if (lines(j).stripLineEnd.trim == "```") closed = true
            else body ++= lines(j)
            j += 1
          }
          val attrs = attrRe.findAllMatchIn(rest)
            .map(m => m.group(1) -> m.group(2)).toMap
          blocks += Code(
            Option(lang).filter(_.nonEmpty).map(_.toLowerCase),
            attrs, body.toString, rawB.toString)
          i = j
        case headingRe(hashes, txt) =>
          flushProse()
          blocks += Heading(hashes.length, txt.trim, line)
          i += 1
        case _ =>
          prose ++= line
          i += 1
      }
    }
    flushProse()
    blocks.result()
  }

  /** The executable units of a document, in order: (lang, title?, code). */
  def queryBlocks(text: String): List[(String, Option[String], String)] =
    parse(text).collect {
      case Code(Some(l @ ("wv" | "sql")), attrs, code, _) =>
        (l, attrs.get("title"), code)
    }
}
