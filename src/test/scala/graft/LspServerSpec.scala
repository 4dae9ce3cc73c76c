package graft

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.nio.charset.StandardCharsets.UTF_8
import graft.server.Json

/** Drives the stdio LSP endpoint with Content-Length framed JSON-RPC
  * byte streams end-to-end (framing + dispatch + providers). */
class LspServerSpec extends SparkTestBase {

  private def frame(msg: Map[String, Any]): Array[Byte] = {
    val body = Json.write(msg).getBytes(UTF_8)
    s"Content-Length: ${body.length}\r\n\r\n".getBytes(UTF_8) ++ body
  }

  /** Run a framed conversation; returns the decoded response bodies. */
  private def converse(msgs: Seq[Map[String, Any]]): Seq[Map[String, Any]] = {
    val in = new ByteArrayInputStream(msgs.flatMap(m => frame(m).toSeq).toArray)
    val out = new ByteArrayOutputStream()
    val session = new LspServer.Session("/root/testdata/sf0.001", ".")
    LspServer.serve(in, out, session)
    // decode every framed response
    val bytes = out.toByteArray
    val text = new String(bytes, UTF_8)
    val re = "(?s)Content-Length: (\\d+)\r\n\r\n".r
    val res = scala.collection.mutable.ListBuffer.empty[Map[String, Any]]
    var i = 0
    while (i < text.length) {
      re.findFirstMatchIn(text.substring(i)) match {
        case Some(m) =>
          val start = i + m.end
          val len = m.group(1).toInt
          res += Json.parseObject(text.substring(start, start + len))
          i = start + len
        case None => i = text.length
      }
    }
    res.toList
  }

  private val uri = "file:///tmp/test.wv"
  private def open(text: String) = Map(
    "jsonrpc" -> "2.0", "method" -> "textDocument/didOpen",
    "params" -> Map("textDocument" -> Map("uri" -> uri, "text" -> text)))
  private def pos(line: Int, ch: Int) = Map("line" -> line, "character" -> ch)

  test("initialize advertises capabilities; unknown methods error; exit ends the loop") {
    val rs = converse(Seq(
      Map("jsonrpc" -> "2.0", "id" -> 1, "method" -> "initialize", "params" -> Map()),
      Map("jsonrpc" -> "2.0", "id" -> 2, "method" -> "no/such", "params" -> Map()),
      Map("jsonrpc" -> "2.0", "method" -> "exit"),
      // after exit nothing is processed
      Map("jsonrpc" -> "2.0", "id" -> 3, "method" -> "initialize", "params" -> Map())))
    assert(rs.length == 2)
    val caps = rs(0)("result").asInstanceOf[Map[String, Any]]("capabilities")
      .asInstanceOf[Map[String, Any]]
    assert(caps("definitionProvider") == true && caps("hoverProvider") == true)
    val err = rs(1)("error").asInstanceOf[Map[String, Any]]
    assert(err("message").toString.contains("no/such"))
  }

  test("definition over didOpen state returns an LSP Location") {
    val src = "model m = {\n  from lineitem\n}\nfrom m"
    val rs = converse(Seq(
      open(src),
      Map("jsonrpc" -> "2.0", "id" -> 1, "method" -> "textDocument/definition",
        "params" -> Map("textDocument" -> Map("uri" -> uri),
          "position" -> pos(3, 5))), // cursor on the `m` reference (0-based)
      Map("jsonrpc" -> "2.0", "method" -> "exit")))
    val loc = rs(0)("result").asInstanceOf[Map[String, Any]]
    assert(loc("uri") == uri)
    val start = loc("range").asInstanceOf[Map[String, Any]]("start")
      .asInstanceOf[Map[String, Any]]
    assert(start("line") == 0L || start("line") == 0)
  }

  test("hover and completion serve through the protocol, didChange updates state") {
    val v1 = "from orders\nselect o_totalprice"
    val v2 = "from lineitem\nselect l_quantity"
    val rs = converse(Seq(
      open(v1),
      Map("jsonrpc" -> "2.0", "id" -> 1, "method" -> "textDocument/hover",
        "params" -> Map("textDocument" -> Map("uri" -> uri),
          "position" -> pos(1, 8))),
      Map("jsonrpc" -> "2.0", "method" -> "textDocument/didChange",
        "params" -> Map("textDocument" -> Map("uri" -> uri),
          "contentChanges" -> Seq(Map("text" -> v2)))),
      Map("jsonrpc" -> "2.0", "id" -> 2, "method" -> "textDocument/hover",
        "params" -> Map("textDocument" -> Map("uri" -> uri),
          "position" -> pos(1, 8))),
      Map("jsonrpc" -> "2.0", "id" -> 3, "method" -> "textDocument/completion",
        "params" -> Map("textDocument" -> Map("uri" -> uri),
          "position" -> pos(1, 9))), // after "select l_"
      Map("jsonrpc" -> "2.0", "method" -> "exit")))
    def hoverText(r: Map[String, Any]): String =
      r("result").asInstanceOf[Map[String, Any]]("contents")
        .asInstanceOf[Map[String, Any]]("value").toString
    assert(hoverText(rs(0)).contains("o_totalprice: double"))
    assert(hoverText(rs(1)).contains("l_quantity: double"))
    val items = rs(2)("result").asInstanceOf[Seq[Map[String, Any]]]
    assert(items.exists(_("label") == "l_quantity"))
    assert(items.forall(_("label").toString.startsWith("l_")))
  }
}
