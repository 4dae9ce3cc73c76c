package graft.tools

/** Driver-side tool registry backing the language's
  * `call connector.tool(name: value, …)` relation (reference
  * relation.scala:1182-1205 + connector tool plumbing: the reference
  * resolves tools through profile connectors/MCP; here a tool is any
  * registered function from named arguments to a content string — the
  * invocation summary schema (connector, tool, status, content) is
  * identical, so queries and tests compose the same way).
  *
  * Tools run on the DRIVER, once per `call` site — they are invocation
  * endpoints (webhooks, catalog lookups, side-channel reads), not per-row
  * functions, so there is nothing to distribute.
  */
object ToolRegistry {

  /** A tool: named arguments → content string. Throwing marks the
    * invocation summary status "error" with the message as content. */
  type Tool = Map[String, Any] => String

  private val tools =
    scala.collection.concurrent.TrieMap[(String, String), Tool](
      // built-in demonstration connector
      ("local", "echo") ->
        (args => args.get("message").map(String.valueOf).getOrElse("")),
      ("local", "upper") ->
        (args => args.get("message").map(String.valueOf).getOrElse("").toUpperCase))

  def register(connector: String, tool: String)(fn: Tool): Unit =
    tools.put((connector.toLowerCase, tool.toLowerCase), fn)

  def lookup(connector: String, tool: String): Option[Tool] =
    tools.get((connector.toLowerCase, tool.toLowerCase))

  /** Invoke and summarize: (status, content). A missing tool and a thrown
    * exception both surface as an "error" row, not a query failure — the
    * reference pipes the summary through query operators and tests. */
  def invoke(connector: String, tool: String, args: Map[String, Any]): (String, String) =
    lookup(connector, tool) match {
      case None => ("error", s"tool not found: $connector.$tool")
      case Some(fn) =>
        try ("success", fn(args))
        catch { case e: Throwable => ("error", String.valueOf(e.getMessage)) }
    }
}
