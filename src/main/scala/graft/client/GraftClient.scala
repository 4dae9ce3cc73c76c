package graft.client

import graft.server.Json
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets.UTF_8
import java.time.Duration

/** Typed Scala client for the graft HTTP query server — the Spark-native
  * analogue of the reference's `wvlet-client` module (reference
  * wvlet-client/src/main/scala/wvlet/lang/api/v1/frontend/FrontendRPC.scala:
  * one aggregated client object exposing `FrontendApi` / `FileApi` /
  * `FlowApi` method groups over a shared HTTP transport; per-service
  * methods in client/FrontendApiClient.scala:32-46, FileApiClient.scala,
  * FlowApiClient.scala). Same WHAT, different HOW: the reference generates
  * RPC stubs over its own uni-http client; here the JDK's
  * `java.net.http.HttpClient` (zero added dependencies) calls the JSON
  * endpoints of [[graft.server.Server]] directly, and responses decode into
  * small case classes via the same dependency-free [[graft.server.Json]]
  * codec the server emits with.
  *
  * The reference's submitQuery/getQueryInfo split (async submit returning an
  * id, results polled and paged separately) is preserved verbatim;
  * [[GraftClient.runQuery]] adds the obvious convenience loop (submit →
  * poll → drain pages) that reference consumers hand-roll.
  */
object GraftClient {

  final case class ServerStatus(version: String, upTimeMs: Long)

  final case class Column(name: String, typeName: String)

  /** One `getQueryInfo` page plus the query's terminal metadata. `rows` holds
    * the rows of THIS page (or, from [[GraftClient.runQuery]], all pages
    * drained); values decode as the JSON scalars the server emitted
    * (Long/Double/String/Boolean/null; binary columns arrive Base64-encoded,
    * matching the server's encoding contract). */
  final case class QueryInfo(
      queryId: String,
      status: String, // running | finished | failed | cancelled
      schema: Seq[Column],
      rows: Seq[Seq[Any]],
      totalRows: Long,
      truncated: Boolean,
      pageToken: String,
      error: Option[String],
      createdAt: String,
      completedAt: Option[String]) {
    def isTerminal: Boolean = status != "running"
  }

  final case class FlowRunSummary(
      runId: String,
      flowName: String,
      state: String,
      startedAtMillis: Long,
      finishedAtMillis: Long,
      runTimeMillis: Long)

  final case class FlowStage(name: String, state: String, attempts: Long, error: Option[String])

  final case class FlowRun(summary: FlowRunSummary, stages: Seq[FlowStage])

  final case class FileEntry(
      name: String,
      path: String,
      exists: Boolean,
      isDirectory: Boolean,
      size: Long,
      lastUpdatedAtMillis: Long,
      content: Option[String])

  final case class SourceRange(
      startLine: Long, startColumn: Long, endLine: Long, endColumn: Long,
      path: Option[String])

  final case class Hover(text: String, range: SourceRange)

  final case class CompletionItem(label: String, kind: String, detail: String)

  /** Non-2xx response: HTTP status + the server's `error` message. */
  final class RpcException(val code: Int, message: String)
      extends RuntimeException(s"HTTP $code: $message")

  def connect(baseUrl: String): GraftClient = new GraftClient(baseUrl)
}

final class GraftClient(
    baseUrl: String,
    requestTimeout: Duration = Duration.ofMinutes(2)
) extends AutoCloseable {
  import GraftClient._

  private val base = baseUrl.stripSuffix("/")
  private val http = HttpClient.newBuilder()
    .connectTimeout(Duration.ofSeconds(10))
    .build()

  // ------------------------------------------------------------- transport

  private def call(method: String, path: String, body: Option[String] = None): Map[String, Any] = {
    val b = HttpRequest.newBuilder(URI.create(s"$base$path")).timeout(requestTimeout)
    val req = (body match {
      case Some(j) => b.header("Content-Type", "application/json")
        .method(method, HttpRequest.BodyPublishers.ofString(j, UTF_8))
      case None => b.method(method, HttpRequest.BodyPublishers.noBody())
    }).build()
    val resp = http.send(req, HttpResponse.BodyHandlers.ofString(UTF_8))
    val parsed =
      try Json.parseObject(resp.body())
      catch { case _: Json.JsonParseException => Map("error" -> resp.body()) }
    if (resp.statusCode() >= 400)
      throw new RpcException(resp.statusCode(), parsed.get("error") match {
        case Some(s: String) => s
        case other => String.valueOf(other.orNull)
      })
    parsed
  }

  private def str(m: Map[String, Any], k: String): String = m.get(k) match {
    case Some(s: String) => s
    case Some(other) if other != null => other.toString
    case _ => ""
  }
  private def lng(m: Map[String, Any], k: String): Long = m.get(k) match {
    case Some(n: Number) => n.longValue()
    case _ => 0L
  }
  private def bool(m: Map[String, Any], k: String): Boolean = m.get(k) match {
    case Some(b: Boolean) => b
    case _ => false
  }
  private def opt(m: Map[String, Any], k: String): Option[String] = m.get(k) match {
    case Some(s: String) => Some(s)
    case _ => None
  }
  private def objs(m: Map[String, Any], k: String): Seq[Map[String, Any]] = m.get(k) match {
    case Some(xs: Seq[_]) => xs.collect { case o: Map[_, _] => o.asInstanceOf[Map[String, Any]] }
    case _ => Nil
  }

  // ---------------------------------------------- FrontendApi (query RPCs)

  /** `GET /api/v1/status` (reference FrontendApiClient.status). */
  def status(): ServerStatus = {
    val m = call("GET", "/api/v1/status")
    ServerStatus(str(m, "version"), lng(m, "upTimeMs"))
  }

  /** Async submit; returns the queryId immediately (reference
    * FrontendApiClient.submitQuery → QueryResponse.queryId). `sessionId`
    * scopes def/model/val state per client; `querySelection`/`line` are the
    * editor-selection surface (single/subquery/describe/allbefore). */
  def submitQuery(
      query: String,
      maxRows: Int = 1000,
      sessionId: String = "",
      querySelection: String = "all",
      line: Int = 1): String = {
    val payload = Map(
      "query" -> query, "maxRows" -> maxRows, "sessionId" -> sessionId,
      "querySelection" -> querySelection, "line" -> line)
    str(call("POST", "/api/v1/query", Some(Json.write(payload))), "queryId")
  }

  /** One status/result page (reference FrontendApiClient.getQueryInfo with
    * QueryInfoRequest.pageToken). */
  def getQueryInfo(queryId: String, pageToken: String = ""): QueryInfo = {
    val q = if (pageToken.nonEmpty) s"?pageToken=$pageToken" else ""
    decodeInfo(call("GET", s"/api/v1/query/$queryId$q"))
  }

  private def decodeInfo(m: Map[String, Any]): QueryInfo = QueryInfo(
    queryId = str(m, "queryId"),
    status = str(m, "status"),
    schema = objs(m, "schema").map(c => Column(str(c, "name"), str(c, "typeName"))),
    rows = m.get("rows") match {
      case Some(xs: Seq[_]) => xs.collect { case r: Seq[_] => r.toSeq }
      case _ => Nil
    },
    totalRows = lng(m, "totalRows"),
    truncated = bool(m, "truncated"),
    pageToken = str(m, "pageToken"),
    error = opt(m, "error"),
    createdAt = str(m, "createdAt"),
    completedAt = opt(m, "completedAt"))

  /** Cancel a running query (`DELETE /api/v1/query/{id}`). Returns true if
    * this call performed the cancellation, false if the query was already in
    * a terminal state (the server's 409). */
  def cancelQuery(queryId: String): Boolean =
    try { call("DELETE", s"/api/v1/query/$queryId"); true }
    catch { case e: RpcException if e.code == 409 => false }

  /** Submit, poll to a terminal state, drain every result page. Polling is
    * client-side by design — the server's submit/poll split is the scale
    * posture (no held connections, bounded pages) and this loop is the
    * convenience the reference leaves to consumers. */
  def runQuery(
      query: String,
      maxRows: Int = 1000,
      sessionId: String = "",
      querySelection: String = "all",
      line: Int = 1,
      pollInterval: Duration = Duration.ofMillis(200),
      timeout: Duration = Duration.ofMinutes(5)): QueryInfo = {
    val id = submitQuery(query, maxRows, sessionId, querySelection, line)
    val deadline = System.nanoTime() + timeout.toNanos
    var info = getQueryInfo(id)
    while (!info.isTerminal && System.nanoTime() < deadline) {
      Thread.sleep(pollInterval.toMillis)
      info = getQueryInfo(id)
    }
    if (!info.isTerminal)
      throw new RpcException(408, s"query $id still running after $timeout")
    var all = info.rows
    var token = info.pageToken
    while (token.nonEmpty) {
      val page = getQueryInfo(id, token)
      all = all ++ page.rows
      token = page.pageToken
    }
    info.copy(rows = all, pageToken = "")
  }

  // --------------------------------------------------------------- FlowApi

  /** `GET /api/v1/flows` (reference FlowApiClient.listRuns). */
  def listFlowRuns(flowName: Option[String] = None, limit: Int = 100): Seq[FlowRunSummary] = {
    val qs = flowName.map(n =>
      s"flowName=${java.net.URLEncoder.encode(n, "UTF-8")}&").getOrElse("") + s"limit=$limit"
    objs(call("GET", s"/api/v1/flows?$qs"), "runs").map(decodeRunSummary)
  }

  /** `GET /api/v1/flows/{runId}` (reference FlowApiClient.getRun). */
  def getFlowRun(runId: String): FlowRun = {
    val m = call("GET", s"/api/v1/flows/$runId")
    FlowRun(decodeRunSummary(m), objs(m, "stages").map(s =>
      FlowStage(str(s, "name"), str(s, "state"), lng(s, "attempts"), opt(s, "error"))))
  }

  private def decodeRunSummary(m: Map[String, Any]): FlowRunSummary = FlowRunSummary(
    runId = str(m, "runId"), flowName = str(m, "flowName"), state = str(m, "state"),
    startedAtMillis = lng(m, "startedAtMillis"),
    finishedAtMillis = lng(m, "finishedAtMillis"),
    runTimeMillis = lng(m, "runTimeMillis"))

  // --------------------------------------------------------------- FileApi

  /** List a workspace directory: sub-directories + `.wv` scripts (reference
    * FileApiClient.listFiles). */
  def listFiles(path: String = ""): Seq[FileEntry] = {
    val qs = if (path.isEmpty) "" else s"?path=${java.net.URLEncoder.encode(path, "UTF-8")}"
    objs(call("GET", s"/api/v1/files$qs"), "entries").map(decodeFile)
  }

  /** Read one workspace file with content (reference FileApiClient.getFile). */
  def readFile(path: String): FileEntry =
    decodeFile(call("GET", s"/api/v1/files/read?path=${java.net.URLEncoder.encode(path, "UTF-8")}"))

  private def decodeFile(m: Map[String, Any]): FileEntry = FileEntry(
    name = str(m, "name"), path = str(m, "path"), exists = bool(m, "exists"),
    isDirectory = bool(m, "isDirectory"), size = lng(m, "size"),
    lastUpdatedAtMillis = lng(m, "lastUpdatedAtMillis"), content = opt(m, "content"))

  // ------------------------------------------------- compiler-service RPCs

  /** SQL → wv (`wvlet transpile`, SURVEY §3.3). */
  def transpile(sql: String): String =
    str(call("POST", "/api/v1/transpile", Some(Json.write(Map("sql" -> sql)))), "query")

  /** wv → Spark SQL (the `wvlet compile -t` codegen direction). */
  def toSql(query: String): String =
    str(call("POST", "/api/v1/to_sql", Some(Json.write(Map("query" -> query)))), "sql")

  /** Canonical-form formatter (`wvlet fmt`). */
  def fmt(query: String): String =
    str(call("POST", "/api/v1/fmt", Some(Json.write(Map("query" -> query)))), "formatted")

  /** Offline compile check — the WvcLib compile_query_json envelope verbatim
    * (graft.CompileApi; throws RpcException(400) with the envelope's error
    * for invalid queries). */
  def compile(query: String): Map[String, Any] =
    call("POST", "/api/v1/compile", Some(Json.write(Map("query" -> query))))

  // -------------------------------------------------------- editor services

  private def lspCall(op: String, text: String, offset: Int): Map[String, Any] =
    call("POST", "/api/v1/lsp", Some(Json.write(Map(
      "op" -> op, "text" -> text, "offset" -> offset))))

  private def decodeRange(m: Map[String, Any]): SourceRange = SourceRange(
    lng(m, "startLine"), lng(m, "startColumn"),
    lng(m, "endLine"), lng(m, "endColumn"), opt(m, "path"))

  /** Definition lookup at a 1-based char offset; None when the symbol has no
    * definition in the buffer or workspace. */
  def definition(text: String, offset: Int): Option[SourceRange] = {
    val m = lspCall("definition", text, offset)
    if (m.get("found").contains(false)) None else Some(decodeRange(m))
  }

  /** Hover info (type/docs) at a 1-based char offset. */
  def hover(text: String, offset: Int): Option[Hover] = {
    val m = lspCall("hover", text, offset)
    if (m.get("found").contains(false)) None
    else Some(Hover(str(m, "text"), decodeRange(m)))
  }

  /** Completion items at a 1-based char offset. */
  def complete(text: String, offset: Int): Seq[CompletionItem] =
    objs(lspCall("complete", text, offset), "items").map(i =>
      CompletionItem(str(i, "label"), str(i, "kind"), str(i, "detail")))

  override def close(): Unit = () // JDK HttpClient owns no closable resources pre-21
}
