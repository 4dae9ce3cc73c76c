"""HTTP client for the Graft query server.

Endpoints used (see graft/server/Server.scala for the server side):

- ``GET  /api/v1/status``                 — version + uptime
- ``POST /api/v1/query``                  — submit; returns ``{queryId}``
- ``GET  /api/v1/query/{id}?pageToken=N`` — status + schema + a page of rows
- ``DELETE /api/v1/query/{id}``           — cancel a running query
- ``POST /api/v1/to_sql``                 — wv text → Spark SQL text
- ``POST /api/v1/compile``                — compile-check envelope (JSON)
- ``POST /api/v1/transpile``              — SQL → wv text
- ``POST /api/v1/fmt``                    — canonical formatter

Pure stdlib (urllib); no third-party dependencies, matching the reference
SDK's zero-dependency contract.
"""

import json
import os
import time
import urllib.error
import urllib.request

DEFAULT_ENDPOINT = "http://127.0.0.1:9876"


class RpcError(Exception):
    """A non-2xx response from the server.

    Attributes
    ----------
    status : int
        HTTP status code (0 when the server was unreachable).
    message : str
        The server's ``error`` field, or the transport error text.
    """

    def __init__(self, status, message):
        self.status = status
        self.message = message
        super().__init__("[%s] %s" % (status, message))


class CompilationError(Exception):
    """A query failed to compile.

    Attributes
    ----------
    message : str
        Compiler error text.
    line, column : int or None
        Error position when the server reports one.
    """

    def __init__(self, message, line=None, column=None):
        self.message = message
        self.line = line
        self.column = column
        super().__init__(message)


class QueryResult(object):
    """Terminal result of a query run: status, schema, and all row pages."""

    def __init__(self, query_id, status, schema, rows, total_rows, truncated, error):
        self.query_id = query_id
        self.status = status
        #: list of (name, type_name) pairs
        self.schema = schema
        #: list of rows; each row is a list of JSON-decoded values
        self.rows = rows
        self.total_rows = total_rows
        self.truncated = truncated
        self.error = error

    @property
    def column_names(self):
        return [n for n, _ in self.schema]

    def to_pandas(self):
        """Materialize as a pandas DataFrame (pandas is NOT a dependency —
        importing it here is the caller's opt-in)."""
        import pandas

        return pandas.DataFrame(self.rows, columns=self.column_names)

    def __repr__(self):
        return "QueryResult(%s, %s, %d rows)" % (
            self.query_id,
            self.status,
            len(self.rows),
        )


class GraftClient(object):
    """Typed client over the Graft HTTP API (the Python twin of the JVM
    ``graft.client.GraftClient``; same submit → poll → page drain loop)."""

    def __init__(self, endpoint=None, timeout=30.0):
        self.endpoint = (
            endpoint or os.environ.get("GRAFT_ENDPOINT") or DEFAULT_ENDPOINT
        ).rstrip("/")
        self.timeout = timeout

    # ------------------------------------------------------------ transport

    def _call(self, method, path, body=None):
        url = self.endpoint + path
        data = None
        headers = {"Accept": "application/json"}
        if body is not None:
            data = json.dumps(body).encode("utf-8")
            headers["Content-Type"] = "application/json"
        req = urllib.request.Request(url, data=data, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return json.loads(resp.read().decode("utf-8"))
        except urllib.error.HTTPError as e:
            try:
                payload = json.loads(e.read().decode("utf-8"))
                message = payload.get("error") or payload.get("message") or str(payload)
            except Exception:
                message = str(e)
            raise RpcError(e.code, message)
        except urllib.error.URLError as e:
            raise RpcError(0, "cannot reach %s: %s" % (url, e.reason))

    # ------------------------------------------------------------- frontend

    def status(self):
        """``GET /api/v1/status`` → ``{"version": ..., "upTimeMs": ...}``."""
        return self._call("GET", "/api/v1/status")

    def compile(self, query, target=None):
        """Compile wv text to SQL text (reference ``wvlet.compile``).

        ``target`` is accepted for signature parity with the reference SDK;
        the server generates Spark SQL (its single target) regardless.
        Raises :class:`CompilationError` on invalid input.
        """
        try:
            return self._call("POST", "/api/v1/to_sql", {"query": query})["sql"]
        except RpcError as e:
            if e.status == 400:
                raise CompilationError(e.message)
            raise

    def compile_check(self, query):
        """``POST /api/v1/compile`` — the compile-API JSON envelope
        (success flag, diagnostics with positions, output schema) without
        generating SQL text. Returns the envelope dict."""
        return self._call("POST", "/api/v1/compile", {"query": query})

    def transpile(self, sql):
        """SQL text → wv text (the migration path; reference
        ``wvlet transpile``)."""
        return self._call("POST", "/api/v1/transpile", {"sql": sql})["query"]

    def fmt(self, query):
        """Canonical formatting of wv text (``wvlet fmt``)."""
        return self._call("POST", "/api/v1/fmt", {"query": query})["formatted"]

    # ---------------------------------------------------------------- query

    def submit(self, query, max_rows=None, session_id=None):
        """Submit a query; returns its ``queryId`` immediately."""
        body = {"query": query}
        if max_rows is not None:
            body["maxRows"] = int(max_rows)
        if session_id:
            body["sessionId"] = session_id
        return self._call("POST", "/api/v1/query", body)["queryId"]

    def query_info(self, query_id, page_token=None):
        """One status + page snapshot for a submitted query."""
        path = "/api/v1/query/" + query_id
        if page_token:
            path += "?pageToken=" + str(page_token)
        return self._call("GET", path)

    def cancel(self, query_id):
        """Cancel a running query (``DELETE /api/v1/query/{id}``)."""
        return self._call("DELETE", "/api/v1/query/" + query_id)

    def run(
        self,
        query,
        max_rows=None,
        session_id=None,
        poll_interval=0.2,
        timeout=300.0,
    ):
        """Submit, poll to a terminal state, then drain every row page.

        Returns a :class:`QueryResult`. Raises :class:`RpcError` on a failed
        or timed-out query (the failure message is the server's error).
        """
        qid = self.submit(query, max_rows=max_rows, session_id=session_id)
        deadline = time.time() + timeout
        info = self.query_info(qid)
        while info["status"] in ("queued", "running"):
            if time.time() > deadline:
                raise RpcError(408, "query %s still running after %ss" % (qid, timeout))
            time.sleep(poll_interval)
            info = self.query_info(qid)
        if info["status"] != "finished":
            raise RpcError(500, info.get("error") or ("query " + info["status"]))
        rows = list(info.get("rows") or [])
        token = info.get("pageToken") or ""
        while token:
            page = self.query_info(qid, token)
            rows.extend(page.get("rows") or [])
            token = page.get("pageToken") or ""
        schema = [(c["name"], c["typeName"]) for c in info.get("schema") or []]
        return QueryResult(
            query_id=qid,
            status=info["status"],
            schema=schema,
            rows=rows,
            total_rows=info.get("totalRows", len(rows)),
            truncated=bool(info.get("truncated")),
            error=info.get("error"),
        )

    # ---------------------------------------------------------------- flows

    def flow_runs(self, flow_name=None, limit=100):
        """List persisted flow runs (``GET /api/v1/flows``)."""
        path = "/api/v1/flows?limit=%d" % limit
        if flow_name:
            path += "&flowName=" + urllib.request.quote(flow_name)
        return self._call("GET", path)["runs"]

    def flow_run(self, run_id):
        """One flow run with its stage records (``GET /api/v1/flows/{id}``)."""
        return self._call("GET", "/api/v1/flows/" + run_id)


def compile(query, target=None, endpoint=None):
    """Module-level convenience mirroring ``from wvlet import compile``:
    compile wv text to SQL text against the default (or given) endpoint."""
    return GraftClient(endpoint).compile(query, target=target)
