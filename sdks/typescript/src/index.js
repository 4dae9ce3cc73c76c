/**
 * Graft TypeScript/JavaScript SDK
 * ================================
 *
 * A zero-dependency Node client for a running Graft query server,
 * mirroring the reference Wvlet TypeScript SDK's compile surface
 * (`WvletCompiler.compile()` → SQL text) plus the run surface of the HTTP
 * API (submit → poll → page drain, like the Python SDK and the JVM
 * GraftClient). Plain ES module + handwritten index.d.ts — no build step,
 * no npm dependencies (uses Node's global fetch, Node ≥ 18).
 *
 * Endpoint resolution: explicit option, else GRAFT_ENDPOINT env var, else
 * http://127.0.0.1:9876.
 */
"use strict";

const DEFAULT_ENDPOINT = "http://127.0.0.1:9876";

class RpcError extends Error {
  constructor(status, message) {
    super(`[${status}] ${message}`);
    this.name = "RpcError";
    this.status = status;
    this.rpcMessage = message;
  }
}

class CompilationError extends Error {
  constructor(message, line, column) {
    super(message);
    this.name = "CompilationError";
    this.line = line === undefined ? null : line;
    this.column = column === undefined ? null : column;
  }
}

class QueryResult {
  constructor(info, rows) {
    this.queryId = info.queryId;
    this.status = info.status;
    /** [{name, typeName}] */
    this.schema = info.schema || [];
    /** array of rows; each row an array of JSON values */
    this.rows = rows;
    this.totalRows = info.totalRows !== undefined ? info.totalRows : rows.length;
    this.truncated = !!info.truncated;
    this.error = info.error || null;
  }

  get columnNames() {
    return this.schema.map((c) => c.name);
  }

  /** rows as objects keyed by column name */
  toObjects() {
    const names = this.columnNames;
    return this.rows.map((r) =>
      Object.fromEntries(names.map((n, i) => [n, r[i]]))
    );
  }
}

class GraftClient {
  constructor(options) {
    const opts = typeof options === "string" ? { endpoint: options } : options || {};
    this.endpoint = (
      opts.endpoint ||
      (typeof process !== "undefined" && process.env && process.env.GRAFT_ENDPOINT) ||
      DEFAULT_ENDPOINT
    ).replace(/\/+$/, "");
    this.timeoutMs = opts.timeoutMs || 30000;
  }

  async _call(method, path, body) {
    const url = this.endpoint + path;
    let resp;
    try {
      resp = await fetch(url, {
        method,
        headers: body !== undefined ? { "Content-Type": "application/json" } : {},
        body: body !== undefined ? JSON.stringify(body) : undefined,
        signal: AbortSignal.timeout(this.timeoutMs),
      });
    } catch (e) {
      throw new RpcError(0, `cannot reach ${url}: ${e.message || e}`);
    }
    let payload;
    try {
      payload = await resp.json();
    } catch (e) {
      payload = {};
    }
    if (!resp.ok) {
      throw new RpcError(
        resp.status,
        payload.error || payload.message || resp.statusText
      );
    }
    return payload;
  }

  /** GET /api/v1/status */
  status() {
    return this._call("GET", "/api/v1/status");
  }

  /**
   * Compile wv text to SQL text (reference WvletCompiler.compile).
   * `target` accepted for signature parity; the server generates Spark SQL.
   */
  async compile(query, _target) {
    try {
      return (await this._call("POST", "/api/v1/to_sql", { query })).sql;
    } catch (e) {
      if (e instanceof RpcError && e.status === 400)
        throw new CompilationError(e.rpcMessage);
      throw e;
    }
  }

  /** POST /api/v1/compile — the compile-check JSON envelope. */
  compileCheck(query) {
    return this._call("POST", "/api/v1/compile", { query });
  }

  /** SQL text → wv text (the migration path). */
  async transpile(sql) {
    return (await this._call("POST", "/api/v1/transpile", { sql })).query;
  }

  /** Canonical formatting of wv text. */
  async fmt(query) {
    return (await this._call("POST", "/api/v1/fmt", { query })).formatted;
  }

  /** Submit a query; resolves with its queryId immediately. */
  async submit(query, options) {
    const opts = options || {};
    const body = { query };
    if (opts.maxRows !== undefined) body.maxRows = opts.maxRows;
    if (opts.sessionId) body.sessionId = opts.sessionId;
    return (await this._call("POST", "/api/v1/query", body)).queryId;
  }

  /** One status + page snapshot for a submitted query. */
  queryInfo(queryId, pageToken) {
    const qs = pageToken ? `?pageToken=${pageToken}` : "";
    return this._call("GET", `/api/v1/query/${queryId}${qs}`);
  }

  /** Cancel a running query. */
  cancel(queryId) {
    return this._call("DELETE", `/api/v1/query/${queryId}`);
  }

  /**
   * Submit, poll to a terminal state, then drain every row page.
   * Resolves with a QueryResult; rejects with RpcError on failure/timeout.
   */
  async run(query, options) {
    const opts = options || {};
    const pollMs = opts.pollIntervalMs || 200;
    const deadline = Date.now() + (opts.timeoutMs || 300000);
    const qid = await this.submit(query, opts);
    let info = await this.queryInfo(qid);
    while (info.status === "queued" || info.status === "running") {
      if (Date.now() > deadline)
        throw new RpcError(408, `query ${qid} still running`);
      await new Promise((r) => setTimeout(r, pollMs));
      info = await this.queryInfo(qid);
    }
    if (info.status !== "finished")
      throw new RpcError(500, info.error || `query ${info.status}`);
    const rows = [...(info.rows || [])];
    let token = info.pageToken || "";
    while (token) {
      const page = await this.queryInfo(qid, token);
      rows.push(...(page.rows || []));
      token = page.pageToken || "";
    }
    return new QueryResult(info, rows);
  }

  /** List persisted flow runs. */
  async flowRuns(flowName, limit) {
    let path = `/api/v1/flows?limit=${limit || 100}`;
    if (flowName) path += `&flowName=${encodeURIComponent(flowName)}`;
    return (await this._call("GET", path)).runs;
  }

  /** One flow run with its stage records. */
  flowRun(runId) {
    return this._call("GET", `/api/v1/flows/${runId}`);
  }
}

/**
 * Reference-parity compiler facade: `new WvletCompiler({endpoint, target})`
 * then `.compile(query)` → SQL text (async here — compilation happens on
 * the server rather than in a bundled native library).
 */
class WvletCompiler {
  constructor(options) {
    const opts = options || {};
    this._client = new GraftClient({ endpoint: opts.endpoint });
    this._target = opts.target;
  }

  compile(query) {
    return this._client.compile(query, this._target);
  }
}

/** Module-level convenience: compile wv text to SQL text. */
function compile(query, options) {
  return new GraftClient(options || {}).compile(query);
}

module.exports = {
  GraftClient,
  WvletCompiler,
  QueryResult,
  CompilationError,
  RpcError,
  compile,
};
