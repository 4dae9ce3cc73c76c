/**
 * Minimal LSP client transport over a child process' stdio — the
 * Content-Length framed JSON-RPC 2.0 the Graft stdio language server
 * (graft.LspServer) speaks. Pure Node (no vscode import, no third-party
 * deps), so it is testable headlessly against the real server process
 * (test/protocol_test.js, driven from the JVM suite) and reusable by the
 * VS Code glue in extension.js.
 *
 * Reference shape: vscode-wvlet's extension delegates this to
 * vscode-languageclient; this package hand-rolls the ~150 lines instead so
 * the extension has zero npm dependencies.
 */
"use strict";

class LspConnection {
  /** @param child a spawned process whose stdin/stdout speak framed LSP */
  constructor(child) {
    this.child = child;
    this.nextId = 1;
    this.pending = new Map(); // id -> {resolve, reject}
    this.onNotification = null; // (method, params) => void
    this.buf = Buffer.alloc(0);
    child.stdout.on("data", (chunk) => this._feed(chunk));
  }

  _feed(chunk) {
    this.buf = Buffer.concat([this.buf, chunk]);
    for (;;) {
      const headerEnd = this.buf.indexOf("\r\n\r\n");
      if (headerEnd < 0) return;
      const header = this.buf.slice(0, headerEnd).toString("ascii");
      const m = /Content-Length:\s*(\d+)/i.exec(header);
      if (!m) {
        // malformed frame: drop the header and resync
        this.buf = this.buf.slice(headerEnd + 4);
        continue;
      }
      const len = parseInt(m[1], 10);
      const start = headerEnd + 4;
      if (this.buf.length < start + len) return; // body not complete yet
      const body = this.buf.slice(start, start + len).toString("utf8");
      this.buf = this.buf.slice(start + len);
      let msg;
      try {
        msg = JSON.parse(body);
      } catch (e) {
        continue;
      }
      this._dispatch(msg);
    }
  }

  _dispatch(msg) {
    if (msg.id !== undefined && (msg.result !== undefined || msg.error !== undefined)) {
      const p = this.pending.get(msg.id);
      if (p) {
        this.pending.delete(msg.id);
        if (msg.error) p.reject(new Error(msg.error.message || JSON.stringify(msg.error)));
        else p.resolve(msg.result);
      }
    } else if (msg.method && this.onNotification) {
      this.onNotification(msg.method, msg.params);
    }
  }

  _send(obj) {
    const body = Buffer.from(JSON.stringify(obj), "utf8");
    const frame = Buffer.concat([
      Buffer.from("Content-Length: " + body.length + "\r\n\r\n", "ascii"),
      body,
    ]);
    this.child.stdin.write(frame);
  }

  /** JSON-RPC request; resolves with the result. */
  request(method, params, timeoutMs) {
    const id = this.nextId++;
    return new Promise((resolve, reject) => {
      const t = setTimeout(
        () => {
          this.pending.delete(id);
          reject(new Error("LSP request '" + method + "' timed out"));
        },
        timeoutMs || 30000
      );
      this.pending.set(id, {
        resolve: (r) => {
          clearTimeout(t);
          resolve(r);
        },
        reject: (e) => {
          clearTimeout(t);
          reject(e);
        },
      });
      this._send({ jsonrpc: "2.0", id: id, method: method, params: params || {} });
    });
  }

  /** JSON-RPC notification (no response expected). */
  notify(method, params) {
    this._send({ jsonrpc: "2.0", method: method, params: params || {} });
  }

  // ------------------------------------------------------- LSP lifecycle

  async initialize(rootUri, timeoutMs) {
    // generous default: a cold JVM server (Spark session) can take a while
    const result = await this.request(
      "initialize",
      {
        processId: process.pid,
        rootUri: rootUri || null,
        capabilities: {},
      },
      timeoutMs || 120000
    );
    this.notify("initialized", {});
    return result;
  }

  didOpen(uri, languageId, version, text) {
    this.notify("textDocument/didOpen", {
      textDocument: { uri: uri, languageId: languageId, version: version, text: text },
    });
  }

  didChange(uri, version, text) {
    // the server is full-sync: one change event carrying the whole text
    this.notify("textDocument/didChange", {
      textDocument: { uri: uri, version: version },
      contentChanges: [{ text: text }],
    });
  }

  didClose(uri) {
    this.notify("textDocument/didClose", { textDocument: { uri: uri } });
  }

  completion(uri, line, character) {
    return this.request("textDocument/completion", {
      textDocument: { uri: uri },
      position: { line: line, character: character },
    });
  }

  hover(uri, line, character) {
    return this.request("textDocument/hover", {
      textDocument: { uri: uri },
      position: { line: line, character: character },
    });
  }

  definition(uri, line, character) {
    return this.request("textDocument/definition", {
      textDocument: { uri: uri },
      position: { line: line, character: character },
    });
  }

  async shutdown() {
    try {
      await this.request("shutdown", null, 5000);
    } catch (e) {
      /* server may already be gone */
    }
    this.notify("exit", null);
  }
}

module.exports = { LspConnection };
