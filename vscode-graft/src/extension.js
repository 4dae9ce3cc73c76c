/**
 * VS Code extension glue for the Graft language server (the editor-surface
 * twin of the reference's vscode-wvlet/src/extension.ts): spawns the stdio
 * LSP server and wires VS Code's document events and providers onto the
 * hand-rolled zero-dependency transport in lspclient.js.
 *
 * Server command resolution (first hit wins):
 *   1. the `graft.lsp.command` setting (string, run through the shell)
 *   2. `java -cp <graft.lsp.classpath> graft.LspServer`
 *   3. `sbt -batch "runMain graft.LspServer"` in the workspace root
 */
"use strict";

const vscode = require("vscode");
const cp = require("child_process");
const { LspConnection } = require("./lspclient");

let conn = null;
let child = null;
let output = null;

function serverCommand(workspaceRoot) {
  const cfg = vscode.workspace.getConfiguration("graft");
  const explicit = cfg.get("lsp.command");
  if (explicit) return { cmd: explicit, shell: true };
  const classpath = cfg.get("lsp.classpath");
  if (classpath)
    return {
      cmd: "java",
      args: ["-cp", classpath, "graft.LspServer", "--workspace", workspaceRoot],
      shell: false,
    };
  return {
    cmd: "sbt",
    args: ["-batch", '"runMain graft.LspServer --workspace ' + workspaceRoot + '"'],
    shell: true,
  };
}

function toVsPosition(p) {
  return new vscode.Position(p.line, p.character);
}

function toVsRange(r) {
  return new vscode.Range(toVsPosition(r.start), toVsPosition(r.end));
}

function activate(context) {
  output = vscode.window.createOutputChannel("Graft Language Server");
  const root =
    vscode.workspace.workspaceFolders && vscode.workspace.workspaceFolders.length
      ? vscode.workspace.workspaceFolders[0].uri.fsPath
      : process.cwd();

  const spec = serverCommand(root);
  output.appendLine("[graft] starting LSP: " + spec.cmd + " " + (spec.args || []).join(" "));
  child = spec.shell
    ? cp.spawn(spec.cmd + " " + (spec.args || []).join(" "), { shell: true, cwd: root })
    : cp.spawn(spec.cmd, spec.args || [], { cwd: root });
  child.stderr.on("data", (d) => output.append(d.toString()));
  child.on("exit", (code) => output.appendLine("[graft] LSP server exited: " + code));

  conn = new LspConnection(child);
  conn.initialize("file://" + root).then(
    () => output.appendLine("[graft] LSP initialized"),
    (e) => output.appendLine("[graft] initialize failed: " + e.message)
  );

  const selector = { language: "wvlet", scheme: "file" };
  const versions = new Map();

  const open = (doc) => {
    if (doc.languageId !== "wvlet") return;
    versions.set(doc.uri.toString(), 1);
    conn.didOpen(doc.uri.toString(), "wvlet", 1, doc.getText());
  };
  vscode.workspace.textDocuments.forEach(open);

  context.subscriptions.push(
    vscode.workspace.onDidOpenTextDocument(open),
    vscode.workspace.onDidChangeTextDocument((e) => {
      if (e.document.languageId !== "wvlet") return;
      const uri = e.document.uri.toString();
      const v = (versions.get(uri) || 1) + 1;
      versions.set(uri, v);
      conn.didChange(uri, v, e.document.getText());
    }),
    vscode.workspace.onDidCloseTextDocument((doc) => {
      if (doc.languageId !== "wvlet") return;
      versions.delete(doc.uri.toString());
      conn.didClose(doc.uri.toString());
    }),

    vscode.languages.registerCompletionItemProvider(
      selector,
      {
        async provideCompletionItems(doc, pos) {
          const res = await conn.completion(doc.uri.toString(), pos.line, pos.character);
          const items = (res && res.items) || res || [];
          return items.map((i) => {
            const item = new vscode.CompletionItem(
              i.label,
              (i.kind || 1) - 1 // LSP kinds are 1-based, vscode's enum 0-based
            );
            if (i.detail) item.detail = i.detail;
            if (i.insertText) item.insertText = i.insertText;
            return item;
          });
        },
      },
      "." // the server's trigger character
    ),

    vscode.languages.registerHoverProvider(selector, {
      async provideHover(doc, pos) {
        const res = await conn.hover(doc.uri.toString(), pos.line, pos.character);
        if (!res || !res.contents) return null;
        const md = new vscode.MarkdownString(
          typeof res.contents === "string" ? res.contents : res.contents.value
        );
        return new vscode.Hover(md, res.range ? toVsRange(res.range) : undefined);
      },
    }),

    vscode.languages.registerDefinitionProvider(selector, {
      async provideDefinition(doc, pos) {
        const res = await conn.definition(doc.uri.toString(), pos.line, pos.character);
        if (!res) return null;
        const locs = Array.isArray(res) ? res : [res];
        return locs.map(
          (l) => new vscode.Location(vscode.Uri.parse(l.uri), toVsRange(l.range))
        );
      },
    })
  );
}

function deactivate() {
  const done = conn ? conn.shutdown() : Promise.resolve();
  return done.then(() => {
    if (child) child.kill();
  });
}

module.exports = { activate, deactivate };
