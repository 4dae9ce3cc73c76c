/**
 * Headless protocol test for the extension's LSP transport: drives
 * src/lspclient.js against the REAL Graft stdio server. The server command
 * comes from the GRAFT_LSP_CMD env var (shell-parsed), e.g.
 *   GRAFT_LSP_CMD='java -cp <cp> graft.LspServer --dir /root/testdata/sf0.001'
 * Prints one JSON result line; exits nonzero on failure. Driven from the
 * JVM suite by VsCodeLspSpec (which knows the test classpath).
 */
"use strict";

const cp = require("child_process");
const { LspConnection } = require("../src/lspclient");

async function main() {
  const cmd = process.env.GRAFT_LSP_CMD;
  if (!cmd) throw new Error("GRAFT_LSP_CMD not set");
  const child = cp.spawn(cmd, { shell: true });
  child.stderr.on("data", () => {}); // Spark INFO noise
  const conn = new LspConnection(child);

  const init = await conn.initialize("file:///tmp", 120000);
  const results = { capabilities: !!(init && init.capabilities) };

  const uri = "file:///tmp/test.wv";
  const text = "from lineitem\nselect l_orderkey, l_quantity\n";
  conn.didOpen(uri, "wvlet", 1, text);

  // dot-completion after a column name: l_quantity. → numeric methods
  const text2 = "from lineitem\nselect l_quantity.\n";
  conn.didChange(uri, 2, text2);
  const comp = await conn.completion(uri, 1, 18); // cursor just after the '.'
  const items = (comp && comp.items) || comp || [];
  results.completion_count = items.length;
  results.completion_has_sum = items.some((i) => i.label === "sum");

  // hover over the table name
  const hov = await conn.hover(uri, 0, 7);
  results.hover = !!(hov && hov.contents);

  conn.didClose(uri);
  await conn.shutdown();
  console.log(JSON.stringify(results));
  // exit explicitly: the child's exit notification races node's natural end
  process.exit(0);
}

main().catch((e) => {
  console.error(String(e && e.stack ? e.stack : e));
  process.exit(1);
});
