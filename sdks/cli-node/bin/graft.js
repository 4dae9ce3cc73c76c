#!/usr/bin/env node
/**
 * Graft CLI for Node (reference: sdks/cli-node/bin/wvlet.js — there a
 * Scala.js-compiled embedded compiler; here a thin client over the Graft
 * HTTP server, which is where this repo's compiler lives).
 *
 *   graft compile [-q '<wv text>' | <file.wv>]     wv -> SQL text on stdout
 *   graft run     [-q '<wv text>' | <file.wv>]     rows as JSON lines
 *   graft --help
 *
 * Endpoint: --endpoint URL flag or GRAFT_ENDPOINT (default
 * http://127.0.0.1:9876). Exit codes: 0 ok, 1 compile/run error, 2 usage.
 */
"use strict";

const fs = require("fs");
const path = require("path");
// installed package: the @graft/graft dependency; repo checkout: the
// sibling sdks/typescript sources (no install step needed for the specs)
let clientMod;
try {
  clientMod = require("@graft/graft");
} catch (e) {
  clientMod = require(path.join(__dirname, "..", "..", "typescript", "src", "index.js"));
}
const { GraftClient, CompilationError } = clientMod;

function usage(code) {
  process.stderr.write(
    "usage: graft <compile|run> [-q <query>] [file.wv] [--endpoint URL]\n");
  process.exit(code);
}

async function main() {
  const args = process.argv.slice(2);
  if (args.includes("--help") || args.includes("-h")) usage(0);
  const cmd = args.shift();
  if (cmd !== "compile" && cmd !== "run") usage(2);

  let query = null;
  let endpoint = process.env.GRAFT_ENDPOINT;
  for (let i = 0; i < args.length; i++) {
    if (args[i] === "-q") query = args[++i];
    else if (args[i] === "--endpoint") endpoint = args[++i];
    else if (!args[i].startsWith("-")) query = fs.readFileSync(args[i], "utf8");
    else usage(2);
  }
  if (query == null) {
    // read stdin when piped (graft compile < q.wv)
    if (process.stdin.isTTY) usage(2);
    query = fs.readFileSync(0, "utf8");
  }

  const client = new GraftClient(endpoint ? { endpoint } : {});
  if (cmd === "compile") {
    const sql = await client.compile(query);
    process.stdout.write(sql.endsWith("\n") ? sql : sql + "\n");
  } else {
    const result = await client.run(query);
    for (const row of result.rows) process.stdout.write(JSON.stringify(row) + "\n");
  }
}

main().catch((e) => {
  if (e instanceof CompilationError) {
    const loc = e.line != null ? `:${e.line}:${e.column}` : "";
    process.stderr.write(`compile error${loc}: ${e.message}\n`);
  } else {
    process.stderr.write(`error: ${e.message}\n`);
  }
  process.exit(1);
});
