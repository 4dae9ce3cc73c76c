/**
 * Headless test for the Prism Graft definition. Prism itself is not
 * vendored (offline build), so this drives the definition with a faithful
 * mini-tokenizer over Prism's token-object contract (ordered patterns,
 * greedy strings, alternation arrays) and checks classification of a
 * sample document plus registration under both language ids.
 * Prints one JSON line; exits nonzero on failure.
 */
"use strict";

const register = require("../components/prism-graft.js");
const lang = register.graftLanguage;

const failures = [];
function expect(cond, msg) {
  if (!cond) failures.push(msg);
}

// registration contract
const fakePrism = { languages: {} };
const returned = register(fakePrism);
expect(fakePrism.languages.wvlet === lang, "registers wvlet");
expect(fakePrism.languages.wv === lang, "registers wv alias");
expect(returned === lang, "register returns the definition");

// mini Prism tokenizer: walk token entries in order, leftmost-earliest wins
function tokenize(doc) {
  const entries = [];
  for (const [name, val] of Object.entries(lang)) {
    for (const v of Array.isArray(val) ? val : [val]) {
      entries.push([name, v.pattern instanceof RegExp ? v.pattern : v]);
    }
  }
  const out = [];
  let pos = 0;
  while (pos < doc.length) {
    let best = null;
    for (const [name, re] of entries) {
      const g = new RegExp(re.source, "g");
      g.lastIndex = pos;
      const m = g.exec(doc);
      if (m && (!best || m.index < best.index)) best = { name, index: m.index, text: m[0] };
      if (best && best.index === pos) break;
    }
    if (!best) break;
    out.push([best.name, best.text]);
    pos = best.index + best.text.length;
  }
  return out;
}

const doc = [
  "-- weekly revenue",
  "model Weekly = {",
  "  from lineitem",
  "  where l_quantity > 10.5 and l_returnflag = 'R'",
  "  | agg total = l_extendedprice.sum",
  "}",
  'val msg = "done: ${n} rows"',
].join("\n");
const toks = tokenize(doc);
const has = (name, text) => toks.some(([n, t]) => n === name && t === text);

expect(has("comment", "-- weekly revenue"), "line comment");
expect(has("keyword", "model"), "model keyword");
expect(has("class-name", "Weekly"), "model name class");
expect(has("keyword", "from"), "from keyword");
expect(has("keyword", "agg"), "agg keyword");
expect(has("number", "10.5"), "float number");
expect(has("string", "'R'"), "single-quoted string");
expect(has("operator", "|"), "pipe operator");
expect(toks.some(([n, t]) => n === "string" && t.includes("${n}")), "interpolated string");
// keywords must NOT fire inside strings/comments (order contract)
const kwFrom = toks.filter(([n, t]) => n === "keyword" && t === "from");
expect(kwFrom.length === 1, "from fires once, outside strings");

console.log(JSON.stringify({ ok: failures.length === 0, failures }));
process.exit(failures.length === 0 ? 0 : 1);
