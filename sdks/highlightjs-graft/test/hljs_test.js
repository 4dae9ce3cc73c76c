/**
 * Headless test for the highlight.js Graft definition. highlight.js itself
 * is not vendored (offline build), so this drives the definition with a
 * minimal hljs-API stub plus a tiny mode interpreter: top-level `contains`
 * modes (begin/end or begin-only) and keyword classification — enough to
 * verify the definition tokenizes the language surface the way hljs would.
 * Prints one JSON line; exits nonzero on failure.
 */
"use strict";

const def = require("../src/graft.js");

// --- minimal hljs API the definition uses ---------------------------------
const hljsStub = {
  BACKSLASH_ESCAPE: { begin: /\\./ },
  COMMENT: (begin, end) => ({ className: "comment", begin, end }),
};

const lang = def(hljsStub);

const failures = [];
function expect(cond, msg) {
  if (!cond) failures.push(msg);
}

// 1. structural contract hljs relies on
expect(lang.name === "Graft", "language name");
expect(Array.isArray(lang.aliases) && lang.aliases.includes("wv"), "wv alias");
expect(typeof lang.keywords === "object", "keywords group object");
expect(Array.isArray(lang.contains) && lang.contains.length > 5, "contains modes");
for (const m of lang.contains) {
  if (m.begin) expect(m.begin instanceof RegExp, "begin is a RegExp: " + m.className);
  if (m.end) expect(m.end instanceof RegExp, "end is a RegExp: " + m.className);
}

// 2. keyword groups cover the language surface
const kw = lang.keywords.keyword.split(/\s+/);
for (const w of ["from", "select", "agg", "flow", "stage", "asof", "subscribe",
                 "rollup", "pivot", "test", "should", "model"]) {
  expect(kw.includes(w), "keyword missing: " + w);
}
expect(lang.keywords.literal.split(/\s+/).includes("null"), "null literal");
expect(lang.keywords.built_in.split(/\s+/).includes("string"), "string type");

// 3. mini-interpreter: classify a document with the modes + keywords
function tokenize(doc) {
  const out = [];
  let pos = 0;
  outer: while (pos < doc.length) {
    for (const m of lang.contains) {
      const re = new RegExp(m.begin.source, "gm");
      re.lastIndex = pos;
      const b = re.exec(doc);
      if (b && b.index === pos) {
        if (m.end) {
          const er = new RegExp(m.end.source, "gm");
          er.lastIndex = pos + b[0].length;
          const e = er.exec(doc);
          const stop = e ? e.index + e[0].length : doc.length;
          out.push([m.className, doc.slice(pos, stop)]);
          pos = stop;
        } else {
          out.push([m.className, b[0]]);
          pos += b[0].length;
        }
        continue outer;
      }
    }
    const word = /^[A-Za-z_][A-Za-z0-9_]*/.exec(doc.slice(pos));
    if (word) {
      const w = word[0];
      const cls = kw.includes(w) ? "keyword"
        : lang.keywords.literal.split(/\s+/).includes(w) ? "literal"
        : lang.keywords.built_in.split(/\s+/).includes(w) ? "built_in"
        : "ident";
      out.push([cls, w]);
      pos += w.length;
    } else pos += 1;
  }
  return out;
}

const doc = [
  "-- revenue per flag",
  "from lineitem",
  "where l_quantity > 10.5 and l_returnflag = 'R'",
  "| agg total = l_extendedprice.sum",
  "flow Nightly = { stage s1 = from orders | -> Retention }",
  'val msg = "rows: ${n}"',
].join("\n");
const toks = tokenize(doc);
const byText = (t) => toks.find(([, s]) => s === t || s.startsWith(t));

expect(byText("-- revenue")[0] === "comment", "line comment classified");
expect(toks.some(([c, s]) => c === "keyword" && s === "from"), "from keyword");
expect(toks.some(([c, s]) => c === "keyword" && s === "agg"), "agg keyword");
expect(toks.some(([c, s]) => c === "number" && s === "10.5"), "float literal");
expect(toks.some(([c, s]) => c === "string" && s === "'R'"), "single-quoted string");
expect(toks.some(([c, s]) => c === "operator" && s === "|"), "pipe operator");
expect(toks.some(([c, s]) => c === "operator" && s === "->"), "jump arrow");
expect(toks.some(([c, s]) => c === "title.class" && s === "Nightly"), "flow name class");
expect(toks.some(([c, s]) => c === "string" && s.includes("${n}")), "interpolated string");

console.log(JSON.stringify({ ok: failures.length === 0, failures }));
process.exit(failures.length === 0 ? 0 : 1);
