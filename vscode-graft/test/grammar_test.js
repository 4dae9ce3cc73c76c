/**
 * Tokenization test for syntaxes/graft.tmLanguage.json. vscode-textmate is
 * not vendored (offline build), so this drives the grammar with a minimal
 * TextMate-subset interpreter: top-level patterns plus begin/end blocks
 * (enough for this grammar, which nests only escapes/interpolation inside
 * strings). Verifies (1) every regex in the file compiles, (2) a sample
 * document tokenizes with the expected scopes, (3) multi-line block
 * comments and triple-quoted strings stay open across lines.
 * Prints one JSON line; exits nonzero on failure.
 */
"use strict";

const fs = require("fs");
const path = require("path");

const grammar = JSON.parse(
  fs.readFileSync(path.join(__dirname, "..", "syntaxes", "graft.tmLanguage.json"), "utf8")
);

function collectRegexes(node, out) {
  if (Array.isArray(node)) return node.forEach((n) => collectRegexes(n, out));
  if (node && typeof node === "object") {
    for (const k of ["match", "begin", "end"]) {
      if (typeof node[k] === "string") out.push(node[k]);
    }
    for (const v of Object.values(node)) collectRegexes(v, out);
  }
}

function resolve(patterns) {
  // expand {include: "#name"} one level deep (grammar has no deeper cycles)
  const out = [];
  for (const p of patterns || []) {
    if (p.include) {
      const rep = grammar.repository[p.include.slice(1)];
      if (!rep) throw new Error("missing repository entry " + p.include);
      if (rep.patterns) out.push(...resolve(rep.patterns));
      else out.push(rep);
    } else out.push(p);
  }
  return out;
}

// --- tiny tokenizer -------------------------------------------------------
const top = resolve(grammar.patterns);

function tokenizeLine(line, state) {
  const tokens = [];
  let pos = 0;
  while (pos < line.length) {
    if (state.open) {
      // inside a begin/end block: look for its end
      const endRe = new RegExp(state.open.end);
      const m = endRe.exec(line.slice(pos));
      if (!m) {
        tokens.push([state.open.name, line.slice(pos)]);
        return tokens; // stays open into the next line
      }
      tokens.push([state.open.name, line.slice(pos, pos + m.index + m[0].length)]);
      pos += m.index + m[0].length;
      state.open = null;
      continue;
    }
    let best = null;
    for (const p of top) {
      const re = new RegExp(p.begin || p.match, "g");
      re.lastIndex = pos;
      const m = re.exec(line);
      if (m && m.index >= pos && (!best || m.index < best.index)) {
        best = { index: m.index, text: m[0], rule: p };
        if (m.index === pos) break; // leftmost-first like TextMate
      }
    }
    if (!best) {
      return tokens; // rest of line is unscoped whitespace/other
    }
    if (best.rule.begin) {
      // does the block close on this same line?
      const endRe = new RegExp(best.rule.end, "g");
      endRe.lastIndex = best.index + best.text.length;
      const em = endRe.exec(line);
      if (em) {
        tokens.push([best.rule.name, line.slice(best.index, em.index + em[0].length)]);
        pos = em.index + em[0].length;
      } else {
        tokens.push([best.rule.name, line.slice(best.index)]);
        state.open = best.rule;
        return tokens;
      }
    } else {
      tokens.push([best.rule.name, best.text]);
      pos = best.index + best.text.length;
    }
  }
  return tokens;
}

function tokenize(doc) {
  const state = { open: null };
  return doc.split("\n").map((l) => tokenizeLine(l, state));
}

function scopeOf(lineTokens, text) {
  const t = lineTokens.find(([, s]) => s === text);
  return t ? t[0] : null;
}

// --- assertions -----------------------------------------------------------
const failures = [];
function expect(cond, msg) {
  if (!cond) failures.push(msg);
}

// 1. every regex compiles (JS RegExp approximates Oniguruma for this subset)
const regexes = [];
collectRegexes(grammar, regexes);
for (const r of regexes) {
  try {
    new RegExp(r);
  } catch (e) {
    failures.push("regex does not compile: " + r);
  }
}
expect(regexes.length > 25, "grammar unexpectedly small: " + regexes.length + " regexes");

// 2. scope spot-checks over a representative document
const doc = [
  "-- line comment",
  "from lineitem",
  "where l_quantity > 10.5 and l_returnflag = 'R'",
  "group by l_returnflag",
  "agg total = l_extendedprice.sum",
  "| select _.total",
  "model Top10(n: int) = { from orders | limit 10 }",
  "flow Nightly = {",
  "  stage ingest = from 'data.parquet'",
  "  stage done = from ingest | -> Retention",
  "}",
  "test _.rows should be [[1]]",
].join("\n");
const lines = tokenize(doc);

expect(scopeOf(lines[0], "-- line comment") === "comment.line.double-dash.wv", "line comment scope");
expect(scopeOf(lines[1], "from") === "keyword.control.query.wv", "from keyword scope");
expect(scopeOf(lines[2], "where") === "keyword.control.query.wv", "where keyword scope");
expect(scopeOf(lines[2], "10.5") === "constant.numeric.float.wv", "float literal scope");
expect(scopeOf(lines[2], "and") === "keyword.operator.word.wv", "and operator scope");
expect(scopeOf(lines[2], "'R'") === "string.quoted.single.wv", "single-quoted string scope");
expect(scopeOf(lines[4], "agg") === "keyword.control.query.wv", "agg keyword scope");
expect(scopeOf(lines[5], "|") === "keyword.operator.pipe.wv", "pipe operator scope");
expect(scopeOf(lines[5], "_") === "variable.language.underscore.wv", "underscore scope");
expect(scopeOf(lines[6], "model") === "storage.type.declaration.wv", "model declaration scope");
expect(scopeOf(lines[6], "Top10") === "entity.name.type.wv", "model name as type scope");
expect(scopeOf(lines[6], "int") === "support.type.primitive.wv", "primitive type scope");
expect(scopeOf(lines[7], "flow") === "storage.type.declaration.wv", "flow declaration scope");
expect(scopeOf(lines[8], "stage") === "storage.type.declaration.wv", "stage declaration scope");
expect(scopeOf(lines[8], "'data.parquet'") === "string.quoted.single.wv", "file path string scope");
expect(scopeOf(lines[9], "->") === "keyword.operator.arrow.wv", "jump arrow scope");
expect(scopeOf(lines[11], "test") === "keyword.other.test.wv", "test keyword scope");
expect(scopeOf(lines[11], "should") === "keyword.other.test.wv", "should keyword scope");

// 3. multi-line constructs stay open
const multi = tokenize('--- doc\nstill comment\n---\nfrom t\nval s = """a\n${x}\nb"""\nfrom u');
expect(scopeOf(multi[1], "still comment") === "comment.block.documentation.wv", "block comment spans lines");
expect(scopeOf(multi[3], "from") === "keyword.control.query.wv", "comment closed before from");
expect(multi[5].some(([n]) => n === "string.quoted.triple.wv"), "triple string spans lines");
expect(scopeOf(multi[7], "from") === "keyword.control.query.wv", "triple string closed before from");

// 4. package.json wires the grammar to the language
const pkg = JSON.parse(fs.readFileSync(path.join(__dirname, "..", "package.json"), "utf8"));
const g = ((pkg.contributes || {}).grammars || [])[0] || {};
expect(g.scopeName === grammar.scopeName, "package.json grammar scopeName matches");
expect(g.language === "wvlet", "package.json grammar bound to the wvlet language id");
expect(fs.existsSync(path.join(__dirname, "..", g.path || "")), "package.json grammar path exists");

console.log(JSON.stringify({ ok: failures.length === 0, failures }));
process.exit(failures.length === 0 ? 0 : 1);
