/*
Language: Graft (wv)
Description: Flow-style query language of the Graft Spark engine
Category: data
*/
// highlight.js language definition for the Graft wv language — the same
// surface the TextMate grammar (vscode-graft/syntaxes) covers, expressed
// in hljs's mode language. CommonJS + default export interop so it loads
// under require() and as an hljs plugin module.
"use strict";

function graft(hljs) {
  const KEYWORDS = {
    keyword:
      // declarations
      "def model type val flow stage package import export native inline extends " +
      // commands / DML / DDL
      "create alter insert update upsert merge delete truncate save append " +
      "overwrite into use explain prepare execute call show describe run schema table catalog " +
      // query pipeline
      "from select where group having order limit offset agg transform " +
      "add prepend exclude rename shift pivot unpivot sample distinct dedup " +
      "count concat intersect except union all unnest lateral by as " +
      // joins / windows
      "join left right full inner cross semi anti asof on using natural " +
      "over partition rows range unbounded preceding following current row " +
      "grouping sets rollup cube filter " +
      // streaming / flows
      "subscribe watermark incremental incrementalize window route fork " +
      "merge depends wait until activate end " +
      // expressions / tests
      "and or not is in like rlike between exists contains case when then " +
      "else if cast extract interval at time zone for with to of " +
      "test should be contain debug",
    literal: "true false null",
    built_in:
      "boolean byte short int long float double decimal string char date " +
      "timestamp array map struct binary json sql asc desc nulls first last",
  };

  const INTERP = {
    className: "subst",
    begin: /\$\{/,
    end: /\}/,
    keywords: KEYWORDS,
  };

  return {
    name: "Graft",
    aliases: ["wv", "wvlet"],
    case_insensitive: false,
    keywords: KEYWORDS,
    contains: [
      { className: "comment", begin: /---/, end: /---/ },
      hljs.COMMENT(/--/, /$/),
      {
        className: "string",
        begin: /"""/,
        end: /"""/,
        contains: [hljs.BACKSLASH_ESCAPE, INTERP],
      },
      {
        className: "string",
        begin: /"/,
        end: /"/,
        contains: [hljs.BACKSLASH_ESCAPE, INTERP],
      },
      {
        className: "string",
        begin: /'/,
        end: /'/,
        contains: [hljs.BACKSLASH_ESCAPE],
      },
      {
        className: "symbol",
        begin: /`/,
        end: /`/,
        contains: [INTERP],
      },
      { className: "number", begin: /\b0[xX][0-9a-fA-F_]+\b/ },
      { className: "number", begin: /\b\d[\d_]*\.\d+([eE][+-]?\d+)?\b/ },
      { className: "number", begin: /\b\d[\d_]*\b/ },
      // `-> Flow` jumps and lambda arrows render as operators
      { className: "operator", begin: /->|<-|=>/ },
      // the pipe is the language's signature operator
      { className: "operator", begin: /\|/ },
      // model/type names are capitalized
      { className: "title.class", begin: /\b[A-Z][A-Za-z0-9_]*\b/ },
    ],
  };
}

module.exports = graft;
module.exports.default = graft;
