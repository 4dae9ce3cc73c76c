/**
 * Prism language definition for the Graft (wv) flow-style query language —
 * the Prism-flavored sibling of highlightjs-graft and the vscode-graft
 * TextMate grammar (reference project: prismjs-wvlet). Registers under
 * `wvlet` with a `wv` alias. Works as a Prism plugin (browser global or
 * `Prism.languages` injection) and exports the definition for tests.
 */
(function (global) {
  "use strict";

  // Prism token order matters: earlier patterns win. Comments and strings
  // first so keywords inside them never fire.
  var graftLanguage = {
    comment: [
      { pattern: /---[\s\S]*?---/, greedy: true },
      { pattern: /--.*/, greedy: true },
    ],
    string: [
      // triple-quoted, then double, then single; ${} interpolation carries
      // an inner 'interpolation' token so themes can tint it
      {
        pattern: /"""[\s\S]*?"""/,
        greedy: true,
        inside: { interpolation: /\$\{[^}]*\}/ },
      },
      {
        pattern: /"(?:\\.|[^"\\])*"/,
        greedy: true,
        inside: { interpolation: /\$\{[^}]*\}/ },
      },
      { pattern: /'(?:\\.|[^'\\])*'/, greedy: true },
    ],
    symbol: { pattern: /`[^`]*`/, greedy: true },
    keyword:
      /\b(?:def|model|type|val|flow|stage|package|import|export|native|inline|extends|create|alter|insert|update|upsert|merge|delete|truncate|save|append|overwrite|into|use|explain|prepare|execute|call|show|describe|run|schema|table|catalog|from|select|where|group|having|order|limit|offset|agg|transform|add|prepend|exclude|rename|shift|pivot|unpivot|sample|distinct|dedup|count|concat|intersect|except|union|all|unnest|lateral|by|as|join|left|right|full|inner|cross|semi|anti|asof|on|using|natural|over|partition|rows|range|unbounded|preceding|following|current|row|grouping|sets|rollup|cube|filter|subscribe|watermark|incremental|incrementalize|window|route|fork|depends|wait|until|activate|end|and|or|not|is|in|like|rlike|between|exists|contains|case|when|then|else|if|cast|extract|interval|at|time|zone|for|with|to|of|test|should|be|contain|debug)\b/,
    boolean: /\b(?:true|false|null)\b/,
    builtin:
      /\b(?:boolean|byte|short|int|long|float|double|decimal|string|char|date|timestamp|array|map|struct|binary|json|sql|asc|desc|nulls|first|last)\b/,
    number: /\b0[xX][0-9a-fA-F_]+\b|\b\d[\d_]*(?:\.\d+(?:[eE][+-]?\d+)?)?\b/,
    "class-name": /\b[A-Z][A-Za-z0-9_]*\b/,
    operator: /->|<-|=>|!=|<=|>=|[<>=|+\-*\/%!]/,
    punctuation: /[{}\[\](),.:;]/,
  };

  function register(Prism) {
    Prism.languages.wvlet = graftLanguage;
    Prism.languages.wv = graftLanguage;
    return graftLanguage;
  }

  if (typeof module !== "undefined" && module.exports) {
    module.exports = register;
    module.exports.graftLanguage = graftLanguage;
  }
  if (global && global.Prism && global.Prism.languages) register(global.Prism);
})(typeof self !== "undefined" ? self : typeof window !== "undefined" ? window : null);
