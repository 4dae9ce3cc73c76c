package graft.server

/** Single-page query console served at `/` — a deliberately minimal stand-in
  * for the reference's bundled web UI (reference wvlet-ui-main/, a Scala.js
  * SPA served by StaticContentApi.scala). Same WHAT (browser query console
  * over the frontend API: submit, poll, render schema + rows, format), a
  * fraction of the HOW: one embedded HTML page, zero build tooling, zero
  * dependencies — every capability it exercises is the public JSON API, so
  * anything the page does a user's own tooling can do too. The editor is a
  * highlighted textarea: a transparent-text textarea over a token-colored
  * <pre> kept in sync on input/scroll, with the language's token rules
  * (the same surface sdks/prismjs-graft covers) inlined — still zero
  * dependencies. */
object WebUi {

  val page: String =
    """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>graft console</title>
<style>
  body { font-family: ui-monospace, SFMono-Regular, Menlo, monospace;
         margin: 2rem auto; max-width: 72rem; padding: 0 1rem; color: #1a1a1a; }
  h1 { font-size: 1.1rem; }
  .editor { position: relative; width: 100%; height: 9rem; }
  .editor textarea, .editor pre {
    position: absolute; inset: 0; margin: 0; font: inherit; font-size: 1rem;
    line-height: 1.35; padding: .5rem; box-sizing: border-box;
    white-space: pre-wrap; word-break: break-word; overflow: auto;
    border: 1px solid #bbb; border-radius: 4px; }
  .editor pre { pointer-events: none; background: #fff; color: #1a1a1a; }
  .editor textarea { background: transparent; color: transparent;
    caret-color: #1a1a1a; resize: none; z-index: 1; border-color: transparent; }
  .tk-kw  { color: #0550ae; font-weight: 600; }
  .tk-str { color: #0a7a36; }
  .tk-num { color: #953800; }
  .tk-com { color: #8a8a8a; font-style: italic; }
  .tk-op  { color: #8250df; }
  .tk-ty  { color: #7a5200; }
  button { font: inherit; padding: .35rem .9rem; margin: .5rem .5rem 0 0;
           border: 1px solid #888; border-radius: 4px; background: #f4f4f4;
           cursor: pointer; }
  button:hover { background: #e8e8e8; }
  #status { margin: .75rem 0; color: #555; }
  #status.err { color: #b00020; white-space: pre-wrap; }
  table { border-collapse: collapse; margin-top: .5rem; font-size: .85rem; }
  th, td { border: 1px solid #ccc; padding: .25rem .6rem; text-align: left; }
  th { background: #f0f0f0; }
  .dim { color: #777; font-size: .8rem; margin-top: .4rem; }
</style>
</head>
<body>
<h1>graft console</h1>
<div class="editor">
  <pre id="hl" aria-hidden="true"></pre>
  <textarea id="q" spellcheck="false">from lineitem
group by l_returnflag
agg n = _.count, sum_qty = l_quantity.sum
order by l_returnflag</textarea>
</div>
<div>
  <button onclick="run()">run</button>
  <button onclick="run('single')">run at cursor</button>
  <button onclick="run('describe')">describe at cursor</button>
  <button onclick="fmt()">format</button>
  <button onclick="transpileSql()">transpile SQL&rarr;wv</button>
</div>
<div id="status"></div>
<div id="out"></div>
<script>
const $ = id => document.getElementById(id);

// --- inline highlighter: the prismjs-graft token rules, dependency-free ---
const KW = new Set(('def model type val flow stage package import export native inline extends ' +
  'create alter insert update upsert merge delete truncate save append overwrite into use ' +
  'explain prepare execute call show describe run schema table catalog from select where ' +
  'group having order limit offset agg transform add prepend exclude rename shift pivot ' +
  'unpivot sample distinct dedup count concat intersect except union all unnest lateral by as ' +
  'join left right full inner cross semi anti asof on using natural over partition rows range ' +
  'unbounded preceding following current row grouping sets rollup cube filter subscribe ' +
  'watermark incremental incrementalize window route fork depends wait until activate end ' +
  'and or not is in like rlike between exists contains case when then else if cast extract ' +
  'interval at time zone for with to of test should be contain debug true false null').split(' '));
const TY = new Set(('boolean byte short int long float double decimal string char date ' +
  'timestamp array map struct binary json sql asc desc nulls first last').split(' '));
const TOKEN_RE = /(---[\s\S]*?(?:---|$))|(--[^\n]*)|("{3}[\s\S]*?(?:"{3}|$)|"(?:\\.|[^"\\\n])*"?|'(?:\\.|[^'\\\n])*'?|`[^`\n]*`?)|(\b0[xX][0-9a-fA-F_]+\b|\b\d[\d_]*(?:\.\d+)?\b)|(->|<-|=>|!=|<=|>=|[|<>=+*\/%])|([A-Za-z_][A-Za-z0-9_]*)/g;
function esc(s) {
  return s.replace(/&/g, '&amp;').replace(/</g, '&lt;').replace(/>/g, '&gt;');
}
function highlight(src) {
  let out = '', last = 0, m;
  TOKEN_RE.lastIndex = 0;
  while ((m = TOKEN_RE.exec(src))) {
    out += esc(src.slice(last, m.index));
    const t = m[0];
    const cls = m[1] || m[2] ? 'tk-com' : m[3] ? 'tk-str' : m[4] ? 'tk-num'
      : m[5] ? 'tk-op'
      : KW.has(t) ? 'tk-kw' : TY.has(t) ? 'tk-ty'
      : /^[A-Z]/.test(t) ? 'tk-ty' : null;
    out += cls ? '<span class="' + cls + '">' + esc(t) + '</span>' : esc(t);
    last = m.index + t.length;
  }
  return out + esc(src.slice(last)) + '\n';
}
function sync() {
  $('hl').innerHTML = highlight($('q').value);
  $('hl').scrollTop = $('q').scrollTop;
  $('hl').scrollLeft = $('q').scrollLeft;
}
$('q').addEventListener('input', sync);
$('q').addEventListener('scroll', sync);
sync();

function setStatus(msg, err) {
  const s = $('status'); s.textContent = msg; s.className = err ? 'err' : '';
}
async function post(path, body) {
  const r = await fetch(path, { method: 'POST', body: JSON.stringify(body) });
  return await r.json();
}
async function run(selection) {
  $('out').innerHTML = '';
  setStatus('submitting…');
  const body = { query: $('q').value, maxRows: 500 };
  if (selection) {
    // cursor line from the textarea caret (editor-selection surface)
    const ta = $('q');
    body.querySelection = selection;
    body.line = ta.value.slice(0, ta.selectionStart).split('\n').length;
  }
  const sub = await post('/api/v1/query', body);
  if (!sub.queryId) { setStatus(sub.error || 'submit failed', true); return; }
  setStatus('running ' + sub.queryId + '…');
  let info;
  for (;;) {
    info = await (await fetch('/api/v1/query/' + sub.queryId)).json();
    if (info.status !== 'running') break;
    await new Promise(res => setTimeout(res, 300));
  }
  if (info.status === 'failed') { setStatus(info.error, true); return; }
  setStatus('finished — ' + info.totalRows + ' row(s)' +
            (info.truncated ? ' (truncated)' : ''));
  if (!info.schema.length) return;
  const tbl = document.createElement('table');
  const hdr = tbl.insertRow();
  info.schema.forEach(c => {
    const th = document.createElement('th');
    th.textContent = c.name + ' : ' + c.typeName;
    hdr.appendChild(th);
  });
  let rows = info.rows, token = info.pageToken;
  while (token) {  // drain remaining pages
    const page = await (await fetch('/api/v1/query/' + sub.queryId +
                                    '?pageToken=' + token)).json();
    rows = rows.concat(page.rows); token = page.pageToken;
  }
  rows.forEach(r => {
    const tr = tbl.insertRow();
    r.forEach(v => { tr.insertCell().textContent = v === null ? 'null' : v; });
  });
  $('out').appendChild(tbl);
  const note = document.createElement('div');
  note.className = 'dim';
  note.textContent = 'query ' + sub.queryId;
  $('out').appendChild(note);
}
async function fmt() {
  const resp = await post('/api/v1/fmt', { query: $('q').value });
  if (resp.formatted) { $('q').value = resp.formatted; sync(); setStatus('formatted'); }
  else setStatus(resp.error || 'format failed', true);
}
async function transpileSql() {
  const resp = await post('/api/v1/transpile', { sql: $('q').value });
  if (resp.query) { $('q').value = resp.query; sync(); setStatus('transpiled'); }
  else setStatus(resp.error || 'transpile failed', true);
}
</script>
</body>
</html>
"""
}
