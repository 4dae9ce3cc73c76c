package graft.server

/** Single-page query workbench served at `/` — a deliberately minimal
  * stand-in for the reference's bundled web UI (reference wvlet-ui-main/
  * WvletEditor + FileNav + QueryResultReader, and wvlet-ui-playground/
  * QueryNavigator + SQLPreview — Scala.js SPAs served by
  * StaticContentApi.scala). Same WHAT, a fraction of the HOW: one embedded
  * HTML page, zero build tooling, zero dependencies — every capability it
  * exercises is the public JSON API, so anything the page does a user's
  * own tooling can do too. Surfaces:
  *   - highlighted editor (transparent textarea over a token-colored pre,
  *     prismjs-graft token rules inlined)
  *   - table explorer sidebar (GET /api/v1/tables; click inserts a `from`,
  *     expands to column:type rows — the playground's QueryNavigator role)
  *   - compiled-SQL preview with a target-dialect selector over
  *     /api/v1/to_sql (the playground's SQLPreview pane, which shows the
  *     DuckDB SQL wvlet compiles to; here any of spark|duckdb|trino|hive)
  *   - run / run-at-cursor / describe / format / transpile actions
  *   - query history (localStorage ring, newest first)
  *   - CSV download of the rendered result page set
  */
object WebUi {

  val page: String =
    """<!doctype html>
<html>
<head>
<meta charset="utf-8">
<title>graft console</title>
<style>
  body { font-family: ui-monospace, SFMono-Regular, Menlo, monospace;
         margin: 1.25rem auto; max-width: 100rem; padding: 0 1rem; color: #1a1a1a; }
  h1 { font-size: 1.1rem; margin: 0 0 .75rem; }
  .layout { display: flex; gap: 1rem; align-items: flex-start; }
  #nav { flex: 0 0 15rem; border: 1px solid #ddd; border-radius: 4px;
         padding: .5rem; font-size: .8rem; max-height: 80vh; overflow: auto; }
  #nav h2 { font-size: .85rem; margin: .2rem 0 .4rem; color: #555; }
  #nav .tbl { cursor: pointer; padding: .1rem .2rem; }
  #nav .tbl:hover { background: #f0f4ff; }
  #nav .cols { margin: 0 0 .3rem .9rem; color: #666; display: none; }
  #nav .cols div { padding: 0 .2rem; }
  #nav .cols .ty { color: #7a5200; }
  main { flex: 1 1 auto; min-width: 0; }
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
  button, select { font: inherit; padding: .35rem .9rem; margin: .5rem .5rem 0 0;
           border: 1px solid #888; border-radius: 4px; background: #f4f4f4;
           cursor: pointer; }
  button:hover { background: #e8e8e8; }
  #status { margin: .75rem 0; color: #555; }
  #status.err { color: #b00020; white-space: pre-wrap; }
  table { border-collapse: collapse; margin-top: .5rem; font-size: .85rem; }
  th, td { border: 1px solid #ccc; padding: .25rem .6rem; text-align: left; }
  th { background: #f0f0f0; }
  .dim { color: #777; font-size: .8rem; margin-top: .4rem; }
  #sqlprev { display: none; margin-top: .6rem; border: 1px solid #ddd;
             border-radius: 4px; padding: .5rem; background: #fafafa;
             white-space: pre-wrap; font-size: .85rem; }
</style>
</head>
<body>
<h1>graft console <a href="/playground" style="font-weight:normal;font-size:.8rem;margin-left:1rem">playground &rarr;</a></h1>
<div class="layout">
<nav id="nav"><h2>tables</h2><div id="tbls">loading…</div></nav>
<main>
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
  <button onclick="sqlPreview()">compile&rarr;</button><select id="dialect">
    <option>spark</option><option>duckdb</option><option>trino</option><option>hive</option>
  </select>
  <select id="hist" onchange="restoreHist()"><option value="">history…</option></select>
  <button id="csv" style="display:none" onclick="downloadCsv()">download CSV</button>
</div>
<div id="sqlprev"></div>
<div id="status"></div>
<div id="out"></div>
</main>
</div>
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

// --- table explorer (GET /api/v1/tables) ---
async function loadTables() {
  try {
    const resp = await (await fetch('/api/v1/tables')).json();
    const box = $('tbls'); box.innerHTML = '';
    (resp.tables || []).forEach(t => {
      const d = document.createElement('div');
      d.className = 'tbl'; d.textContent = '▸ ' + t.name;
      const cols = document.createElement('div'); cols.className = 'cols';
      t.columns.forEach(c => {
        const row = document.createElement('div');
        row.innerHTML = esc(c.name) + ' : <span class="ty">' + esc(c.typeName) + '</span>';
        cols.appendChild(row);
      });
      d.onclick = () => {
        const open = cols.style.display === 'block';
        cols.style.display = open ? 'none' : 'block';
        d.textContent = (open ? '▸ ' : '▾ ') + t.name;
        if (!open && !$('q').value.trim()) { $('q').value = 'from ' + t.name; sync(); }
      };
      box.appendChild(d); box.appendChild(cols);
    });
    if (!(resp.tables || []).length) box.textContent = '(no tables)';
  } catch (e) { $('tbls').textContent = 'unavailable'; }
}
loadTables();

// --- query history (localStorage ring, newest first) ---
const HKEY = 'graft_console_history';
function histAll() {
  try { return JSON.parse(localStorage.getItem(HKEY) || '[]'); } catch (e) { return []; }
}
function histPush(q) {
  const xs = histAll().filter(x => x !== q); xs.unshift(q);
  localStorage.setItem(HKEY, JSON.stringify(xs.slice(0, 20)));
  renderHist();
}
function renderHist() {
  const sel = $('hist');
  sel.innerHTML = '<option value="">history…</option>';
  histAll().forEach((q, i) => {
    const o = document.createElement('option');
    o.value = String(i);
    o.textContent = q.replace(/\s+/g, ' ').slice(0, 60);
    sel.appendChild(o);
  });
}
function restoreHist() {
  const i = $('hist').value;
  if (i !== '') { $('q').value = histAll()[Number(i)]; sync(); $('hist').value = ''; }
}
renderHist();

// --- compiled-SQL preview (playground SQLPreview; /api/v1/to_sql) ---
async function sqlPreview() {
  const resp = await post('/api/v1/to_sql',
    { query: $('q').value, target: $('dialect').value });
  const box = $('sqlprev'); box.style.display = 'block';
  if (resp.sql) { box.textContent = '-- ' + $('dialect').value + '\n' + resp.sql; }
  else { box.textContent = 'error: ' + (resp.error || 'failed'); }
}

// --- results + CSV export ---
let lastResult = null;
function downloadCsv() {
  if (!lastResult) return;
  const escCsv = v => v === null ? '' :
    /[",\n]/.test(String(v)) ? '"' + String(v).replace(/"/g, '""') + '"' : String(v);
  const lines = [lastResult.schema.map(c => escCsv(c.name)).join(',')]
    .concat(lastResult.rows.map(r => r.map(escCsv).join(',')));
  const blob = new Blob([lines.join('\n') + '\n'], { type: 'text/csv' });
  const a = document.createElement('a');
  a.href = URL.createObjectURL(blob); a.download = 'result.csv'; a.click();
  URL.revokeObjectURL(a.href);
}

async function run(selection) {
  $('out').innerHTML = ''; $('csv').style.display = 'none'; lastResult = null;
  setStatus('submitting…');
  const body = { query: $('q').value, maxRows: 500 };
  if (selection) {
    // cursor line from the textarea caret (editor-selection surface)
    const ta = $('q');
    body.querySelection = selection;
    body.line = ta.value.slice(0, ta.selectionStart).split('\n').length;
  }
  histPush($('q').value);
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
  lastResult = { schema: info.schema, rows: rows };
  $('csv').style.display = '';
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
