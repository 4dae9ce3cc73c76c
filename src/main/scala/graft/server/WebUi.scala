package graft.server

/** Single-page query console served at `/` — a deliberately minimal stand-in
  * for the reference's bundled web UI (reference wvlet-ui-main/, a Scala.js
  * SPA served by StaticContentApi.scala). Same WHAT (browser query console
  * over the frontend API: submit, poll, render schema + rows, format), a
  * fraction of the HOW: one embedded HTML page, zero build tooling, zero
  * dependencies — every capability it exercises is the public JSON API, so
  * anything the page does a user's own tooling can do too. */
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
  textarea { width: 100%; height: 9rem; font: inherit; padding: .5rem;
             box-sizing: border-box; border: 1px solid #bbb; border-radius: 4px; }
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
<textarea id="q" spellcheck="false">from lineitem
group by l_returnflag
agg n = _.count, sum_qty = l_quantity.sum
order by l_returnflag</textarea>
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
  if (resp.formatted) { $('q').value = resp.formatted; setStatus('formatted'); }
  else setStatus(resp.error || 'format failed', true);
}
async function transpileSql() {
  const resp = await post('/api/v1/transpile', { sql: $('q').value });
  if (resp.query) { $('q').value = resp.query; setStatus('transpiled'); }
  else setStatus(resp.error || 'transpile failed', true);
}
</script>
</body>
</html>
"""
}
