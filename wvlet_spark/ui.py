"""Browser playground for the query server — the reference's wvlet-ui
editor surface (reference: wvlet-ui-main/src/main/scala/wvlet/lang/ui/
component/editor/ QueryEditor.scala / QueryResultReader.scala /
ConsoleLogWindow.scala, served pages wvlet-ui-main/index.html) re-expressed
as one dependency-free static page over the FrontendApi JSON endpoints in
`wvlet_spark.server`.

Original implementation: vanilla HTML/JS in a Python string (the
environment is dependency-frozen and offline — no bundler, no CDN).  The
page speaks only the public endpoints: POST /v1/query (with cursor `line`
and `querySelection` so "run the subquery under the cursor" works like the
reference's QuerySelector), GET /v1/query/<id> for history recall, and
GET /v1/status for the header badge.
"""

from __future__ import annotations

PLAYGROUND_HTML = """<!DOCTYPE html>
<html lang="en">
<head>
<meta charset="utf-8"/>
<title>wvlet-spark playground</title>
<style>
  :root { color-scheme: dark; }
  * { box-sizing: border-box; }
  body { margin: 0; font: 14px/1.45 system-ui, sans-serif;
         background: #14161a; color: #d8dde4; }
  header { display: flex; align-items: baseline; gap: 12px;
           padding: 10px 16px; background: #1d2127;
           border-bottom: 1px solid #2c323b; }
  header h1 { font-size: 15px; margin: 0; color: #7cc4ff; }
  header .status { font-size: 12px; color: #8a93a0; }
  main { display: grid; grid-template-columns: 2fr 1fr; gap: 12px;
         padding: 12px 16px; }
  section.run { grid-column: 1; }
  aside.history { grid-column: 2; }
  textarea { width: 100%; height: 220px; background: #0f1115;
             color: #e6ebf1; border: 1px solid #2c323b; border-radius: 6px;
             padding: 10px; font: 13px/1.5 ui-monospace, monospace;
             resize: vertical; }
  .bar { display: flex; gap: 8px; align-items: center; margin: 8px 0; }
  button { background: #2563eb; color: #fff; border: 0; border-radius: 6px;
           padding: 6px 14px; font-size: 13px; cursor: pointer; }
  button:hover { background: #1d4ed8; }
  select { background: #1d2127; color: #d8dde4; border: 1px solid #2c323b;
           border-radius: 6px; padding: 5px 8px; }
  .muted { color: #8a93a0; font-size: 12px; }
  .error { background: #3b1d22; border: 1px solid #7f2b38; color: #ffb4c0;
           border-radius: 6px; padding: 8px 10px; margin: 8px 0;
           white-space: pre-wrap; font-family: ui-monospace, monospace; }
  .tests div { font-family: ui-monospace, monospace; font-size: 12px; }
  .tests .ok { color: #7ee2a8; } .tests .fail { color: #ffb4c0; }
  table { border-collapse: collapse; margin-top: 8px; max-width: 100%;
          display: block; overflow-x: auto; }
  th, td { border: 1px solid #2c323b; padding: 4px 9px; font-size: 12.5px;
           font-family: ui-monospace, monospace; white-space: nowrap; }
  th { background: #1d2127; color: #9fc6ef; position: sticky; top: 0; }
  details { margin-top: 8px; }
  pre.sql { background: #0f1115; border: 1px solid #2c323b;
            border-radius: 6px; padding: 8px 10px; overflow-x: auto;
            font-size: 12px; }
  aside.history ul { list-style: none; margin: 0; padding: 0; }
  aside.history li { padding: 6px 8px; border: 1px solid #2c323b;
                     border-radius: 6px; margin-bottom: 6px; cursor: pointer;
                     font-size: 12px; }
  aside.history li:hover { background: #1d2127; }
  aside.history li .q { font-family: ui-monospace, monospace;
                        color: #d8dde4; display: block; overflow: hidden;
                        text-overflow: ellipsis; white-space: nowrap; }
</style>
</head>
<body>
<header>
  <h1>wvlet-spark playground</h1>
  <span class="status" id="status">connecting&hellip;</span>
</header>
<main>
<section class="run">
  <textarea id="q" spellcheck="false" placeholder="from lineitem
where l_quantity &gt; 45
agg total = l_extendedprice.sum _ group by l_returnflag
order by total desc"></textarea>
  <div class="bar">
    <button id="run">Run (Ctrl+Enter)</button>
    <select id="mode" title="query selection at the cursor line">
      <option value="subquery">subquery at cursor</option>
      <option value="single">single statement</option>
      <option value="all_before">all before cursor</option>
      <option value="all" selected>whole script</option>
      <option value="describe">describe at cursor</option>
    </select>
    <label class="muted"><input type="checkbox" id="testrun" checked/>
      run <code>test</code> blocks</label>
    <span class="muted" id="meta"></span>
  </div>
  <div id="error" class="error" hidden></div>
  <div id="tests" class="tests"></div>
  <div id="result"></div>
  <details id="sqlbox" hidden><summary class="muted">compiled SQL</summary>
    <pre class="sql" id="sql"></pre></details>
</section>
<aside class="history">
  <div class="muted">history</div>
  <ul id="hist"></ul>
  <div class="muted" style="margin-top:12px">
    flow runs <button id="flowsRefresh"
      style="padding:2px 8px;font-size:11px">refresh</button>
  </div>
  <div id="flows" class="tests"></div>
</aside>
</main>
<script>
const $ = id => document.getElementById(id);

fetch('/v1/status').then(r => r.json()).then(s => {
  $('status').textContent =
    'v' + s.version + ' \\u00b7 up ' + Math.round(s.upTimeSec) + 's';
}).catch(() => { $('status').textContent = 'offline'; });

function cursorLine(ta) {
  return ta.value.slice(0, ta.selectionStart).split('\\n').length;
}

function render(info) {
  $('error').hidden = !info.error;
  if (info.error)
    $('error').textContent =
      (info.error.type || 'Error') + ': ' + info.error.message;
  $('meta').textContent = info.queryId
    ? info.queryId + ' \\u00b7 ' + info.elapsedMs + ' ms' +
      (info.clipped ? ' \\u00b7 clipped' : '') : '';
  $('tests').innerHTML = (info.testResults || []).map(([ok, msg]) =>
    '<div class="' + (ok ? 'ok' : 'fail') + '">' +
    (ok ? '\\u2713 ' : '\\u2717 ') + esc(msg) + '</div>').join('');
  const res = $('result');
  if (info.columns && info.columns.length) {
    let h = '<table><thead><tr>' + info.columns.map(c =>
      '<th>' + esc(c) + '</th>').join('') + '</tr></thead><tbody>';
    for (const row of info.rows)
      h += '<tr>' + row.map(v => '<td>' +
        esc(v === null ? 'null' : String(v)) + '</td>').join('') + '</tr>';
    res.innerHTML = h + '</tbody></table>';
  } else res.innerHTML =
    info.error ? '' : '<div class="muted">no result rows</div>';
  $('sqlbox').hidden = !info.sql;
  if (info.sql) $('sql').textContent = info.sql;
}

function esc(s) {
  return s.replace(/[&<>]/g,
    c => ({'&': '&amp;', '<': '&lt;', '>': '&gt;'}[c]));
}

const history = [];
function pushHistory(info, text) {
  history.unshift({id: info.queryId, text});
  if (history.length > 30) history.pop();
  $('hist').innerHTML = history.map(h =>
    '<li data-id="' + h.id + '"><span class="muted">' + h.id +
    '</span><span class="q">' + esc(h.text.split('\\n')[0]) +
    '</span></li>').join('');
}
$('hist').addEventListener('click', async ev => {
  const li = ev.target.closest('li');
  if (!li) return;
  const r = await fetch('/v1/query/' + li.dataset.id);
  if (r.ok) render(await r.json());
});

async function run() {
  const ta = $('q');
  $('meta').textContent = 'running\\u2026';
  const body = {
    query: ta.value,
    querySelection: $('mode').value,
    line: cursorLine(ta),
    isTestRun: $('testrun').checked,
    maxRows: 100,
  };
  let info;
  try {
    const r = await fetch('/v1/query', {
      method: 'POST',
      headers: {'Content-Type': 'application/json'},
      body: JSON.stringify(body),
    });
    info = await r.json();
  } catch (ex) {
    info = {error: {type: 'NetworkError', message: String(ex)},
            columns: [], rows: [], testResults: []};
  }
  render(info);
  if (info.queryId) pushHistory(info, ta.value);
}
async function refreshFlows() {
  try {
    const info = await (await fetch('/v1/flows')).json();
    const box = $('flows');
    if (!info.flows.length && !info.runs.length) {
      box.innerHTML = '<div class="muted">none</div>'; return;
    }
    let h = info.flows.map(f => '<div>' + esc(f.name) + ' (' +
      f.stages.length + ' stages)</div>').join('');
    for (const r of info.runs)
      h += '<div>' + esc(r.runId) + ' \\u00b7 ' + esc(r.flow) + ': ' +
        r.stages.map(s => '<span class="' +
          (s.state === 'failed' ? 'fail' : 'ok') + '">' + esc(s.stage) +
          '=' + esc(s.state) + '</span>').join(' ') + '</div>';
    box.innerHTML = h;
  } catch (ex) { $('flows').textContent = String(ex); }
}
$('flowsRefresh').addEventListener('click', refreshFlows);
refreshFlows();

$('run').addEventListener('click', run);
$('q').addEventListener('keydown', ev => {
  if ((ev.ctrlKey || ev.metaKey) && ev.key === 'Enter') {
    ev.preventDefault(); run();
  }
});
</script>
</body>
</html>
"""
