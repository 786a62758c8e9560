"""The bundled dashboard page over the publisher endpoints.

The reference ships a prebuilt ECharts SPA under
``InsightAnalytics/src/main/resources/static/`` (e.g.
``static/js/app.077fdfec.js``) that consumes its three live endpoints.
This is the same product surface rebuilt self-contained: one HTML page,
vanilla JS, inline SVG bars — zero external assets (the container has
no CDN access, and the engine shouldn't depend on one), served by
``serving/http_server.py`` at ``/``.

It drives exactly the three real endpoints (`/dauRealtime`,
`/statsByItem`, `/detailByItem`) with the reference's parameter names;
the ~18 further endpoints the reference's JS mentions have no backend
there either (SURVEY.md §2.11) and are out of scope.
"""

from __future__ import annotations

DASHBOARD_HTML = """<!doctype html>
<html lang="en">
<head>
<meta charset="utf-8">
<title>Insight Analytics — publisher dashboard</title>
<style>
  body { font-family: system-ui, sans-serif; margin: 1.5rem; background: #fafafa; color: #222; }
  h1 { font-size: 1.3rem; } h2 { font-size: 1.05rem; margin: 0 0 .5rem; }
  .row { display: flex; gap: 1rem; flex-wrap: wrap; }
  .card { background: #fff; border: 1px solid #ddd; border-radius: 8px;
          padding: 1rem; flex: 1 1 360px; }
  .controls { margin-bottom: 1rem; display: flex; gap: .5rem; flex-wrap: wrap; align-items: center; }
  input, select, button { padding: .3rem .5rem; font: inherit; }
  table { border-collapse: collapse; width: 100%; font-size: .85rem; }
  th, td { border-bottom: 1px solid #eee; padding: .25rem .4rem; text-align: left; }
  .bar { fill: #4a7fd4; } .bar.yd { fill: #c9d7ee; }
  .err { color: #b00020; white-space: pre-wrap; }
  .kpi { font-size: 1.6rem; font-weight: 600; }
</style>
</head>
<body>
<h1>Insight Analytics</h1>
<div class="controls">
  <label>date <input id="td" type="date"></label>
  <label>item <input id="item" type="text" value="mouse" size="12"></label>
  <button id="go">refresh</button>
  <span id="status"></span>
</div>
<div class="row">
  <div class="card"><h2>DAU realtime (hourly, today vs yesterday)</h2>
    <div class="kpi" id="dauTotal"></div><svg id="dauChart" width="640" height="200"></svg></div>
  <div class="card"><h2>Stats by item — gender</h2><table id="gender"></table>
    <h2 style="margin-top:1rem">Stats by item — age</h2><table id="age"></table></div>
</div>
<div class="row" style="margin-top:1rem">
  <div class="card"><h2>Detail by item</h2>
    <div class="controls">
      <button id="prev">prev</button><span id="pageinfo"></span><button id="next">next</button>
    </div>
    <table id="detail"></table></div>
</div>
<script>
"use strict";
let pageNo = 1;
const $ = id => document.getElementById(id);
async function getJSON(path, params) {
  const u = new URL(path, location.origin);
  for (const [k, v] of Object.entries(params)) u.searchParams.set(k, v);
  const r = await fetch(u);
  const body = await r.json();
  if (!r.ok) throw new Error(path + ": " + (body.error || r.status));
  return body;
}
function bars(svg, today, yesterday) {
  svg.innerHTML = "";
  const W = svg.width.baseVal.value, H = svg.height.baseVal.value, n = 24;
  const max = Math.max(1, ...today, ...yesterday), bw = W / n;
  const ns = "http://www.w3.org/2000/svg";
  for (let h = 0; h < n; h++) {
    for (const [vals, cls, off] of [[yesterday, "bar yd", 1], [today, "bar", bw * 0.35 + 1]]) {
      const v = vals[h] || 0, bh = (H - 14) * v / max;
      const r = document.createElementNS(ns, "rect");
      r.setAttribute("x", h * bw + off); r.setAttribute("y", H - 14 - bh);
      r.setAttribute("width", bw * 0.33); r.setAttribute("height", bh);
      r.setAttribute("class", cls);
      const t = document.createElementNS(ns, "title");
      t.textContent = `${h}:00 — ${v}`; r.appendChild(t); svg.appendChild(r);
    }
    if (h % 4 === 0) {
      const txt = document.createElementNS(ns, "text");
      txt.setAttribute("x", h * bw); txt.setAttribute("y", H - 2);
      txt.setAttribute("font-size", "9"); txt.textContent = h + "h";
      svg.appendChild(txt);
    }
  }
}
function fillTable(el, rows, cols) {
  // DOM/textContent construction, never innerHTML with data values:
  // served columns (e.g. sku_name) are verbatim table strings, so
  // string-interpolated markup would execute as HTML (stored XSS)
  el.replaceChildren();
  const hr = document.createElement("tr");
  for (const c of cols) {
    const th = document.createElement("th");
    th.textContent = c; hr.appendChild(th);
  }
  el.appendChild(hr);
  for (const r of rows) {
    const tr = document.createElement("tr");
    for (const c of cols) {
      const td = document.createElement("td");
      td.textContent = r[c] ?? ""; tr.appendChild(td);
    }
    el.appendChild(tr);
  }
}
async function refresh() {
  const td = $("td").value, item = $("item").value;
  $("status").textContent = "loading…"; $("status").className = "";
  try {
    const dau = await getJSON("/dauRealtime", { td });
    $("dauTotal").textContent = "total: " + (dau.dauTotal ?? "–");
    const hours = x => { const a = Array(24).fill(0);
      for (const [h, v] of Object.entries(x || {})) a[+h] = v; return a; };
    bars($("dauChart"), hours(dau.dauTd), hours(dau.dauYd));
    for (const t of ["gender", "age"]) {
      const rows = await getJSON("/statsByItem", { itemName: item, date: td, t });
      fillTable($(t), rows, ["name", "value"]);
    }
    const det = await getJSON("/detailByItem",
      { date: td, itemName: item, pageNo, pageSize: 10 });
    const rows = det.detail || [];
    fillTable($("detail"), rows, rows.length ? Object.keys(rows[0]) : []);
    $("pageinfo").textContent = `page ${pageNo} — ${det.total ?? "?"} total`;
    $("status").textContent = "";
  } catch (e) { $("status").textContent = e.message; $("status").className = "err"; }
}
$("go").onclick = () => { pageNo = 1; refresh(); };
$("prev").onclick = () => { if (pageNo > 1) { pageNo--; refresh(); } };
$("next").onclick = () => { pageNo++; refresh(); };
$("td").value = new Date().toISOString().slice(0, 10);
refresh();
</script>
</body>
</html>
"""
