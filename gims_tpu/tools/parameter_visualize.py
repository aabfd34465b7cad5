"""Parameter-sweep visualization dashboard.

The reference ships a password-gated Dash/plotly web dashboard over the
parameter_search record files (reference: tools/parameter_visualize.py —
heatmaps per fixed r/t/m, 3-D scatter of correct matches and time, line
plots, ~20 interactive callbacks). Dash isn't available in this
environment, so the default output here is a SELF-CONTAINED interactive
HTML app: the sweep records are embedded as JSON and rendered
client-side (canvas heatmap with scene/metric/fix-axis/fix-value
controls, hover tooltips, per-axis summary lines, a sortable best-N
table, optional password gate) — the Dash callbacks become vanilla-JS
event handlers, no server round-trips needed. `--static` keeps the
matplotlib snapshot report; `--serve` hosts either via the stdlib HTTP
server.

Input: record.xlsx / record.txt files with rows [r, t, m, correct,
total, time] (tools/parameter_search.py output; same format as the
reference's tools/files/*/record.txt).
"""

from __future__ import annotations

import argparse
import ast
import base64
import io
import os
from pathlib import Path

import numpy as np


def load_records(path):
    """Load a record.xlsx or record.txt into an (N, 6) float array."""
    path = str(path)
    if path.endswith(".xlsx"):
        import pandas as pd

        df = pd.read_excel(path)
        return df.values.astype(float)
    rows = []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if line:
                rows.append(ast.literal_eval(line))
    return np.array(rows, float)


def _fig_to_b64(fig):
    import matplotlib.pyplot as plt

    buf = io.BytesIO()
    fig.savefig(buf, format="png", dpi=110, bbox_inches="tight")
    plt.close(fig)
    return base64.b64encode(buf.getvalue()).decode()


def _heatmap(records, fix_axis, fix_value, value_col=3):
    """Heatmap of `value_col` over the two free axes with one axis fixed."""
    import matplotlib.pyplot as plt

    axes = {0: "r", 1: "t", 2: "m"}
    free = [a for a in (0, 1, 2) if a != fix_axis]
    sel = records[records[:, fix_axis] == fix_value]
    if len(sel) == 0:
        return None
    xs = np.unique(sel[:, free[0]])
    ys = np.unique(sel[:, free[1]])
    grid = np.full((len(ys), len(xs)), np.nan)
    for row in sel:
        xi = np.searchsorted(xs, row[free[0]])
        yi = np.searchsorted(ys, row[free[1]])
        grid[yi, xi] = row[value_col]
    fig, ax = plt.subplots(figsize=(5, 4))
    im = ax.imshow(grid, origin="lower", aspect="auto", cmap="viridis",
                   extent=[xs.min(), xs.max(), ys.min(), ys.max()])
    ax.set_xlabel(axes[free[0]])
    ax.set_ylabel(axes[free[1]])
    name = "correct" if value_col == 3 else "time"
    ax.set_title(f"{name} @ {axes[fix_axis]}={fix_value:g}")
    fig.colorbar(im, ax=ax)
    return _fig_to_b64(fig)


def _scatter3d(records, value_col=3):
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(6, 5))
    ax = fig.add_subplot(111, projection="3d")
    sc = ax.scatter(records[:, 0], records[:, 1], records[:, 2],
                    c=records[:, value_col], cmap="viridis", s=18)
    ax.set_xlabel("r")
    ax.set_ylabel("t")
    ax.set_zlabel("m")
    name = "correct matches" if value_col == 3 else "time (s)"
    ax.set_title(f"3-D sweep: {name}")
    fig.colorbar(sc, ax=ax, shrink=0.7)
    return _fig_to_b64(fig)


def _lines(records):
    import matplotlib.pyplot as plt

    fig, axs = plt.subplots(1, 3, figsize=(13, 3.2))
    for i, name in enumerate(("r", "t", "m")):
        vals = np.unique(records[:, i])
        mean_c = [records[records[:, i] == v, 3].mean() for v in vals]
        mean_t = [records[records[:, i] == v, 5].mean() for v in vals]
        axs[i].plot(vals, mean_c, "o-", label="correct")
        ax2 = axs[i].twinx()
        ax2.plot(vals, mean_t, "s--", color="tab:red", label="time")
        axs[i].set_xlabel(name)
        axs[i].set_ylabel("mean correct")
        ax2.set_ylabel("mean time (s)")
    fig.tight_layout()
    return _fig_to_b64(fig)


def render_report(record_paths, out_html="parameter_report.html"):
    sections = []
    for path in record_paths:
        records = load_records(path)
        if len(records) == 0:
            continue
        imgs = []
        b = _scatter3d(records, 3)
        imgs.append(("3-D correct matches", b))
        imgs.append(("3-D time", _scatter3d(records, 5)))
        imgs.append(("axis summaries", _lines(records)))
        for axis in (0, 1, 2):
            vals = np.unique(records[:, axis])
            mid = vals[len(vals) // 2]
            hm = _heatmap(records, axis, mid)
            if hm:
                imgs.append((f"heatmap (fix axis {'rtm'[axis]}={mid:g})", hm))
        body = "".join(
            f"<h3>{title}</h3><img src='data:image/png;base64,{b64}'/>"
            for title, b64 in imgs if b64
        )
        sections.append(f"<h2>{Path(path).parent.name}</h2>{body}")
    html = (
        "<html><head><title>GIMS-TPU parameter sweeps</title></head>"
        "<body><h1>AGC parameter sweep report</h1>"
        + "".join(sections) + "</body></html>"
    )
    with open(out_html, "w") as f:
        f.write(html)
    return out_html


_APP_JS = r"""
const DATA = __DATA__;
const PASSWORD = __PASSWORD__;
const AXES = ['r', 't', 'm'];
let state = {scene: Object.keys(DATA)[0], metric: 3, fix: 2, fixVal: null};

function uniq(rows, col) {
  return [...new Set(rows.map(r => r[col]))].sort((a, b) => a - b);
}
function colormap(v) { // viridis-ish 5-stop ramp
  const stops = [[68,1,84],[59,82,139],[33,145,140],[94,201,98],[253,231,37]];
  const t = Math.max(0, Math.min(1, v)) * (stops.length - 1);
  const i = Math.min(Math.floor(t), stops.length - 2), f = t - i;
  const c = stops[i].map((x, k) => Math.round(x + f * (stops[i+1][k] - x)));
  return `rgb(${c[0]},${c[1]},${c[2]})`;
}
function drawHeatmap() {
  const rows = DATA[state.scene];
  const free = [0, 1, 2].filter(a => a !== state.fix);
  const sel = rows.filter(r => r[state.fix] === state.fixVal);
  const xs = uniq(sel, free[0]), ys = uniq(sel, free[1]);
  const cv = document.getElementById('hm'), ctx = cv.getContext('2d');
  ctx.clearRect(0, 0, cv.width, cv.height);
  if (!sel.length) return;
  const vals = sel.map(r => r[state.metric]);
  const lo = Math.min(...vals), hi = Math.max(...vals);
  const cw = (cv.width - 60) / xs.length, chh = (cv.height - 40) / ys.length;
  const cells = {};
  sel.forEach(r => {
    cells[`${r[free[0]]},${r[free[1]]}`] = r;
  });
  xs.forEach((x, xi) => ys.forEach((y, yi) => {
    const r = cells[`${x},${y}`];
    if (!r) return;
    const v = (r[state.metric] - lo) / Math.max(hi - lo, 1e-9);
    ctx.fillStyle = colormap(v);
    ctx.fillRect(50 + xi * cw, cv.height - 30 - (yi + 1) * chh, cw - 1, chh - 1);
  }));
  ctx.fillStyle = '#222'; ctx.font = '11px sans-serif';
  xs.forEach((x, xi) => ctx.fillText(x, 50 + xi * cw + cw / 2 - 6, cv.height - 14));
  ys.forEach((y, yi) => ctx.fillText(y, 18, cv.height - 30 - yi * chh - chh / 2 + 4));
  ctx.fillText(AXES[free[0]], cv.width / 2, cv.height - 2);
  ctx.save(); ctx.translate(8, cv.height / 2); ctx.rotate(-Math.PI / 2);
  ctx.fillText(AXES[free[1]], 0, 0); ctx.restore();
  cv.onmousemove = ev => {
    const b = cv.getBoundingClientRect();
    const xi = Math.floor((ev.clientX - b.left - 50) / cw);
    const yi = Math.floor((cv.height - 30 - (ev.clientY - b.top)) / chh);
    const tip = document.getElementById('tip');
    if (xi >= 0 && xi < xs.length && yi >= 0 && yi < ys.length) {
      const r = cells[`${xs[xi]},${ys[yi]}`];
      if (r) {
        tip.textContent = `r=${r[0]} t=${r[1]} m=${r[2]}  correct=${r[3]}/${r[4]}  time=${r[5].toFixed(2)}s`;
        return;
      }
    }
    tip.textContent = '';
  };
}
function drawLines() {
  const rows = DATA[state.scene];
  AXES.forEach((name, axis) => {
    const cv = document.getElementById('ln' + axis), ctx = cv.getContext('2d');
    ctx.clearRect(0, 0, cv.width, cv.height);
    const vals = uniq(rows, axis);
    const means = vals.map(v => {
      const sel = rows.filter(r => r[axis] === v);
      return sel.reduce((s, r) => s + r[state.metric], 0) / sel.length;
    });
    const lo = Math.min(...means), hi = Math.max(...means);
    ctx.strokeStyle = '#2a6'; ctx.beginPath();
    vals.forEach((v, i) => {
      const x = 28 + i * (cv.width - 40) / Math.max(vals.length - 1, 1);
      const y = cv.height - 22 - (means[i] - lo) / Math.max(hi - lo, 1e-9) * (cv.height - 36);
      i ? ctx.lineTo(x, y) : ctx.moveTo(x, y);
      ctx.fillStyle = '#222'; ctx.fillText(v, x - 6, cv.height - 8);
    });
    ctx.stroke();
    ctx.fillText(`mean ${state.metric === 3 ? 'correct' : 'time'} vs ${name}`, 30, 12);
  });
}
function drawTable() {
  const rows = [...DATA[state.scene]];
  rows.sort((a, b) => b[3] - a[3]);
  const top = rows.slice(0, 12);
  document.getElementById('tbl').innerHTML =
    '<tr><th>r</th><th>t</th><th>m</th><th>correct</th><th>total</th><th>time (s)</th></tr>' +
    top.map(r => `<tr><td>${r[0]}</td><td>${r[1]}</td><td>${r[2]}</td>` +
      `<td>${r[3]}</td><td>${r[4]}</td><td>${r[5].toFixed(2)}</td></tr>`).join('');
}
function refit() {
  const rows = DATA[state.scene];
  const vals = uniq(rows, state.fix);
  const slider = document.getElementById('fixval');
  slider.max = vals.length - 1;
  if (state.fixVal === null || !vals.includes(state.fixVal)) {
    slider.value = Math.floor(vals.length / 2);
  }
  state.fixVal = vals[slider.value];
  document.getElementById('fixlabel').textContent =
    `${AXES[state.fix]} = ${state.fixVal}`;
  drawHeatmap(); drawLines(); drawTable();
}
function init() {
  if (PASSWORD && prompt('password') !== PASSWORD) {
    document.body.innerHTML = '<h2>locked</h2>'; return;
  }
  const scene = document.getElementById('scene');
  Object.keys(DATA).forEach(k => scene.add(new Option(k, k)));
  scene.onchange = () => { state.scene = scene.value; state.fixVal = null; refit(); };
  document.getElementById('metric').onchange =
    e => { state.metric = +e.target.value; refit(); };
  document.getElementById('fixaxis').onchange =
    e => { state.fix = +e.target.value; state.fixVal = null; refit(); };
  document.getElementById('fixval').oninput = () => { state.fixVal = null; refit(); };
  refit();
}
window.onload = init;
"""

_APP_HTML = """<html><head><title>GIMS-TPU parameter sweeps</title>
<style>
 body {{ font-family: sans-serif; margin: 18px; }}
 canvas {{ border: 1px solid #ccc; margin: 4px; }}
 select, input {{ margin: 0 10px 0 4px; }}
 table {{ border-collapse: collapse; }}
 td, th {{ border: 1px solid #bbb; padding: 2px 10px; text-align: right; }}
 #tip {{ height: 18px; color: #333; font-size: 13px; }}
</style></head><body>
<h1>AGC parameter sweep dashboard</h1>
<div>
 scene <select id="scene"></select>
 metric <select id="metric"><option value="3">correct</option>
 <option value="5">time</option></select>
 fix axis <select id="fixaxis"><option value="0">r</option>
 <option value="1">t</option><option value="2" selected>m</option></select>
 <input type="range" id="fixval" min="0" max="0" value="0"/>
 <span id="fixlabel"></span>
</div>
<canvas id="hm" width="640" height="420"></canvas>
<div id="tip"></div>
<div>
 <canvas id="ln0" width="300" height="160"></canvas>
 <canvas id="ln1" width="300" height="160"></canvas>
 <canvas id="ln2" width="300" height="160"></canvas>
</div>
<h3>best parameter sets</h3>
<table id="tbl"></table>
<script>{script}</script>
</body></html>"""


def render_interactive(record_paths, out_html="parameter_dashboard.html",
                       password=None):
    """Self-contained interactive dashboard (the Dash-app replacement)."""
    import json

    data = {}
    for path in record_paths:
        records = load_records(path)
        if len(records):
            data[Path(path).parent.name or Path(path).stem] = (
                records.tolist()
            )
    script = _APP_JS.replace("__DATA__", json.dumps(data)).replace(
        "__PASSWORD__", json.dumps(password)
    )
    with open(out_html, "w") as f:
        f.write(_APP_HTML.format(script=script))
    return out_html


def serve(out_html, port=8050):
    """Minimal stdlib server replacing the Dash app."""
    import http.server
    import functools

    directory = str(Path(out_html).resolve().parent)
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=directory
    )
    print(f"Serving {out_html} at http://127.0.0.1:{port}/"
          f"{Path(out_html).name}")
    http.server.HTTPServer(("127.0.0.1", port), handler).serve_forever()


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("records", nargs="+",
                        help="record.txt / record.xlsx files")
    parser.add_argument("--out", type=str, default="parameter_report.html")
    parser.add_argument("--serve", action="store_true")
    parser.add_argument("--port", type=int, default=8050)
    parser.add_argument("--static", action="store_true",
                        help="matplotlib snapshot report instead of the "
                             "interactive app")
    parser.add_argument("--password", type=str, default=None,
                        help="optional access gate (reference parity: the "
                             "Dash app is password-protected)")
    args = parser.parse_args(argv)
    if args.static:
        out = render_report(args.records, args.out)
    else:
        out = render_interactive(args.records, args.out, args.password)
    print(f"wrote {out}")
    if args.serve:
        serve(out, args.port)


if __name__ == "__main__":
    main()
