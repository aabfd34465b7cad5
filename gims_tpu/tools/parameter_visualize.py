"""Parameter-sweep visualization dashboard.

The reference ships a password-gated Dash/plotly web dashboard over the
parameter_search record files (reference: tools/parameter_visualize.py —
heatmaps per fixed r/t/m, 3-D scatter of correct matches and time, line
plots). Dash isn't available in this environment, so this module renders
the same views with matplotlib into a single static HTML report, and also
offers a lightweight stdlib HTTP server to browse it.

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
    args = parser.parse_args(argv)
    out = render_report(args.records, args.out)
    print(f"wrote {out}")
    if args.serve:
        serve(out, args.port)


if __name__ == "__main__":
    main()
