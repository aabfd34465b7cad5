#!/usr/bin/env python
"""Sweep the fused-path throughput knobs on the real TPU.

Runs bench.py's fused mode across {batch} x {compact_to} x {topk_impl}
and prints one JSON line per combination plus a final ranking, so a
single command decides the shipped defaults after a kernel change.

Usage: python scripts/bench_fused_sweep.py [--quick]
"""

import argparse
import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_one(env_over):
    env = dict(os.environ)
    env.update({k: str(v) for k, v in env_over.items() if v is not None})
    env["GIMS_BENCH_MODE"] = "fused"
    p = subprocess.run(
        [sys.executable, os.path.join(ROOT, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600,
    )
    line = p.stdout.strip().splitlines()[-1] if p.stdout.strip() else "{}"
    try:
        out = json.loads(line)
    except json.JSONDecodeError:
        out = {"error": line[:200] or p.stderr[-200:]}
    out["knobs"] = {k: v for k, v in env_over.items() if v is not None}
    print(json.dumps(out), flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="batch {1,4} x compact {None,8192} only")
    ap.add_argument("--batches", type=int, nargs="*", default=None)
    ap.add_argument("--compacts", type=int, nargs="*", default=None)
    ap.add_argument("--knobs", default=None, choices=["ref", "tuned"],
                    help="bench knob set (GIMS_BENCH_KNOBS)")
    args = ap.parse_args()

    # budget stays 6144: the e2e weights are trained at that exact
    # detection geometry, so only dispatch batch and trunk compaction are
    # free knobs (both quality-checked after the winner is picked).
    batches = args.batches or ([1, 4] if args.quick else [8, 12, 16])
    compacts = args.compacts or ([None, 8192] if args.quick else [3072, 4096])

    results = []
    for b in batches:
        for c in compacts:
            results.append(run_one({
                "GIMS_BENCH_BATCH": b,
                "GIMS_BENCH_COMPACT": c,
                "GIMS_BENCH_PHOTOS": 0,
                "GIMS_BENCH_KNOBS": args.knobs,
            }))

    ok = [r for r in results if r.get("value")]
    ok.sort(key=lambda r: -r["value"])
    print("\n=== ranking (pairs/s) ===")
    for r in ok:
        print(f"{r['value']:8.3f}  {r['knobs']}  "
              f"avg_matches={r.get('avg_matches')}")


if __name__ == "__main__":
    main()
