"""AGC parameter grid search.

Parity with reference tools/parameter_search.py:142-209: sweep
(radius, percentile, min_size) on one image pair, record
[r, t, m, correct_matches, total_matches, time] rows to record.xlsx and
record.txt. On TPU the sweep replays ONE compiled executable — the knobs
are traced scalars (see gims_tpu/api.py _jit_forward), so each combination
costs one device step instead of the reference's full 2-19 s rebuild.
"""

from __future__ import annotations

import argparse
import itertools
import os
import time
from typing import Optional

import cv2
import numpy as np


def search_process(matcher, param, image0, image1, image0_name, image1_name,
                   result_path):
    import pandas as pd

    radius, percentile, min_size = param
    t1 = time.perf_counter()
    pred = matcher({
        "image0": image0[None], "image1": image1[None],
        "radius": radius, "percentile": percentile, "min_size": min_size,
        "return_descriptors": False,
    })
    t2 = time.perf_counter()
    kpts0 = pred["keypoints0"][0]
    kpts1 = pred["keypoints1"][0]
    matches = pred["matches0"][0]
    valid = matches > -1
    mkpts0 = kpts0[valid]
    mkpts1 = kpts1[matches[valid]]
    try:
        H, mask = cv2.findHomography(
            np.float32(mkpts0), np.float32(mkpts1), cv2.USAC_DEFAULT
        )
        result_count = int((mask.ravel() == 1).sum())
        total_count = len(matches)
    except cv2.error:
        result_count, total_count = 0, 0
    print(f"{list(param)}, {image0_name}/{image1_name} => "
          f"{result_count}/{total_count}")
    row = list(param) + [result_count, total_count, t2 - t1]

    save_file = os.path.join(result_path, "record")
    columns = ["r", "t", "m", "correct_matches", "total_matches", "time"]
    try:  # xlsx needs openpyxl; fall back to csv with the xlsx name
        xlsx = save_file + ".xlsx"
        df_prev = pd.read_excel(xlsx) if os.path.exists(xlsx) else None
        df_new = pd.DataFrame([row], columns=columns)
        df = (pd.concat([df_prev, df_new], ignore_index=True)
              if df_prev is not None else df_new)
        df.to_excel(xlsx, index=False)
    except (ImportError, ValueError):
        import csv

        path = save_file + ".csv"
        new = not os.path.exists(path)
        with open(path, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(columns)
            w.writerow(row)
    with open(save_file + ".txt", "a+") as f:
        f.write(f"{row}\n")
    return row


def search(image0_path, image1_path, parameters, weights_path, output_dir,
           max_keypoints=-1, matcher=None):
    from gims_tpu.api import Matching

    if matcher is None:
        matcher = Matching({
            "weights_path": weights_path,
            "sinkhorn_iterations": 20,
            "match_threshold": 0.02,
            "max_keypoints": max_keypoints,
        })
    image0 = cv2.imread(image0_path, cv2.IMREAD_COLOR)
    image1 = cv2.imread(image1_path, cv2.IMREAD_COLOR)
    name0 = os.path.splitext(os.path.basename(image0_path))[0]
    name1 = os.path.splitext(os.path.basename(image1_path))[0]
    result_path = os.path.join(output_dir, f"{name0[:20]}_{name1[:20]}")
    os.makedirs(result_path, exist_ok=True)
    rows = []
    for param in parameters:
        try:
            rows.append(search_process(
                matcher, param, image0, image1, name0, name1, result_path
            ))
        except Exception as e:  # noqa: BLE001
            # error ping + keep sweeping (reference:
            # tools/parameter_search.py:206-209); no-op unless
            # GIMS_NOTIFY_URL is set
            from gims_tpu.core.notify import send_notify

            send_notify(f"parameter_search error at {list(param)}: {e}")
            print(f"search_process failed at {list(param)}: {e}")
    return rows


def main(argv=None):
    parser = argparse.ArgumentParser(description="GIMS-TPU parameter search")
    parser.add_argument("-i0", "--image0", type=str, required=True)
    parser.add_argument("-i1", "--image1", type=str, required=True)
    parser.add_argument("-r", "--r-range", type=str, default="10,30")
    parser.add_argument("-t", "--t-range", type=str, default="0,10")
    parser.add_argument("-m", "--m-range", type=str, default="0,10")
    parser.add_argument("-k", "--max-keypoints", type=int, default=-1)
    parser.add_argument("-w", "--weights", type=str, default=None)
    parser.add_argument("-o", "--output", type=str,
                        default="./output/search")
    args = parser.parse_args(argv)

    rs = [int(x) for x in args.r_range.split(",")]
    ts = [int(x) for x in args.t_range.split(",")]
    ms = [int(x) for x in args.m_range.split(",")]
    parameters = [
        list(p) for p in itertools.product(
            range(rs[0], rs[1] + 1), range(ts[0], ts[1] + 1),
            range(ms[0], ms[1] + 1),
        )
    ]
    search(args.image0, args.image1, parameters, args.weights, args.output,
           args.max_keypoints)


if __name__ == "__main__":
    main()
