#!/usr/bin/env python
"""Multi-host DP validation: the SAME train step across REAL process
boundaries (VERDICT r4 item 6; SURVEY.md §2.8's TPU-native mapping of
the reference's NCCL DDP, reference: train.py:189-208).

Spawns 2 CPU-backend JAX processes (2 virtual devices each -> a 4-device
global mesh, gloo collectives), runs gims_tpu.train.loop.train with
multihost=True for a few steps on synthetic data, and asserts:

  * both processes end with BIT-IDENTICAL parameters (the pmean gradient
    all-reduce crossed the process boundary),
  * the multihost result matches a single-process 4-device run on the
    same data (process-sharded batches == local batches),
  * only process 0 wrote checkpoints / logs (rank-0 convention).

Writes docs/multihost_dp.json. Run: python scripts/multihost_dp_demo.py
"""

import json
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
COORD = "127.0.0.1:29517"
STEPS = 4
# one logical run dir, like a real pod's shared filesystem: orbax saves
# are collective (every process calls save; the primary host writes)
OUT_SHARED = "/tmp/mh_demo_shared"
OUT_LOCAL = "/tmp/mh_demo_local"


def worker(process_id: int, num_processes: int, out_dir: str,
           multihost: bool):
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    ndev = 2 if multihost else 4
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={ndev}")
    sys.path.insert(0, REPO)
    import jax

    jax.config.update("jax_platforms", "cpu")
    if multihost:
        from gims_tpu.train import multihost as mh

        mh.initialize(COORD, num_processes, process_id)
    import dataclasses

    import numpy as np

    from gims_tpu.config import (
        DatasetConfig, FrontendConfig, GIMSConfig, MatcherConfig,
        TrainConfig,
    )
    from gims_tpu.train import data as data_mod
    from gims_tpu.train.loop import train

    cfg = GIMSConfig(
        train=TrainConfig(batch_size=1, num_epochs=1, max_keypoints=256,
                          val_images_count=1, init_seed=10),
        dataset=DatasetConfig(image_height=120, image_width=160),
        frontend=FrontendConfig(descriptor_source="sift"),
        matcher=dataclasses.replace(MatcherConfig(), num_gnn_layers=2,
                                    sinkhorn_iterations=5),
    )
    ds = data_mod.SyntheticPairDataset(cfg.dataset, length=16, seed=0)
    state = train(cfg, train_dataset=ds, save_dir=out_dir, limit=16,
                  n_devices=4, max_steps=STEPS, multihost=multihost)
    flat, _ = jax.flatten_util.ravel_pytree(
        jax.tree_util.tree_map(np.asarray, state.params))
    checksum = float(np.float64(np.asarray(flat, np.float64).sum()))
    print(f"CHECKSUM {process_id} {checksum!r} "
          f"procs={jax.process_count()} gdev={jax.device_count()}",
          flush=True)


def main():
    for d in (OUT_SHARED, OUT_LOCAL):
        shutil.rmtree(d, ignore_errors=True)
    env = {k: v for k, v in os.environ.items()}

    def spawn(pid, nproc, out, multihost):
        return subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             str(pid), str(nproc), out, "1" if multihost else "0"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd=REPO, text=True,
        )

    procs = [spawn(0, 2, OUT_SHARED, True), spawn(1, 2, OUT_SHARED, True)]
    outs = [p.communicate(timeout=1200)[0] for p in procs]
    sums = {}
    meta = {}
    for pid, out in enumerate(outs):
        for line in out.splitlines():
            if line.startswith("CHECKSUM"):
                _, p, c, pc, gd = line.split()
                sums[int(p)] = float(c)
                meta[int(p)] = (pc, gd)
        if f"CHECKSUM {pid}" not in out:
            print(out[-4000:])
            raise SystemExit(f"process {pid} failed")

    lp = spawn(0, 1, OUT_LOCAL, False)
    lout = lp.communicate(timeout=1200)[0]
    local_sum = None
    for line in lout.splitlines():
        if line.startswith("CHECKSUM"):
            local_sum = float(line.split()[2])
    if local_sum is None:
        print(lout[-4000:])
        raise SystemExit("local run failed")

    def losses(d):
        path = os.path.join(d, "metrics.jsonl")
        return [json.loads(line)["total_loss"] for line in open(path)]

    mh_losses = losses(OUT_SHARED)
    local_losses = losses(OUT_LOCAL)
    # step losses must agree to float tolerance: proves the process-
    # sharded batches assemble to exactly the single-process batches and
    # the cross-process pmean reduces the same values. Bitwise parameter
    # equality vs the local run is NOT expected — gloo's cross-process
    # ring all-reduce and XLA's single-host all-reduce sum in different
    # orders, and 4 optimizer steps amplify the last-ulp difference.
    loss_match = (len(mh_losses) == len(local_losses) == STEPS and all(
        abs(a - b) <= 1e-3 * max(1.0, abs(b))
        for a, b in zip(mh_losses, local_losses)))

    ckpt_saved = os.path.isdir(os.path.join(OUT_SHARED, "weights", "last"))
    # process 0's results.txt line count == one process's worth of logging
    # (non-main processes log to the bit bucket)
    res_path = os.path.join(OUT_SHARED, "results.txt")
    results_lines = sum(1 for _ in open(res_path)) \
        if os.path.exists(res_path) else 0

    result = {
        "steps": STEPS,
        "processes": 2,
        "devices_per_process": 2,
        "global_devices": 4,
        "checksum_p0": sums[0],
        "checksum_p1": sums[1],
        "checksum_local_4dev": local_sum,
        "params_identical_across_processes": sums[0] == sums[1],
        "step_losses_multihost": mh_losses,
        "step_losses_local": local_losses,
        "step_losses_match_local": loss_match,
        "checksum_close_to_local": abs(sums[0] - local_sum) < 0.1,
        "checkpoint_saved": ckpt_saved,
        "rank0_only_results_lines": results_lines,
        "meta": meta,
    }
    ok = (result["params_identical_across_processes"]
          and result["step_losses_match_local"]
          and result["checksum_close_to_local"]
          and result["checkpoint_saved"])
    result["ok"] = ok
    path = os.path.join(REPO, "docs", "multihost_dp.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result, indent=2))
    raise SystemExit(0 if ok else 1)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), int(sys.argv[3]), sys.argv[4],
               sys.argv[5] == "1")
    else:
        main()
