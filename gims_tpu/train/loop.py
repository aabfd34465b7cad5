"""Training orchestration — the reference train.py:28-186 rebuilt.

Per batch: host loads an image pair + synthesizes the homography, the
frontend computes fixed-count (2048) keypoints/descriptors on device, GT
correspondences come from the jitted reprojection matcher, and one jitted
train step (optionally shard_map'ed over a data-parallel mesh) updates the
model. Checkpoint policy parity: lastiter.pt every 2000 iters, minloss.pt
on a new rolling-mean minimum every 200, last/best per epoch by the
validation weighted score (reference: train.py:155-184) — stored via orbax.
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gims_tpu.config import GIMSConfig
from gims_tpu.api import Matching, init_gmatcher_variables
from gims_tpu.core import checkpoint as ckpt_io
from gims_tpu.frontend.feature import FeatureFrontend
from gims_tpu.matcher import pipeline
from gims_tpu.train import data as data_mod
from gims_tpu.train import gt as gt_mod
from gims_tpu.train import step as step_mod
from gims_tpu.eval import metrics as M
from gims_tpu.eval.homography import evaluate_pair


def extract_batch(frontend: FeatureFrontend, images, max_keypoints, seeds,
                  pool=None):
    """images: list of (H, W, 3) uint8 -> stacked padded DEVICE arrays.

    Each image gets its own topup RandomState (seeded by the caller) so a
    thread pool can extract sides concurrently — cv2 releases the GIL."""

    def one(args):
        img, seed = args
        return frontend.extract_padded(
            img, max_keypoints=max_keypoints, bucket=max_keypoints,
            train_topup=True, rng=np.random.RandomState(seed),
        )

    outs = list((pool.map if pool is not None else map)(
        one, zip(images, seeds)))
    kpts = [o["kpts"] for o in outs]
    descs = [o["desc"] for o in outs]
    valids = [o["valid"] for o in outs]
    return jnp.stack(kpts), jnp.stack(descs), jnp.stack(valids)


def row_seeds(idxs, base_seed: int) -> np.ndarray:
    """Per-image topup seeds derived from DATASET indices (orig images
    first, then warps — the builders' image order). Index-deterministic,
    so a process building only its shard of a batch draws exactly the
    seeds the whole-batch build would (multihost == single-process
    bitwise), and cached batches keep identical noise across epochs."""
    idxs = np.asarray(idxs, np.int64)
    out = []
    for side in (0, 1):
        out.append((base_seed + 1000003 * idxs + 7919 * side)
                   % (2**31 - 1))
    return np.concatenate(out).astype(np.int64)


def build_batch(frontend, pairs, max_keypoints, rng, pool=None, seeds=None):
    """pairs: list of (orig, warped, H) -> train-step batch dict."""
    origs = [p[0] for p in pairs]
    warps = [p[1] for p in pairs]
    Hs = np.stack([p[2] for p in pairs])
    if seeds is None:
        seeds = rng.randint(0, 2**31 - 1, size=2 * len(pairs))
    half = len(pairs)
    kpA, deA, vaA = extract_batch(frontend, origs + warps, max_keypoints,
                                  seeds, pool)
    kp0, de0, va0 = kpA[:half], deA[:half], vaA[:half]
    kp1, de1, va1 = kpA[half:], deA[half:], vaA[half:]

    rows_list, valid_list = [], []
    for b in range(len(pairs)):
        m0, m1 = gt_mod.find_matches(
            kp0[b], kp1[b], jnp.asarray(Hs[b]), va0[b], va1[b],
            dist_thresh=3.0, n_iters=1,
        )
        rows, valid = gt_mod.build_gt_rows(
            m0, m1, va0[b], va1[b], batch_index=0
        )
        rows_list.append(rows)
        valid_list.append(valid)
    # Descriptors ride (and cache) as bf16 128-d halves: every frontend
    # emits 256-d = concat([d, d]) duplicates (reference:
    # utils/common.py:891), so storing one half at bf16 costs 4x less HBM
    # (cached-feature fine-tuning at N=6144 would otherwise hold ~12 MB of
    # f32 descriptors per batch). The train step reconstructs f32 256-d.
    return {
        "kpts0": kp0, "desc0_h": de0[..., :128].astype(jnp.bfloat16),
        "valid0": va0,
        "kpts1": kp1, "desc1_h": de1[..., :128].astype(jnp.bfloat16),
        "valid1": va1,
        "gt_rows": jnp.stack(rows_list),
        "gt_valid": jnp.stack(valid_list),
    }


def build_batch_raw(fe_cfg, pairs, max_keypoints, rng, pool=None,
                    seeds=None):
    """Host-only batch builder for the fused SIFT train step: detect +
    describe on the host, pad, and ship four arrays; normalization and GT
    matching happen inside the jitted step (train/step.py)."""
    from gims_tpu.frontend.sift import detect_and_describe

    images = [p[0] for p in pairs] + [p[1] for p in pairs]
    if seeds is None:
        seeds = rng.randint(0, 2**31 - 1, size=len(images))
    nb = max_keypoints

    def one(args):
        img, seed = args
        kp, d = detect_and_describe(
            img, fe_cfg, max_keypoints, train_topup=True,
            rng=np.random.RandomState(seed),
        )
        n = min(len(kp), nb)
        kpts = np.full((nb, 2), 1e6, np.float32)
        kpts[:n] = kp.pt[:n]
        du8 = np.zeros((nb, 128), np.uint8)
        du8[:n] = d[:n]
        valid = np.zeros((nb,), bool)
        valid[:n] = True
        return kpts, du8, valid

    outs = list((pool.map if pool is not None else map)(
        one, zip(images, seeds)))
    half = len(pairs)
    kpts = np.stack([o[0] for o in outs])
    du8 = np.stack([o[1] for o in outs])
    valid = np.stack([o[2] for o in outs])
    return {
        "kpts0": jnp.asarray(kpts[:half]),
        "desc0_u8": jnp.asarray(du8[:half]),
        "valid0": jnp.asarray(valid[:half]),
        "kpts1": jnp.asarray(kpts[half:]),
        "desc1_u8": jnp.asarray(du8[half:]),
        "valid1": jnp.asarray(valid[half:]),
        "homography": jnp.asarray(
            np.stack([p[2] for p in pairs]).astype(np.float32)),
    }


def test_model(matcher: Matching, val_dataset, val_count: int, agc=None,
               min_matches: int = 12):
    """In-training validation (reference: utils/common.py:912-977):
    skipped pairs contribute penalty records (error=500, P=R=0)."""
    records = []
    for i in range(min(val_count, len(val_dataset))):
        image, warped, H = val_dataset[i]
        record, _ = evaluate_pair(matcher, image, warped, H, min_matches, agc)
        if record is None:
            record = {"error_dlt": 500.0, "error_ransac": 500.0,
                      "precision": 0.0, "recall": 0.0}
        records.append(record)
    thresholds = [5, 10, 25]
    results = {
        "dlt_auc": [100.0 * a for a in M.pose_auc(
            [r["error_dlt"] for r in records], thresholds)],
        "ransac_auc": [100.0 * a for a in M.pose_auc(
            [r["error_ransac"] for r in records], thresholds)],
        "precision": 100.0 * float(np.mean([r["precision"] for r in records])),
        "recall": 100.0 * float(np.mean([r["recall"] for r in records])),
        "thresholds": thresholds,
    }
    results["weight_score"] = M.weighted_score(results)
    return results


def build_batch_e2e(pairs):
    """Fused end-to-end batch: gray uint8 frames + homography only (the
    fused train step detects/describes in-graph — train/fused_step.py).
    One pair per device: a B-pair batch shards over the data mesh."""
    import cv2

    g0 = np.stack([cv2.cvtColor(p[0], cv2.COLOR_BGR2GRAY) for p in pairs])
    g1 = np.stack([cv2.cvtColor(p[1], cv2.COLOR_BGR2GRAY) for p in pairs])
    return {
        "img0_u8": jnp.asarray(g0),
        "img1_u8": jnp.asarray(g1),
        "homography": jnp.asarray(
            np.stack([p[2] for p in pairs]).astype(np.float32)),
    }


def train(cfg: GIMSConfig, train_dataset=None, val_dataset=None,
          save_dir: Optional[str] = None, limit: int = -1,
          n_devices: int = 1, carhynet_weights: Optional[str] = None,
          max_steps: int = -1, fast_frontend: bool = False,
          restore_path: Optional[str] = None, cache_features: bool = False,
          init_weights: Optional[str] = None, fused_e2e: bool = False,
          multihost: bool = False, log_fn=print):
    """Main loop. Returns the final TrainState.

    multihost=True: the process has joined a global runtime
    (multihost.initialize, one process per host). The data mesh spans
    EVERY process's devices, each process materializes only its own rows
    of each global batch (train/multihost.py process_batch_slice — the
    DistributedSampler analog, reference: train.py:66), and logging /
    checkpoints / validation run on process 0 only (the reference's
    rank-0 convention, train.py:34)."""
    tcfg = cfg.train
    mh = None
    is_main = True
    if multihost:
        from gims_tpu.train import multihost as mh

        if fused_e2e:
            raise NotImplementedError("multihost fused_e2e not wired yet")
        n_devices = jax.device_count()
        is_main = mh.is_main()
        if not is_main:
            log_fn = lambda *a, **k: None  # noqa: E731
    if fast_frontend:
        cfg = dataclasses.replace(
            cfg,
            frontend=dataclasses.replace(
                cfg.frontend, interpolation="linear", warp_size=32
            ),
        )
    save_dir = Path(save_dir or os.path.join(tcfg.output_dir, tcfg.experiment_name))
    weight_dir = save_dir / "weights"
    weight_dir.mkdir(parents=True, exist_ok=True)
    # non-main processes write to the bit bucket (rank-0 logging parity)
    results_file = open(
        save_dir / "results.txt" if is_main else os.devnull, "a")
    # structured metrics stream (the reference's optional wandb logging,
    # train.py:153-154, without the cloud dependency)
    metrics_file = open(
        save_dir / "metrics.jsonl" if is_main else os.devnull, "a")

    np.random.seed(tcfg.init_seed)
    rng = np.random.RandomState(tcfg.init_seed)

    frontend = FeatureFrontend(cfg.frontend, weights_path=carhynet_weights)
    variables = init_gmatcher_variables(
        cfg.matcher, seed=tcfg.init_seed, scheme=cfg.matcher.init_scheme
    )
    if fused_e2e:
        from gims_tpu.train import fused_step as fstep_mod

        if frontend.engine is None or cfg.frontend.descriptor_source \
                != "dense_gray":
            raise ValueError("fused_e2e requires descriptor_source="
                             "'dense_gray'")
        variables = fstep_mod.joint_variables(
            cfg, variables, frontend.engine.variables)

    if train_dataset is None:
        coco_dir = os.path.join(cfg.dataset.dataset_path, "train2017")
        if os.path.isdir(coco_dir):
            train_dataset = data_mod.CocoPairDataset(
                cfg.dataset, "train", limit=limit, seed=tcfg.init_seed
            )
        else:
            log_fn(f"[train] no COCO at {coco_dir}; using synthetic pairs")
            train_dataset = data_mod.SyntheticPairDataset(
                cfg.dataset, length=limit if limit > 0 else 1000,
                seed=tcfg.init_seed,
            )
    if val_dataset is None:
        val_dataset = data_mod.SyntheticPairDataset(
            cfg.dataset, length=tcfg.val_images_count, seed=999
        )

    bsz = tcfg.batch_size * n_devices
    num_batches = max(len(train_dataset) // bsz, 1)
    start_epoch = tcfg.start_epoch
    if restore_path:
        state, tx, r_epoch, r_it = restore_train_state(
            cfg, restore_path, num_batches, variables=variables
        )
        # iter == -1 marks an end-of-epoch checkpoint (last/best);
        # anything else resumes the same epoch from its start.
        start_epoch = r_epoch + 1 if r_it < 0 else r_epoch
        log_fn(f"[train] resumed {restore_path}: epoch {r_epoch} "
               f"iter {r_it} (opt step {int(state.step)})")
    else:
        if init_weights:
            # Warm start from exported npz weights (fine-tuning): model
            # params/batch_stats come from the file, the optimizer and LR
            # schedule start fresh (unlike --restore_path, which resumes
            # the full optimizer state and counters).
            loaded = ckpt_io.unflatten_npz(init_weights)
            warm = {
                "params": loaded["params"],
                "batch_stats": loaded.get(
                    "batch_stats", variables.get("batch_stats", {})),
            }
            if fused_e2e and "gmatcher" not in loaded["params"]:
                # matcher-only export: keep the engine's CNN variables —
                # unless a sibling <name>_car.npz (joint-e2e export pair,
                # scripts/export_checkpoint.py --e2e) warm-starts the CNN
                variables["params"]["gmatcher"] = warm["params"]
                variables["batch_stats"]["gmatcher"] = warm["batch_stats"]
                car_path = (init_weights[:-4] if init_weights.endswith(
                    ".npz") else init_weights) + "_car.npz"
                if os.path.exists(car_path):
                    car_loaded = ckpt_io.unflatten_npz(car_path)
                    variables["params"]["carhynet"] = car_loaded["params"]
                    variables["batch_stats"]["carhynet"] = car_loaded.get(
                        "batch_stats", variables["batch_stats"]["carhynet"])
                    log_fn(f"[train] CNN warm start from {car_path}")
            else:
                variables = warm
            log_fn(f"[train] warm start from {init_weights}")
        state, tx = step_mod.create_train_state(cfg, variables, num_batches)

    image_shape = (cfg.dataset.image_height, cfg.dataset.image_width)
    if fused_e2e:
        from gims_tpu.carhynet.model import CARHyNet
        from gims_tpu.frontend.detect_device import build_gray_blur
        from gims_tpu.fused import FusedMatching, octave_budgets

        budgets = octave_budgets(*image_shape, tcfg.max_keypoints,
                                 cfg.frontend.upsample)
        blur_mats = build_gray_blur(*image_shape, cfg.frontend.upsample)
        dense_model = CARHyNet(dense=True, in_channels=1)
        freeze_steps = tcfg.freeze_gmatcher_epochs * num_batches
        if freeze_steps:
            log_fn(f"[train] matcher frozen for first {freeze_steps} steps "
                   f"({tcfg.freeze_gmatcher_epochs} epochs)")
        if n_devices > 1:
            # DP over the pair batch, one pair per device: the same
            # shard_map/pmean wiring as the classic distributed step
            # (train/step.py); the whole fused extraction + joint loss
            # runs per shard, gradients all-reduce over ICI.
            from jax.sharding import Mesh, PartitionSpec as Pspec
            from jax import shard_map
            import functools as _ft

            if tcfg.batch_size != 1:
                raise ValueError("fused_e2e uses batch_size=1 per device")
            mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
            inner = fstep_mod.make_fused_e2e_train_step(
                cfg, tx, image_shape, budgets, blur_mats, None, dense_model,
                axis_name="data", freeze_steps=freeze_steps)
            step_fn = jax.jit(_ft.partial(
                shard_map, mesh=mesh,
                in_specs=(Pspec(), Pspec("data")),
                out_specs=(Pspec(), Pspec()),
                check_vma=False,
            )(inner))
        else:
            step_fn = jax.jit(fstep_mod.make_fused_e2e_train_step(
                cfg, tx, image_shape, budgets, blur_mats, None, dense_model,
                freeze_steps=freeze_steps))
        # validation runs the REAL fused inference program with the
        # current weights (bf16 dense maps, like bench/eval)
        fused_eval = FusedMatching({
            "sinkhorn_iterations": cfg.matcher.sinkhorn_iterations,
            "match_threshold": cfg.matcher.match_threshold,
            "attention_dtype": "bfloat16",
            "fast_frontend": True,
            "descriptor_source": "dense_gray",
            "upsample": cfg.frontend.upsample,
            "dense_layers": cfg.frontend.dense_layers,
            "dense_first_map_oct": cfg.frontend.dense_first_map_oct,
            "radius": cfg.agc.radius, "percentile": cfg.agc.percentile,
            "min_size": cfg.agc.min_size,
        }, variables=init_gmatcher_variables(cfg.matcher),
            total_keypoints=tcfg.max_keypoints)

        class _FusedEval:
            def __call__(self, data):
                return fused_eval(data["image0"][0], data["image1"][0])

        eval_matcher = _FusedEval()
    elif n_devices > 1:
        from jax.sharding import Mesh

        if multihost:
            # mesh over EVERY process's devices; the state becomes an
            # explicitly replicated global array (DDP broadcast analog)
            mesh = mh.global_mesh()
            state = mh.replicate(mesh, state)
        else:
            mesh = Mesh(np.array(jax.devices()[:n_devices]), ("data",))
        step_fn = step_mod.make_distributed_train_step(
            cfg, tx, image_shape, mesh
        )
    else:
        step_fn = jax.jit(step_mod.make_train_step(cfg, tx, image_shape))

    eval_matcher = (eval_matcher if fused_e2e else
                    Matching(cfg, variables=variables, frontend=frontend))

    best_val_score = 1e-10
    best_min_loss = 1e9
    order = np.arange(len(train_dataset))
    global_step = int(state.step)
    log_fn(f"Started training for {tcfg.num_epochs} epochs, "
           f"{num_batches} batches/epoch, {n_devices} device(s)")
    header = ("%10s" * 8) % ("Epoch", "Iter", "PosLoss", "NegLoss",
                             "TotLoss", "Dtime", "Ptime", "Mtime")
    # Pipelined host work: a prefetch worker prepares batch i+1 (dataset
    # synthesis + SIFT + GT dispatch) while the device runs step i; inside
    # a batch the per-image extracts run on a small thread pool (cv2
    # releases the GIL). The prefetch worker alone touches the dataset and
    # rng, so data order stays deterministic.
    from concurrent.futures import ThreadPoolExecutor

    side_pool = ThreadPoolExecutor(max_workers=max(2, 2 * tcfg.batch_size))
    prefetch = ThreadPoolExecutor(max_workers=1)

    fused_sift = cfg.frontend.descriptor_source == "sift"

    # cache_features: each batch's host work (pair synthesis + SIFT) runs
    # ONCE and the device arrays are reused every epoch. On this host's
    # single core the raw path is data-bound (~0.45 s/step vs 0.073 s of
    # device step time at 2048 kpts), so caching trains ~6x more steps per
    # wall-hour. Tradeoff: photometric aug and topup noise are frozen
    # after the first epoch. The arrays live in HBM (~1 MB/batch at 2048
    # kpts — a thousand cached batches is ~1 GB).
    batch_cache = {} if cache_features else None

    def make_batch(idxs):
        if multihost:
            # every process sees the same global order (same seed) and
            # materializes only its own contiguous rows
            idxs = idxs[mh.process_batch_slice(len(idxs))]
        key = tuple(int(i) for i in idxs) if cache_features else None
        if batch_cache is not None and key in batch_cache:
            return batch_cache[key], 0.0, 0.0
        t1 = time.time()
        pairs = [train_dataset[int(i)] for i in idxs]
        t2 = time.time()
        seeds = row_seeds(idxs, tcfg.init_seed)
        if fused_e2e:
            batch = build_batch_e2e(pairs)
        elif fused_sift:
            batch = build_batch_raw(cfg.frontend, pairs, tcfg.max_keypoints,
                                    rng, pool=side_pool, seeds=seeds)
        else:
            batch = build_batch(frontend, pairs, tcfg.max_keypoints, rng,
                                pool=side_pool, seeds=seeds)
        if multihost:
            batch = mh.globalize_batch(mesh, batch)
        if batch_cache is not None:
            batch_cache[key] = batch
        return batch, t2 - t1, time.time() - t2

    for epoch in range(start_epoch, tcfg.num_epochs):
        log_fn(header)
        if cache_features:
            # fixed batch composition (the cache key), shuffled batch ORDER:
            # regrouping would defeat the cache
            groups = order[: num_batches * bsz].reshape(num_batches, -1)[
                rng.permutation(num_batches)
            ]
            order = groups.reshape(-1)
        else:
            rng.shuffle(order)
        mloss = np.zeros(3)
        t5 = time.time()
        fut = prefetch.submit(make_batch, order[:bsz])
        # Metrics stay DEVICE arrays between flushes: a per-step host
        # readout costs a ~29 ms tunnel RPC and serializes the pipeline
        # (it multiplied cached-epoch step time ~6x). Buffered steps run
        # back-to-back; one batched device_get per flush interval reads
        # them all.
        flush_every = max(1, min(tcfg.log_interval, tcfg.minloss_every))
        pending = []

        def flush_pending():
            nonlocal mloss, best_min_loss
            if not pending:
                return
            import json as _json

            # ONE stacked transfer: fetching the tiny arrays individually
            # costs a ~29 ms RPC each (~9 s per 100-step flush)
            vals = np.asarray(jnp.stack([m for _, _, m, _ in pending]))
            for (ep_i, it_i, _, times), loss_items in zip(pending, vals):
                mloss = (mloss * it_i + loss_items) / (it_i + 1)
                log_fn(("%10s%10d" + "%10.4g" * 6) % (
                    str(ep_i), it_i, *mloss, *times))
                metrics_file.write(_json.dumps({
                    "epoch": ep_i, "iter": it_i,
                    "pos_loss": float(loss_items[0]),
                    "neg_loss": float(loss_items[1]),
                    "total_loss": float(loss_items[2]),
                    "mloss": float(mloss[2]),
                    "data_time": times[0], "preprocess_time": times[1],
                    "model_time": times[2],
                }) + "\n")
            metrics_file.flush()
            ep_i, it_i, _, _ = pending[-1]
            results_file.write(
                f"Epoch: {ep_i} Iter: {it_i}, Loss: {mloss[0]}\n")
            results_file.flush()
            pending.clear()

        for it in range(num_batches):
            batch, dt_data, dt_prep = fut.result()
            if it + 1 < num_batches and not (0 < max_steps <= global_step + 1):
                fut = prefetch.submit(
                    make_batch, order[(it + 1) * bsz:(it + 2) * bsz])
            t1 = time.time()
            state, metrics = step_fn(state, batch)
            mvec = metrics.get("vec")
            if mvec is None:
                mvec = jnp.stack([metrics["pos_loss"], metrics["neg_loss"],
                                  metrics["total_loss"]])
            pending.append((epoch, it, mvec,
                            (dt_data, dt_prep, time.time() - t1)))
            if (it + 1) % flush_every == 0 or it + 1 == num_batches \
                    or (0 < max_steps <= global_step + 1):
                flush_pending()
                # multihost: orbax saves are COLLECTIVE (every process
                # calls save into the shared run dir; orbax coordinates
                # and the primary host writes the replicated arrays).
                # Both conditions below are lockstep across processes —
                # counters are shared and mloss is pmean-reduced.
                ckpt_state = None
                if (it + 1) % tcfg.lastiter_every < flush_every:
                    ckpt_state = _ckpt_payload(state, epoch, it)
                    ckpt_io.save_orbax(str(weight_dir / "lastiter"),
                                       ckpt_state)
                if ((it + 1) % tcfg.minloss_every < flush_every
                        and mloss[2] < best_min_loss):
                    best_min_loss = float(mloss[2])
                    log_fn(f"save minloss {epoch} with loss {best_min_loss}")
                    ckpt_io.save_orbax(
                        str(weight_dir / "minloss"),
                        ckpt_state or _ckpt_payload(state, epoch, it),
                    )
            global_step += 1
            if 0 < max_steps <= global_step:
                break

        # per-epoch validation with the EMA (or raw) weights. Multihost:
        # the host-driven eval runs on process 0 only (the reference's
        # rank-0 test_model convention, train.py:169-184) and the score
        # is broadcast so every process takes the same best-checkpoint
        # branch; the orbax saves below are collective.
        run_val = not (multihost and not is_main)
        score = 0.0
        if run_val:
            eval_params = (state.ema_params if state.ema_params is not None
                           else state.params)
            if multihost:
                # global replicated arrays -> host numpy for the
                # single-device eval program
                eval_params = jax.tree_util.tree_map(np.asarray, eval_params)
            if fused_e2e:
                m_vars, c_vars = fstep_mod.split_joint(
                    eval_params, state.batch_stats)
                fused_eval.variables = jax.device_put(m_vars)
                fused_eval.car_variables = jax.device_put(c_vars)
            else:
                eval_matcher.variables = {
                    "params": eval_params,
                    "batch_stats": (
                        jax.tree_util.tree_map(np.asarray, state.batch_stats)
                        if multihost else state.batch_stats),
                }
            results = test_model(
                eval_matcher, val_dataset, tcfg.val_images_count,
                agc={"radius": cfg.agc.radius,
                     "percentile": cfg.agc.percentile,
                     "min_size": cfg.agc.min_size},
            )
            log_fn(f"Validation: {results}")
            score = float(results["weight_score"])
        if multihost:
            from jax.experimental import multihost_utils

            score = float(multihost_utils.broadcast_one_to_all(
                np.float32(score)))
        ckpt_state = _ckpt_payload(state, epoch, -1)
        ckpt_io.save_orbax(str(weight_dir / "last"), ckpt_state)
        if score > best_val_score:
            best_val_score = score
            log_fn(f"Saving best model at epoch {epoch} "
                   f"with score {best_val_score}")
            ckpt_io.save_orbax(str(weight_dir / "best"), ckpt_state)
        if 0 < max_steps <= global_step:
            break
    prefetch.shutdown(wait=False)
    side_pool.shutdown(wait=False)
    results_file.close()
    metrics_file.close()
    if multihost:
        # keep processes in lockstep through process-0-only epilogue work
        # (validation/checkpoints): an early exit would trip the runtime's
        # shutdown barrier while process 0 is still evaluating
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("gims_train_end")
    return state


def _ckpt_payload(state, epoch, it):
    return {
        "epoch": np.asarray(epoch),
        "iter": np.asarray(it),
        "params": state.params,
        "batch_stats": state.batch_stats,
        "ema": state.ema_params if state.ema_params is not None else {},
        "ema_updates": np.asarray(state.ema_updates),
        "opt_state": state.opt_state,
        "step": np.asarray(state.step),
    }


def restore_train_state(cfg: GIMSConfig, path: str, num_batches: int,
                        variables=None):
    """Real resume (the reference's restore_path is dead code —
    train.py never loads it; fixed here per SURVEY.md §7).

    variables: optional template tree (e.g. the joint fused-e2e tree);
    defaults to a fresh matcher init."""
    if variables is None:
        variables = init_gmatcher_variables(cfg.matcher)
    state, tx = step_mod.create_train_state(cfg, variables, num_batches)
    like = _ckpt_payload(state, 0, 0)
    loaded = ckpt_io.load_orbax(path, like)
    state = state.replace(
        step=jnp.asarray(loaded["step"]),
        params=loaded["params"],
        batch_stats=loaded["batch_stats"],
        opt_state=loaded["opt_state"],
        ema_params=(loaded["ema"] if cfg.train.use_ema else None),
        ema_updates=jnp.asarray(loaded["ema_updates"]),
    )
    return state, tx, int(loaded["epoch"]), int(loaded["iter"])
