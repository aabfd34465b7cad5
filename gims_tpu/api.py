"""Public matching API — preserves the reference's dict contract.

`Matching` mirrors reference models/matching.py:8-30: feed a dict with
`image0`/`image1` (numpy (1,H,W,3) or (H,W,3) uint8 BGR) and optional AGC
knobs; receive keypoints/descriptors/matches/matching_scores/mdesc per
side. Keypoint sets in the output are the AGC-kept subsets, exactly like
the reference's graph-pruned node data (reference: models/gmatcher.py:
244-252), with matches indexed into those compacted sets.

TPU structure: the frontend runs per image (host SIFT + device pyramid /
patches / CNN); the matcher core is one jitted program per
(bucket0, bucket1) pair.
"""

from __future__ import annotations

import functools
import time
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gims_tpu.config import GIMSConfig, AGCConfig, MatcherConfig, FrontendConfig
from gims_tpu.core.bucketing import pad_keypoint_set, compact_indices
from gims_tpu.frontend.feature import FeatureFrontend
from gims_tpu.matcher import pipeline
from gims_tpu.matcher.gmatcher import GMatcher
from gims_tpu.agc.graph import delaunay_adjacency_host


@functools.partial(jax.jit, static_argnums=(1, 2))
def _jit_forward(variables, mcfg, image_shape,
                 kpts0, desc0, valid0, kpts1, desc1, valid1, k0, k1,
                 radius, min_size):
    # AGC knobs travel as traced scalars: sweeping radius/percentile/
    # min_size (tools/parameter_search) replays one executable
    return pipeline.forward_match(
        variables, mcfg, AGCConfig(), kpts0, desc0, valid0,
        kpts1, desc1, valid1, image_shape, k0=k0, k1=k1,
        radius=radius, min_size=min_size,
    )


@functools.partial(jax.jit, static_argnums=(1, 2))
def _jit_forward_adj(variables, mcfg, image_shape,
                     kpts0, desc0, valid0, adj0, kpts1, desc1, valid1, adj1):
    return pipeline.forward_match(
        variables, mcfg, AGCConfig(), kpts0, desc0, valid0,
        kpts1, desc1, valid1, image_shape, adj0=adj0, adj1=adj1,
    )


def _as_hw3(img):
    img = np.asarray(img)
    if img.ndim == 4:
        img = img[0]
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    return np.ascontiguousarray(img.astype(np.uint8))


class Matching:
    """Image matching front API.

    config accepts the reference's keys (weights_path, sinkhorn_iterations,
    match_threshold, max_keypoints) or a full GIMSConfig.
    """

    def __init__(self, config=None, variables=None,
                 frontend: Optional[FeatureFrontend] = None, seed: int = 0):
        if isinstance(config, GIMSConfig):
            self.cfg = config
            self.max_keypoints = config.frontend.max_keypoints
        else:
            config = dict(config or {})
            # fast-by-default on TPU (like attention_impl="auto"):
            # bf16 attention + Pallas Sinkhorn unless overridden; CPU
            # keeps exact f32/XLA for tests and parity runs
            on_tpu = jax.default_backend() == "tpu"
            mcfg = MatcherConfig(
                sinkhorn_iterations=config.get("sinkhorn_iterations", 100),
                match_threshold=config.get("match_threshold", 0.2),
                attention_dtype=config.get(
                    "attention_dtype", "bfloat16" if on_tpu else "float32"),
                use_pallas_sinkhorn=config.get("use_pallas_sinkhorn", on_tpu),
            )
            self.cfg = GIMSConfig(matcher=mcfg)
            self.max_keypoints = config.get("max_keypoints", -1)
            weights_path = config.get("weights_path")
            if variables is None and weights_path:
                from gims_tpu.matcher.convert import load_gims_checkpoint

                variables = load_gims_checkpoint(weights_path)
                print(f'Loaded GMatcher model ("{weights_path}" weights)')

        if variables is None:
            variables = init_gmatcher_variables(self.cfg.matcher, seed)
        # pin weights on device once — numpy-backed trees (e.g. loaded
        # checkpoints) would otherwise re-upload ~50 MB per call
        self.variables = jax.device_put(variables)
        fe_cfg = self.cfg.frontend
        if isinstance(config, dict):
            import dataclasses

            if config.get("fast_frontend"):
                # fast mode: linear taps + direct 32x32 sampling — 12x fewer
                # gather rows (the TPU gather unit is row-count-bound); small
                # descriptor-quality tradeoff, see frontend/patches.py
                fe_cfg = dataclasses.replace(
                    fe_cfg, interpolation="linear", warp_size=32
                )
            if config.get("descriptor_source"):
                fe_cfg = dataclasses.replace(
                    fe_cfg, descriptor_source=config["descriptor_source"]
                )
            if config.get("detector"):
                fe_cfg = dataclasses.replace(
                    fe_cfg, detector=config["detector"]
                )
            if config.get("sift_descriptor"):
                fe_cfg = dataclasses.replace(
                    fe_cfg, sift_descriptor=config["sift_descriptor"]
                )
            if config.get("sift_samples"):
                fe_cfg = dataclasses.replace(
                    fe_cfg, sift_samples=int(config["sift_samples"])
                )
        self.frontend = frontend or FeatureFrontend(fe_cfg)
        self.timings = {}

    def __call__(self, data: dict) -> dict:
        mcfg = self.cfg.matcher
        import dataclasses as _dc

        # carry ALL configured AGC knobs (threshold/cc/reconnect impls
        # included); the data dict overrides the reference's four
        acfg = _dc.replace(
            self.cfg.agc,
            radius=float(data.get("radius", self.cfg.agc.radius)),
            percentile=float(data.get("percentile", self.cfg.agc.percentile)),
            min_size=int(data.get("min_size", self.cfg.agc.min_size)),
            delaunay=bool(data.get("delaunay", self.cfg.agc.delaunay)),
        )

        return_desc = bool(data.get("return_descriptors", True))

        feats = {}
        t0 = time.perf_counter()
        precomputed = data.get("features")
        for side in ("0", "1"):
            if precomputed is not None:
                feats[side] = precomputed[side]
                continue
            if f"keypoints{side}" in data:
                kpts = np.asarray(data[f"keypoints{side}"])
                descs = _desc_nd(np.asarray(data[f"descriptors{side}"]))
                scores = np.asarray(data[f"scores{side}"], np.float32)
                kp_p, de_p, sc_p, msk = pad_keypoint_set(kpts, descs, scores)
                feats[side] = {
                    "kpts": jnp.asarray(kp_p), "desc": jnp.asarray(de_p),
                    "valid": jnp.asarray(msk), "scores": sc_p,
                    "kpts_host": kp_p, "n": len(kpts),
                }
            else:
                img = _as_hw3(data[f"image{side}"])
                f = self.frontend.extract_padded(
                    img, max_keypoints=self.max_keypoints
                )
                nb = f["kpts"].shape[0]
                kp_p = np.full((nb, 2), 1e6, np.float32)
                kp_p[: f["n"]] = f["kp"].pt[: f["n"]]
                feats[side] = {**f, "kpts_host": kp_p}
        t1 = time.perf_counter()

        img0 = _as_hw3(data["image0"])
        image_shape = tuple(img0.shape[:2])

        f0, f1 = feats["0"], feats["1"]
        if acfg.delaunay:
            adj0 = delaunay_adjacency_host(f0["kpts_host"], np.asarray(f0["valid"]))
            adj1 = delaunay_adjacency_host(f1["kpts_host"], np.asarray(f1["valid"]))
            out = _jit_forward_adj(
                self.variables, mcfg, image_shape,
                f0["kpts"][None], f0["desc"][None], f0["valid"][None],
                jnp.asarray(adj0)[None],
                f1["kpts"][None], f1["desc"][None], f1["valid"][None],
                jnp.asarray(adj1)[None],
            )
        else:
            k0 = pipeline.percentile_rank(f0["n"], acfg.percentile)
            k1 = pipeline.percentile_rank(f1["n"], acfg.percentile)
            out = _jit_forward(
                self.variables, mcfg, image_shape,
                f0["kpts"][None], f0["desc"][None], f0["valid"][None],
                f1["kpts"][None], f1["desc"][None], f1["valid"][None],
                jnp.asarray([k0], np.int32), jnp.asarray([k1], np.int32),
                jnp.float32(acfg.radius), jnp.int32(acfg.min_size),
            )
        # download only the small outputs (and descriptors on request) —
        # in ONE batched device_get: each separate fetch costs a ~29 ms
        # RPC round-trip through the axon tunnel
        keys = ["kept0", "kept1", "matches0", "matches1",
                "matching_scores0", "matching_scores1"]
        host = {k: out[k] for k in keys}
        if return_desc:
            host["mdesc0"] = out["mdesc0"]
            host["mdesc1"] = out["mdesc1"]
            host["desc0"] = f0["desc"]
            host["desc1"] = f1["desc"]
        host = jax.device_get(host)
        t2 = time.perf_counter()
        self.timings = {
            "frontend": t1 - t0, "matcher": t2 - t1,
            **{f"frontend_{k}": v for k, v in self.frontend.timings.items()},
        }
        return self._compact(host, f0, f1, return_desc)

    def prepare_features(self, pair, agc=None):
        """Run the frontend for a pair ahead of time (pipelining hook).

        Host SIFT runs here; the device work is dispatched asynchronously,
        so a worker thread can overlap this with the previous pair's
        matcher. Returns the dict to pass as data["features"]."""
        from concurrent.futures import ThreadPoolExecutor

        img0, img1 = pair

        def one(img):
            f = self.frontend.extract_padded(
                _as_hw3(img), max_keypoints=self.max_keypoints
            )
            nb = f["kpts"].shape[0]
            kp_p = np.full((nb, 2), 1e6, np.float32)
            kp_p[: f["n"]] = f["kp"].pt[: f["n"]]
            return {**f, "kpts_host": kp_p}

        # cv2 SIFT releases the GIL: detecting both sides concurrently
        # hides one detect (~0.2 s) behind the other; device dispatches
        # from two threads are queue-ordered and safe
        with ThreadPoolExecutor(max_workers=2) as pool:
            f0, f1 = pool.map(one, (img0, img1))
        return {"0": f0, "1": f1}

    def _compact(self, out, f0, f1, return_desc):
        kept0 = out["kept0"][0]
        kept1 = out["kept1"][0]
        new0, old0 = compact_indices(kept0)
        new1, old1 = compact_indices(kept1)

        def remap(matches, new_other):
            m = matches.astype(np.int64)
            return np.where(m >= 0, new_other[np.clip(m, 0, None)], -1)

        matches0 = remap(out["matches0"][0][old0], new1)
        matches1 = remap(out["matches1"][0][old1], new0)
        pred = {
            "keypoints0": f0["kpts_host"][old0][None],
            "keypoints1": f1["kpts_host"][old1][None],
            "scores0": f0["scores"][old0][None],
            "scores1": f1["scores"][old1][None],
            "matches0": matches0.astype(np.int32)[None],
            "matches1": matches1.astype(np.int32)[None],
            "matching_scores0": out["matching_scores0"][0][old0][None],
            "matching_scores1": out["matching_scores1"][0][old1][None],
        }
        if return_desc:
            pred["descriptors0"] = out["desc0"][old0].T[None]
            pred["descriptors1"] = out["desc1"][old1].T[None]
            pred["mdesc0"] = out["mdesc0"][0][old0]
            pred["mdesc1"] = out["mdesc1"][0][old1]
        return pred


def _desc_nd(d):
    d = np.asarray(d, np.float32)
    if d.ndim == 2 and d.shape[0] in (128, 256) and d.shape[0] < d.shape[1]:
        return d.T  # (C, N) -> (N, C)
    return d


def init_gmatcher_variables(mcfg: MatcherConfig, seed: int = 0, nb: int = 32,
                            scheme: str = "default"):
    """Initialize GMatcher variables.

    scheme="default": flax initializers (reference-equivalent random init).
    scheme="identity": zero-residual warm start — every GNN layer's final
    MLP dense and the keypoint encoder's last dense start at zero (ReZero/
    Fixup-style, so the 18-layer trunk is the identity at step 0), the
    GraphSAGE stack starts as the duplication-averaging identity map, and
    final_proj starts as I. Then the initial score matrix IS the scaled
    descriptor similarity, i.e. the model starts at soft mutual-NN
    quality instead of random and training only has to learn the
    *refinement*. Sound for nonnegative descriptors (SIFT); CAR-HyNet
    descriptors pass ReLUs at a small loss of init fidelity.
    """
    gm = GMatcher(mcfg)
    z = lambda *s: jnp.zeros(s)
    variables = gm.init(
        jax.random.PRNGKey(seed),
        z(1, nb, 2), z(1, nb, mcfg.input_dim), jnp.zeros((1, nb, nb), bool),
        jnp.ones((1, nb), bool),
        z(1, nb, 2), z(1, nb, mcfg.input_dim), jnp.zeros((1, nb, nb), bool),
        jnp.ones((1, nb), bool),
    )
    if scheme == "identity":
        variables = _identity_warm_start(variables, mcfg)
    return variables


def _identity_warm_start(variables, mcfg: MatcherConfig):
    import flax

    params = flax.core.unfreeze(variables["params"]) if hasattr(
        flax.core, "unfreeze") else dict(variables["params"])
    d = mcfg.descriptor_dim
    h = d // 2

    def zero_like(p):
        return jax.tree_util.tree_map(jnp.zeros_like, p)

    # trunk residual branches -> 0 (last dense of each layer MLP)
    for name, layer in params["gnn"].items():
        layer["mlp"]["dense_1"] = zero_like(layer["mlp"]["dense_1"])
    # keypoint encoding -> 0 at init
    enc = params["kenc"]["encoder"]
    last = f"dense_{len(mcfg.keypoint_encoder)}"
    enc[last] = zero_like(enc[last])
    # SAGE = duplication-averaging identity chain (256 -> 128 -> 128 -> 256
    # for the default config), neighbor branch 0
    eye = jnp.eye(h)
    maps = [
        jnp.concatenate([eye, eye], axis=0) * 0.5,   # (256,128): avg halves
        eye,                                          # (128,128)
        jnp.concatenate([eye, eye], axis=1),          # (128,256): re-dup
    ]
    sage = params["gnn_encoder"]
    for i, m in enumerate(maps):
        lay = sage[f"layer_{i}"]
        if lay["fc_self"]["kernel"].shape == m.shape:
            lay["fc_self"]["kernel"] = m
            lay["fc_neigh"]["kernel"] = jnp.zeros_like(
                lay["fc_neigh"]["kernel"])
            lay["bias"] = jnp.zeros_like(lay["bias"])
    # final_proj = s*I with s^2 * ||dup_desc||^2 / sqrt(d) = 10: initial
    # logits are 10x the 128-d cosine similarity — sharp enough that
    # confident descriptor matches survive the 1/(M+N) OT dilution and the
    # 0.02 confidence threshold at step 0 (measured on a synthetic pair:
    # alpha=8 -> 127 matches @ 100% precision, 12 -> 227 @ 81%, 16 -> 362
    # @ 51% with max_keypoints=1024; training tunes it from there).
    s = float(np.sqrt(10.0 * np.sqrt(d) / 2.0))
    params["final_proj"]["kernel"] = jnp.eye(d) * s
    params["final_proj"]["bias"] = jnp.zeros_like(
        params["final_proj"]["bias"])
    return {**variables, "params": params}
