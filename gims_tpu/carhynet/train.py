"""CAR-HyNet descriptor training on patch-pair datasets.

The reference ships a pretrained car_hynet.pth and trains it out-of-repo
on UBC/HPatches (data plumbing: reference carhynet/util.py:193-391). This
module provides the equivalent in-framework capability: a UBC-montage
loader, the patch augmentation, and a jitted training loop with the
hybrid HyNet loss.
"""

from __future__ import annotations

import os
from typing import Iterator, Optional, Tuple

import cv2
import numpy as np
import jax
import jax.numpy as jnp
import optax

from gims_tpu.carhynet.model import CARHyNet
from gims_tpu.carhynet.loss import hynet_loss, cal_fpr95


def read_ubc_montages(root: str, sz_patch: int = 32, color: bool = True,
                      patch_raw: int = 64):
    """Read a UBC-format patch set: sorted .bmp montages of 64x64 patches
    (row-major) + info.txt whose first column is the 3D point id.

    Returns (patches (N, sz, sz, C) float32 /255, point_ids (N,))."""
    files = sorted(os.listdir(root))
    patches = []
    for name in files:
        if not name.endswith(".bmp"):
            continue
        flag = cv2.IMREAD_COLOR if color else cv2.IMREAD_GRAYSCALE
        img = cv2.imread(os.path.join(root, name), flag)
        rows = img.shape[0] // patch_raw
        cols = img.shape[1] // patch_raw
        for r in range(rows):
            for c in range(cols):
                p = img[r * patch_raw:(r + 1) * patch_raw,
                        c * patch_raw:(c + 1) * patch_raw]
                if sz_patch != patch_raw:
                    p = cv2.resize(p, (sz_patch, sz_patch))
                patches.append(p)
    info = os.path.join(root, "info.txt")
    ids = []
    if os.path.exists(info):
        with open(info) as f:
            ids = [int(line.split()[0]) for line in f if line.strip()]
    patches = np.asarray(patches, np.float32) / 255.0
    ids = np.asarray(ids[: len(patches)], np.int64)
    patches = patches[: len(ids)] if len(ids) else patches
    if patches.ndim == 3:
        patches = patches[..., None]
    return patches, ids


def sample_pairs(patches, point_ids, n_points, rng):
    """Pick n_points distinct 3D points and two patches of each
    (the reference's per-batch structure: diagonal = positive pairs)."""
    uniq, inverse, counts = np.unique(
        point_ids, return_inverse=True, return_counts=True
    )
    multi = np.nonzero(counts >= 2)[0]
    chosen = rng.choice(multi, size=n_points, replace=len(multi) < n_points)
    left, right = [], []
    for u in chosen:
        idxs = np.nonzero(inverse == u)[0]
        a, b = rng.choice(idxs, size=2, replace=len(idxs) < 2)
        left.append(a)
        right.append(b)
    return patches[left], patches[right]


def augment_patches(batch, rng):
    """Random 90-degree rotations and flips, consistent within a pair
    (reference capability: carhynet/util.py data_aug)."""
    out = batch.copy()
    for i in range(len(out)):
        k = rng.randint(4)
        out[i] = np.rot90(out[i], k)
        if rng.rand() < 0.5:
            out[i] = out[i][:, ::-1]
    return np.ascontiguousarray(out)


class SyntheticPatchPairs:
    """Stand-in patch-pair source: warped crops of procedural texture."""

    def __init__(self, n_points=20000, sz=32, seed=0):
        rng = np.random.RandomState(seed)
        tex = rng.randint(0, 255, (128, 128, 3)).astype(np.uint8)
        self.canvas = cv2.resize(tex, (1024, 1024),
                                 interpolation=cv2.INTER_CUBIC)
        self.sz = sz
        self.n_points = n_points
        self.rng = rng

    def batch(self, n):
        sz = self.sz
        left = np.empty((n, sz, sz, 3), np.float32)
        right = np.empty((n, sz, sz, 3), np.float32)
        for i in range(n):
            x = self.rng.randint(0, 1024 - 2 * sz)
            y = self.rng.randint(0, 1024 - 2 * sz)
            crop = self.canvas[y:y + 2 * sz, x:x + 2 * sz].astype(np.float32)
            left[i] = cv2.resize(crop, (sz, sz)) / 255.0
            ang = self.rng.uniform(-25, 25)
            M = cv2.getRotationMatrix2D((sz, sz), ang,
                                        self.rng.uniform(0.9, 1.1))
            warped = cv2.warpAffine(crop, M, (2 * sz, 2 * sz))
            right[i] = cv2.resize(warped, (sz, sz)) / 255.0
            right[i] += self.rng.randn(sz, sz, 3) * 0.02
        return left, np.clip(right, 0, 1)


def make_descriptor_train_step(model: CARHyNet, tx, margin=1.2, alpha=2.0,
                               is_sosr=True, knn_sos=8):
    @jax.jit
    def step(params, batch_stats, opt_state, left, right, dropout_key):
        def loss_fn(p):
            (dl, rl), upd1 = model.apply(
                {"params": p, "batch_stats": batch_stats}, left, train=True,
                mutable=["batch_stats"], rngs={"dropout": dropout_key},
            )
            (dr, rr), upd2 = model.apply(
                {"params": p, "batch_stats": upd1["batch_stats"]}, right,
                train=True, mutable=["batch_stats"],
                rngs={"dropout": jax.random.fold_in(dropout_key, 1)},
            )
            loss, dp, dn = hynet_loss(dl, dr, rl, rr, margin, alpha,
                                      is_sosr, knn_sos)
            return loss, (upd2["batch_stats"], dp, dn)

        (loss, (bs, dp, dn)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, bs, opt_state, loss, dp, dn

    return step


def train_descriptor(
    data_root: Optional[str] = None,
    steps: int = 1000,
    batch_points: int = 256,
    lr: float = 1e-3,
    seed: int = 0,
    log_every: int = 50,
    log_fn=print,
):
    """Train CAR-HyNet; UBC montages when data_root given, else synthetic."""
    rng = np.random.RandomState(seed)
    model = CARHyNet()
    variables = model.init(
        jax.random.PRNGKey(seed), jnp.zeros((2, 32, 32, 3)), train=False
    )
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    step = make_descriptor_train_step(model, tx)

    if data_root:
        patches, ids = read_ubc_montages(data_root)
        source = lambda n: sample_pairs(patches, ids, n, rng)
    else:
        synth = SyntheticPatchPairs(seed=seed)
        source = synth.batch

    key = jax.random.PRNGKey(seed)
    for it in range(steps):
        left, right = source(batch_points)
        left = augment_patches(left, rng)
        right = augment_patches(right, rng)
        key, sub = jax.random.split(key)
        params, batch_stats, opt_state, loss, dp, dn = step(
            params, batch_stats, opt_state,
            jnp.asarray(left), jnp.asarray(right), sub,
        )
        if (it + 1) % log_every == 0 or it == 0:
            log_fn(f"[{it}] loss={float(loss):.2f} "
                   f"d_pos={float(dp):.3f} d_neg={float(dn):.3f}")
    return {"params": params, "batch_stats": batch_stats}
