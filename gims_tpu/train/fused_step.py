"""End-to-end fused training: the descriptor CNN learns jointly with the
matcher THROUGH the exact single-program pipeline that inference runs.

The staged trainer (train/step.py) treats the frontend as fixed: host (or
cached) features in, matcher gradients out. This step instead takes the
raw grayscale image pair + homography and runs the fused extraction
(fused._extract_side: device DoG detection on the gray pyramid, dense
convolutional CAR-HyNet maps, bilinear descriptor sampling) INSIDE the
jitted loss, so gradients flow through the descriptor samples into the
dense CNN while the matcher trains on the exact keypoint distribution and
descriptor geometry the fused eval program produces. Detection indices
(top-k, Newton offsets) depend only on the fixed gray pyramid — no
gradient path, no stop_gradient needed.

Replaces the reference's two-stage recipe (pretrained car_hynet.pth +
separate GMatcher training, reference: train.py:39 +
carhynet/models.py:649-653) with task-supervised joint training — the
in-env answer to the absent pretrained descriptor checkpoint.

Ground truth (reprojection matching) is computed in-graph from the pair
homography, so the host uploads only two gray frames + a 3x3 matrix per
step (and the cached-feature trainer can keep whole epochs device-resident
at ~1 MB/pair).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from gims_tpu.config import GIMSConfig
from gims_tpu.matcher import pipeline
from gims_tpu.train import gt as gt_mod
from gims_tpu.train import step as step_mod


def joint_variables(cfg: GIMSConfig, matcher_vars, car_vars):
    """Pack matcher + descriptor-CNN variables into one train tree."""
    return {
        "params": {
            "gmatcher": matcher_vars["params"],
            "carhynet": car_vars["params"],
        },
        "batch_stats": {
            "gmatcher": matcher_vars.get("batch_stats", {}),
            "carhynet": car_vars.get("batch_stats", {}),
        },
    }


def split_joint(params, batch_stats):
    """Inverse of joint_variables: (matcher_vars, car_vars)."""
    return (
        {"params": params["gmatcher"],
         "batch_stats": batch_stats.get("gmatcher", {})},
        {"params": params["carhynet"],
         "batch_stats": batch_stats.get("carhynet", {})},
    )


def descriptor_info_nce(d0, d1, m0, m1, va0, va1, tau: float = 0.1):
    """Symmetric InfoNCE over GT-corresponding descriptors.

    d0/d1: (N, D) L2-normalized descriptors (the 128-d halves); m0/m1:
    reprojection GT (index of the match on the other side, -1 = none);
    va0/va1: validity masks. Every other-side valid keypoint is a
    negative. This supervises the dense CNN *directly* (metric learning,
    like the reference's standalone Loss_HyNet triplet stage — reference:
    carhynet/models.py:520-636) alongside the task gradient that flows
    through AGC + trunk + Sinkhorn, which on its own moves descriptors
    only through 20 OT iterations' worth of softmax smoothing.
    """
    big_neg = jnp.float32(-1e9)

    def one_side(da, db, ma, vb):
        logits = jnp.matmul(da, db.T,
                            precision=jax.lax.Precision.HIGH) / tau
        logits = jnp.where(vb[None, :], logits, big_neg)
        logp = jax.nn.log_softmax(logits, axis=1)
        pos = ma >= 0
        tgt = jnp.clip(ma, 0)
        picked = jnp.take_along_axis(logp, tgt[:, None], axis=1)[:, 0]
        cnt = jnp.maximum(jnp.sum(pos.astype(jnp.float32)), 1.0)
        return -jnp.sum(jnp.where(pos, picked, 0.0)) / cnt

    return 0.5 * (one_side(d0, d1, m0, va1) + one_side(d1, d0, m1, va0))


def make_fused_e2e_train_step(cfg: GIMSConfig, tx, image_shape, budgets,
                              blur_mats, car_model, dense_model,
                              axis_name=None, freeze_steps: int = 0):
    """step(state, batch) -> (state, metrics).

    batch: img0_u8 (B, H, W) uint8 gray, img1_u8, homography (B, 3, 3).
    Requires batch_size 1 per device (the fused extraction is per-image;
    B=1 matches the reference's batch_size, configs/coco_config.yaml:6).

    freeze_steps > 0 stages the joint recipe: for the first freeze_steps
    optimizer steps the matcher params are held fixed (grads AND updates
    zeroed — zeroing grads alone would still let weight decay shrink the
    frozen weights) while the descriptor CNN learns against the
    warm-started matcher; joint updates from a fresh CNN at full LR were
    measured to destabilize both nets (epoch-1 loss 1.42 -> 2.47).

    cfg.train.desc_loss_weight > 0 adds the InfoNCE descriptor loss
    (descriptor_info_nce) on the GT correspondences.
    """
    from gims_tpu.fused import _extract_side

    mcfg, acfg = cfg.matcher, cfg.agc
    h, w = image_shape
    dlw = float(cfg.train.desc_loss_weight)
    import dataclasses

    # CNN compute in bf16 (params/grads/moments stay f32 — _extract_side
    # casts per-call): matches the eval program's dense_dtype AND halves
    # the conv tensors that dominate this step's HBM footprint. f32
    # compute put the 6144-budget step ~1.4 GB over the v5e's 15.75 G.
    fe = dataclasses.replace(cfg.frontend, descriptor_source="dense_gray",
                             dense_dtype=cfg.frontend.dense_dtype)

    def step(state: step_mod.TrainState, batch):
        img0 = batch["img0_u8"]
        img1 = batch["img1_u8"]
        Hmat = batch["homography"]
        assert img0.shape[0] == 1, "fused e2e step is per-pair (B=1)"

        def loss_fn(params):
            car_vars = {"params": params["carhynet"],
                        "batch_stats": state.batch_stats["carhynet"]}
            kp0, _sc0, va0, de0 = _extract_side(
                img0[0], h, w, budgets, fe, car_vars, None,
                dense_model, blur_mats)
            kp1, _sc1, va1, de1 = _extract_side(
                img1[0], h, w, budgets, fe, car_vars, None,
                dense_model, blur_mats)
            m0, m1 = gt_mod.find_matches(
                kp0, kp1, Hmat[0], va0, va1, dist_thresh=3.0, n_iters=1)
            rows, row_valid = gt_mod.build_gt_rows(
                m0, m1, va0, va1, batch_index=0)
            total, (pos, neg, updates) = pipeline.training_forward(
                {"params": params["gmatcher"],
                 "batch_stats": state.batch_stats["gmatcher"]},
                mcfg, acfg,
                kp0[None], de0[None], va0[None],
                kp1[None], de1[None], va1[None],
                rows, row_valid, image_shape,
            )
            if dlw > 0:
                dnce = descriptor_info_nce(
                    de0[:, :128], de1[:, :128], m0, m1, va0, va1)
                total = total + dlw * dnce
            return total, (pos, neg, updates)

        (total, (pos, neg, updates)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        metrics = {"total_loss": total, "pos_loss": pos, "neg_loss": neg,
                   "vec": jnp.stack([pos, neg, total])}
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            metrics = jax.lax.pmean(metrics, axis_name)
            updates = jax.lax.pmean(updates, axis_name)

        if freeze_steps > 0:
            frozen = state.step < freeze_steps

            def _gate(tree):
                return jax.tree_util.tree_map(
                    lambda g: jnp.where(frozen, jnp.zeros_like(g), g), tree)

            grads = dict(grads)
            grads["gmatcher"] = _gate(grads["gmatcher"])
        upd, opt_state = tx.update(grads, state.opt_state, state.params)
        if freeze_steps > 0:
            upd = dict(upd)
            upd["gmatcher"] = _gate(upd["gmatcher"])
        params = optax.apply_updates(state.params, upd)
        ema_params, ema_updates = state.ema_params, state.ema_updates
        if ema_params is not None:
            ema_params, ema_updates = step_mod.ema_update(
                ema_params, params, ema_updates)
        new_batch_stats = dict(state.batch_stats)
        new_batch_stats["gmatcher"] = updates.get(
            "batch_stats", state.batch_stats["gmatcher"])
        return state.replace(
            step=state.step + 1,
            params=params,
            batch_stats=new_batch_stats,
            opt_state=opt_state,
            ema_params=ema_params,
            ema_updates=ema_updates,
        ), metrics

    return step
