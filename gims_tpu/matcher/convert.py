"""Torch -> flax conversion for GMatcher checkpoints.

Maps the reference's state dict layout (models/gmatcher.py:165-217; the
checkpoint dict prefers 'ema' then 'model' keys, reference:
gmatcher.py:208-217) onto this framework's module tree. torch Conv1d
kernels (O, I, 1) become Dense kernels (I, O); BatchNorm1d running stats
land in batch_stats.
"""

from __future__ import annotations

import numpy as np


def _t(x):
    return np.asarray(x, dtype=np.float32)


def _conv1d_w(x):
    return _t(x)[:, :, 0].T  # (O, I, 1) -> (I, O)


def _linear_w(x):
    return _t(x).T


class _Builder:
    def __init__(self, sd):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params = {}
        self.stats = {}
        self.used = set()

    def get(self, key):
        self.used.add(key)
        return self.sd[key]

    def dense_from_conv1d(self, tp, fp):
        self.params[fp] = {
            "kernel": _conv1d_w(self.get(f"{tp}.weight")),
            "bias": _t(self.get(f"{tp}.bias")),
        }

    def dense_from_linear(self, tp, fp, bias=True):
        p = {"kernel": _linear_w(self.get(f"{tp}.weight"))}
        if bias:
            p["bias"] = _t(self.get(f"{tp}.bias"))
        self.params[fp] = p

    def bn(self, tp, fp):
        self.params[fp] = {
            "scale": _t(self.get(f"{tp}.weight")),
            "bias": _t(self.get(f"{tp}.bias")),
        }
        self.stats[fp] = {
            "mean": _t(self.get(f"{tp}.running_mean")),
            "var": _t(self.get(f"{tp}.running_var")),
        }
        self.used.add(f"{tp}.num_batches_tracked")

    def mlp(self, tp, fp, n_layers):
        """Reference MLP(): Sequential [conv, norm, relu]*(n-1) + conv —
        convs at 3i, norms at 3i+1."""
        for i in range(n_layers):
            self.dense_from_conv1d(f"{tp}.{3 * i}", f"{fp}/dense_{i}")
            if i < n_layers - 1:
                self.bn(f"{tp}.{3 * i + 1}", f"{fp}/norm_{i}")


def convert_gmatcher_torch(state_dict, num_gnn_layers=18,
                           kenc_layers=(32, 64, 128, 256),
                           has_input_proj=False):
    """Returns flax variables {'params': ..., 'batch_stats': ...}."""
    sd = dict(state_dict)
    # strip DDP 'module.' prefixes (reference: utils/common.py:107-114)
    sd = {
        (k[7:] if k.startswith("module.") else k): v for k, v in sd.items()
    }
    b = _Builder(sd)

    b.mlp("kenc.encoder", "kenc/encoder", len(kenc_layers) + 1)

    for i in range(num_gnn_layers):
        base = f"gnn.layers.{i}"
        fp = f"gnn/layer_{i}"
        for j, name in enumerate(("proj_q", "proj_k", "proj_v")):
            b.dense_from_conv1d(f"{base}.attn.proj.{j}", f"{fp}/attn/{name}")
        b.dense_from_conv1d(f"{base}.attn.merge", f"{fp}/attn/merge")
        b.mlp(f"{base}.mlp", f"{fp}/mlp", 2)

    for i in range(3):
        base = f"gnn_encoder.layers.{i}"
        fp = f"gnn_encoder/layer_{i}"
        b.dense_from_linear(f"{base}.fc_self", f"{fp}/fc_self", bias=False)
        b.dense_from_linear(f"{base}.fc_neigh", f"{fp}/fc_neigh", bias=False)
        # DGL stores the additive bias on the conv module itself
        b.params[fp] = {"bias": _t(b.get(f"{base}.bias"))}

    if has_input_proj:
        b.dense_from_linear("input_proj", "input_proj")
    b.dense_from_conv1d("final_proj", "final_proj")
    b.params["bin_score"] = _t(b.get("bin_score")).reshape(())

    unused = set(b.sd) - b.used
    if unused:
        raise ValueError(f"unconsumed torch keys: {sorted(unused)[:8]} ...")

    def nest(flat):
        tree = {}
        for path, leaf in flat.items():
            node = tree
            parts = path.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            last = parts[-1]
            if (
                last in node and isinstance(node[last], dict)
                and isinstance(leaf, dict)
            ):
                node[last].update(leaf)  # merge module-level extras (SAGE bias)
            else:
                node[last] = leaf
        return tree

    return {"params": nest(b.params), "batch_stats": nest(b.stats)}


def load_gims_checkpoint(path: str, **kwargs):
    """Load GMatcher weights from either format:

    - ``.npz``: this framework's native flat-pytree export
      (core.checkpoint.save_npz), returned as-is;
    - anything else: a reference torch training checkpoint (.pt),
      preferring the EMA weights like the reference loader
      (models/gmatcher.py:208-217).
    """
    if str(path).endswith(".npz"):
        from gims_tpu.core.checkpoint import unflatten_npz

        return unflatten_npz(path)
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict) and ckpt.get("ema") is not None:
        sd = ckpt["ema"]
    elif isinstance(ckpt, dict) and "model" in ckpt:
        sd = ckpt["model"]
    else:
        sd = ckpt
    return convert_gmatcher_torch(sd, **kwargs)
