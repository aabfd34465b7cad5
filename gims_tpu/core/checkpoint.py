"""Checkpoint IO.

Two formats:
* .npz flat-pytree — lightweight, dependency-free, used for model-only
  weights (descriptor nets, matcher variables).
* orbax — full train state (params, opt state, EMA, epoch/iter counters),
  used by the training loop with the reference's four-file policy
  (lastiter/minloss/last/best — reference: train.py:155-184).
"""

from __future__ import annotations

import os
from typing import Any, Dict

import numpy as np
import jax


SEP = "::"


def flatten_tree(tree) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = SEP.join(_key_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _key_str(p):
    if hasattr(p, "key"):
        return str(p.key)
    if hasattr(p, "idx"):
        return f"#{p.idx}"
    return str(p)


def save_npz(path: str, tree) -> None:
    np.savez(path, **flatten_tree(tree))


def unflatten_npz(path: str):
    data = np.load(path)
    tree: Dict[str, Any] = {}
    for key in data.files:
        parts = key.split(SEP)
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def save_orbax(path: str, state) -> None:
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, like=None):
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if like is not None:
        return ckptr.restore(path, like)
    return ckptr.restore(path)
