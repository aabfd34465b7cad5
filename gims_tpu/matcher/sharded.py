"""Keypoint-axis scale-out: forward_match sharded over a device mesh.

The matcher's "sequence length" is the keypoint count N (SURVEY §5): the
reference materializes full N x M attention scores and an (N+1) x (M+1)
coupling, peaking at 7.38 GB for N ~ 15k (/root/reference/README.md:160)
— one modern chip holds that, but nothing in the reference can go
further. This module is the beyond-one-chip path: every O(N^2) tensor in
the pipeline — pairwise distances, cosine similarities, adjacency,
attention scores, the OT coupling — is sharded over a 1-D `kp` mesh axis
so P chips hold 1/P of each.

Mechanism (the scaling-book recipe): inputs arrive row-sharded
(`NamedSharding(mesh, P(None, 'kp'))`), `forward_match` runs under plain
`jit` and XLA's SPMD partitioner propagates the sharding through the
dense AGC, trunk, Sinkhorn, and extraction — `lax.with_sharding_constraint`
pins the (N, N) intermediates where propagation alone could replicate.
The 18-layer GNN dispatches to the ring-attention shard_map primitive
(`matcher/ring_attention.py`): K/V shards rotate around the mesh axis
via `lax.ppermute`, so no device ever holds more than its (n/P, m/P)
partial score tile.

Verified dense-equivalent on the 8-virtual-device CPU mesh
(tests/test_sharded.py), with a compiled-memory assertion that the
per-device footprint scales ~1/P.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gims_tpu.config import AGCConfig, MatcherConfig
from gims_tpu.matcher import pipeline


def _shard_cfg(mcfg: MatcherConfig) -> MatcherConfig:
    """The sharded trunk configuration: ring attention over the mesh axis
    (the Pallas kernel and the XLA flash scan are single-chip paths), XLA
    Sinkhorn (the Pallas streaming kernel is single-chip)."""
    return dataclasses.replace(
        mcfg,
        attention_impl="ring",
        use_pallas_sinkhorn=False,
    )


def make_forward_match_sharded(mcfg: MatcherConfig, acfg: AGCConfig,
                               mesh: Mesh, image_shape,
                               axis: str = "kp"):
    """Build a jitted forward_match whose keypoint axis is sharded over
    `mesh`'s `axis`. Returns fn(kpts0, desc0, valid0, kpts1, desc1,
    valid1, k0, k1) -> padded prediction dict (same contract as
    pipeline.forward_match).

    N and M must be divisible by the mesh axis size (pad the bucket up).
    """
    from gims_tpu.matcher import ring_attention

    mcfg_s = _shard_cfg(mcfg)
    ring_attention.set_ring_mesh(mesh, axis)

    row = NamedSharding(mesh, P(None, axis))        # (B, N, ...) row-sharded
    rep = NamedSharding(mesh, P())

    def fn(variables, kpts0, desc0, valid0, kpts1, desc1, valid1, k0, k1):
        # pin the row sharding on entry; GSPMD propagates it through the
        # dense AGC matrices and the trunk
        kpts0 = jax.lax.with_sharding_constraint(kpts0, row)
        desc0 = jax.lax.with_sharding_constraint(desc0, row)
        valid0 = jax.lax.with_sharding_constraint(valid0, row)
        kpts1 = jax.lax.with_sharding_constraint(kpts1, row)
        desc1 = jax.lax.with_sharding_constraint(desc1, row)
        valid1 = jax.lax.with_sharding_constraint(valid1, row)
        out = pipeline.forward_match(
            variables, mcfg_s, acfg,
            kpts0, desc0, valid0, kpts1, desc1, valid1,
            image_shape, k0=k0, k1=k1,
            shard_axis=axis,
        )
        # matches/scores ride home row-sharded; host code gathers
        return out

    jitted = jax.jit(fn)

    def call(variables, kpts0, desc0, valid0, kpts1, desc1, valid1,
             k0=None, k1=None):
        n = kpts0.shape[1]
        m = kpts1.shape[1]
        psz = mesh.devices.size
        if n % psz or m % psz:
            raise ValueError(
                f"buckets ({n}, {m}) must divide the {psz}-way mesh axis")
        args = [jax.device_put(a, row) for a in
                (kpts0, desc0, valid0, kpts1, desc1, valid1)]
        if k0 is None:
            # per-row valid counts: a (B, N) batch gets a (B,) rank vector
            # (summing over the whole batch would silently inflate the
            # percentile rank for B > 1)
            nv0 = np.asarray(jnp.sum(valid0, axis=1))
            nv1 = np.asarray(jnp.sum(valid1, axis=1))
            k0 = jnp.asarray(
                [pipeline.percentile_rank(int(v), acfg.percentile)
                 for v in nv0], jnp.int32)
            k1 = jnp.asarray(
                [pipeline.percentile_rank(int(v), acfg.percentile)
                 for v in nv1], jnp.int32)
        # re-bind the ring context before (re)tracing: another sharded
        # matcher built since construction may have pointed the process
        # global at a different mesh (ADVICE r3) — the jit cache is
        # per-matcher, so binding here guarantees every trace sees the
        # mesh this matcher was built with
        ring_attention.set_ring_mesh(mesh, axis)
        with jax.sharding.set_mesh(mesh):
            return jitted(jax.device_put(variables, rep), *args,
                          jax.device_put(k0, rep), jax.device_put(k1, rep))

    call.jitted = jitted
    call.mesh = mesh
    return call


def sharded_memory_analysis(mcfg: MatcherConfig, acfg: AGCConfig,
                            mesh: Mesh, image_shape, nb: int,
                            variables) -> Optional[dict]:
    """Compile the sharded program and report per-device temp memory —
    the evidence that the O(N^2) intermediates are physically sharded.
    Returns None when the backend exposes no memory analysis."""
    call = make_forward_match_sharded(mcfg, acfg, mesh, image_shape)
    b = 1
    sh = jax.ShapeDtypeStruct
    row = NamedSharding(mesh, P(None, "kp"))
    rep = NamedSharding(mesh, P())
    vab = jax.tree_util.tree_map(
        lambda x: sh(jnp.shape(x), jnp.result_type(x), sharding=rep),
        variables)
    args = [
        sh((b, nb, 2), jnp.float32, sharding=row),
        sh((b, nb, mcfg.input_dim), jnp.float32, sharding=row),
        sh((b, nb), jnp.bool_, sharding=row),
        sh((b, nb, 2), jnp.float32, sharding=row),
        sh((b, nb, mcfg.input_dim), jnp.float32, sharding=row),
        sh((b, nb), jnp.bool_, sharding=row),
        sh((b,), jnp.int32, sharding=rep),
        sh((b,), jnp.int32, sharding=rep),
    ]
    with jax.sharding.set_mesh(mesh):
        compiled = call.jitted.lower(vab, *args).compile()
    try:
        ma = compiled.memory_analysis()
        return {
            "temp_size_bytes": int(ma.temp_size_in_bytes),
            "argument_size_bytes": int(ma.argument_size_in_bytes),
        }
    except Exception:  # noqa: BLE001 - backend-dependent API
        return None
