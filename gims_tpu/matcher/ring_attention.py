"""Ring attention over a keypoint-sharded mesh axis.

The matcher's "sequence length" is the keypoint count N (SURVEY §5: the
reference materializes the full N x M score matrix per head and peaks at
7.38 GB for N ~ 15k — /root/reference/models/gmatcher.py:35-39). One v5e
chip comfortably holds the 12288 bucket; this module is the scale-OUT
primitive for keypoint counts beyond a single chip's HBM: shard the
keypoint axis over a 1-D mesh and run blockwise (flash-style) attention
with the K/V shards rotating around the ring via `lax.ppermute`, so no
device ever holds more than its 1/P slice of keys or the (n_l, m_l)
partial score tile.

Per ring step each device holds Q_local (N/P) against the visiting
K/V shard (M/P), folds it into an online-softmax accumulator (running
max / denominator — the same math as matcher/pallas_attention.py), and
forwards the shard to its ring neighbor. After P steps every query has
seen every key; results are bit-equal to dense masked attention up to
f32 rounding regardless of P.

Collectives ride the mesh axis (ICI on real hardware); there is no
host gather at any point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e9

# Process-level ring context: the mesh/axis that attention_impl="ring"
# dispatches over. Set by sharded.make_forward_match_sharded (or tests)
# before tracing; flax module attributes can't carry a Mesh cleanly
# through every layer, so the trunk reads it here at trace time.
_RING_CTX = {"mesh": None, "axis": "kp"}


def set_ring_mesh(mesh: Mesh, axis: str = "kp") -> None:
    """Select the mesh/axis used by masked_attention(impl='ring')."""
    _RING_CTX["mesh"] = mesh
    _RING_CTX["axis"] = axis


def get_ring_mesh():
    """(mesh, axis) for ring dispatch; raises if none was set."""
    if _RING_CTX["mesh"] is None:
        raise ValueError(
            "attention_impl='ring' needs set_ring_mesh(mesh, axis) first "
            "(see gims_tpu/matcher/sharded.py)")
    return _RING_CTX["mesh"], _RING_CTX["axis"]


def _ring_attention_local(q, k, v, bias, axis_name: str):
    """Per-shard body (runs under shard_map).

    q: (B, n_l, H, D) local queries; k, v: (B, m_l, H, D) resident K/V
    shard; bias: (B, m_l) additive key bias (0 / NEG_INF). Returns
    (B, n_l, H, D).
    """
    p = jax.lax.axis_size(axis_name)
    b, n_l, h, d = q.shape
    # pcast to=varying: the accumulators are per-shard state (they follow
    # the local q rows), so type them as varying over the mesh axis up
    # front — otherwise the fori_loop carry flips replicated -> varying
    acc = jax.lax.pcast(jnp.zeros((b, n_l, h, d), jnp.float32), axis_name,
                        to="varying")
    mx = jax.lax.pcast(
        jnp.full((b, n_l, h), NEG_INF, jnp.float32), axis_name, to="varying")
    den = jax.lax.pcast(jnp.zeros((b, n_l, h), jnp.float32), axis_name,
                        to="varying")
    scale = 1.0 / (float(d) ** 0.5)
    perm = [(i, (i + 1) % p) for i in range(p)]

    def step(i, carry):
        k_c, v_c, bias_c, acc, mx, den = carry
        s = jnp.einsum("bnhd,bmhd->bnhm", q, k_c,
                       preferred_element_type=jnp.float32) * scale
        s = s + bias_c[:, None, None, :]
        m_new = jnp.maximum(mx, jnp.max(s, axis=-1))
        corr = jnp.exp(mx - m_new)
        pm = jnp.exp(s - m_new[..., None])          # (B, n_l, H, m_l)
        den = den * corr + jnp.sum(pm, axis=-1)
        acc = acc * corr[..., None] + jnp.einsum(
            "bnhm,bmhd->bnhd", pm.astype(v_c.dtype), v_c,
            preferred_element_type=jnp.float32)
        mx = m_new
        k_c = jax.lax.ppermute(k_c, axis_name, perm)
        v_c = jax.lax.ppermute(v_c, axis_name, perm)
        bias_c = jax.lax.ppermute(bias_c, axis_name, perm)
        return k_c, v_c, bias_c, acc, mx, den

    _, _, _, acc, _, den = jax.lax.fori_loop(
        0, p, step, (k, v, bias, acc, mx, den))
    return (acc / jnp.maximum(den, 1e-30)[..., None]).astype(q.dtype)


@functools.partial(jax.jit, static_argnames=("mesh", "axis_name"))
def masked_attention_ring(q, k, v, key_mask, mesh: Mesh,
                          axis_name: str = "kp"):
    """Dense-equivalent masked attention, keypoint axis sharded over
    `mesh`'s `axis_name`.

    q: (B, N, H, D); k, v: (B, M, H, D); key_mask: (B, M) bool.
    N and M must be divisible by the mesh axis size. Same contract as
    masked_attention_direct; outputs gather back to the caller's sharding.
    """
    from jax import shard_map

    bias = jnp.where(key_mask, 0.0, NEG_INF).astype(jnp.float32)
    seq = P(None, axis_name, None, None)
    fn = shard_map(
        functools.partial(_ring_attention_local, axis_name=axis_name),
        mesh=mesh,
        in_specs=(seq, seq, seq, P(None, axis_name)),
        out_specs=seq,
    )
    sh = NamedSharding(mesh, seq)
    return fn(jax.device_put(q, sh), jax.device_put(k, sh),
              jax.device_put(v, sh),
              jax.device_put(bias, NamedSharding(mesh, P(None, axis_name))))
