"""Descriptor engine: batched jit inference over patch sets.

Replaces the reference's HyNetnetFeature2D (reference:
carhynet/models.py:639-671), which loops over chunks of 512 patches under
no_grad. Here the whole patch set is padded to a bucket and run as one
XLA program per bucket size; compiled programs are cached.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from gims_tpu.carhynet.model import CARHyNet
from gims_tpu.core.bucketing import bucket_size

PATCH_BUCKETS = (512, 1024, 2048, 4096, 8192, 16384, 24576, 32768)


class DescriptorEngine:
    """Computes 128-d CAR-HyNet descriptors for (N, 32, 32, 3) patches."""

    def __init__(self, variables=None, weights_path: Optional[str] = None,
                 dim_desc: int = 128, seed: int = 0, in_channels: int = 3):
        self.dim_desc = dim_desc
        self.in_channels = in_channels
        self.model = CARHyNet(dim_desc=dim_desc, in_channels=in_channels)
        if variables is None:
            if weights_path is not None:
                variables = load_variables(weights_path, dim_desc)
            else:
                variables = self.model.init(
                    jax.random.PRNGKey(seed),
                    jnp.zeros((1, 32, 32, in_channels), jnp.float32),
                )
        self.variables = variables

        @functools.partial(jax.jit, static_argnums=())
        def _apply(vars_, patches):
            # accepts (N, 32, 32, C) or the flat (N, 32*32*C) device layout
            patches = patches.reshape(-1, 32, 32, in_channels)
            return self.model.apply(vars_, patches, train=False)

        self._apply = _apply

    def compute_device(self, patches) -> jnp.ndarray:
        """Device patches (Nb, 32, 32, 3) in [0,1] -> device (Nb, 128).

        Stays entirely on device; padded rows produce garbage descriptors
        that downstream masks ignore."""
        return self._apply(self.variables, patches)

    def compute(self, patches: np.ndarray) -> np.ndarray:
        """patches: (N, 32, 32, 3) float32 in [0, 1] -> (N, 128) float32."""
        n = patches.shape[0]
        if n == 0:
            return np.zeros((0, self.dim_desc), np.float32)
        nb = bucket_size(n, PATCH_BUCKETS)
        padded = np.zeros((nb, 32, 32, 3), np.float32)
        padded[:n] = patches
        out = self.compute_device(jnp.asarray(padded))
        return np.asarray(out)[:n]

    def compute_sift(self, patches, kps, color=True):
        """Reference-compatible surface (carhynet/models.py:667-670)."""
        if len(kps) == 0:
            return kps, []
        return kps, self.compute(np.asarray(patches, np.float32))


def load_variables(weights_path: str, dim_desc: int = 128):
    """Load CAR-HyNet weights from a torch .pth state dict or an orbax/npz
    checkpoint produced by this framework."""
    if weights_path.endswith((".pth", ".pt")):
        from gims_tpu.carhynet.convert import convert_carhynet_torch
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=True)
        return convert_carhynet_torch(sd)
    if weights_path.endswith(".npz"):
        from gims_tpu.core.checkpoint import unflatten_npz

        return unflatten_npz(weights_path)
    raise ValueError(f"unsupported weights format: {weights_path}")
