"""GIMS-TPU: a TPU-native image-matching framework.

A from-scratch JAX/XLA/Pallas rebuild of the GIMS image-matching system
(adaptive graph construction + graph-attentional matching + optimal transport),
re-designed for TPU hardware:

* fixed-shape, bucketed-padding pipelines (every (bucket0, bucket1) pair
  compiles once and replays),
* dense masked graph ops instead of networkx/DGL/cKDTree,
* flash-style (blockwise) masked attention for the 18-layer GNN,
* fixed-iteration log-domain Sinkhorn under ``jax.lax.fori_loop``,
* data parallelism via ``jax.sharding.Mesh`` + ``shard_map`` with ICI
  collectives.

Reference behavior parity: songxf1024/GIMS (see SURVEY.md at repo root).
"""

__version__ = "0.1.0"

from gims_tpu.config import GIMSConfig, AGCConfig, MatcherConfig  # noqa: F401
