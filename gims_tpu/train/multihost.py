"""Multi-host data parallelism (SURVEY.md §2.8's TPU-native mapping).

The reference is single-node: torch.multiprocessing.spawn + NCCL over
localhost (reference: train.py:189-208). The TPU-native multi-HOST
equivalent is one JAX process per host joined through
`jax.distributed.initialize`, a single global Mesh over every host's
devices, and the SAME shard_map/pmean train step (train/step.py) — XLA
lowers the gradient pmean to ICI/DCN collectives across hosts.

Pieces (each replaces a reference mechanism):
  initialize()            <- dist.init_process_group('nccl')
  is_main()               <- the reference's rank-0 checks (train.py:34)
  global_mesh()           <- DDP's implicit world process group
  process_batch_slice()   <- DistributedSampler (train.py:66): every
                             process keeps the same global order and
                             takes its own contiguous rows of each batch
  globalize_batch()       <- scatter of per-rank batches: assembles the
                             per-process host rows into one global
                             jax.Array sharded over the data axis
  replicate()             <- DDP's broadcast of initial parameters

Validated across real process boundaries (2 CPU-backend processes, gloo
collectives) by scripts/multihost_dp_demo.py -> docs/multihost_dp.json.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_ids: Optional[list] = None):
    """Join the global runtime. Call BEFORE any other jax API touches a
    backend. coordinator: "host:port" of process 0."""
    kwargs = {}
    if local_device_ids is not None:
        kwargs["local_device_ids"] = local_device_ids
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )


def is_main() -> bool:
    """True on the logging/checkpointing process (reference rank 0)."""
    return jax.process_index() == 0


def global_mesh(axis: str = "data") -> Mesh:
    """1-D mesh over EVERY process's devices."""
    return Mesh(np.asarray(jax.devices()), (axis,))


def process_batch_slice(global_batch_size: int) -> slice:
    """This process's contiguous rows of each global batch — the
    DistributedSampler analog. Every process builds the same global
    index order (same seed) and materializes only these rows."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n_proc} processes")
    per = global_batch_size // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def globalize_batch(mesh: Mesh, batch, axis: str = "data"):
    """Per-process host rows -> one global jax.Array per leaf, sharded
    over the data axis. Leaves must be batch-major with identical
    per-process row counts."""
    sharding = NamedSharding(mesh, P(axis))

    def leaf(x):
        return jax.make_array_from_process_local_data(
            sharding, np.asarray(x))

    return jax.tree_util.tree_map(leaf, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a (same-valued on every process) host tree onto every
    device of the global mesh — DDP's parameter broadcast equivalent
    (processes init from the same seed, like the reference's same-seed
    init; the sharding constraint makes the replication explicit)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
