"""Multi-host (DCN) initialization and per-host input sharding helpers.

Single-slice training uses ICI collectives only; for multi-host pods this
wires jax.distributed (the DCN layer) and splits the global batch across
hosts — each host feeds its local shard and `make_global_batch` assembles a
globally-sharded array (SURVEY.md §5.8: the compiler owns the comm backend;
there is no NCCL/MPI equivalent to configure).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Initialize the multi-host runtime (no-op on a single process)."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def local_batch_slice(global_batch_size: int) -> slice:
    """The [start, end) rows of the global batch this host must produce."""
    n_proc = jax.process_count()
    if global_batch_size % n_proc != 0:
        raise ValueError(f"global batch {global_batch_size} not divisible by {n_proc} hosts")
    per = global_batch_size // n_proc
    pid = jax.process_index()
    return slice(pid * per, (pid + 1) * per)


def make_global_batch(local_arrays, mesh: Mesh, axis: str = "data"):
    """Assemble per-host numpy shards into a globally-sharded jax.Array tree."""

    def to_global(x):
        x = np.asarray(x)
        global_shape = (x.shape[0] * jax.process_count(),) + x.shape[1:]
        sharding = NamedSharding(mesh, P(axis, *([None] * (x.ndim - 1))))
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(to_global, local_arrays)
