"""Mesh + sharding helpers (the DP/TP plumbing around the jitted steps).

Data parallelism: batch axis sharded over the 'data' mesh axis; the jitted
train step then runs SPMD and XLA inserts psum for gradients and the global
batch moments of BatchNorm (sync-BN for free). Model state is replicated.

A second 'model' axis is accepted for sharding the non-local attention's
ndataset dimension at whole-scene scale (the CP/ring-attention analog,
SURVEY.md §5.7) — unused by the parity configs, which fit one chip.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a device mesh. Default: all local devices on one 'data' axis."""
    devices = jax.devices()
    n = num_devices or len(devices)
    if len(devices) < n:
        raise RuntimeError(
            f"make_mesh: asked for {n} devices but the initialized "
            f"'{devices[0].platform}' backend exposes only {len(devices)}. "
            "For virtual-device testing, force the CPU platform with "
            "n host devices BEFORE any backend init (see tests/conftest.py), "
            "or call __graft_entry__.dryrun_multichip which self-provisions."
        )
    devices = devices[:n]
    if shape is None:
        shape = (n,) + (1,) * (len(axis_names) - 1)
    arr = np.array(devices).reshape(tuple(shape))
    return Mesh(arr, tuple(axis_names))


def batch_sharding(mesh: Mesh, ndim: int, axis: str = "data") -> NamedSharding:
    """Sharding that splits the leading (batch) dim over `axis`."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a host batch onto the mesh, sharded along the batch dimension."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x), axis)), batch
    )


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params / train state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def setup_data_parallel(state, batch_size: int, log=print):
    """Turn-key DP for a trainer: replicate the train state over all local
    devices and return (state, place_batch).

    `place_batch` shards a host array along its leading (batch) dim over the
    'data' axis; feeding every step's arrays through it makes the jitted
    train/eval steps run SPMD — XLA inserts psum for the gradient reduction
    and the BatchNorm batch moments (sync-BN) over ICI. The reference has no
    DP at all (SURVEY.md §2.9); this is the TPU-native design shared by all
    five trainers.
    """
    import jax.numpy as jnp

    devices = jax.devices()
    if len(devices) <= 1:
        log("data-parallel requested but only one device is visible; running single-device")
        return state, jnp.asarray

    mesh = make_mesh()
    ndev = mesh.devices.size
    if batch_size % ndev != 0:
        raise ValueError(
            f"batch_size {batch_size} not divisible by {ndev} devices"
        )
    state = replicate(state, mesh)
    log(f"data-parallel over {ndev} devices")

    def place_batch(x, dtype=None):
        x = np.asarray(x, dtype=dtype)
        return jax.device_put(x, batch_sharding(mesh, x.ndim))

    return state, place_batch


def setup_data_parallel_eval(state, log=print):
    """Turn-key DP for a TESTER: replicate the restored state and return
    (state, place) for batch-sharded SPMD inference.

    Unlike `setup_data_parallel` there is no strict divisibility check:
    eval streams can end in a ragged tail batch (e.g. the ModelNet test
    split), and vote batch sizes are user-overridable at test time. A
    divisible batch is sharded over the 'data' axis; a ragged one falls
    back to replicated placement — correct either way, the tail just runs
    without the speedup (and compiles a second executable for its
    sharding). Inference reads stored BN stats, so no cross-device state
    ever needs reconciling. The reference evaluates single-GPU only; this
    is the repo's own TPU-native surface (SURVEY.md §2.9).
    """
    import jax.numpy as jnp

    devices = jax.devices()
    if len(devices) <= 1:
        log("data-parallel requested but only one device is visible; "
            "running single-device")
        return state, jnp.asarray

    mesh = make_mesh()
    ndev = mesh.devices.size
    state = replicate(state, mesh)
    log(f"data-parallel eval over {ndev} devices")

    def place(x, dtype=None):
        x = np.asarray(x, dtype=dtype)
        if x.shape[0] % ndev == 0:
            return jax.device_put(x, batch_sharding(mesh, x.ndim))
        return jnp.asarray(x)

    return state, place
