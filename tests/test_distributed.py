"""Multi-host helpers (parallel/distributed.py), single-process behavior.

The DCN layer itself needs a pod; what is testable here is the host-side
contract: the local slice arithmetic, the global-batch assembly on the
8-device mesh with process_count()==1, and the no-op init path
(SURVEY.md §5.8).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pointasnl_tpu.parallel import make_mesh
from pointasnl_tpu.parallel.distributed import (
    initialize_distributed,
    local_batch_slice,
    make_global_batch,
)


def test_initialize_distributed_single_process_noop():
    # Must not attempt to reach a coordinator when num_processes <= 1/None.
    initialize_distributed()
    initialize_distributed(num_processes=1, process_id=0)
    assert jax.process_count() == 1


def test_local_batch_slice_single_process():
    s = local_batch_slice(16)
    assert (s.start, s.stop) == (0, 16)
    rows = np.arange(16)[s]
    assert rows.shape == (16,)


def test_local_batch_slice_divisibility_error():
    # 1 host divides everything; fake a 3-host world to hit the error path.
    class _Fake:
        def __call__(self):
            return 3

    orig = jax.process_count
    jax.process_count = _Fake()
    try:
        with pytest.raises(ValueError, match="not divisible"):
            local_batch_slice(16)
        s = local_batch_slice(12)
        assert (s.start, s.stop) == (0, 4)  # process_index()==0
    finally:
        jax.process_count = orig


def test_make_global_batch_shards_on_mesh(rng):
    mesh = make_mesh(num_devices=8, axis_names=("data",))
    local = {
        "points": rng.randn(8, 16, 3).astype(np.float32),
        "labels": rng.randint(0, 4, (8,)),
    }
    global_batch = make_global_batch(local, mesh)
    # Single process: global shape == local shape, values identical.
    assert global_batch["points"].shape == (8, 16, 3)
    assert global_batch["labels"].shape == (8,)
    np.testing.assert_array_equal(np.asarray(global_batch["points"]), local["points"])
    # Batch dim sharded over 'data': one row per device.
    assert global_batch["points"].sharding.is_equivalent_to(
        NamedSharding(mesh, P("data", None, None)), ndim=3
    )
    shard_shapes = {s.data.shape for s in global_batch["points"].addressable_shards}
    assert shard_shapes == {(1, 16, 3)}


def test_make_global_batch_feeds_jit(rng):
    """A globally-assembled batch is consumable by a jitted SPMD reduction."""
    mesh = make_mesh(num_devices=8, axis_names=("data",))
    local = {"x": rng.randn(16, 4).astype(np.float32)}
    gb = make_global_batch(local, mesh)

    @jax.jit
    def mean_norm(b):
        return jnp.mean(jnp.sum(b["x"] ** 2, -1))

    np.testing.assert_allclose(
        float(mean_norm(gb)), float(np.mean(np.sum(local["x"] ** 2, -1))), rtol=1e-6
    )
