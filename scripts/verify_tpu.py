"""On-device verification: Pallas kernels vs jnp oracles + one train step.

Run on real TPU hardware (the CI tests only cover interpret mode):
    python scripts/verify_tpu.py
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    rng = np.random.RandomState(0)

    # 1. Pallas FPS vs jnp oracle on device
    from pointasnl_tpu.ops import geometry as g
    from pointasnl_tpu.ops.pallas import fps as pfps

    for B, N, M in [(2, 1024, 128), (4, 10240, 1280)]:
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        got = np.asarray(pfps.farthest_point_sample(M, xyz))
        want = np.asarray(jax.jit(lambda x, m=M: g.farthest_point_sample(m, x))(xyz))
        assert (got == want).all(), f"FPS mismatch at B{B} N{N} M{M}"
        print(f"pallas fps B{B} N{N} M{M}: OK")

    # 1b. kNN kernels vs the f64 numpy oracle AT MODEL SCALE on device.
    # This is the check interpret-mode tests cannot do: the TPU's default
    # matmul precision is bf16-level, which once made the kernels mis-rank
    # ~70% of neighborhoods at 10240-point scale (fixed with
    # precision=HIGHEST distance matmuls; this guards the regression).
    from pointasnl_tpu.ops.pallas import knn as pknn
    from pointasnl_tpu.ops.pallas import knn_spatial as ks

    for name, fn, B, N, M, K in [
        ("resident", pknn.knn_point, 2, 10240, 1280, 32),
        ("spatial", ks.knn_point, 2, 10240, 1280, 32),
    ]:
        xyz = jnp.asarray(rng.randn(B, N, 3).astype(np.float32))
        qry = jnp.asarray(rng.randn(B, M, 3).astype(np.float32))
        _, gi = fn(K, xyz, qry)
        gi = np.asarray(gi)
        x64 = np.asarray(xyz, np.float64)
        q64 = np.asarray(qry, np.float64)
        mism = 0
        for b in range(B):
            d2 = ((q64[b][:, None] - x64[b][None]) ** 2).sum(-1)
            want = np.argsort(d2, axis=1, kind="stable")[:, :K]
            mism += int((gi[b] != want).sum())
        frac = mism / gi.size
        # allow only FP near-tie swaps (measured ~1e-5 of entries)
        assert frac < 1e-4, f"{name} kNN mis-ranks {frac:.2%} at scale"
        print(f"pallas knn[{name}] {M}x{N} k{K}: OK ({mism} near-tie diffs)")

    # 1c. Scene-scale checks, f64 oracle on SAMPLED query rows (the full
    # N^2 oracle would need ~137 GB at 131k). Covers the spatial kernel's
    # HBM-pack/two-level machinery and the raised-VMEM resident rung —
    # the paths the 10240-scale checks above never reach.
    from pointasnl_tpu.data.synthetic import surface_scene

    def check_rows(name, got_i, x64, q64, rows, k):
        mism = 0
        for r in rows:
            d2 = ((q64[r] - x64) ** 2).sum(-1)
            want = np.argsort(d2, kind="stable")[:k]
            mism += int((got_i[r] != want).sum())
        frac = mism / (len(rows) * k)
        assert frac < 1e-4, f"{name} mis-ranks {frac:.2%} at scene scale"
        print(f"pallas knn[{name}]: OK ({mism} near-tie diffs "
              f"on {len(rows)} sampled rows)")

    n_scene = 131072
    scene = jnp.asarray(surface_scene(rng, 1, n_scene, extent=6.0))
    _, gi = ks.knn_point(32, scene, scene)  # self-kNN: the whole-scene path
    gi = np.asarray(gi)[0]
    x64 = np.asarray(scene, np.float64)[0]
    rows = rng.choice(n_scene, 512, replace=False)
    check_rows(f"spatial-{n_scene}", gi, x64, x64, rows, 32)

    n_res = 32768  # 12288 < N <= RESIDENT_RAISED_MAX_N: raised-VMEM rung
    cloud = jnp.asarray(surface_scene(rng, 1, n_res, extent=3.0))
    _, gi = pknn._knn_scan(32, cloud, cloud)
    gi = np.asarray(gi)[0]
    x64 = np.asarray(cloud, np.float64)[0]
    rows = rng.choice(n_res, 512, replace=False)
    check_rows(f"resident-raised-{n_res}", gi, x64, x64, rows, 32)

    # 2. Flash attention vs dense on device
    from pointasnl_tpu.ops.pallas.flash_attention import flash_attention

    q = jnp.asarray(rng.randn(2, 200, 32).astype(np.float32))
    k = jnp.asarray(rng.randn(2, 1024, 32).astype(np.float32))
    v = jnp.asarray(rng.randn(2, 1024, 16).astype(np.float32))
    got = np.asarray(flash_attention(q, k, v))
    import math

    attn = jax.nn.softmax(jnp.einsum("bmc,bnc->bmn", q, k) / math.sqrt(32), axis=-1)
    want = np.asarray(jnp.einsum("bmn,bnd->bmd", attn, v))
    # default TPU matmul precision runs bf16 passes on both paths; tolerance
    # reflects bf16 epsilon (~8e-3) on the attention logits.
    np.testing.assert_allclose(got, want, rtol=3e-2, atol=3e-3)
    print("pallas flash attention: OK")

    # 3. One classification train step end to end
    from pointasnl_tpu.models import PointASNLCls
    from pointasnl_tpu.train import (
        bn_momentum_schedule,
        create_train_state,
        make_train_step,
        staircase_lr_schedule,
    )
    from pointasnl_tpu.train.state import make_optimizer

    batch = {
        "points": jnp.asarray(rng.randn(8, 1024, 3).astype(np.float32)),
        "labels": jnp.asarray(rng.randint(0, 40, (8,))),
    }
    model = PointASNLCls(num_class=40, adaptive_sample=True)
    tx = make_optimizer("adam", staircase_lr_schedule(1e-3, 8, 2e5, 0.7))
    state = create_train_state(model, batch["points"], tx=tx)
    step = make_train_step(bn_schedule=bn_momentum_schedule(8, 2e5), task="cls", donate=False)
    state, metrics = step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    print(f"train step: OK (loss {float(metrics['loss']):.3f})")
    print("ALL TPU VERIFICATIONS PASSED")


if __name__ == "__main__":
    main()
